package graft


import org.apache.spark.sql.types._

import graft.table.{DeleteFile, MergeMode, TransactionalTable}

/** Targeted MOR delete fold (`foldDeletes` / CALL graft.system.fold_deletes):
  * pending delete files are applied to ONLY the data files they can mask —
  * equality deletes via pk-range∧bloom pruning, positional deletes via their
  * named victim files — everything else rides into the new snapshot by
  * reference. The O(affected) alternative to compact()'s full-table rewrite.
  */
class FoldDeletesSpec extends SparkSpec {
  import spark.implicits._

  private val sch = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def oneFile(rows: Seq[(Long, String)]) =
    rows.toDF("id", "v").repartition(1)

  test("equality fold rewrites only pk-range-affected files; far file carried by path") {
    val t = TransactionalTable.create(spark, tmpDir("fold-eq"), sch, "id")
    t.append(oneFile((0L until 100L).map(i => i -> s"a$i")), batchId = 0)
    t.append(oneFile((1000L until 1100L).map(i => i -> s"b$i")), batchId = 1)
    val farFile = t.snapshot.files.find(_.pkMin >= 1000L).get.path
    // MOR merge touching only the low region: update 0..9, delete 10..19
    t.merge(oneFile((0L until 10L).map(i => i -> s"u$i")),
      (10L until 20L).toDF("id"), batchId = 2, MergeMode.MergeOnRead)
    assert(t.snapshot.deletes.nonEmpty, "test premise: equality deletes pending")

    val (rewritten, folded) = t.foldDeletes()
    assert(folded === 1L)
    assert(rewritten >= 1L && rewritten <= 2L,
      s"only the low-range file (and at most the merge's own batch file) " +
        s"may rewrite, got $rewritten")
    val s = t.snapshot
    assert(s.deletes.isEmpty, "fold must clear the delete set")
    assert(s.files.exists(_.path == farFile),
      "the far file must survive by reference (identical path)")
    // end state: updates applied, deletes gone, far region intact
    val got = t.scan().as[(Long, String)].collect().toMap
    assert(got.size === 190)
    assert(got(0L) === "u0" && !got.contains(15L) && got(1050L) === "b1050")
    // metadata-only COUNT(*) is restored (no delete join needed)
    assert(t.countRows === 190L && s.rowCount === 190L)
  }

  test("positional fold rewrites only the named victim files") {
    val t = TransactionalTable.create(spark, tmpDir("fold-pos"), sch, "id")
    t.append(oneFile((0L until 100L).map(i => i -> s"a$i")), batchId = 0)
    t.append(oneFile((1000L until 1100L).map(i => i -> s"b$i")), batchId = 1)
    val farFile = t.snapshot.files.find(_.pkMin >= 1000L).get.path
    t.merge(oneFile(Seq.empty), (10L until 20L).toDF("id"),
      batchId = 2, MergeMode.MergeOnReadPositional)
    assert(t.snapshot.deletes.exists(_.kind == DeleteFile.Position),
      "test premise: positional deletes pending")

    val (rewritten, folded) = t.foldDeletes()
    assert(folded === 1L && rewritten === 1L,
      s"exactly the one victim file rewrites, got ($rewritten, $folded)")
    val s = t.snapshot
    assert(s.deletes.isEmpty)
    assert(s.files.exists(_.path == farFile), "non-victim carried by reference")
    val got = t.scan().as[(Long, String)].collect().toMap
    assert(got.size === 190 && !got.contains(12L) && got(1001L) === "b1001")
  }

  test("delete set that masks nothing is dropped in a pure-metadata commit") {
    val t = TransactionalTable.create(spark, tmpDir("fold-noop"), sch, "id")
    t.append(oneFile((0L until 50L).map(i => i -> s"a$i")), batchId = 0)
    // delete keys in a key region no data file covers
    t.merge(oneFile(Seq.empty), (5000L until 5010L).toDF("id"),
      batchId = 1, MergeMode.MergeOnRead)
    assert(t.snapshot.deletes.nonEmpty)
    val pathsBefore = t.snapshot.files.map(_.path).toSet
    val vBefore = t.currentVersion

    val (rewritten, folded) = t.foldDeletes()
    assert(rewritten === 0L && folded === 1L)
    val s = t.snapshot
    assert(s.version === vBefore + 1 && s.deletes.isEmpty)
    assert(s.files.map(_.path).toSet === pathsBefore,
      "masks-nothing fold must move zero data")
  }

  test("time travel to the pre-fold version still applies the old deletes") {
    val t = TransactionalTable.create(spark, tmpDir("fold-tt"), sch, "id")
    t.append(oneFile((0L until 30L).map(i => i -> s"a$i")), batchId = 0)
    t.merge(oneFile(Seq.empty), (0L until 10L).toDF("id"),
      batchId = 1, MergeMode.MergeOnRead)
    val preFold = t.currentVersion
    t.foldDeletes()
    assert(t.scan().count() === 20L)
    assert(t.scanAt(preFold).count() === 20L,
      "pre-fold snapshot reads with its delete files intact")
    assert(t.scanAt(preFold - 1).count() === 30L)
  }

  test("second fold is a no-op; fold after CoW merge sees no deletes") {
    val t = TransactionalTable.create(spark, tmpDir("fold-idem"), sch, "id")
    t.append(oneFile((0L until 20L).map(i => i -> s"a$i")), batchId = 0)
    t.merge(oneFile(Seq.empty), (0L until 5L).toDF("id"),
      batchId = 1, MergeMode.MergeOnRead)
    assert(t.foldDeletes()._2 === 1L)
    val v = t.currentVersion
    assert(t.foldDeletes() === ((0L, 0L)), "nothing pending — no-op")
    assert(t.currentVersion === v, "no-op fold must not commit")
  }

  test("SQL surface: CALL system.fold_deletes clears the MOR-pending state") {
    val w = tmpDir("fold-wh")
    spark.conf.set("spark.sql.catalog.graft_fd", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_fd.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    val t = TransactionalTable.create(spark, s"$w/db/t", sch, "id")
    t.append(oneFile((0L until 40L).map(i => i -> s"a$i")), batchId = 0)
    t.merge(oneFile(Seq.empty), (0L until 10L).toDF("id"),
      batchId = 1, MergeMode.MergeOnRead)
    val Seq((rw, folded)) = spark.sql("CALL graft_fd.system.fold_deletes('db.t')")
      .as[(Long, Long)].collect().toSeq
    assert(rw === 1L && folded === 1L)
    assert(TransactionalTable.open(spark, s"$w/db/t").snapshot.deletes.isEmpty)
    assert(spark.sql("SELECT COUNT(*) FROM graft_fd.db.t").as[Long].head() === 30L)
  }
}
