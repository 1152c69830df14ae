package graft

import java.nio.file.{Files, Paths}

import graft.table.TransactionalTable

/** Metadata-only DELETE for partition-covering predicates (Iceberg
  * `canDeleteWhere` parity): `DELETE FROM t WHERE pcol = v` on an
  * identity-partitioned table drops the covered files as a pure metadata
  * commit — no scan, no write job — and falls back to the key-scan + merge
  * for any predicate that does not exactly cover files. */
class DeleteWhereSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshCat(): (String, String) = {
    n += 1
    val cat = s"graft_dw$n"
    val w = tmpDir(s"graft-dw$n-warehouse")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    Files.createDirectories(Paths.get(s"$w/db"))
    (cat, w)
  }

  private def mkEvents(cat: String): Unit = {
    spark.sql(
      s"""CREATE TABLE $cat.db.ev (id BIGINT, event STRING, val INT)
         |PARTITIONED BY (event) TBLPROPERTIES ('pk'='id')""".stripMargin)
    spark.sql(
      s"""INSERT INTO $cat.db.ev VALUES
         |  (1, 'view', 10), (2, 'view', 20),
         |  (3, 'click', 30), (4, 'click', 40),
         |  (5, 'error', 50), (6, 'error', 60)""".stripMargin)
  }

  private def dataFilePaths(root: String): Set[String] =
    TransactionalTable.open(spark, root).snapshot.files.map(_.path).toSet

  test("partition-equality DELETE is a metadata-only file drop") {
    val (cat, w) = freshCat()
    mkEvents(cat)
    val root = s"$w/db/ev"
    val before = dataFilePaths(root)
    val vBefore = TransactionalTable.open(spark, root).currentVersion

    spark.sql(s"DELETE FROM $cat.db.ev WHERE event = 'error'")

    val t = TransactionalTable.open(spark, root)
    // exactly one commit, stamped 'delete'
    assert(t.currentVersion === vBefore + 1)
    assert(t.operationOf(t.currentVersion).contains("delete"))
    // ZERO data files written: the new snapshot is a subset of the old one
    val after = dataFilePaths(root)
    assert(after.subsetOf(before), "metadata-only DELETE wrote a data file")
    assert((before -- after).nonEmpty, "no file was dropped")
    // rows gone, others intact
    assert(spark.sql(s"SELECT id FROM $cat.db.ev ORDER BY id")
      .as[Long].collect().toSeq === Seq(1L, 2L, 3L, 4L))
    // time travel intact: dropped files remain on disk for the old snapshot
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.db.ev VERSION AS OF $vBefore").as[Long].head() === 6L)
  }

  test("destroyed-file proof: the covered partition is never scanned") {
    // The strongest form of "no scan, no write job": physically destroy the
    // to-be-dropped partition's parquet before the DELETE. Any scan-based
    // plan fails; the metadata-only drop cannot notice.
    val (cat, w) = freshCat()
    mkEvents(cat)
    val root = s"$w/db/ev"
    TransactionalTable.open(spark, root).snapshot.files
      .filter(_.partition.contains("error"))
      .foreach(f => Files.delete(Paths.get(f.path)))
    spark.sql(s"DELETE FROM $cat.db.ev WHERE event = 'error'")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.ev").as[Long].head() === 4L)
  }

  test("IN-list DELETE drops multiple partitions metadata-only") {
    val (cat, w) = freshCat()
    mkEvents(cat)
    val root = s"$w/db/ev"
    val before = dataFilePaths(root)
    spark.sql(s"DELETE FROM $cat.db.ev WHERE event IN ('click', 'error')")
    assert(dataFilePaths(root).subsetOf(before))
    assert(spark.sql(s"SELECT id FROM $cat.db.ev ORDER BY id")
      .as[Long].collect().toSeq === Seq(1L, 2L))
  }

  test("straddling predicate falls back to the key-scan merge") {
    val (cat, w) = freshCat()
    mkEvents(cat)
    val root = s"$w/db/ev"
    // covers only PART of the 'view' partition — must NOT drop whole files
    spark.sql(s"DELETE FROM $cat.db.ev WHERE event = 'view' AND val > 15")
    val t = TransactionalTable.open(spark, root)
    // the fallback is observable in the op stamp: the merge path commits as
    // 'mergeAdhoc', the metadata-only drop as 'delete'
    assert(t.operationOf(t.currentVersion).contains("mergeAdhoc"),
      "straddling DELETE should have taken the merge path")
    assert(spark.sql(s"SELECT id FROM $cat.db.ev ORDER BY id")
      .as[Long].collect().toSeq === Seq(1L, 3L, 4L, 5L, 6L))
    // the surviving same-partition row is untouched (file-level delete would
    // have removed id=1 with its partition)
    assert(spark.sql(s"SELECT val FROM $cat.db.ev WHERE event = 'view'")
      .as[Int].collect().toSeq === Seq(10))
    // non-partition-column predicate also merges
    spark.sql(s"DELETE FROM $cat.db.ev WHERE val = 30")
    assert(spark.sql(s"SELECT id FROM $cat.db.ev ORDER BY id")
      .as[Long].collect().toSeq === Seq(1L, 4L, 5L, 6L))
  }

  test("days(ts) boundary-exact range DELETE drops whole day partitions metadata-only") {
    val (cat, w) = freshCat()
    spark.sql(
      s"""CREATE TABLE $cat.db.tev (id BIGINT, ts TIMESTAMP, val INT)
         |PARTITIONED BY (days(ts)) TBLPROPERTIES ('pk'='id')""".stripMargin)
    spark.sql(
      s"""INSERT INTO $cat.db.tev VALUES
         |  (1, TIMESTAMP '2024-01-01 01:00:00', 10),
         |  (2, TIMESTAMP '2024-01-01 23:00:00', 20),
         |  (3, TIMESTAMP '2024-01-02 01:00:00', 30),
         |  (4, TIMESTAMP '2024-01-03 05:00:00', 40),
         |  (5, TIMESTAMP '2024-01-04 09:00:00', 50)""".stripMargin)
    val root = s"$w/db/tev"
    // destroy the two covered days' files: a scan-based DELETE would fail
    TransactionalTable.open(spark, root).snapshot.files
      .filter(f => f.partition.exists(p => p == "19723" || p == "19724"))
      .foreach(f => Files.delete(Paths.get(f.path)))
    spark.sql(
      s"""DELETE FROM $cat.db.tev
         |WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
         |  AND ts <  TIMESTAMP '2024-01-03 00:00:00'""".stripMargin)
    val t = TransactionalTable.open(spark, root)
    assert(t.operationOf(t.currentVersion).contains("delete"))
    assert(spark.sql(s"SELECT id FROM $cat.db.tev ORDER BY id")
      .as[Long].collect().toSeq === Seq(4L, 5L))
    // a NON-boundary bound must take the merge (covers part of a day);
    // deleting exactly one row proves the row-level path ran
    spark.sql(
      s"""DELETE FROM $cat.db.tev
         |WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
         |  AND ts <  TIMESTAMP '2024-01-03 06:00:00'""".stripMargin)
    val t2 = TransactionalTable.open(spark, root)
    assert(t2.operationOf(t2.currentVersion).contains("mergeAdhoc"),
      "mid-day upper bound must not take the metadata path")
    assert(spark.sql(s"SELECT id FROM $cat.db.tev ORDER BY id")
      .as[Long].collect().toSeq === Seq(5L))
  }

  test("non-identity transform never takes the metadata path") {
    val (cat, w) = freshCat()
    spark.sql(
      s"""CREATE TABLE $cat.db.tev (id BIGINT, ts TIMESTAMP, val INT)
         |PARTITIONED BY (days(ts)) TBLPROPERTIES ('pk'='id')""".stripMargin)
    spark.sql(
      s"""INSERT INTO $cat.db.tev VALUES
         |  (1, TIMESTAMP '2024-01-01 01:00:00', 10),
         |  (2, TIMESTAMP '2024-01-01 23:00:00', 20),
         |  (3, TIMESTAMP '2024-01-02 01:00:00', 30)""".stripMargin)
    // ts-equality covers a strict subset of the day partition's rows — the
    // classifier must send it to the merge, deleting exactly one row
    spark.sql(
      s"DELETE FROM $cat.db.tev WHERE ts = TIMESTAMP '2024-01-01 01:00:00'")
    assert(spark.sql(s"SELECT id FROM $cat.db.tev ORDER BY id")
      .as[Long].collect().toSeq === Seq(2L, 3L))
  }

  test("property: metadata path and merge path agree on every partition subset") {
    // The metadata-only drop must be indistinguishable from the row-level
    // merge for ANY covered predicate — same end state, only the commit
    // shape differs. Deterministic sweep over all partition subsets.
    val (cat, w) = freshCat()
    mkEvents(cat)
    val all = Seq("view", "click", "error")
    val base = spark.sql(s"SELECT id, event, val FROM $cat.db.ev").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    all.toSet.subsets().filter(_.nonEmpty).foreach { subset =>
      val (c2, w2) = freshCat()
      mkEvents(c2)
      val inList = subset.map(v => s"'$v'").mkString(", ")
      spark.sql(s"DELETE FROM $c2.db.ev WHERE event IN ($inList)")
      val tMeta = TransactionalTable.open(spark, s"$w2/db/ev")
      assert(tMeta.operationOf(tMeta.currentVersion).contains("delete"),
        s"subset $subset must take the metadata path")
      val got = spark.sql(s"SELECT id, event, val FROM $c2.db.ev").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      // merge-path twin: a straddling conjunct forces the row-level merge
      val (c3, w3) = freshCat()
      mkEvents(c3)
      spark.sql(s"DELETE FROM $c3.db.ev WHERE event IN ($inList) AND val > -999")
      val tMerge = TransactionalTable.open(spark, s"$w3/db/ev")
      assert(tMerge.operationOf(tMerge.currentVersion).contains("mergeAdhoc"),
        s"twin for $subset must take the merge path")
      val want = spark.sql(s"SELECT id, event, val FROM $c3.db.ev").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      assert(got === want, s"paths disagree for subset $subset")
      assert(got === base.filterNot(r => subset.contains(r._2)))
      val _ = (w, w3)
    }
  }

  test("delete artifacts targeting dropped files drop with them (URI-form targets)") {
    import graft.table.{MergeMode, PartitionTransform}
    val root = tmpDir("dw-dv") + "/t"
    val sch = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("p", org.apache.spark.sql.types.StringType)))
    val t = TransactionalTable.create(spark, root, sch, "id", partitionCol = Some("p"))
    t.merge(Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "p"),
      spark.emptyDataset[Long].toDF("id"), batchId = 0)
    // a DELETION VECTOR masking a row of partition 'a' — its target is the
    // URI-form _metadata.file_path, NOT the plain manifest path
    t.merge(Seq.empty[(Long, String)].toDF("id", "p"), Seq(1L).toDF("id"),
      batchId = 1, mode = MergeMode.MergeOnReadVector)
    assert(t.snapshot.deletes.nonEmpty, "fixture needs a pending DV")
    // metadata-only drop of partition 'a' must drop the DV with its file
    assert(t.deletePartitions(Set("a")).exists(_ > 0))
    assert(t.snapshot.deletes.isEmpty,
      s"DV targeting a dropped file must drop too, got ${t.snapshot.deletes}")
    assert(t.scan().select("id").as[Long].collect().toSeq === Seq(3L))
    // morPending cleared -> maintenance is allowed again
    t.compactPartitions(Seq("b"), minFileRows = 1L << 20)
  }

  test("positional delete files drop when ALL victims drop; carry when any survives") {
    import graft.table.MergeMode
    val sch = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("p", org.apache.spark.sql.types.StringType)))
    // case 1: the positional delete's only victim is in the dropped partition
    val t1 = TransactionalTable.create(spark, tmpDir("dw-pos1") + "/t", sch, "id",
      partitionCol = Some("p"))
    t1.merge(Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "p"),
      spark.emptyDataset[Long].toDF("id"), batchId = 0)
    t1.merge(Seq.empty[(Long, String)].toDF("id", "p"), Seq(1L).toDF("id"),
      batchId = 1, mode = MergeMode.MergeOnReadPositional)
    assert(t1.snapshot.deletes.nonEmpty)
    assert(t1.deletePartitions(Set("a")).exists(_ > 0))
    assert(t1.snapshot.deletes.isEmpty,
      s"positional artifact with all victims dropped must drop, got ${t1.snapshot.deletes}")
    assert(t1.scan().select("id").as[Long].collect().toSeq === Seq(3L))
    // case 2: one positional delete file masks rows in BOTH partitions —
    // dropping one partition must CARRY the artifact (it still masks 'b')
    val t2 = TransactionalTable.create(spark, tmpDir("dw-pos2") + "/t", sch, "id",
      partitionCol = Some("p"))
    t2.merge(Seq((1L, "a"), (3L, "b"), (4L, "b")).toDF("id", "p"),
      spark.emptyDataset[Long].toDF("id"), batchId = 0)
    t2.merge(Seq.empty[(Long, String)].toDF("id", "p"), Seq(1L, 3L).toDF("id"),
      batchId = 1, mode = MergeMode.MergeOnReadPositional)
    assert(t2.deletePartitions(Set("a")).exists(_ > 0))
    assert(t2.snapshot.deletes.nonEmpty,
      "artifact masking a surviving file must be carried")
    assert(t2.scan().select("id").as[Long].collect().toSeq === Seq(4L),
      "carried artifact must still mask id=3 in the surviving partition")
  }

  test("deletePartitions API: not metadata-decidable under partition evolution") {
    // files written under an older spec may contain matching rows — the
    // metadata path must refuse (None) and leave the table untouched
    val sch = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event",
        org.apache.spark.sql.types.StringType)))
    val t0 = TransactionalTable.create(spark, tmpDir("ttable-dw-evolve"), sch, "id")
    t0.append(Seq((1L, "view"), (2L, "error")).toDF("id", "event"))
    val t = t0.evolvePartitioning(
      Some(graft.table.PartitionTransform.Identity("event")))
    t.append(Seq((3L, "error")).toDF("id", "event"))
    val vBefore = t.currentVersion
    assert(t.deletePartitions(Set("error")).isEmpty,
      "old-spec files are not metadata-decidable")
    assert(t.currentVersion === vBefore, "refused drop must not commit")
    // after compaction migrates every file to the current spec, it works
    t.compact(minFileRows = 1000L)
    assert(t.deletePartitions(Set("error")).contains(1L))
    assert(t.scan().select("id").as[Long].collect().toSeq === Seq(1L))
  }
}
