package graft

import org.apache.spark.sql.functions._

import graft.cdc.Cdc
import graft.fixtures.CdcFixtures
import graft.stream.CdcPipeline
import graft.table.{MergeMode, TransactionalTable}

/** Merge-on-read (Iceberg v2-style equality deletes): merges write data +
  * delete files without rewriting existing files; scans apply the delete
  * join; compaction folds deletes back into pure data. */
class MergeOnReadSpec extends SparkSpec {
  import spark.implicits._

  private def freshGolden(mode: MergeMode): TransactionalTable = {
    val t = TransactionalTable.create(spark, tmpDir("ttable-mor"), Cdc.tableSchema,
      Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    def apply(lines: Seq[String], b: Long): Unit = {
      val deduped = Cdc.latestPerKey(Cdc.flatten(Cdc.parse(lines.toDS())))
      t.merge(Cdc.projectToTable(Cdc.upserts(deduped)),
        Cdc.deletes(deduped).select(col(Cdc.PrimaryKey)), b, mode)
    }
    apply(CdcFixtures.scenario1Lines, 0)
    apply(CdcFixtures.scenario2Lines, 1)
    t
  }

  test("MOR golden replay equals the CoW end state; no data file rewritten") {
    val t = freshGolden(MergeMode.MergeOnRead)
    val got = t.scan()
      .select($"trans_id", $"amount").as[(Long, Int)].collect().sortBy(_._1).toSeq
    val want = CdcFixtures.expectedEndState.map(e => (e._1, e._5))
    assert(got === want)
    assert(t.countRows === 12) // falls back to scan-count under pending deletes

    // batch-0 files survive untouched in the manifest (MOR never rewrites)
    val v1Files = t.snapshotAt(1).files.map(_.path).toSet
    assert(v1Files.subsetOf(t.snapshot.files.map(_.path).toSet))
    assert(t.snapshot.deletes.nonEmpty)
  }

  test("compaction folds deletes in; result identical; SQL readable again") {
    val t = freshGolden(MergeMode.MergeOnRead)
    val before = t.scan().orderBy("trans_id").collect().toSeq
    t.compact()
    assert(t.snapshot.deletes.isEmpty)
    assert(t.scan().orderBy("trans_id").collect().toSeq === before)
    assert(t.countRows === 12) // metadata-only again
    // time travel to the MOR version still applies its deletes
    assert(t.scanAt(2).count() === 12)
  }

  test("mixed modes: CoW after MOR does not resurrect masked rows") {
    val t = freshGolden(MergeMode.MergeOnRead)
    // CoW-merge an update of key 19 (amount → 500) while deletes are pending
    val up = Seq((19L, "826787813308", "visit", "DK2617NXBK", 500, "tablet",
      new java.sql.Timestamp(0L))).toDF(Cdc.tableSchema.fieldNames.toIndexedSeq: _*)
    t.merge(up, spark.emptyDataset[Long].toDF("trans_id"), batchId = 2)
    val got = t.scan().select($"trans_id", $"amount").as[(Long, Int)].collect().toMap
    assert(got(19L) === 500)
    assert(got.size === 12, s"unexpected keys: ${got.keys.toSeq.sorted}")
    assert(!got.contains(6L), "CoW rewrite resurrected a MOR-deleted row")
  }

  test("positional MOR golden replay equals the CoW end state; no rewrite") {
    val t = freshGolden(MergeMode.MergeOnReadPositional)
    val got = t.scan()
      .select($"trans_id", $"amount").as[(Long, Int)].collect().sortBy(_._1).toSeq
    val want = CdcFixtures.expectedEndState.map(e => (e._1, e._5))
    assert(got === want)
    // batch-0 files survive untouched; pending deletes are positional
    val v1Files = t.snapshotAt(1).files.map(_.path).toSet
    assert(v1Files.subsetOf(t.snapshot.files.map(_.path).toSet))
    assert(t.snapshot.deletes.nonEmpty)
    assert(t.snapshot.deletes.forall(_.kind === graft.table.DeleteFile.Position))
    // time travel applies only version-1's delete set (none exists yet there)
    assert(t.scanAt(1).count() === 10)
  }

  test("positional MOR: compaction folds position deletes; scan identical") {
    val t = freshGolden(MergeMode.MergeOnReadPositional)
    val before = t.scan().orderBy("trans_id").collect().toSeq
    t.compact()
    assert(t.snapshot.deletes.isEmpty)
    assert(t.scan().orderBy("trans_id").collect().toSeq === before)
    assert(t.countRows === 12)
  }

  test("mixed equality + positional delete files apply together") {
    val t = freshGolden(MergeMode.MergeOnRead) // scenario1+2 → equality deletes
    // a third batch via POSITIONAL mode: update key 21, delete key 28
    val up = Seq((21L, "751351243210", "cart", "UPDATED", 999, "tablet",
      new java.sql.Timestamp(0L))).toDF(Cdc.tableSchema.fieldNames.toIndexedSeq: _*)
    t.merge(up, Seq(28L).toDF("trans_id"), batchId = 2,
      MergeMode.MergeOnReadPositional)
    val kinds = t.snapshot.deletes.map(_.kind).toSet
    assert(kinds === Set(graft.table.DeleteFile.Equality, graft.table.DeleteFile.Position))
    val got = t.scan().select($"trans_id", $"amount").as[(Long, Int)].collect().toMap
    assert(got(21L) === 999, "positional mask of the superseded image failed")
    assert(!got.contains(28L), "positional delete failed")
    assert(got.size === 11)
    // and compaction folds BOTH kinds
    t.compact()
    assert(t.snapshot.deletes.isEmpty)
    assert(t.scan().count() === 11)
  }

  test("catalog SQL reads MOR-pending tables via the delete-aware rewrite") {
    val w = tmpDir("graft-mor-warehouse")
    spark.conf.set("spark.sql.catalog.graft_mor", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_mor.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    val t = TransactionalTable.create(spark, s"$w/db/retail", Cdc.tableSchema,
      Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    def applyB(lines: Seq[String], b: Long): Unit = {
      val deduped = Cdc.latestPerKey(Cdc.flatten(Cdc.parse(lines.toDS())))
      t.merge(Cdc.projectToTable(Cdc.upserts(deduped)),
        Cdc.deletes(deduped).select(col(Cdc.PrimaryKey)), b, MergeMode.MergeOnRead)
    }
    applyB(CdcFixtures.scenario1Lines, 0)
    applyB(CdcFixtures.scenario2Lines, 1)
    assert(t.snapshot.deletes.nonEmpty, "test premise: deletes pending")
    // SQL over the live MOR table: masked rows must not surface (GraftMorScanRule)
    val cnt = spark.sql("SELECT COUNT(*) AS c FROM graft_mor.db.retail").as[Long].head()
    assert(cnt === 12L)
    val got = spark.sql(
      "SELECT trans_id, amount FROM graft_mor.db.retail WHERE event = 'cart' ORDER BY trans_id")
      .as[(Long, Int)].collect().toSeq
    assert(got === t.scan().filter($"event" === "cart")
      .select($"trans_id", $"amount").orderBy($"trans_id").as[(Long, Int)].collect().toSeq)
    // time travel to the batch-0 MOR snapshot still applies ITS delete set
    val v1 = spark.sql("SELECT COUNT(*) AS c FROM graft_mor.db.retail VERSION AS OF 1")
      .as[Long].head()
    assert(v1 === 10L)
    // compaction folds deletes; the plain scan path answers identically
    t.compact()
    val cnt2 = spark.sql("SELECT COUNT(*) AS c FROM graft_mor.db.retail").as[Long].head()
    assert(cnt2 === 12L)
  }
}
