package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.ops.{ExportOps, QualityMonitor}
import graft.table.TransactionalTable

/**
 * Maintenance cadence for the engine's OWN bookkeeping (r18 review missing
 * #5/#6): consumer-ack registries, quality-stats and MV aux tables expire
 * snapshot history at an opt-in post-commit cadence (one ack/batch per
 * commit FOREVER otherwise), with writer fences provably surviving every
 * expiry; and the CatalogLinks / view-metadata version chains run a
 * keep-last-N sweep so a rename/DDL-heavy namespace stays O(N) files.
 */
class MaintenanceCadenceSpec extends SparkSpec {
  import spark.implicits._

  private def manifestCount(root: String): Long =
    graft.util.Fs.listSeq(Paths.get(root, "manifest"))
      .count(p => p.getFileName.toString.matches("v\\d+\\.json")).toLong

  test("consumer-ack registry history stays bounded under continuous acking; monotonicity and low-watermark survive expiry") {
    val root = tmpDir("maint-consumers")
    val exp = s"$root/exp"
    // a long-lived stream acking 40 intervals: without expiry that is 40
    // manifests forever; with the cadence the registry holds a bounded tail
    (1 to 40).foreach(v => ExportOps.ackConsumed(spark, exp, "trainer", v.toLong))
    ExportOps.ackConsumed(spark, exp, "slow", 3L)
    val n = manifestCount(s"$exp/_consumers")
    assert(n <= 24, s"snapshot history must stay bounded by the cadence: $n manifests")
    // the live state is exact and the monotone rule still enforces: a
    // stale/replayed ack no-ops even though its read-window snapshots are
    // long expired
    ExportOps.ackConsumed(spark, exp, "trainer", 7L)
    assert(ExportOps.consumerAcks(spark, exp) ===
      Map("trainer" -> 40L, "slow" -> 3L),
      "expiry must never regress or lose an ack")
  }

  test("quality-stats history stays bounded under continuous batches; the replay fence survives expiry") {
    val root = tmpDir("maint-stats")
    val stats = QualityMonitor.statsTable(spark, s"$root/stats")
    val docs = (1 to 6).map(i => (i.toLong, s"a b c tok$i", "src"))
      .toDF("doc_id", "text", "source")
    (0 until 40).foreach(b => assert(QualityMonitor.appendBatch(stats, docs, b.toLong)))
    val n = manifestCount(s"$root/stats")
    assert(n <= 24, s"snapshot history must stay bounded by the cadence: $n manifests")
    // FENCE PRESERVATION (the expiry soundness claim): the commit path
    // inherits every writer fence into each newer manifest, so a
    // re-delivered epoch still no-ops after dozens of expiries
    assert(!QualityMonitor.appendBatch(stats, docs, 39L),
      "a replayed epoch must still fence to a no-op after expiry")
    assert(!QualityMonitor.appendBatch(stats, docs, 5L),
      "an out-of-order backfill must still fence after expiry")
    // and the drift surfaces keep reading the full retained row history
    // (expiry drops SNAPSHOTS, never live rows)
    val d = QualityMonitor.drift(stats, refUpToBatch = 19)
    assert(d.nRef === 120L && d.nCur === 120L && !d.drifted,
      s"stable traffic over the full row history: $d")
  }

  test("catalog-links and view-metadata chains run keep-last-N sweeps; resolution stays exact through the GC") {
    val cat = s"graft_gc${System.nanoTime()}"
    val w = tmpDir("maint-links")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    spark.conf.set(s"spark.sql.catalog.$cat.renameMode", "metadata")
    Files.createDirectories(Paths.get(s"$w/db"))
    TransactionalTable.create(spark, s"$w/db/t0",
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT"), "id", None)
    spark.sql(s"INSERT INTO $cat.db.t0 VALUES (1), (2)")
    // 14 chained metadata renames: pre-r19 that is 14 map files forever
    (1 to 14).foreach(i =>
      spark.sql(s"ALTER TABLE $cat.db.t${i - 1} RENAME TO db.t$i"))
    val linkFiles = graft.util.Fs.listSeq(Paths.get(s"$w/db/_catalog_links"))
      .count(_.getFileName.toString.matches("v\\d+\\.json"))
    assert(linkFiles <= 8, s"links chain must stay O(keep-last): $linkFiles files")
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.db.t14").as[Long].head() === 2L,
      "resolution through the GC'd chain stays exact")
    intercept[Exception](spark.sql(s"SELECT * FROM $cat.db.t13").collect())

    // view chain: 14 property DDLs — same bound, view still whole
    spark.sql(s"CREATE VIEW $cat.db.v AS SELECT id FROM $cat.db.t14")
    (1 to 14).foreach(i =>
      spark.sql(s"ALTER VIEW $cat.db.v SET TBLPROPERTIES('k$i'='$i')"))
    val viewFiles = graft.util.Fs.listSeq(Paths.get(s"$w/db/v/_view"))
      .count(_.getFileName.toString.matches("v\\d+\\.json"))
    assert(viewFiles <= 8, s"view chain must stay O(keep-last): $viewFiles files")
    val meta = graft.sql.GraftViewStore.load(s"$w/db/v", graft.table.PosixCommitIO)
    assert(meta.properties.size === 14 && meta.properties("k1") === "1",
      "every committed property survives the sweep (state lives in the head)")
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.db.v").as[Long].head() === 2L)
  }

  test("MV storage expires snapshot history under a refresh cadence") {
    val cat = s"graft_mvx${System.nanoTime()}"
    val w = tmpDir("maint-mv")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    Files.createDirectories(Paths.get(s"$w/db"))
    TransactionalTable.create(spark, s"$w/db/t",
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v BIGINT"),
      "id", None)
    spark.sql(s"INSERT INTO $cat.db.t VALUES (0, 0)")
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.db.m TBLPROPERTIES('pk'='id') " +
      s"AS SELECT id, v FROM $cat.db.t")
    val storage = TransactionalTable.open(spark, s"$w/db/m/_storage")
    assert(storage.snapshotExpiry.isDefined,
      "MV storage must opt into the expiry cadence at creation")
    (1 to 36).foreach { i =>
      spark.sql(s"INSERT INTO $cat.db.t VALUES ($i, $i)")
      spark.sql(s"CALL $cat.system.refresh_mv('db.m')").collect()
    }
    val n = manifestCount(s"$w/db/m/_storage")
    assert(n <= 24, s"MV storage snapshot history must stay bounded: $n manifests")
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.db.m").as[Long].head() === 37L,
      "the MV keeps answering exactly through the expiries")
  }
}
