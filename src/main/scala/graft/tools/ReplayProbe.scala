package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cdc.Cdc
import graft.queries.Tables
import graft.stream.{CdcEventsReplay, CdcPipeline}
import graft.table.TransactionalTable

/** Dev probe: break the cdc_events_replay per-batch cost into stages so the
  * per-commit constant (verdict r10 #2) is measured, not guessed.
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ReplayProbe" */
object ReplayProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label%-38s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // whole-query baseline
    time("endState TOTAL (4 batches)") {
      CdcEventsReplay.endState(spark, sfDir).count()
    }

    // stage breakdown for each batch
    val events = Tables.events(spark, sfDir)
    val maxId = time("max(event_id)")(events.agg(max("event_id")).head().getLong(0))
    val root = Files.createTempDirectory("graft_probe").toString
    val t = TransactionalTable.create(spark, root, Cdc.tableSchema, Cdc.PrimaryKey,
      Some(Cdc.PartitionColumn))
    val nBatches = 4
    val step = maxId / nBatches + 1
    (0 until nBatches).foreach { i =>
      val batch = events.filter(
        col("event_id") >= i * step && col("event_id") < (i + 1) * step)
      val envelopes = Cdc.parse(CdcEventsReplay.envelopeLines(batch))
      val deduped = time(s"b$i parse+dedup+persist+agg") {
        val d = Cdc.latestPerKey(Cdc.flatten(envelopes)).persist()
        d.agg(count(lit(1))).head()
        d
      }
      val ups = Cdc.projectToTable(Cdc.upserts(deduped))
      val dels = Cdc.deletes(deduped).select(col(Cdc.PrimaryKey))
      time(s"b$i merge (plan+write+commit)") {
        t.merge(ups, dels, i, graft.table.MergeMode.CopyOnWrite)
      }
      deduped.unpersist()
    }

    println(s"[probe] files after 4 batches: ${t.snapshot.files.size}")

    // constant-cost isolation: same data, ONE batch
    val root1 = Files.createTempDirectory("graft_probe1").toString
    time("replay nBatches=1 TOTAL") {
      CdcEventsReplay.replay(spark, sfDir, root1, nBatches = 1)
    }

    // hypothesis: hash write-distribution (1 file per partition value per
    // commit) cuts the per-commit file count and read-back passes
    val root2 = Files.createTempDirectory("graft_probe2").toString
    time("replay 4 batches, write.distribution=hash TOTAL") {
      val t2 = TransactionalTable.create(spark, root2, Cdc.tableSchema, Cdc.PrimaryKey,
        Some(Cdc.PartitionColumn))
      t2.setWriteDistribution("hash")
      (0 until nBatches).foreach { i =>
        val batch = events.filter(
          col("event_id") >= i * step && col("event_id") < (i + 1) * step)
        CdcPipeline.applyCdcBatch(t2, Cdc.parse(CdcEventsReplay.envelopeLines(batch)), i)
      }
      println(s"[probe] hash-dist files after 4 batches: ${t2.snapshot.files.size}")
    }
    // empty-commit floor: merge of 1 row into the 4-batch table
    import spark.implicits._
    val one = Seq((999999999L, "c", "visit", "S", 1, "pc",
      new java.sql.Timestamp(0L))).toDF(
      "trans_id", "customer_id", "event", "sku", "amount", "device", "trans_datetime")
    time("1-row merge into built table")(t.merge(one, one.limit(0).select(col("trans_id")), 99))
    spark.stop()
  }
}
