package graft.stream

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.Cdc
import graft.queries.Tables
import graft.table.TransactionalTable

/**
 * Scale-up CDC replay: turns the driver's `events` fixture into DMS-format
 * envelope JSON lines and streams them through the FULL pipeline (parse → W1
 * dedup → CoW MERGE) in ordered micro-batches. This is the sf-scalable
 * version of the golden-fixture replay — the workload behind BASELINE.md's
 * "micro-batch turnaround ≪ 100 s at sf0.1" target, and (because `events.ts`
 * is monotone in `event_id`, verified) its end state is exactly
 * last-event-per-user, so the whole run is DuckDB-oracle-checkable.
 *
 * Mapping: trans_id=user_id (keys collide across batches → real MERGE churn),
 * op = delete for 'error' events else update, amount = floor(value),
 * txn-id = event_id (the W1 tie-break).
 */
object CdcEventsReplay {

  private val TsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"

  /** events rows → envelope JSON lines (DMS `json-unformatted` wire shape,
    * reference `gen_fake_cdc_data.py:28-58`). */
  def envelopeLines(events: DataFrame): Dataset[String] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(to_json(struct(
      struct(
        col("user_id").as("trans_id"),
        col("user_id").cast("string").as("customer_id"),
        col("event_type").as("event"),
        lit("SKU0").as("sku"),
        floor(col("value")).cast("int").as("amount"),
        lit("pc").as("device"),
        date_format(col("ts"), TsFmt).as("trans_datetime")).as("data"),
      struct(
        date_format(col("ts"), TsFmt).as("timestamp"),
        lit("data").as("record-type"),
        when(col("event_type") === "error", "delete").otherwise("update").as("operation"),
        lit("primary-key").as("partition-key-type"),
        lit("testdb").as("schema-name"),
        lit("retail_trans").as("table-name"),
        col("event_id").as("transaction-id")).as("metadata"))).as("value")).as[String]
  }

  /**
   * Replay the events table as `nBatches` contiguous event_id ranges (order
   * preserved — later batches hold later events). Returns the table and the
   * per-batch wall-clock seconds (the freshness metric: each must stay far
   * under the reference's 100 s trigger).
   */
  def replay(spark: SparkSession, sfDir: String, root: String, nBatches: Int = 4,
      mode: graft.table.MergeMode = graft.table.MergeMode.CopyOnWrite)
      : (TransactionalTable, Seq[Double]) = {
    val events = Tables.events(spark, sfDir)
    val maxId = events.agg(max("event_id")).head().getLong(0)
    val t = TransactionalTable.create(spark, root, Cdc.tableSchema, Cdc.PrimaryKey,
      Some(Cdc.PartitionColumn))
    // Production posture for a CDC table partitioned by a low-cardinality
    // value column (the reference's PARTITIONED BY event): hash write
    // distribution → one file per partition value per commit. Without it,
    // every CoW commit writes tasks×values small files (measured 128 after
    // 4 batches at sf0.1), and each one pays footer-stat + bloom read-back
    // and inflates every later merge's affected set — the measured cost was
    // 2.3 s/batch vs 1.0 s/batch with hash distribution (ReplayProbe).
    t.setWriteDistribution("hash")
    val step = maxId / nBatches + 1
    val times = (0 until nBatches).map { i =>
      val batch = events.filter(
        col("event_id") >= i * step && col("event_id") < (i + 1) * step)
      val t0 = System.nanoTime()
      CdcPipeline.applyCdcBatch(t, Cdc.parse(envelopeLines(batch)), batchId = i, mode)
      (System.nanoTime() - t0) / 1e9
    }
    (t, times)
  }

  /** End state as a deterministic DataFrame (for Verify/oracle compare). */
  def endState(spark: SparkSession, sfDir: String): DataFrame = {
    val root = Files.createTempDirectory("graft_events_replay").toString
    val (t, _) = replay(spark, sfDir, root)
    t.scan().select(
        col("trans_id"), col("customer_id"), col("event"), col("amount"),
        date_format(col("trans_datetime"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("trans_dt"))
      .orderBy("trans_id")
  }
}
