package graft.cdc

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * CDC envelope model + per-batch kernels.
 *
 * The reference consumes DMS-format change records: a two-field JSON envelope
 * `{data: <row>, metadata: <cdc info>}` (reference:
 * `src/utils/gen_fake_cdc_data.py:28-58`, producer format `json-unformatted` per
 * `cdk_stacks/dms_aurora_mysql_to_kinesis.py:91`). The reference lets Glue infer
 * the schema at runtime (`spark_sql_merge_into_iceberg.py:80`); we instead pin an
 * explicit `StructType` so parsing is deterministic and streaming-safe.
 *
 * Scale note: every transform here is a narrow, codegen-friendly projection or a
 * single hash-shuffle bounded by the micro-batch size (never the table size).
 */
object Cdc {

  /** Business row carried in `data` (reference `README.md:215-225`).
   *  `trans_id` stays 64-bit (the reference's Athena DDL narrows to int —
   *  a latent bug we deliberately do not copy; SURVEY §1.2). */
  val dataSchema: StructType = StructType(Seq(
    StructField("trans_id", LongType),
    StructField("customer_id", StringType),
    StructField("event", StringType),
    StructField("sku", StringType),
    StructField("amount", IntegerType),
    StructField("device", StringType),
    StructField("trans_datetime", StringType)))

  /** CDC metadata (reference `gen_fake_cdc_data.py:28`). Field names contain `-`
   *  exactly as DMS emits them; column access below uses backticks. */
  val metadataSchema: StructType = StructType(Seq(
    StructField("timestamp", StringType),
    StructField("record-type", StringType),
    StructField("operation", StringType),
    StructField("partition-key-type", StringType),
    StructField("schema-name", StringType),
    StructField("table-name", StringType),
    StructField("transaction-id", LongType)))

  val envelopeSchema: StructType = StructType(Seq(
    StructField("data", dataSchema),
    StructField("metadata", metadataSchema)))

  /** Target-table schema (reference DDL `README.md:355-369`, partitioned by `event`). */
  val tableSchema: StructType = StructType(Seq(
    StructField("trans_id", LongType),
    StructField("customer_id", StringType),
    StructField("event", StringType),
    StructField("sku", StringType),
    StructField("amount", IntegerType),
    StructField("device", StringType),
    StructField("trans_datetime", TimestampType)))

  val PrimaryKey = "trans_id"
  val PartitionColumn = "event"

  /** Parse raw JSON lines into envelope rows (one struct pair per line).
   *  Malformed lines yield null structs rather than failing the batch. */
  def parse(lines: Dataset[String]): DataFrame =
    lines.select(from_json(col("value"), envelopeSchema).as("e"))
      .select(col("e.data").as("data"), col("e.metadata").as("metadata"))

  /**
   * Flatten the envelope: `data.*` to top level plus `_op`, `_op_timestamp`,
   * `_txn_id` (reference `spark_sql_merge_into_iceberg.py:100-103,110`).
   *
   * Timestamps use `try_to_timestamp`: the reference's own fixture contains an
   * invalid hour-29 timestamp (`gen_fake_cdc_data.py:58`) that must become NULL
   * (and therefore lose dedup ties), not abort the batch — Spark 4 runs ANSI-on,
   * where plain `to_timestamp` would throw.
   */
  def flatten(envelopes: DataFrame): DataFrame =
    envelopes.select(
        col("data.*"),
        col("metadata.operation").as("_op"),
        try_to_timestamp(col("metadata.timestamp")).as("_op_timestamp"),
        col("metadata.`transaction-id`").as("_txn_id"))
      .withColumn("trans_datetime", try_to_timestamp(col("trans_datetime")))

  /**
   * W1: last-writer-wins collapse — keep the latest record per key within a batch
   * (reference `spark_sql_merge_into_iceberg.py:105-108`). One hash shuffle,
   * bounded by batch size. The reference orders by timestamp only, which is
   * nondeterministic on ties; we add `transaction-id` as secondary sort
   * (documented deviation, SURVEY §2.4) so results are stable. NULL (unparseable)
   * timestamps sort last under `desc` and thus lose ties, matching the reference.
   */
  def latestPerKey(flat: DataFrame, pk: String = PrimaryKey): DataFrame = {
    val w = Window.partitionBy(col(pk)).orderBy(desc("_op_timestamp"), desc("_txn_id"))
    flat.withColumn("_row", row_number().over(w))
      .filter(col("_row") === 1)
      .drop("_row")
  }

  /**
   * Skew-aware W1 alternative: same latest-per-key semantics expressed as an
   * aggregation (`max_by` over the (ts, txn) ordering struct) instead of a
   * ranking window. Hash aggregation gets map-side PARTIAL combine, so a hot
   * key ships ≤1 row per map task across the shuffle — a window function
   * ships every row of the hot key to one reducer. Use this form when key
   * skew is expected (the 100 TB posture); results are identical where the
   * ordering is total (ts + unique txn id), incl. NULL ts losing (struct
   * max treats NULL fields as smallest).
   */
  def latestPerKeyAgg(flat: DataFrame, pk: String = PrimaryKey): DataFrame = {
    val payload = struct(flat.columns.map(col).toIndexedSeq: _*)
    val ordering = struct(col("_op_timestamp"), col("_txn_id"))
    flat.groupBy(col(pk))
      .agg(max_by(payload, ordering).as("_latest"))
      .select(col("_latest.*"))
  }

  /** F2: route inserts+updates (reference `job:112`). */
  def upserts(deduped: DataFrame): DataFrame = deduped.filter(col("_op") =!= "delete")

  /** F3: route deletes (reference `job:127`). */
  def deletes(deduped: DataFrame): DataFrame = deduped.filter(col("_op") === "delete")

  /** P4: project to the target table's column set/order, dropping CDC bookkeeping
   *  columns (reference `job:108`'s select-by-schema-names). */
  def projectToTable(df: DataFrame): DataFrame =
    df.select(tableSchema.fieldNames.map(col).toIndexedSeq: _*)

  /** Target schema for the GUARDED pipeline variant: the business row plus the
    * persisted op timestamp the guard compares against (SURVEY §7.5.3 — the
    * reference stores no op ts, which is why its last-batch-wins anomaly is
    * unfixable there). */
  val guardedTableSchema: StructType = tableSchema.add("_op_ts", TimestampType)

  /** Projection for guarded tables: business columns + `_op_ts`. */
  def projectToTableGuarded(df: DataFrame): DataFrame =
    df.select((tableSchema.fieldNames.map(col) :+
      col("_op_timestamp").as("_op_ts")).toIndexedSeq: _*)
}
