package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, BooleanType, StructField, StructType}

/**
 * Slowly-changing-dimension TYPE 2 maintenance over a [[TransactionalTable]]:
 * instead of merging a CDC batch destructively (the reference's MERGE sink,
 * `spark_sql_merge_into_iceberg.py:118-136`), every key keeps its FULL
 * version history as interval rows — `_valid_from_seq` / `_valid_to_seq`
 * commit-sequence bounds plus an `_is_current` flag — the lakehouse shape
 * warehouses build for auditable dimensions.
 *
 * Mechanics per batch (one MERGE, replay-fenced like any other commit):
 *  - business keys touched by the batch (upsert OR delete) CLOSE their open
 *    interval: the current row is upserted back with `_valid_to_seq = seq`
 *    and `_is_current = false` (same composite PK (key, _valid_from_seq) —
 *    a copy-on-write update, no new identity);
 *  - upserted keys additionally OPEN a fresh interval (`_valid_from_seq =
 *    seq`, open-ended, current);
 *  - deletes open nothing — the closed interval is the tombstone.
 *
 * The history table's PK is (businessKey, _valid_from_seq) — the engine's
 * composite-PK machinery gives file pruning on the leading key column, and
 * the "current slice" (`_is_current`) of touched keys is the only part read
 * per batch (key-set pruned like any merge). Cost per batch is O(touched
 * keys), never O(history).
 */
object Scd2 {

  val ValidFrom = "_valid_from_seq"
  val ValidTo = "_valid_to_seq"
  val IsCurrent = "_is_current"

  /** History-table schema for a source row schema. */
  def historySchema(source: StructType): StructType =
    StructType(source.fields.toSeq ++ Seq(
      StructField(ValidFrom, LongType, nullable = false),
      StructField(ValidTo, LongType, nullable = true),
      StructField(IsCurrent, BooleanType, nullable = false)))

  /** Create a fresh SCD2 history table for `source` rows keyed by `key`. */
  def create(spark: SparkSession, root: String, source: StructType,
      key: String): TransactionalTable =
    TransactionalTable.create(spark, root, historySchema(source),
      pk = s"$key,$ValidFrom")

  /**
   * Apply one CDC micro-batch. `upserts` are full source rows (≤1 per key —
   * post-W1 dedup), `deleteKeys` needs the key column only. `seq` is the
   * batch's position in the history's sequence domain (monotone per table —
   * commonly the upstream batch id + 1); `batchId` rides the table's replay
   * fence so re-delivered batches are exactly-once no-ops.
   */
  def applyBatch(hist: TransactionalTable, upserts: DataFrame,
      deleteKeys: DataFrame, key: String, seq: Long, batchId: Long): Unit = {
    val srcCols = upserts.columns.toSeq
    val touched = upserts.select(col(key)).unionByName(deleteKeys.select(col(key)))
      .distinct()
    // Current open intervals of the touched keys — the engine prunes files
    // by the leading PK column, so this reads the touched slice only.
    val open = hist.scan().filter(col(IsCurrent))
      .join(broadcast(touched), Seq(key), "left_semi")
    val closed = open
      .withColumn(ValidTo, lit(seq))
      .withColumn(IsCurrent, lit(false))
    val opened = upserts
      .select(srcCols.map(col): _*)
      .withColumn(ValidFrom, lit(seq))
      .withColumn(ValidTo, lit(null).cast("long"))
      .withColumn(IsCurrent, lit(true))
    val histCols = hist.schema.fieldNames.toIndexedSeq
    hist.merge(
      closed.select(histCols.map(col): _*)
        .unionByName(opened.select(histCols.map(col): _*)),
      deleteKeys.limit(0).select(col(key), lit(0L).as(ValidFrom)), // SCD2 never deletes rows
      batchId)
  }

  /** The current dimension state (what a destructive MERGE table would hold). */
  def current(hist: TransactionalTable): DataFrame =
    hist.scan().filter(col(IsCurrent))

  /** Point-in-time state AS OF sequence `seq` (closed-open intervals). */
  def asOf(hist: TransactionalTable, seq: Long): DataFrame =
    hist.scan().filter(col(ValidFrom) <= seq &&
      (col(ValidTo).isNull || col(ValidTo) > seq))
}
