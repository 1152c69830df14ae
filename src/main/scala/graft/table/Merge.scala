package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The MERGE algebra of the reference, expressed as DataFrame set operations.
 *
 * The reference issues Iceberg `MERGE INTO` SQL per micro-batch (reference
 * `src/main/python/spark_sql_merge_into_iceberg.py:118-122` upsert, `:133-136`
 * delete). With no Iceberg runtime in this environment, the identical row-level
 * semantics are: survivors = target LEFT ANTI source-keys, result = survivors
 * UNION ALL source rows (upsert) / survivors alone (delete).
 *
 * Scale posture: the source side of a CDC merge is a deduped micro-batch —
 * orders of magnitude smaller than the target — so its key set is explicitly
 * broadcast. The anti-join then runs as a BroadcastHashJoin over only the
 * target rows actually scanned (TransactionalTable prunes unscanned files by
 * PK range first), never a full-table sort-merge shuffle.
 */
object Merge {

  /** J1: MATCHED → UPDATE SET *, NOT MATCHED → INSERT * (by-name star semantics). */
  def upsert(target: DataFrame, source: DataFrame, pk: String): DataFrame = {
    val keys = broadcast(source.select(col(pk)).distinct())
    target.join(keys, Seq(pk), "left_anti").unionByName(source.select(target.columns.map(col).toIndexedSeq: _*))
  }

  /** J2: MATCHED → DELETE. `deletes` needs only the key column. */
  def delete(target: DataFrame, deletes: DataFrame, pk: String): DataFrame = {
    val keys = broadcast(deletes.select(col(pk)).distinct())
    target.join(keys, Seq(pk), "left_anti")
  }

  /** [[apply]] over a COMPOSITE key: the anti-join runs on all key columns
    * (`USING`-style, so the join is a plain multi-column hash join). */
  def composite(target: DataFrame, upserts: DataFrame, deleteKeys: DataFrame,
      pks: Seq[String], broadcastKeys: Boolean = true): DataFrame = {
    val keys = upserts.select(pks.map(col): _*)
      .unionByName(deleteKeys.select(pks.map(col): _*)).distinct()
    val touched = if (broadcastKeys) broadcast(keys) else keys
    target.join(touched, pks, "left_anti")
      .unionByName(upserts.select(target.columns.map(col).toIndexedSeq: _*))
  }

  /**
   * Timestamp-GUARDED upsert+delete (the reference's T3 late-data anomaly
   * fixed, SURVEY §7.5.3: `WHEN MATCHED AND s.ts >= t.ts`): a source row only
   * replaces/removes the target row when its `tsCol` is not older — a late
   * event arriving in a later batch can no longer clobber newer data. Both
   * sides are ≤1 row/key post-W1, so one full-outer join on the PK decides
   * every key; NULL source ts (unparseable) never wins. `deleteKeys` carries
   * (pk, tsCol).
   */
  def applyGuarded(target: DataFrame, upserts: DataFrame, deleteKeys: DataFrame,
      pk: String, tsCol: String, broadcastKeys: Boolean = true): DataFrame = {
    val tCols = target.columns
    val s = upserts.select(col(pk).as("_spk"), struct(tCols.map(col).toIndexedSeq: _*).as("_srow"),
      col(tsCol).as("_sts"))
    val d = deleteKeys.select(col(pk).as("_dpk"), col(tsCol).as("_dts"))
    // No broadcast hint on the full-outer join: Spark cannot broadcast either
    // side of a full outer (the hint only produced a planner warning). Both
    // sides are batch-bounded anyway — the target here is the PK-range-pruned
    // slice, not the table — so the sort-merge join is over O(batch) rows.
    val sSide = s
    val dSide = if (broadcastKeys) broadcast(d) else d
    val t = target.select(struct(tCols.map(col).toIndexedSeq: _*).as("_trow"),
      col(pk).as("_tpk"), col(tsCol).as("_tts"))
    val sourceWins = col("_tpk").isNull ||
      (col("_sts").isNotNull && (col("_tts").isNull || col("_sts") >= col("_tts")))
    val deleteWins = col("_dpk").isNotNull && col("_tpk").isNotNull &&
      col("_dts").isNotNull && (col("_tts").isNull || col("_dts") >= col("_tts"))
    t.join(sSide, col("_tpk") === col("_spk"), "full_outer")
      .join(dSide, coalesce(col("_tpk"), col("_spk")) === col("_dpk"), "left_outer")
      .withColumn("_win",
        when(deleteWins, lit(null)) // guarded delete removes the key
          .when(col("_spk").isNotNull && sourceWins, col("_srow"))
          .otherwise(col("_trow")))
      .filter(col("_win").isNotNull)
      .select(col("_win.*"))
  }

  /**
   * Combined upsert+delete in a single pass over the target. After W1 dedup the
   * key sets are disjoint (≤1 row/key), so this equals the reference's
   * sequential upsert-then-delete MERGEs (O4 ordering) with one fewer scan.
   *
   * `broadcastKeys = false` drops the broadcast hint for oversized batches
   * (e.g. a bulk backfill routed through merge): a multi-GB key set would OOM
   * the broadcast, and Catalyst/AQE pick a shuffle join correctly there.
   */
  def apply(target: DataFrame, upserts: DataFrame, deleteKeys: DataFrame, pk: String,
      broadcastKeys: Boolean = true): DataFrame = {
    val keys = upserts.select(col(pk)).unionByName(deleteKeys.select(col(pk))).distinct()
    val touched = if (broadcastKeys) broadcast(keys) else keys
    target.join(touched, Seq(pk), "left_anti")
      .unionByName(upserts.select(target.columns.map(col).toIndexedSeq: _*))
  }
}
