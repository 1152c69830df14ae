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
