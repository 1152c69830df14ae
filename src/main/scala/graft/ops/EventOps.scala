package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-stream batch operators (the `events` fixture shape: user_id, ts,
 * event_id, ...).
 *
 * Sessionization: gap-based sessions per user — the canonical events→
 * training-features transform. One hash shuffle on user_id; both window
 * passes reuse the same partitioning (Catalyst plans a single Exchange).
 * The streaming twin (arbitrary-gap sessions over an unbounded source) is
 * `graft.stream.StreamingOps.sessionizeStream` via flatMapGroupsWithState.
 */
object EventOps {

  /**
   * Assign gap-based sessions: a new session starts when the time since the
   * user's previous event exceeds `gapSeconds`. Returns per-session rollups
   * with exact-integer timings (µs), deterministic under (ts, event_id)
   * ordering.
   */
  def sessionize(events: DataFrame, gapSeconds: Long,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col("event_id"))
    // cast tolerates TIMESTAMP_NTZ inputs (identity under the UTC session tz)
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val brk = when(us - lag(us, 1).over(byUser) > gapSeconds * 1000000L, 1L).otherwise(0L)
    events
      .withColumn("_brk", brk)
      .withColumn("session_id", sum(col("_brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(us) - min(us)).as("duration_us"))
      .orderBy(userCol, "session_id")
  }
}
