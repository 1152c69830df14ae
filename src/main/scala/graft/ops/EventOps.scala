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

  /**
   * Ordered EVENT-FUNNEL analysis (E195) — the product-analytics staple:
   * how far through an ordered stage sequence (view → click → purchase)
   * each user progressed, where stage k+1 only counts STRICTLY AFTER the
   * event that completed stage k (same-timestamp ties break on the id
   * column — deterministic, so an external oracle replays the fold).
   *
   * ONE aggregation: events filtered to the stage types, collected per
   * user as a sorted (ts, id, type) array and folded with the `aggregate`
   * higher-order function (codegen'd — no UDF): the accumulator is the
   * current stage, an element advances it iff it matches the NEXT stage.
   * Per-user array size is bounded by that user's stage-typed events —
   * the usual funnel-analysis contract (a user with millions of events
   * is a bot; cap upstream). Returns (userCol, stage) with stage in
   * [0, #stages].
   */
  def funnelStages(events: DataFrame, stages: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", tieCol: String = "event_id"): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    val evs = events.filter(col(typeCol).isin(stages: _*))
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(
        struct(col(tsCol).as("t"), col(tieCol).as("i"),
          col(typeCol).as("et")))).as("_evs"))
    val fold = aggregate(col("_evs"), lit(0), (acc, e) =>
      stages.zipWithIndex.foldLeft(when(lit(false), acc)) {
        case (w, (st, i)) => w.when(acc === i && e.getField("et") === st, lit(i + 1))
      }.otherwise(acc))
    evs.select(col(userCol), fold.as("stage"))
  }

  /**
   * RETENTION COHORTS (E196) — the funnel's companion read-out: users
   * bucketed by their FIRST-activity week (the cohort), counted per
   * (cohort, weeks-since-first) cell. Weeks are 7-day buckets of the
   * integer epoch-day (`us div 86400e6 div 7`) — calendar-free and
   * integer-exact, so any engine replays the same cells. Two hash
   * aggregations + one user-keyed join, all on the same key — one
   * exchange shape at any scale.
   */
  def retentionCohorts(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val wk = expr(
      s"unix_micros(CAST($tsCol AS TIMESTAMP)) div 86400000000 div 7")
    val byUser = events.select(col(userCol), wk.as("wk"))
    val cohorts = byUser.groupBy(col(userCol)).agg(min(col("wk")).as("cohort"))
    byUser.join(cohorts, Seq(userCol))
      .groupBy(col("cohort"), (col("wk") - col("cohort")).as("offset_weeks"))
      .agg(countDistinct(col(userCol)).as("users"))
  }

  /**
   * ACTIVE USERS (E198): exact DAU and trailing-7-day WAU per day. The
   * (day, user) pairs dedup once (one exchange); WAU expands each pair to
   * the ≤ 7 days whose trailing window contains it against the BROADCAST
   * day list — O(pairs × 7) work, exact distinct counts, no approximate
   * sketch needed at any corpus size (the day dimension is tiny by
   * construction). Days are integer epoch-day buckets — calendar-free
   * and engine-agnostic.
   */
  def activeUsers(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame =
    // the fixed DAU/WAU read-out is the windows generalization at (1, 7) —
    // one implementation, one set of epoch-day semantics to maintain
    activeUsersWindows(events, Seq("dau" -> 1, "wau" -> 7), userCol, tsCol)

  /**
   * ACTIVE USERS over ARBITRARY trailing windows (E210 — the [[activeUsers]]
   * shape generalized to the full DAU/WAU/MAU read-out behind stickiness
   * dashboards): one exact distinct count per named window. Each deduped
   * (day, user) pair EXPLODES to the ≤ maxWindow trailing-window anchor
   * days that can contain it (`explode(sequence(day, day + maxW - 1))`),
   * an equi semi-join against the broadcast day list drops anchors absent
   * from the data, and one hash aggregation serves every narrower window
   * as a conditional distinct — O(pairs × maxWindow) rows end to end. The
   * earlier non-equi `between` join planned a BroadcastNestedLoopJoin of
   * ALL pairs against ALL distinct days — O(pairs × days) comparisons, a
   * scale-killer at production retention (years of days × 10¹⁰ pairs);
   * the explode bound is maxW = 7/28 ≪ days and independent of history
   * length. Exact at any corpus size; integer epoch-day buckets,
   * calendar-free and engine-agnostic. NULL user ids never count —
   * consistently, in EVERY window ([[activeUsers]]' old hand-rolled DAU
   * leg counted a NULL as one user while its WAU leg did not; the
   * delegation fixed the inconsistency in favor of the SQL-standard
   * COUNT(DISTINCT) rule).
   */
  def activeUsersWindows(events: DataFrame, windows: Seq[(String, Int)],
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    require(windows.nonEmpty && windows.forall(_._2 >= 1),
      s"window lengths must be >= 1 days: $windows")
    val day = expr(s"unix_micros(CAST($tsCol AS TIMESTAMP)) div 86400000000")
    val pairs = events.select(day.as("day"), col(userCol)).distinct()
    val days = pairs.select(col("day")).distinct()
    val maxW = windows.map(_._2).max
    val covered = pairs
      .select(col(userCol), col("day").as("p_day"),
        explode(sequence(col("day"), col("day") + (maxW - 1))).as("day"))
      .join(broadcast(days), Seq("day"), "left_semi")
    val aggs = windows.map { case (name, w) =>
      countDistinct(when(col("p_day") >= col("day") - (w - 1),
        col(userCol))).as(name)
    }
    covered.groupBy(col("day")).agg(aggs.head, aggs.tail: _*)
  }

  /** Funnel summary: per stage k ≥ 1, how many users REACHED it (stage ≥ k)
    * — the standard conversion read-out. */
  def funnelCounts(events: DataFrame, stages: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", tieCol: String = "event_id"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val st = funnelStages(events, stages, userCol, typeCol, tsCol, tieCol)
    val ks = (1 to stages.size).toDF("stage_k")
    st.crossJoin(broadcast(ks))
      .filter(col("stage") >= col("stage_k"))
      .groupBy(col("stage_k"))
      .agg(count(lit(1)).as("users"))
      .select(col("stage_k").as("stage"), col("users"))
  }
}
