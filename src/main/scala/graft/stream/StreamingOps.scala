package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Open-session state carried across micro-batches (one per user). */
final case class SessionState(sessionId: Long, startUs: Long, lastUs: Long, n: Long)

/** Per-key dimension history for the streaming as-of join: (ts, value)
  * versions sorted ascending, pruned to the retention window. */
final case class AsofDimState(versions: List[(Long, String)])

/** One tagged input row of the streaming as-of join union. */
final case class AsofIn(key: Long, tsUs: Long, isDim: Boolean,
    eventVal: Double, dimVal: String)

/** An event enriched with the as-of dimension version (None = no version at
  * or before the event's time had been seen when the event was processed). */
final case class AsofOut(key: Long, event_ts_us: Long, event_val: Double,
    dim_ts_us: Option[Long], dim_val: Option[String])

/** A closed session emitted downstream. */
final case class SessionOut(user_id: Long, session_id: Long, n_events: Long, duration_us: Long)

/**
 * Structured-Streaming operators beyond the CDC pipeline's foreachBatch:
 * event-time windowed aggregation with a watermark, and arbitrary-state
 * sessionization via flatMapGroupsWithState — the two canonical stateful
 * shapes (SURVEY §2.9 notes the reference uses neither; these are the [EXT]
 * streaming surface).
 *
 * Scale posture: both operators shuffle once on their grouping key and keep
 * state partitioned in the state store; watermarks bound state size for the
 * windowed agg, and closed sessions leave the state store immediately.
 */
object StreamingOps {

  /**
   * Event-time tumbling-window counts per event_type with a watermark: late
   * events beyond `lateness` are dropped and window state is reclaimed —
   * without a watermark an unbounded stream accretes unbounded window state.
   */
  def windowedCounts(events: DataFrame, window: String = "1 hour",
      lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(functions.window(col("ts"), window).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  // functions.window under an alias to avoid the String param overload clash
  private object functions {
    def window(c: org.apache.spark.sql.Column, d: String): org.apache.spark.sql.Column =
      org.apache.spark.sql.functions.window(c, d)
  }

  /**
   * Streaming exact dedup (X1's streaming twin): first-seen-wins per key with
   * watermark-BOUNDED state — without the watermark, the seen-keys state
   * grows forever on an unbounded stream; with it, Spark evicts keys once
   * they can no longer collide with late arrivals.
   */
  def dedupStream(events: DataFrame, keys: Seq[String],
      lateness: String = "1 hour"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /**
   * Gap-based sessionization over an unbounded stream of (user_id, ts_us):
   * the streaming twin of `graft.ops.EventOps.sessionize`. Per-user open
   * sessions live in the state store; a session closes (and is emitted) when
   * a later event arrives more than `gapUs` after the session's last event,
   * OR when the key has been idle for `idleTimeout` of processing time — the
   * timeout flushes the user's final session and clears their state, so
   * open-session state cannot grow without bound on an unbounded stream.
   * Append-mode semantics: only closed sessions are emitted.
   *
   * `idleTimeout = None` disables the flush (state then lives until its
   * session closes by gap) — for deterministic finite replays and tests,
   * where processing-time timeouts would make output timing-dependent (and
   * where a pending timeout keeps the engine scheduling no-data batches, so
   * `processAllAvailable` never settles). Unbounded production streams should
   * keep the default.
   */
  /**
   * Watermarked stream-stream inner join (attribution shape): each left event
   * pairs with right events of the same key whose time falls in
   * [left.ts, left.ts + joinWindow]. Both sides carry watermarks and the join
   * condition bounds event-time distance, so Spark's state store retains each
   * side only for watermark + window — bounded state on unbounded streams
   * (an unbounded-condition stream-stream join would buffer forever).
   * Columns: left (l_id, key, ts), right (r_id, key, ts).
   */
  def intervalJoinStreams(left: DataFrame, right: DataFrame,
      joinWindow: String = "1 hour", lateness: String = "30 minutes"): DataFrame = {
    val l = left.withWatermark("ts", lateness).alias("l")
    val r = right.withWatermark("ts", lateness).alias("r")
    l.join(r, expr(
      s"""l.key = r.key AND
         |r.ts >= l.ts AND r.ts <= l.ts + INTERVAL $joinWindow""".stripMargin))
      .select(col("l.l_id"), col("r.r_id"), col("l.key"),
        col("l.ts").as("l_ts"), col("r.ts").as("r_ts"))
  }

  /**
   * Streaming as-of enrichment (the streaming twin of
   * graft.ops.JoinOps.asofJoin): each event picks up the NEWEST dimension
   * version with the same key and `dim.ts <= event.ts` (inclusive, DuckDB/kdb
   * ASOF semantics) among the versions seen so far. Dimension history lives
   * in keyed state as a sorted version list, pruned to `retentionUs` behind
   * the newest event processed for that key (the newest version is always
   * kept, so a slow dimension never un-enriches a fast event stream).
   *
   * Semantics under disorder (documented, not hidden): events are matched
   * against versions AS CAPTURED when their micro-batch is processed —
   * append-mode output is immutable, so a dimension update that arrives
   * AFTER an event was emitted does not retro-correct it. Within one
   * micro-batch, rows are processed in event-time order with dims-before-
   * events at ties, so intra-batch disorder IS repaired. That is the standard
   * stream-enrichment contract (Flink's temporal join with an aggressive
   * watermark degenerates to the same behavior).
   *
   * Scale posture: one shuffle on the key; state per key is O(versions within
   * retention), not O(events); both inputs flow through the same
   * flatMapGroupsWithState operator (no buffering of the event stream).
   */
  def asofEnrichStream(
      events: Dataset[(Long, Long, Double)],
      dims: Dataset[(Long, Long, String)],
      retentionUs: Long = 3600L * 1000000L): Dataset[AsofOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val tagged =
      events.map { case (k, ts, v) => AsofIn(k, ts, isDim = false, v, null) }
        .unionByName(dims.map { case (k, ts, dv) => AsofIn(k, ts, isDim = true, 0.0, dv) })
    tagged.groupByKey(_.key).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (key: Long, it: Iterator[AsofIn], state: GroupState[AsofDimState]) =>
        // event-time order, dims before events at the same timestamp (inclusive)
        val rows = it.toArray.sortBy(r => (r.tsUs, !r.isDim))
        var versions = state.getOption.map(_.versions).getOrElse(Nil)
        var maxEventTs = Long.MinValue
        val out = scala.collection.mutable.ArrayBuffer.empty[AsofOut]
        rows.foreach { r =>
          if (r.isDim) {
            // insert in ts order (appends in the common in-order case)
            val (before, after) = versions.partition(_._1 <= r.tsUs)
            versions = before ::: ((r.tsUs, r.dimVal) :: after)
          } else {
            maxEventTs = math.max(maxEventTs, r.tsUs)
            val m = versions.takeWhile(_._1 <= r.tsUs).lastOption
            out += AsofOut(key, r.tsUs, r.eventVal, m.map(_._1), m.map(_._2))
          }
        }
        // prune history behind the newest event, always keeping the latest
        // version at-or-before the horizon (future events may still need it)
        if (maxEventTs != Long.MinValue && versions.nonEmpty) {
          val horizon = maxEventTs - retentionUs
          val (old, recent) = versions.partition(_._1 < horizon)
          versions = old.lastOption.toList ::: recent
        }
        if (versions.nonEmpty) state.update(AsofDimState(versions)) else state.remove()
        out.iterator
    }
  }

  def sessionizeStream(events: Dataset[(Long, Long)], gapUs: Long,
      idleTimeout: Option[String] = Some("30 minutes")): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append,
      idleTimeout.fold[GroupStateTimeout](GroupStateTimeout.NoTimeout)(_ =>
        GroupStateTimeout.ProcessingTimeTimeout)) {
      (user: Long, it: Iterator[(Long, Long)], state: GroupState[SessionState]) =>
        if (state.hasTimedOut) {
          // Idle key: emit the open session as closed and drop the state.
          val st = state.get
          state.remove()
          Iterator.single(SessionOut(user, st.sessionId, st.n, st.lastUs - st.startUs))
        } else {
          val sorted = it.map(_._2).toArray.sorted
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          var st = state.getOption.orNull
          sorted.foreach { us =>
            if (st == null) st = SessionState(0L, us, us, 1L)
            else if (us - st.lastUs > gapUs) {
              out += SessionOut(user, st.sessionId, st.n, st.lastUs - st.startUs)
              st = SessionState(st.sessionId + 1, us, us, 1L)
            } else st = SessionState(st.sessionId, st.startUs, us, st.n + 1)
          }
          if (st != null) {
            state.update(st)
            idleTimeout.foreach(state.setTimeoutDuration)
          }
          out.iterator
        }
    }
  }
}
