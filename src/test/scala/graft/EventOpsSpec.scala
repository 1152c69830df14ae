package graft

import org.apache.spark.sql.functions._

import graft.ops.EventOps

/** Product-analytics event ops: the trailing-window active-user
  * generalization (E210) against a hand-computed fixture. The oracled
  * queries (x7_active_users, x7_stickiness, x7_event_funnel,
  * x7_retention_cohorts) carry the cross-engine evidence; this pins the
  * windowing arithmetic locally. */
class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  test("activeUsersWindows (E210): per-window exact distincts from ONE widest-window join") {
    // epoch days 0,1,2,8: u1 active on 0,1,2,8; u2 on 0; u3 on 8
    def ts(day: Long) = new java.sql.Timestamp(day * 86400L * 1000L)
    val events = Seq(
      (ts(0), "u1"), (ts(0), "u2"), (ts(1), "u1"), (ts(2), "u1"),
      (ts(8), "u1"), (ts(8), "u3"), (ts(8), "u1")
    ).toDF("ts", "user_id")
    val out = EventOps.activeUsersWindows(events,
        Seq("dau" -> 1, "wau" -> 7, "mau" -> 30))
      .orderBy("day")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // day 0: dau {u1,u2}=2, wau=2, mau=2
    // day 1: dau {u1}=1, wau {u1,u2}=2, mau=2
    // day 2: dau 1, wau 2, mau 2
    // day 8: dau {u1,u3}=2; wau window [2..8] → {u1,u3}=2; mau [−21..8] → 3
    assert(out === Seq((0L, 2L, 2L, 2L), (1L, 1L, 2L, 2L),
      (2L, 1L, 2L, 2L), (8L, 2L, 2L, 3L)))
    // agrees with the fixed DAU/WAU twin on the shared windows
    val twin = EventOps.activeUsers(events).orderBy("day")
      .as[(Long, Long, Long)].collect().toSeq
    assert(twin === out.map(r => (r._1, r._2, r._3)))
    // NULL user ids never count, consistently across every window (the
    // COUNT(DISTINCT) rule — pinned so the semantics cannot drift again)
    val withNull = events.unionByName(
      Seq((ts(0), null.asInstanceOf[String])).toDF("ts", "user_id"))
    val d0 = EventOps.activeUsersWindows(withNull, Seq("dau" -> 1, "wau" -> 7))
      .filter(col("day") === 0).as[(Long, Long, Long)].head()
    assert(d0 === ((0L, 2L, 2L)), s"NULL user must not count: $d0")
  }

  test("activeUsersWindows plans NO BroadcastNestedLoopJoin (explode+equi-join, O(pairs × maxW))") {
    // the non-equi `between` join planned a BNLJ of ALL pairs × ALL days —
    // O(pairs × days) comparisons, a scale-killer at years of retention;
    // pin the explode(sequence) + equi-join re-plan the way duplicateSpans
    // pins its one-exchange shape
    def ts(day: Long) = new java.sql.Timestamp(day * 86400L * 1000L)
    val events = Seq((ts(0), "u1"), (ts(1), "u2"), (ts(9), "u1"))
      .toDF("ts", "user_id")
    val out = EventOps.activeUsersWindows(events,
      Seq("dau" -> 1, "wau" -> 7, "mau" -> 28))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Generate explode") || plan.contains("Generate"),
      s"expected the explode expansion in the plan:\n$plan")
  }

  test("scriptSignals (E211): hand-computed counts and fractions; empty doc yields NULL fractions") {
    import graft.ops.TextOps
    val docs = Seq(
      (1L, "ab кот 数"),   // 2 latin, 3 cyrillic, 1 cjk, 2 spaces → 8 chars
      (2L, "")
    ).toDF("doc_id", "text")
    val r = TextOps.scriptSignals(docs).orderBy("doc_id").collect()
    val row1 = r(0)
    assert(row1.getLong(1) === 8L, "n_chars")
    assert(row1.getLong(2) === 2L, "n_latin")
    assert(row1.getLong(3) === 3L, "n_cyrillic")
    assert(row1.getLong(4) === 1L, "n_cjk")
    assert(row1.getLong(5) === 0L, "n_arabic")
    assert(row1.getDouble(8) === 2.0 / 8.0, "frac_latin")
    assert(row1.getDouble(9) === 3.0 / 8.0, "frac_cyrillic")
    val row2 = r(1)
    assert(row2.getLong(1) === 0L)
    (8 to 13).foreach(i => assert(row2.isNullAt(i), s"empty doc frac $i"))
  }
}
