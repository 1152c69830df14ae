package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.JoinOps

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  // Deterministic pseudo-random trades/quotes (the classic as-of pairing).
  private lazy val trades = {
    val rows = for (i <- 0 until 300) yield {
      val k = (i * 7919) % 5
      val t = ((i * 104729) % 1000).toLong
      (i.toLong, k.toLong, t)
    }
    rows.toDF("trade_id", "sym", "t")
  }
  private lazy val quotes = {
    val rows = for (i <- 0 until 200) yield {
      val k = (i * 6271) % 5
      val t = ((i * 99991) % 1000).toLong
      (i.toLong, k.toLong, t, i * 1.5)
    }
    rows.toDF("quote_id", "sym", "qt", "px")
  }
  // One quote per (sym, time): highest quote_id wins — same rule asofJoin's
  // tieBreak applies, so the brute force below can use the deduped table.
  private lazy val quotesDed = quotes
    .groupBy("sym", "qt")
    .agg(max_by(struct($"quote_id", $"px"), $"quote_id").as("m"))
    .select($"sym", $"qt", $"m.quote_id".as("quote_id"), $"m.px".as("px"))

  private def bruteAsof(backward: Boolean): Map[Long, Option[Long]] = {
    val cond = if (backward) $"qt" <= $"t" else $"qt" >= $"t"
    val ord = if (backward) Seq($"qt".desc, $"quote_id".desc) else Seq($"qt".asc, $"quote_id".asc)
    val j = trades.join(quotesDed.withColumnRenamed("sym", "qsym"),
        $"sym" === $"qsym" && cond, "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"trade_id").orderBy(ord: _*)))
      .filter($"rn" === 1)
    j.select($"trade_id", $"quote_id").as[(Long, Option[Long])]
      .collect().map(r => r._1 -> r._2).toMap
  }

  test("asofJoin backward matches the brute-force theta join") {
    val got = JoinOps.asofJoin(trades, quotesDed, "sym", "sym", "t", "qt",
        Seq("quote_id", "px"), rightTieBreak = Some("quote_id"))
      .select($"trade_id", $"quote_id").as[(Long, Option[Long])]
      .collect().map(r => r._1 -> r._2).toMap
    assert(got.size === 300)
    assert(got === bruteAsof(backward = true))
  }

  test("asofJoin forward matches the brute-force theta join") {
    val got = JoinOps.asofJoin(trades, quotesDed, "sym", "sym", "t", "qt",
        Seq("quote_id", "px"), rightTieBreak = Some("quote_id"),
        direction = "forward")
      .select($"trade_id", $"quote_id").as[(Long, Option[Long])]
      .collect().map(r => r._1 -> r._2).toMap
    assert(got === bruteAsof(backward = false))
  }

  test("asofJoin is inclusive at equal timestamps and keeps unmatched lefts") {
    val l = Seq((1L, 1L, 100L), (2L, 1L, 50L), (3L, 2L, 100L)).toDF("id", "k", "t")
    val r = Seq((10L, 1L, 100L, 9.0)).toDF("rid", "k", "rt", "v")
    val got = JoinOps.asofJoin(l, r, "k", "k", "t", "rt", Seq("rid", "v"))
      .select($"id", $"rid").as[(Long, Option[Long])].collect().toMap
    assert(got === Map(1L -> Some(10L), 2L -> None, 3L -> None))
  }

  test("asofJoin plan: single key shuffle, no nested-loop or cartesian join") {
    val df = JoinOps.asofJoin(trades, quotesDed, "sym", "sym", "t", "qt",
      Seq("quote_id", "px"), rightTieBreak = Some("quote_id"))
    df.collect() // materialize under AQE before inspecting the executed plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("rangeJoinBinned matches the theta join, half-open bounds, no dup pairs") {
    val pts = (0L until 500L).map(i => (i, (i * 37) % 400)).toDF("pid", "x")
    val ivs = Seq((1L, 0L, 50L), (2L, 25L, 300L), (3L, 299L, 300L), (4L, 390L, 405L))
      .toDF("iid", "lo", "hi")
    val got = JoinOps.rangeJoinBinned(pts, ivs, "x", "lo", "hi", binWidth = 64L)
      .select($"pid", $"iid").as[(Long, Long)].collect().sorted.toSeq
    val want = pts.join(ivs, $"x" >= $"lo" && $"x" < $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().sorted.toSeq
    assert(got === want)
    assert(got.distinct === got) // each qualifying pair meets in exactly one bin
    // degenerate (empty) and inverted intervals admit nothing — and are
    // dropped BEFORE the bin explode (sequence(hi, lo) descends in Spark;
    // an inverted interval would otherwise fan out junk bin rows)
    val bad = Seq((9L, 50L, 50L), (10L, 300L, 0L)).toDF("iid", "lo", "hi")
    assert(JoinOps.rangeJoinBinned(pts, bad, "x", "lo", "hi", 64L).count() === 0L)
  }

  test("rangeJoinBinned plan is an equi-join on the bin id") {
    val pts = (0L until 100L).map(i => (i, i % 50)).toDF("pid", "x")
    val ivs = Seq((1L, 10L, 20L)).toDF("iid", "lo", "hi")
    val df = JoinOps.rangeJoinBinned(pts, ivs, "x", "lo", "hi", binWidth = 8L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
