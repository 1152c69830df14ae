package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.JoinOps

/**
 * Temporal-join queries (as-of + point-in-interval) over the fixture tables,
 * oracled against DuckDB's native ASOF JOIN / inequality join. The Spark side
 * never runs a theta join: as-of is one union + window shuffle on the key,
 * range is an equi-join on a derived bin id (see graft.ops.JoinOps for the
 * 100 TB rationale).
 *
 * Determinism: both sides dedup the "right" table to one row per (key, time)
 * first — DuckDB's ASOF picks an arbitrary row among exact (key, time) ties,
 * so parity requires tie-free inputs; money columns go through DECIMAL(18,2).
 */
object JoinQueries {

  private val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
  private val DuckTsFmt = "%Y-%m-%d %H:%M:%S.%f"

  val all: Seq[Q] = Seq(

    // J3 backward as-of: enrich each event with the customer's most recent
    // order at event time (the canonical stream-vs-slowly-changing-dimension
    // enrichment). Right side deduped to one order per (custkey, orderdate).
    Q("j3_asof_join",
      (s, d) => {
        val e = Tables.events(s, d)
        val ded = Tables.load(s, d, "orders")
          .groupBy(col("o_custkey"), col("o_orderdate"))
          .agg(max_by(struct(col("o_orderkey"), col("o_totalprice")),
            col("o_orderkey")).as("m"))
          .select(col("o_custkey"), col("o_orderdate"),
            col("m.o_orderkey").as("o_orderkey"), col("m.o_totalprice").as("o_totalprice"))
        JoinOps.asofJoin(e, ded,
            leftKey = "user_id", rightKey = "o_custkey",
            leftTime = "ts", rightTime = "o_orderdate",
            rightCols = Seq("o_orderkey", "o_orderdate", "o_totalprice"),
            rightTieBreak = Some("o_orderkey"))
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), TsFmt).as("ts_s"),
            col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_day"),
            col("o_totalprice").cast("decimal(18,2)").cast("double").as("price"))
          .orderBy("event_id")
      },
      Some(s"""WITH ded AS (
             |  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
             |    SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
             |                                 ORDER BY o_orderkey DESC) AS rn
             |    FROM orders) t WHERE rn = 1)
             |SELECT e.event_id, e.user_id,
             |  strftime(CAST(e.ts AS TIMESTAMP), '$DuckTsFmt') AS ts_s,
             |  d.o_orderkey, strftime(d.o_orderdate, '%Y-%m-%d') AS o_day,
             |  CAST(CAST(d.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
             |FROM events e ASOF LEFT JOIN ded d
             |  ON e.user_id = d.o_custkey AND e.ts >= d.o_orderdate
             |ORDER BY e.event_id""".stripMargin),
      headline = true),

    // J3 forward as-of: first event at-or-after each order's date by the same
    // customer (order → next-touch attribution). Events deduped per (user, ts).
    Q("j3_asof_forward",
      (s, d) => {
        val dev = Tables.events(s, d)
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("event_id"))
        JoinOps.asofJoin(Tables.load(s, d, "orders"), dev,
            leftKey = "o_custkey", rightKey = "user_id",
            leftTime = "o_orderdate", rightTime = "ts",
            rightCols = Seq("event_id", "ts"),
            rightTieBreak = Some("event_id"),
            direction = "forward")
          .select(col("o_orderkey"), col("o_custkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_day"),
            col("event_id"),
            date_format(col("ts"), TsFmt).as("ts_s"))
          .orderBy("o_orderkey")
      },
      Some(s"""WITH dev AS (
             |  SELECT user_id, ts, event_id FROM (
             |    SELECT *, row_number() OVER (PARTITION BY user_id, ts
             |                                 ORDER BY event_id DESC) AS rn
             |    FROM events) t WHERE rn = 1)
             |SELECT o.o_orderkey, o.o_custkey,
             |  strftime(o.o_orderdate, '%Y-%m-%d') AS o_day,
             |  dev.event_id,
             |  strftime(CAST(dev.ts AS TIMESTAMP), '$DuckTsFmt') AS ts_s
             |FROM orders o ASOF LEFT JOIN dev
             |  ON o.o_custkey = dev.user_id AND o.o_orderdate <= dev.ts
             |ORDER BY o.o_orderkey""".stripMargin)),

    // J4 point-in-interval join: events falling in each day's 00:00–06:00
    // maintenance window, aggregated per window. The inequality becomes an
    // equi-join on a 1-hour bin id (6 replicated rows per interval).
    Q("j4_range_join",
      (s, d) => {
        val e = Tables.events(s, d).withColumn("us", unix_micros(col("ts")))
        val windows = e.select(date_trunc("day", col("ts")).as("day")).distinct()
          .withColumn("start_us", unix_micros(col("day")))
          .withColumn("end_us", col("start_us") + lit(6L * 3600L * 1000000L))
        JoinOps.rangeJoinBinned(e, windows, "us", "start_us", "end_us",
            binWidth = 3600L * 1000000L)
          .groupBy(col("day"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("n_events"), col("sum_value"))
          .orderBy("day")
      },
      Some("""WITH days AS (
             |  SELECT DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day FROM events)
             |SELECT strftime(d.day, '%Y-%m-%d') AS day,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events e JOIN days d
             |  ON CAST(e.ts AS TIMESTAMP) >= d.day
             | AND CAST(e.ts AS TIMESTAMP) < d.day + INTERVAL 6 HOUR
             |GROUP BY d.day ORDER BY day""".stripMargin),
      headline = true))
}
