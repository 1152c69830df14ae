package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * X7: the analytic-SQL surface over maintained tables — the reference's product
 * is a table you query with plain SQL (Athena `SELECT COUNT(*)`,
 * `README.md:507-513`); Catalyst provides the whole surface once tables are
 * views (S4, Tables.registerViews).
 *
 * Each query is ONE SQL string executed verbatim by both `spark.sql` and the
 * driver's DuckDB oracle — the dialect subset used (ANSI joins, window
 * functions, DECIMAL casts, CAST(... AS STRING)) parses identically in both.
 * Money math is done in DECIMAL (exact, order-independent) and cast to DOUBLE
 * only at the end so the float output is bit-identical across engines.
 *
 * Scale notes (100 TB posture): every query is declarative — Catalyst does
 * pushdown/pruning; the star joins broadcast the dimension side under AQE
 * (region/nation/customer are orders-of-magnitude smaller than lineitem);
 * aggregations are partial+final hash aggs; the window top-k shuffles once on
 * the partition key.
 */
object AnalyticQueries {

  private val RevenueExpr =
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"

  private def sqlQ(name: String, sql: String, headline: Boolean = false): Q =
    Q(name,
      (s: SparkSession, d: String) => { Tables.registerViews(s, d); s.sql(sql) },
      Some(sql), headline)

  val all: Seq[Q] = Seq(

    // TPC-H Q1-shaped pricing summary over lineitem.
    sqlQ("x7_q1_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         |  $RevenueExpr AS sum_disc_price,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
      headline = true),

    // TPC-H Q3-shaped: join customer ⋈ orders ⋈ lineitem, top revenue orders.
    sqlQ("x7_q3_top_orders",
      s"""SELECT o.o_orderkey,
         |  CAST(CAST(o.o_orderdate AS DATE) AS STRING) AS orderdate,
         |  $RevenueExpr AS revenue
         |FROM customer c
         |JOIN orders o ON c.c_custkey = o.o_custkey
         |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |WHERE c.c_mktsegment = 'BUILDING'
         |GROUP BY o.o_orderkey, o.o_orderdate
         |ORDER BY revenue DESC, o.o_orderkey
         |LIMIT 10""".stripMargin,
      headline = true),

    // TPC-H Q5-shaped: 5-way star join, revenue per nation in one region.
    sqlQ("x7_q5_revenue_by_nation",
      s"""SELECT n.n_name, $RevenueExpr AS revenue
         |FROM region r
         |JOIN nation n ON n.n_regionkey = r.r_regionkey
         |JOIN customer c ON c.c_nationkey = n.n_nationkey
         |JOIN orders o ON o.o_custkey = c.c_custkey
         |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |WHERE r.r_name = 'ASIA'
         |GROUP BY n.n_name
         |ORDER BY revenue DESC, n.n_name""".stripMargin,
      headline = true),

    // TPC-H Q6-shaped selective aggregate (predicate pushdown showcase).
    sqlQ("x7_q6_forecast_revenue",
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_quantity < 24""".stripMargin),

    // Window top-k: best 3 orders per customer (rank + filter).
    sqlQ("x7_topk_orders_per_customer",
      """SELECT c_custkey, o_orderkey, rnk FROM (
        |  SELECT o_custkey AS c_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) AS t
        |WHERE rnk <= 3 ORDER BY c_custkey, rnk""".stripMargin,
      headline = true),

    // COUNT(DISTINCT) per group.
    sqlQ("x7_count_distinct_custs",
      """SELECT o_orderstatus, COUNT(*) AS n_orders, COUNT(DISTINCT o_custkey) AS n_custs
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    // The reference's own verification query shape (`README.md:511-512`).
    sqlQ("x7_count_star_lineitem", "SELECT COUNT(*) AS cnt FROM lineitem"))
}
