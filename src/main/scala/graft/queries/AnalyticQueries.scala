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
 * functions, CAST(... AS STRING)) parses identically in both.
 * Money math must be exact and order-independent for the bit-identical
 * float compare. The SCAN-DOMINATED aggregates (Q1, the shared revenue
 * expression) do it in INTEGER CENTS — `ROUND(x*100)` per row, summed as
 * BIGINT, divided back once at the end; identical IEEE per-row math in
 * both engines, but the hot sum is codegen'd LONG instead of Spark's
 * wide-decimal path. The remaining queries keep DECIMAL(18,2) sums (their
 * cost sits in joins, not the money aggregate).
 *
 * Scale notes (100 TB posture): every query is declarative — Catalyst does
 * pushdown/pruning; the star joins broadcast the dimension side under AQE
 * (region/nation/customer are orders-of-magnitude smaller than lineitem);
 * aggregations are partial+final hash aggs; the window top-k shuffles once on
 * the partition key.
 */
object AnalyticQueries {

  /** Revenue in integer ten-thousandths: cents(price) × percent-complement
    * (100 − hundredths(discount)) — the exact 4-dp product DECIMAL(18,2)
    * multiplication gives, summed as a plain BIGINT. Both engines do the
    * identical per-row IEEE round and the identical final cast/divide, so
    * the double output is bit-identical — at a codegen'd long-sum cost. */
  private val RevenueExpr =
    "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * " +
      "(100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0"

  private def sqlQ(name: String, sql: String, headline: Boolean = false): Q =
    Q(name,
      (s: SparkSession, d: String) => { Tables.registerViews(s, d); s.sql(sql) },
      Some(sql), headline)

  val all: Seq[Q] = Seq(

    // TPC-H Q1-shaped pricing summary over lineitem.
    sqlQ("x7_q1_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
         |  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
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

    // TPC-H Q7-shaped volume shipping: a 6-way star join (lineitem at the
    // center, nation joined twice under different roles) bucketed by ship
    // year. All five non-fact sides are broadcastable dimensions.
    sqlQ("x7_q7_volume_shipping",
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
         |  $RevenueExpr AS revenue
         |FROM lineitem l
         |JOIN supplier s ON s.s_suppkey = l.l_suppkey
         |JOIN orders o ON o.o_orderkey = l.l_orderkey
         |JOIN customer c ON c.c_custkey = o.o_custkey
         |JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
         |JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
         |WHERE n1.n_name <> n2.n_name
         |GROUP BY n1.n_name, n2.n_name, EXTRACT(YEAR FROM l.l_shipdate)
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin),

    // TPC-H Q8-shaped market share: one nation's share of a region's annual
    // part revenue — conditional DECIMAL sums divided only after the exact
    // aggregation, so the double ratio is bit-identical across engines.
    sqlQ("x7_q8_market_share",
      """WITH base AS (
        |  SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
        |    CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS vol,
        |    n2.n_name AS supp_nation
        |  FROM lineitem l
        |  JOIN part p ON p.p_partkey = l.l_partkey
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
        |  JOIN region r ON r.r_regionkey = n1.n_regionkey
        |  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
        |  WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO')
        |SELECT o_year,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |    / CAST(SUM(vol) AS DOUBLE) AS mkt_share,
        |  COUNT(*) AS n_lines
        |FROM base GROUP BY o_year ORDER BY o_year""".stripMargin),

    // TPC-H Q10-shaped returned-item report: customers ranked by revenue
    // lost to returns.
    sqlQ("x7_q10_returned_items",
      s"""SELECT c.c_custkey, c.c_name, n.n_name, $RevenueExpr AS revenue
         |FROM customer c
         |JOIN orders o ON o.o_custkey = c.c_custkey
         |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |JOIN nation n ON n.n_nationkey = c.c_nationkey
         |WHERE l.l_returnflag = 'R'
         |GROUP BY c.c_custkey, c.c_name, n.n_name
         |ORDER BY revenue DESC, c.c_custkey
         |LIMIT 20""".stripMargin),

    // TPC-H Q12-shaped priority buckets: conditional counts after a
    // fact-to-fact join under a pushed date range (lineitem has no shipmode
    // column in this fixture; returnflag plays the grouping role).
    sqlQ("x7_q12_priority_buckets",
      """SELECT l.l_returnflag,
        |  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin),

    // TPC-H Q14-shaped promo revenue share: conditional DECIMAL sums divided
    // only after exact aggregation (bit-identical double ratio).
    sqlQ("x7_q14_promo_share",
      """SELECT
        |  CAST(SUM(CASE WHEN p.p_type = 'PROMO'
        |           THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
        |           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |    / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS promo_share,
        |  COUNT(*) AS n_lines
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l.l_shipdate < TIMESTAMP '1996-07-01 00:00:00'""".stripMargin),

    // TPC-H Q19-shaped disjunctive predicates: an OR-of-ANDs across both join
    // sides — exercises Catalyst's CNF conversion / partial pushdown of
    // disjunctions into each scan.
    sqlQ("x7_q19_disjunctive",
      s"""SELECT $RevenueExpr AS revenue, COUNT(*) AS n
         |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
         |WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
         |       AND l.l_quantity BETWEEN 1 AND 11)
         |   OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 25
         |       AND l.l_quantity BETWEEN 10 AND 20)
         |   OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 50
         |       AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin),

    // TPC-H Q15-shaped top supplier: per-supplier revenue vs the max revenue
    // (scalar subquery over a derived aggregate, exact DECIMAL math so the
    // max comparison is bit-stable).
    sqlQ("x7_q15_top_supplier",
      s"""WITH rev AS (
         |  SELECT s.s_suppkey, s.s_name, $RevenueExpr AS total_revenue
         |  FROM supplier s JOIN lineitem l ON l.l_suppkey = s.s_suppkey
         |  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
         |  GROUP BY s.s_suppkey, s.s_name)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM rev WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
         |ORDER BY s_suppkey""".stripMargin),

    // TPC-H Q17-shaped small-quantity revenue: lineitems below 20% of their
    // part's average quantity (correlated aggregate via a pre-joined
    // per-part average — the decorrelated plan shape Catalyst produces).
    sqlQ("x7_q17_small_quantity",
      """WITH avgq AS (
        |  SELECT l_partkey, CAST(AVG(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS aq
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |  COUNT(*) AS n_lines
        |FROM lineitem l JOIN avgq a ON a.l_partkey = l.l_partkey
        |WHERE l.l_quantity < 0.2 * a.aq""".stripMargin),

    // TPC-H Q18-shaped large orders: customers whose orders exceed a total
    // quantity threshold (HAVING over a join-key aggregate, then re-join).
    sqlQ("x7_q18_large_orders",
      """WITH big AS (
        |  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
        |SELECT c.c_custkey, c.c_name, o.o_orderkey, b.sum_qty
        |FROM big b
        |JOIN orders o ON o.o_orderkey = b.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |ORDER BY b.sum_qty DESC, o.o_orderkey
        |LIMIT 20""".stripMargin),

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
    sqlQ("x7_count_star_lineitem", "SELECT COUNT(*) AS cnt FROM lineitem"),

    // ROLLUP grouping sets (explicit NULLS FIRST — Spark and DuckDB default
    // null ordering differs).
    sqlQ("x7_rollup",
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),

    // CUBE grouping sets.
    sqlQ("x7_cube",
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),

    // Explicit GROUPING SETS with grouping() disambiguation (a stored NULL
    // key vs a rolled-up one — the part CUBE/ROLLUP shorthand hides).
    sqlQ("x7_grouping_sets",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),

    // PIVOT (Catalyst-native long→wide): per-priority order counts spread
    // across status columns. Dialects differ (DuckDB's PIVOT is its own
    // syntax), so the oracle states the same relation as FILTERed counts;
    // COALESCE pins absent (priority, status) cells to 0 on both engines
    // (Spark's pivot yields NULL for empty groups, DuckDB's count 0).
    Q("x7_pivot",
      (s, d) => { Tables.registerViews(s, d); s.sql(
        """SELECT priority, COALESCE(f, 0) AS f, COALESCE(o, 0) AS o,
          |  COALESCE(p, 0) AS p
          |FROM (SELECT o_orderpriority AS priority, o_orderstatus AS status
          |      FROM orders)
          |PIVOT (COUNT(*) FOR status IN ('F' AS f, 'O' AS o, 'P' AS p))
          |ORDER BY priority""".stripMargin) },
      Some("""SELECT o_orderpriority AS priority,
             |  count(*) FILTER (WHERE o_orderstatus = 'F') AS f,
             |  count(*) FILTER (WHERE o_orderstatus = 'O') AS o,
             |  count(*) FILTER (WHERE o_orderstatus = 'P') AS p
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY priority""".stripMargin)),

    // UNPIVOT (wide→long): two customer measures stacked into (metric, val)
    // rows — the inverse reshape, map-only at any scale. Oracle: the same
    // relation as a UNION ALL (DuckDB's UNPIVOT syntax differs).
    Q("x7_unpivot",
      (s, d) => { Tables.registerViews(s, d); s.sql(
        """SELECT c_custkey, metric, val
          |FROM (SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal,
          |        CAST(c_custkey % 7 AS DOUBLE) AS code
          |      FROM customer)
          |UNPIVOT (val FOR metric IN (acctbal, code))
          |ORDER BY c_custkey, metric""".stripMargin) },
      Some("""SELECT c_custkey, 'acctbal' AS metric,
             |  CAST(c_acctbal AS DOUBLE) AS val FROM customer
             |UNION ALL
             |SELECT c_custkey, 'code' AS metric,
             |  CAST(c_custkey % 7 AS DOUBLE) AS val FROM customer
             |ORDER BY c_custkey, metric""".stripMargin)),

    // HAVING over a grouped aggregate.
    sqlQ("x7_having",
      """SELECT o_custkey, COUNT(*) AS n_orders FROM orders
        |GROUP BY o_custkey HAVING COUNT(*) >= 3 ORDER BY o_custkey""".stripMargin),

    // IN-subquery (planned as a semi join).
    sqlQ("x7_in_subquery",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin),

    // Correlated NOT EXISTS (anti join).
    sqlQ("x7_not_exists",
      """SELECT c_custkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin),

    // UNION ALL across tables.
    sqlQ("x7_union_all",
      """SELECT 'order' AS src, o_orderkey AS id FROM orders WHERE o_orderkey % 100 = 0
        |UNION ALL
        |SELECT 'line' AS src, l_orderkey AS id FROM lineitem
        |WHERE l_orderkey % 100 = 0 AND l_linenumber = 1
        |ORDER BY src, id""".stripMargin),

    // Conditional aggregation.
    sqlQ("x7_case_agg",
      """SELECT l_returnflag,
        |  COUNT(CASE WHEN l_quantity < 10 THEN 1 END) AS n_small,
        |  COUNT(CASE WHEN l_quantity >= 10 THEN 1 END) AS n_big
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // LEFT OUTER join with null-aware counting: customers with their order
    // counts, including order-less customers at 0.
    sqlQ("x7_left_join_counts",
      """SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
        |FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_custkey ORDER BY c.c_custkey""".stripMargin),

    // Scalar subquery: orders above the global average price (exact DECIMAL
    // average on both sides).
    sqlQ("x7_scalar_subquery",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) / COUNT(*) AS DECIMAL(18,2))
        |  FROM orders)
        |ORDER BY o_orderkey""".stripMargin),

    // O2: LIMIT 0 — the reference's schema-probe shape (`job:96`).
    sqlQ("x7_limit_zero",
      "SELECT event_id, event_type FROM events LIMIT 0"),

    // Analytic lag(): per-customer inter-order gaps in days (exact int math
    // on epoch days; LAG parses identically in both dialects).
    sqlQ("x7_order_gaps",
      """SELECT o_custkey, COUNT(*) AS n_gaps,
        |  CAST(SUM(gap_days) AS BIGINT) AS total_gap_days,
        |  MAX(gap_days) AS max_gap_days
        |FROM (
        |  SELECT o_custkey,
        |    CAST(CAST(o_orderdate AS DATE) - LAG(CAST(o_orderdate AS DATE))
        |      OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS gap_days
        |  FROM orders) AS t
        |WHERE gap_days IS NOT NULL
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin),

    // Tumbling-window aggregation, batch form (the streaming windowed-count
    // twin in StreamingOps.windowedCounts).
    sqlQ("x7_hourly_event_counts",
      """SELECT CAST(date_trunc('hour', ts) AS STRING) AS hour_start, event_type,
        |  COUNT(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin),

    // Set operations: EXCEPT (customers who never ordered) and INTERSECT
    // (customers with both open and fulfilled orders). Both are DISTINCT set
    // semantics in both dialects; at scale each is one hash shuffle.
    sqlQ("x7_except",
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey FROM orders
        |ORDER BY c_custkey""".stripMargin),

    sqlQ("x7_intersect",
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin),

    // Running total with an explicit ROWS frame (exact DECIMAL accumulation,
    // cast to DOUBLE per row; total order inside each partition makes every
    // prefix deterministic).
    sqlQ("x7_running_total",
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin),

    // ntile + percent_rank within a partition (never a global single-partition
    // window): quartiles of order value per order priority.
    sqlQ("x7_ntile_percent_rank",
      """SELECT o_orderkey, o_orderpriority,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pr
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin),

    // first_value/last_value with an unbounded frame, collapsed to one row
    // per customer.
    sqlQ("x7_first_last_order",
      """SELECT DISTINCT o_custkey,
        |  FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_order,
        |  LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
        |FROM orders
        |ORDER BY o_custkey""".stripMargin),

    // Month-bucketed revenue (dialect-portable month key via ISO-string
    // prefix; exact DECIMAL sum).
    sqlQ("x7_monthly_revenue",
      """SELECT substr(CAST(CAST(o_orderdate AS DATE) AS STRING), 1, 7) AS month,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin),

    // Correlated EXISTS (decorrelated by Catalyst into a semi-join).
    sqlQ("x7_exists_correlated",
      """SELECT c_custkey FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND CAST(o.o_totalprice AS DECIMAL(18,2)) > 300000)
        |ORDER BY c_custkey""".stripMargin),

    // TPC-H Q4-shaped priority checking (the fixture has no commit/receipt
    // dates; "late" = shipped >30 days after the order date): order counts by
    // priority where a correlated EXISTS finds a late line — the classic
    // semi-join-then-aggregate shape.
    sqlQ("x7_q4_priority_check",
      """SELECT o.o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND CAST(CAST(l.l_shipdate AS DATE)
        |                         - CAST(o.o_orderdate AS DATE) AS BIGINT) > 30)
        |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin),

    // TPC-H Q9-shaped profit by nation/year (no partsupp in the fixture:
    // retail price plays the supply-cost role — same 5-way star + two-term
    // DECIMAL aggregate). The LIKE filter on part name reaches the part scan.
    sqlQ("x7_q9_nation_margin",
      """SELECT n.n_name AS nation,
        |  CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
        |             * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
        |           - CAST(p.p_retailprice AS DECIMAL(18,2))
        |             * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS margin
        |FROM lineitem l
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN part p ON p.p_partkey = l.l_partkey
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |WHERE p.p_name LIKE '%a%'
        |GROUP BY n.n_name, EXTRACT(YEAR FROM o.o_orderdate)
        |ORDER BY nation, o_year""".stripMargin),

    // TPC-H Q11-shaped important parts (partsupp value → lineitem revenue):
    // per-part revenue vs a global-total scalar subquery over the SAME CTE —
    // the aggregate is computed once and reused exactly in both engines; the
    // fraction compare happens in DOUBLE only after exact DECIMAL sums.
    sqlQ("x7_q11_important_parts",
      """WITH pv AS (
        |  SELECT l_partkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS val
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT l_partkey, CAST(val AS DOUBLE) AS val
        |FROM pv
        |WHERE CAST(val AS DOUBLE) > CAST((SELECT SUM(val) FROM pv) AS DOUBLE) / 500
        |ORDER BY val DESC, l_partkey""".stripMargin),

    // TPC-H Q13-shaped customer order-count distribution: LEFT JOIN with an
    // extra ON-clause predicate (kept on the join, NOT a WHERE — order-less
    // customers must survive), then a second-level aggregate over the first.
    sqlQ("x7_q13_order_distribution",
      """WITH c_orders AS (
        |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        |  FROM customer c
        |  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |    AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY c.c_custkey)
        |SELECT c_count, COUNT(*) AS custdist
        |FROM c_orders GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin),

    // TPC-H Q16-shaped supplier counts by part attributes (partsupp →
    // lineitem pairs): COUNT(DISTINCT) per group behind a NOT IN subquery
    // (planned as a null-aware anti join) and an IN-list pushed to the part
    // scan.
    sqlQ("x7_q16_supplier_counts",
      """SELECT p.p_brand, p.p_type, p.p_size,
        |  COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand <> 'Brand#3'
        |  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
        |  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p.p_brand, p.p_type, p.p_size
        |ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size""".stripMargin),

    // TPC-H Q2-shaped min-cost supplier (no partsupp: a supplier's min line
    // price plays the supply-cost role): the signature correlated-MIN scalar
    // subquery over the same derived table, region-filtered on the supplier
    // side. Ties (several suppliers at the part's min) survive, identically
    // in both engines.
    sqlQ("x7_q2_min_cost_supplier",
      """WITH costs AS (
        |  SELECT l.l_partkey, l.l_suppkey, n.n_name,
        |    MIN(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS min_price
        |  FROM lineitem l
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  JOIN nation n ON n.n_nationkey = s.s_nationkey
        |  JOIN region r ON r.r_regionkey = n.n_regionkey
        |  WHERE r.r_name = 'ASIA'
        |  GROUP BY l.l_partkey, l.l_suppkey, n.n_name)
        |SELECT c.l_partkey, c.l_suppkey, c.n_name, CAST(c.min_price AS DOUBLE) AS price
        |FROM costs c
        |WHERE c.l_partkey % 50 = 0
        |  AND c.min_price = (SELECT MIN(c2.min_price) FROM costs c2
        |                     WHERE c2.l_partkey = c.l_partkey)
        |ORDER BY c.l_partkey, c.l_suppkey""".stripMargin),

    // TPC-H Q20-shaped excess suppliers: nested IN over a grouped HAVING
    // (suppliers who moved >50 units of any matching part) — the
    // aggregate-inside-semi-join shape.
    sqlQ("x7_q20_excess_suppliers",
      """SELECT s.s_suppkey, s.s_name
        |FROM supplier s
        |WHERE s.s_suppkey IN (
        |  SELECT l.l_suppkey
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |  WHERE p.p_name LIKE '%a%'
        |  GROUP BY l.l_suppkey, l.l_partkey
        |  HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 50)
        |ORDER BY s.s_suppkey""".stripMargin),

    // TPC-H Q21-shaped waiting suppliers (shipdate replaces the fixture's
    // missing commit/receipt dates; "late" = shipped >60 days after order):
    // the only-late-supplier-in-a-multi-supplier-order double-correlation —
    // EXISTS plus NOT EXISTS self-joins against the same fact table.
    sqlQ("x7_q21_waiting_suppliers",
      """SELECT s.s_name, COUNT(*) AS numwait
        |FROM supplier s
        |JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |WHERE o.o_orderstatus = 'F'
        |  AND CAST(CAST(l1.l_shipdate AS DATE)
        |           - CAST(o.o_orderdate AS DATE) AS BIGINT) > 60
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND CAST(CAST(l3.l_shipdate AS DATE)
        |                             - CAST(o.o_orderdate AS DATE) AS BIGINT) > 60)
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s.s_name
        |LIMIT 20""".stripMargin),

    // TPC-H Q22-shaped global sales opportunity (no phone column: custkey%7
    // plays the country code; "no orders" → "no recent orders", since at this
    // SF every customer has ordered at least once and a vacuous anti-join
    // would prove nothing): positive-balance customers above the global
    // average balance with no order in the last window — derived-code
    // grouping + scalar subquery + correlated anti join in one statement.
    sqlQ("x7_q22_sales_opportunity",
      """WITH potential AS (
        |  SELECT CAST(c_custkey % 7 AS BIGINT) AS cntrycode, c_custkey,
        |    CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |  FROM customer
        |  WHERE c_acctbal > 0 AND c_custkey % 7 IN (1, 2, 3, 4, 5))
        |SELECT cntrycode, COUNT(*) AS numcust, CAST(SUM(bal) AS DOUBLE) AS totacctbal
        |FROM potential p
        |WHERE CAST(bal AS DOUBLE) >
        |    (SELECT CAST(SUM(bal) AS DOUBLE) / COUNT(*) FROM potential)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = p.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '1997-06-01 00:00:00')
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin),

    // Gap-based sessionization over events (DataFrame impl in EventOps; the
    // oracle states the same two-window definition in DuckDB SQL).
    Q("x7_sessionize",
      (s, d) => graft.ops.EventOps.sessionize(Tables.events(s, d), gapSeconds = 43200),
      Some("""WITH g AS (
             |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             |    CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
             |           - lag(epoch_us(CAST(ts AS TIMESTAMP)))
             |             OVER (PARTITION BY user_id ORDER BY ts, event_id) > 43200000000
             |         THEN 1 ELSE 0 END AS brk
             |  FROM events),
             |s AS (SELECT user_id, us,
             |        CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
             |                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
             |      FROM g)
             |SELECT user_id, session_id, COUNT(*) AS n_events,
             |  max(us) - min(us) AS duration_us
             |FROM s GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin),
      headline = true),

    // Ordered event-FUNNEL analysis (E195): users reaching each stage of
    // view → click → purchase IN ORDER (stage k+1 strictly after the event
    // completing stage k; ties break on event_id). The engine folds each
    // user's sorted events once with the codegen'd `aggregate` HOF; the
    // oracle states the equivalent sequential-min formulation — both are
    // exactly "first qualifying event after the previous stage".
    Q("x7_event_funnel",
      (s, d) => graft.ops.EventOps.funnelCounts(Tables.events(s, d),
          stages = Seq("view", "click", "purchase"))
        .orderBy("stage"),
      Some("""WITH e AS (SELECT user_id, event_type, ts, event_id FROM events
             |          WHERE event_type IN ('view', 'click', 'purchase')),
             |r AS (SELECT user_id, event_type,
             |        row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rnk
             |      FROM e),
             |t1 AS (SELECT user_id, min(rnk) AS r1 FROM r
             |       WHERE event_type = 'view' GROUP BY user_id),
             |t2 AS (SELECT r.user_id, min(rnk) AS r2 FROM r JOIN t1 USING (user_id)
             |       WHERE event_type = 'click' AND rnk > r1 GROUP BY r.user_id),
             |t3 AS (SELECT r.user_id, min(rnk) AS r3 FROM r JOIN t2 USING (user_id)
             |       WHERE event_type = 'purchase' AND rnk > r2 GROUP BY r.user_id),
             |st AS (SELECT u.user_id,
             |         CASE WHEN t3.user_id IS NOT NULL THEN 3
             |              WHEN t2.user_id IS NOT NULL THEN 2
             |              WHEN t1.user_id IS NOT NULL THEN 1 ELSE 0 END AS stage
             |       FROM (SELECT DISTINCT user_id FROM e) u
             |       LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
             |       LEFT JOIN t3 USING (user_id)),
             |ks AS (SELECT CAST(unnest([1, 2, 3]) AS INT) AS stage_k)
             |SELECT stage_k AS stage, CAST(COUNT(*) AS BIGINT) AS users
             |FROM ks JOIN st ON st.stage >= ks.stage_k
             |GROUP BY 1 ORDER BY stage""".stripMargin)),

    // RETENTION cohorts (E196): users bucketed by first-activity week,
    // counted per (cohort, weeks-since-first) cell — integer-exact 7-day
    // epoch buckets (calendar-free), so both engines compute identical
    // cells.
    Q("x7_retention_cohorts",
      (s, d) => graft.ops.EventOps.retentionCohorts(Tables.events(s, d))
        .orderBy("cohort", "offset_weeks"),
      Some("""WITH w AS (SELECT user_id,
             |            epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 // 7 AS wk
             |          FROM events),
             |c AS (SELECT user_id, min(wk) AS cohort FROM w GROUP BY user_id)
             |SELECT c.cohort, w.wk - c.cohort AS offset_weeks,
             |  CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS users
             |FROM w JOIN c USING (user_id)
             |GROUP BY 1, 2 ORDER BY cohort, offset_weeks""".stripMargin)),

    // ACTIVE USERS (E198): exact DAU + trailing-7-day WAU per epoch day —
    // the (day, user) pairs dedup once, WAU expands each pair against the
    // tiny broadcast day list (O(pairs × 7), exact — no sketch needed).
    Q("x7_active_users",
      (s, d) => graft.ops.EventOps.activeUsers(Tables.events(s, d))
        .orderBy("day"),
      Some("""WITH p AS (SELECT DISTINCT
             |            epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
             |            user_id
             |          FROM events),
             |d AS (SELECT DISTINCT day FROM p),
             |dau AS (SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
             |        FROM p GROUP BY day),
             |wau AS (SELECT d.day, CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS wau
             |        FROM d JOIN p ON p.day BETWEEN d.day - 6 AND d.day
             |        GROUP BY d.day)
             |SELECT day, dau, wau FROM dau JOIN wau USING (day)
             |ORDER BY day""".stripMargin)),

    // X7: STICKINESS (E210) — DAU / trailing-28-day MAU per day, the
    // engagement ratio product dashboards publish; one join at the widest
    // window serves every narrower count as a conditional distinct. The
    // ratio is one IEEE division of two exact longs — bit-equal across
    // engines.
    Q("x7_stickiness",
      (s, d) => {
        import org.apache.spark.sql.functions.col
        graft.ops.EventOps.activeUsersWindows(Tables.events(s, d),
            Seq("dau" -> 1, "wau" -> 7, "mau" -> 28))
          .withColumn("stickiness",
            col("dau").cast("double") / col("mau").cast("double"))
          .orderBy("day")
      },
      Some("""WITH p AS (SELECT DISTINCT
             |            epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
             |            user_id
             |          FROM events),
             |d AS (SELECT DISTINCT day FROM p),
             |w AS (SELECT d.day,
             |        CAST(COUNT(DISTINCT CASE WHEN p.day >= d.day THEN p.user_id END) AS BIGINT) AS dau,
             |        CAST(COUNT(DISTINCT CASE WHEN p.day >= d.day - 6 THEN p.user_id END) AS BIGINT) AS wau,
             |        CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS mau
             |      FROM d JOIN p ON p.day BETWEEN d.day - 27 AND d.day
             |      GROUP BY d.day)
             |SELECT day, dau, wau, mau,
             |       CAST(dau AS DOUBLE) / CAST(mau AS DOUBLE) AS stickiness
             |FROM w ORDER BY day""".stripMargin)))
}
