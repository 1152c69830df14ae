package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/**
 * Plan auditor: prints `explain("formatted")` for the headline queries and
 * greps the physical plan for the properties that matter at 100 TB —
 * filter/column pushdown into the parquet scan, broadcast joins where a side
 * is small, and whole-stage codegen coverage. Run:
 *   sbt "runMain graft.tools.PlanAudit [sfDir]"
 */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val audited = Seq(
      "w1_dedup_latest_per_key", "f3_filter_equal", "j1_merge_upsert",
      "x7_q1_pricing_summary", "x7_q3_top_orders", "x7_q5_revenue_by_nation",
      "x7_q6_forecast_revenue", "x7_topk_orders_per_customer",
      "x2_jaccard_pairs", "x2_jaccard_capped", "x3_cosine_topk",
      "x3_neardup_lsh", "x1_exact_dedup_documents",
      "x7_except", "x7_intersect", "x7_running_total",
      "x7_ntile_percent_rank", "x7_first_last_order", "x7_monthly_revenue",
      "x7_exists_correlated",
      // round 5: temporal joins must stay off the nested-loop path; the new
      // star joins should broadcast every dimension side
      "j3_asof_join", "j3_asof_forward", "j4_range_join",
      "x7_q7_volume_shipping", "x7_q8_market_share", "x7_q10_returned_items",
      "x7_q12_priority_buckets", "x7_q14_promo_share",
      "x4_tfidf", "x4_pack_sequences", "x2_contamination",
      "x3_kmeans_assign", "x1_stratified_sample",
      // round 8: the rest of the TPC-H shapes (correlated/anti-join heavy —
      // none may fall onto a cartesian path) + the changelog read (EXCEPT ALL
      // over the changed slice; the carried-file scan must stay pruned)
      "x7_q2_min_cost_supplier", "x7_q4_priority_check", "x7_q9_nation_margin",
      "x7_q11_important_parts", "x7_q13_order_distribution",
      "x7_q16_supplier_counts", "x7_q20_excess_suppliers",
      "x7_q21_waiting_suppliers", "x7_q22_sales_opportunity",
      "cdc_changes_events",
      // round 10: the bigram-df self-join must reuse the shuffled bigram
      // exchange (one scan feeding both the df count and the join probe),
      // and the variant path extractions must stay in one codegen stage
      "x4_bigram_rarity", "x6_variant_get", "x6_variant_shred",
      "x4_repetition_stats",
      // round 11: distributed metadata tables — the entries/all_files
      // aggregation must read the ChunkEntriesTable scan (never a LocalRows
      // driver dump), and the real-image decode keeps its batched
      // mapPartitions shape
      "cdc_metadata_entries_sql", "cdc_metadata_all_files_sql",
      "x5_decode_real",
      // round 11 second half: the span detector's dup-key aggregate and
      // semi-join probe stay co-partitioned on the fingerprint, with no
      // pair expansion (exchange-count assert in DedupSimilaritySpec); the
      // mixture sampler is one broadcast agg + a map-only filter; the
      // random projection is pure map-side codegen
      "x2_dup_spans", "x1_mixture_budget", "x3_random_projection")

    audited.foreach { name =>
      val df = Registry.byName(name).fn(spark, sfDir)
      // Execute THIS QueryExecution first (collect, not count — count builds
      // a different plan): under AQE only the final adaptive plan shows the
      // real joins + codegen stages.
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      def has(s: String) = plan.contains(s)
      val marks = Seq(
        "PushedFilters" -> (has("PushedFilters: [") && !plan.contains("PushedFilters: []")),
        "BroadcastHashJoin" -> has("BroadcastHashJoin"),
        "SortMergeJoin" -> has("SortMergeJoin"),
        "WholeStageCodegen" -> (has("WholeStageCodegen") || has("*(")), // SimpleMode renders codegen stages as *(n)
        "CartesianProduct" -> has("CartesianProduct"),
        "BroadcastNestedLoop" -> has("BroadcastNestedLoopJoin"))
        .collect { case (k, true) => k }.mkString(", ")
      println(s"[audit] $name: $marks")
    }

    // Full formatted plan for the flagship analytic join (visual check).
    println("\n[audit] ===== x7_q5_revenue_by_nation formatted plan =====")
    Registry.byName("x7_q5_revenue_by_nation").fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
