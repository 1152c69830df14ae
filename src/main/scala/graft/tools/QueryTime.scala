package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Dev probe: time NAMED registry queries under the exact Bench session
  * config (AQE headroom, shuffle partitions, extensions) without running the
  * whole headline suite. Prints min/median of N runs per query.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.QueryTime x4_tfidf x2_contamination"
  * Optional: SPARK_GRAFT_BENCH_RUNS (default 5). */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val byName = Registry.all.map(q => q.name -> q).toMap
    val names = if (args.nonEmpty) args.toSeq else Registry.headlines.map(_.name)
    names.foreach { n =>
      val q = byName.getOrElse(n, sys.error(s"unknown query $n"))
      spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        if (q.streaming) "32" else "256")
      val ts = (0 to runs).map { _ =>
        val t0 = System.nanoTime()
        q.fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.drop(1) // warm-up excluded
      val sorted = ts.sorted
      println(f"[qtime] $n%-28s min=${sorted.head}%7.3f  med=${sorted(sorted.size / 2)}%7.3f  (n=$runs)")
    }
    spark.stop()
  }
}
