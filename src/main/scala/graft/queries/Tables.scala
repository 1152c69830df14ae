package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Loaders + S4 temp-view registration for the driver testdata tables
 * (`/root/testdata/sf{0.001,0.01,0.1}`, schemas in FIXTURES.md §B).
 *
 * S4 mirrors the reference's temp-view surface
 * (`src/main/python/spark_sql_merge_into_iceberg.py:114,129` registers the
 * micro-batch as a SQL-visible view); here every fixture table is registered so
 * the X7 analytic SQL runs through `spark.sql` exactly as the reference's
 * product table is queried through Athena (`README.md:507-513`).
 */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /**
   * `events` with `ts` normalized to a microsecond TimestampType. Fixture
   * generations have shipped this column three ways: parquet TIMESTAMP(NANOS)
   * (read as raw Long nanos under `spark.sql.legacy.parquet.nanosAsLong=true`),
   * TIMESTAMP(MICROS) without the UTC-adjusted flag (read as TIMESTAMP_NTZ in
   * Spark 4), and plain UTC-adjusted micros. All three normalize to the same
   * TimestampType values here (session timezone is pinned to UTC, so the
   * NTZ→LTZ cast is the identity on the epoch value, matching DuckDB).
   */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(Int, String)]()

  /** S4: register every fixture table as a temp view (events ts-normalized).
    * Idempotent and cached per (session, dir) — repeated calls from the query
    * registry cost nothing after the first. */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    if (registered.add((System.identityHashCode(spark), sfDir)))
      names.foreach { n =>
        val df = if (n == "events") events(spark, sfDir) else load(spark, sfDir, n)
        df.createOrReplaceTempView(n)
      }
}
