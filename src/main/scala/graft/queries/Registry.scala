package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * One registered query: the Spark implementation plus (where SQL-expressible)
 * the equivalent ANSI SQL the driver runs in DuckDB over the same parquet
 * fixtures. Column names and row order are deterministic and identical on both
 * sides (aggregates go through exact DECIMAL arithmetic before a final cast to
 * DOUBLE so the float results are bit-equal regardless of evaluation order;
 * temporal outputs are formatted strings to sidestep µs/ns and tz-awareness
 * mismatches between engines).
 */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false,
    /** Micro-batch/stream-replay shaped: the bench keeps the native shuffle
      * partition count for these instead of the analytic AQE-headroom split
      * (many small checkpointed batches — 8× headroom is pure per-stage task
      * overhead there). A property of the query, not of the bench harness,
      * so renamed/added queries can't silently fall into the wrong tier. */
    streaming: Boolean = false)

/** The full driver-visible query inventory (SURVEY.md §2 ids in names). */
object Registry {

  lazy val all: Seq[Q] =
    EventQueries.all ++ AnalyticQueries.all ++ ReplayQueries.all ++ ExtQueries.all ++
      JoinQueries.all ++ PipelineQueries.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  def headlines: Seq[Q] = all.filter(_.headline)
}
