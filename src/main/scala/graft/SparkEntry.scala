package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The query inventory itself lives in graft.queries.Registry. */
object SparkEntry {

  /** Flagship: the golden CDC replay through the full engine (parse → W1 dedup
    * → MERGE → snapshot scan), per the reference's own test procedure
    * (`/root/reference/README.md:386-513`). */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("cdc_replay_end_state").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
