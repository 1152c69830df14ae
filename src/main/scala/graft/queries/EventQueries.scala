package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.table.Merge

/**
 * The reference's per-batch CDC kernels (SURVEY.md §2.2–2.7), each exposed as a
 * driver-checkable batch query over the `events` fixture table. The streaming
 * pipeline applies the same kernels inside `foreachBatch`
 * (graft.stream.CdcPipeline); here they are oracled against DuckDB.
 *
 * Scale notes: W1 is one hash shuffle on the dedup key (batch-bounded in the
 * pipeline); the merge kernels broadcast the small side; everything else is a
 * narrow codegen'd projection/filter with full parquet pushdown.
 */
object EventQueries {

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  /** Format a µs timestamp identically to DuckDB's strftime '%f' (6-digit). */
  private val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  val all: Seq[Q] = Seq(

    // W1: last-writer-wins per key — the dedup core of the reference
    // (`spark_sql_merge_into_iceberg.py:105-108`), event_id as the
    // deterministic tie-break (SURVEY §2.4).
    Q("w1_dedup_latest_per_key",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(desc("ts"), desc("event_id"))
        ev(s, d).withColumn("_row", row_number().over(w))
          .filter(col("_row") === 1).drop("_row")
          .select(col("user_id"), col("event_id"), col("event_type"),
            date_format(col("ts"), TsFmt).as("ts_s"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, event_id, event_type,
             |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts_s
             |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
             |      FROM events) AS t
             |WHERE rn = 1 ORDER BY user_id""".stripMargin),
      headline = true),

    // W1 skew-aware twin: identical semantics via max_by aggregation —
    // map-side partial combine means a hot key ships one row per mapper,
    // not its whole history (same oracle as the window form).
    Q("w1_dedup_agg_skew_aware",
      (s, d) => {
        val e = ev(s, d)
        e.groupBy(col("user_id"))
          .agg(max_by(
            struct(col("event_id"), col("event_type"), col("ts")),
            struct(col("ts"), col("event_id"))).as("m"))
          .select(col("user_id"), col("m.event_id"), col("m.event_type"),
            date_format(col("m.ts"), TsFmt).as("ts_s"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, event_id, event_type,
             |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts_s
             |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
             |      FROM events) AS t
             |WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // F2: route upserts — inequality filter (`job:112`).
    Q("f2_filter_not_equal",
      (s, d) => ev(s, d).filter(col("event_type") =!= "error")
        .select("event_id", "user_id", "event_type", "value").orderBy("event_id"),
      Some("SELECT event_id, user_id, event_type, value FROM events " +
        "WHERE event_type <> 'error' ORDER BY event_id")),

    // F3: route deletes — equality filter (`job:127`).
    Q("f3_filter_equal",
      (s, d) => ev(s, d).filter(col("event_type") === "error")
        .select("event_id", "user_id", "value").orderBy("event_id"),
      Some("SELECT event_id, user_id, value FROM events " +
        "WHERE event_type = 'error' ORDER BY event_id")),

    // P2/P3/P5: alias, cast, derived column (`job:100-110`).
    Q("p_project_alias_cast",
      (s, d) => ev(s, d).select(
          col("event_id").as("id"),
          upper(col("event_type")).as("etype"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"),
          col("value").cast("decimal(18,2)").cast("double").as("value2"))
        .orderBy("id"),
      Some("""SELECT event_id AS id, upper(event_type) AS etype,
             |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             |  CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value2
             |FROM events ORDER BY id""".stripMargin)),

    // A1/A2: COUNT(*) (`job:86`; `README.md:511-512`).
    Q("a2_count_star_events",
      (s, d) => {
        import s.implicits._
        Seq(Tables.load(s, d, "events").count()).toDF("cnt")
      },
      Some("SELECT COUNT(*) AS cnt FROM events")),

    // O1: descending sort (+ deterministic tie-break), top-n.
    Q("o1_sort_desc_topn",
      (s, d) => ev(s, d).select("event_id", "value")
        .orderBy(desc("value"), col("event_id")).limit(50),
      Some("SELECT event_id, value FROM events ORDER BY value DESC, event_id LIMIT 50"),
      headline = true),

    // O3: LIMIT n over an ordered scan (`README.md:436`).
    Q("o3_limit_n",
      (s, d) => ev(s, d).select("event_id", "user_id", "event_type")
        .orderBy("event_id").limit(10),
      Some("SELECT event_id, user_id, event_type FROM events ORDER BY event_id LIMIT 10")),

    // J1: MERGE upsert join kernel (anti ∪ source), `job:118-122`.
    Q("j1_merge_upsert",
      (s, d) => {
        val e = ev(s, d)
        val target = e.filter(col("event_id") % 10 < 5)
          .select("event_id", "user_id", "value")
        val source = e.filter(col("event_id") % 10 >= 3 && col("event_id") % 10 <= 6)
          .select(col("event_id"), col("user_id"), (col("value") + 1).as("value"))
        Merge.upsert(target, source, "event_id").orderBy("event_id")
      },
      Some("""SELECT * FROM (
             |  SELECT event_id, user_id, value FROM events
             |  WHERE event_id % 10 < 5 AND event_id % 10 NOT BETWEEN 3 AND 6
             |  UNION ALL
             |  SELECT event_id, user_id, value + 1 AS value FROM events
             |  WHERE event_id % 10 BETWEEN 3 AND 6
             |) AS t ORDER BY event_id""".stripMargin),
      headline = true, streaming = true),

    // J2: MERGE delete join kernel (anti), `job:133-136`.
    Q("j2_merge_delete",
      (s, d) => {
        val e = ev(s, d)
        val target = e.filter(col("event_id") % 10 < 5)
          .select("event_id", "user_id", "value")
        val deletes = e.filter(col("event_id") % 10 === 2 || col("event_id") % 10 === 3)
          .select("event_id")
        Merge.delete(target, deletes, "event_id").orderBy("event_id")
      },
      Some("SELECT event_id, user_id, value FROM events " +
        "WHERE event_id % 10 IN (0, 1, 4) ORDER BY event_id")))
}
