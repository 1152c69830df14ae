package graft.queries

import org.apache.spark.sql.functions._

/**
 * [EXT] LLM-data-pipeline operators (SURVEY.md §2.11, X1–X6) registered as
 * driver-checkable queries. Implementations live in graft.ops; this file binds
 * them to fixture tables with DuckDB oracle SQL.
 */
object ExtQueries {

  val all: Seq[Q] = Seq(

    // X1: exact dedup — keep the lowest doc_id per identical text (deterministic,
    // unlike dropDuplicates' arbitrary pick). Hash-shuffles on the dedup key
    // once; at 100 TB the key should be a fingerprint (see x4_fingerprint), not
    // the raw text — grouping by a 64-bit hash instead of a multi-KB string.
    Q("x1_exact_dedup_documents",
      (s, d) => Tables.load(s, d, "documents")
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .select("doc_id", "n_copies")
        .orderBy("doc_id"),
      Some("""SELECT min(doc_id) AS doc_id, COUNT(*) AS n_copies
             |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin),
      headline = true),

    // X1 variant: DISTINCT projection (dedup of a derived row set).
    Q("x1_distinct_pairs",
      (s, d) => Tables.load(s, d, "lineitem")
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus"),
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem " +
        "ORDER BY l_returnflag, l_linestatus")),

    // X6: JSON prop extraction from the events.props JSON string column.
    Q("x6_json_extract_props",
      (s, d) => Tables.load(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             |FROM events ORDER BY event_id""".stripMargin)),

    // X6 + aggregation: group by an extracted JSON property.
    Q("x6_json_group_by_prop",
      (s, d) => Tables.load(s, d, "events")
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
        .orderBy("k"),
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, COUNT(*) AS n
             |FROM events GROUP BY 1 ORDER BY k""".stripMargin)))
}
