package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.TextOps

/**
 * [EXT] LLM-data-pipeline operators (SURVEY.md §2.11, X1–X6) registered as
 * driver-checkable queries. Implementations live in graft.ops; this file binds
 * them to fixture tables with DuckDB oracle SQL.
 */
object ExtQueries {

  /** DuckDB-side whitespace tokenizer, mirroring TextOps.tokens. */
  private val DuckToks =
    """list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')"""

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
             |FROM events GROUP BY 1 ORDER BY k""".stripMargin)),

    // X4: per-document token statistics.
    Q("x4_doc_stats",
      (s, d) => TextOps.docStats(Tables.load(s, d, "documents")).orderBy("doc_id"),
      Some(s"""WITH toks AS (SELECT doc_id, length(text) AS n_chars, $DuckToks AS w FROM documents)
              |SELECT doc_id, n_chars, len(w) AS n_tokens,
              |  len(list_distinct(w)) AS n_distinct_tokens,
              |  list_max(list_transform(w, t -> length(t))) AS max_token_len,
              |  CAST(list_sum(list_transform(w, t -> length(t))) AS BIGINT) AS sum_token_len
              |FROM toks ORDER BY doc_id""".stripMargin),
      headline = true),

    // X4: corpus term frequencies (top 20).
    Q("x4_term_frequency",
      (s, d) => TextOps.termFrequency(Tables.load(s, d, "documents")),
      Some(s"""SELECT term, COUNT(*) AS cnt FROM (
              |  SELECT unnest($DuckToks) AS term FROM documents) AS t
              |GROUP BY term ORDER BY cnt DESC, term LIMIT 20""".stripMargin)),

    // X4: deterministic stopword-marker language ID.
    Q("x4_lang_id",
      (s, d) => TextOps.langId(Tables.load(s, d, "documents")).orderBy("doc_id"),
      Some(s"""WITH toks AS (SELECT doc_id, $DuckToks AS w FROM documents),
              |c AS (SELECT doc_id,
              |  len(list_filter(w, t -> t IN ('the','a','is','and','of'))) AS n_en,
              |  len(list_filter(w, t -> t IN ('der','die','und','ist'))) AS n_de,
              |  len(list_filter(w, t -> t IN ('le','la','et','est'))) AS n_fr,
              |  len(list_filter(w, t -> t IN ('el','la','y','es'))) AS n_es
              |FROM toks)
              |SELECT doc_id, n_en, n_de, n_fr, n_es,
              |  CASE WHEN n_en > 0 AND n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
              |       WHEN n_de > 0 AND n_de >= n_fr AND n_de >= n_es THEN 'de'
              |       WHEN n_fr > 0 AND n_fr >= n_es THEN 'fr'
              |       WHEN n_es > 0 THEN 'es'
              |       ELSE 'und' END AS lang_pred
              |FROM c ORDER BY doc_id""".stripMargin)),

    // X4: quality signals (exact counts; ratios in fixed-order double math).
    Q("x4_quality_score",
      (s, d) => TextOps.qualityScore(Tables.load(s, d, "documents")).orderBy("doc_id"),
      Some(s"""WITH toks AS (SELECT doc_id, $DuckToks AS w FROM documents),
              |c AS (SELECT doc_id, len(w) AS n_tokens,
              |  len(list_filter(w, t -> t IN ('the','a','is','and','of'))) AS n_stopwords,
              |  CAST(list_sum(list_transform(w, t -> length(t))) AS BIGINT) AS sum_len
              |FROM toks)
              |SELECT doc_id, n_tokens, n_stopwords,
              |  CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio,
              |  CAST(sum_len AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS avg_token_len,
              |  n_tokens BETWEEN 5 AND 10000 AS length_ok
              |FROM c ORDER BY doc_id""".stripMargin)),

    // X4: 64-bit content + min-shingle-hash fingerprint. Engine-specific hash
    // (xxhash64) → no SQL oracle; the driver records a rows-only check.
    Q("x4_fingerprint",
      (s, d) => TextOps.fingerprint(Tables.load(s, d, "documents")).orderBy("doc_id"),
      None))
}
