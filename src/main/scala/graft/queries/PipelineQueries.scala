package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, SequenceOps, SimilarityOps, SketchOps, TextOps}

/**
 * Training-data-pipeline queries beyond the X1–X6 core: corpus-level TF-IDF
 * ranking, stratified (per-language) downsampling, and k-means cluster
 * assignment over embeddings — the relevance / rebalancing / clustering trio
 * every large-scale corpus build runs.
 *
 * Scale notes: tfidf counts tf in-row (TermCounts kernel — no token-level
 * shuffle at all), aggregates df once on term, and broadcast-joins the term
 * dictionary — no cross join wider than the 1-row corpus count;
 * stratified sampling is a narrow filter (no shuffle); cluster assignment
 * broadcasts k centroid rows and scans the corpus once (same shape as
 * SimilarityOps.cosineTopK).
 */
object PipelineQueries {

  /** DuckDB-side incremental-export replay (odd-doc delta → md5 shard +
    * in-shard order → per-shard running-sum bins), SHARED by the Scala-API
    * query (`x1_incremental_export`) and its CALL twin (`cdc_export_sql`)
    * so the two surfaces cannot drift. */
  private lazy val DuckExportSql: String =
    s"""WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
       |toks AS (SELECT doc_id,
       |  CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')) AS BIGINT) AS n_tokens
       |  FROM d),
       |h AS (SELECT doc_id, n_tokens,
       |  CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS _h
       |  FROM toks),
       |cum AS (SELECT doc_id, n_tokens, CAST(_h % 8 AS INT) AS shard,
       |  CAST(SUM(n_tokens) OVER (PARTITION BY _h % 8 ORDER BY _h, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
       |  FROM h)
       |SELECT shard, (c - n_tokens) // 4096 AS bin,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM cum GROUP BY 1, 2 ORDER BY shard, bin""".stripMargin

  /** DuckDB-side exact near-dup CLOSURE (jaccard ≥ 0.5 pairs → recursive-CTE
    * connected components ending in `comp(doc_id, canonical_id)`) — ONE copy
    * shared by `x1_dedup_clusters` and `x1_dedup_keep_best` so a closure fix
    * can never leave the two oracles silently disagreeing about the same
    * clustering. Starts with `WITH RECURSIVE toks AS ...`. */
  private val DuckClosureCte: String =
    """WITH RECURSIVE toks AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS w
      |  FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |         unnest(list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
      |       FROM toks WHERE len(w) >= 3),
      |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |pairs AS (
      |  SELECT doc_a, doc_b FROM inter
      |  JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
      |  WHERE CAST(n_common AS DOUBLE) / CAST(sa.n + sb.n - n_common AS DOUBLE) >= 0.5),
      |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
      |          UNION SELECT doc_b, doc_a FROM pairs),
      |reach(id, r) AS (
      |  SELECT a, a FROM edges
      |  UNION
      |  SELECT e.a, r.r FROM edges e JOIN reach r ON e.b = r.id),
      |comp AS (SELECT id AS doc_id, min(r) AS canonical_id FROM reach GROUP BY id)""".stripMargin

  /** Shared by `x1_upsample_epochs` and its CALL twin (`cdc_upsample_sql`)
    * so the two surfaces cannot drift. */
  private val DuckUpsampleSql: String =
    """WITH f AS (SELECT doc_id, source,
      |  CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.25
      |              WHEN 'src2' THEN 0.0 ELSE 1.0 END AS fac FROM documents),
      |c AS (SELECT doc_id, source,
      |        CAST(floor(fac) AS BIGINT)
      |        + CASE WHEN CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
      |                 AS BIGINT) AS DOUBLE) < (fac - floor(fac)) * 1152921504606846976.0
      |          THEN 1 ELSE 0 END AS n
      |      FROM f)
      |SELECT doc_id, source, CAST(unnest(range(n)) AS BIGINT) AS epoch
      |FROM c WHERE n > 0 ORDER BY doc_id, epoch""".stripMargin

  private val DuckToks =
    """list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')"""

  /** DuckDB-side KEEP-BEST index replay (simhash banding + md5 logit +
    * better-of corpus/in-batch rules + the eviction set: evens index as
    * batch 0 self-deduped by quality, odds arrive as batch 1), SHARED by
    * the Scala-API query (`x1_keep_best_index`), its CALL twin
    * (`cdc_keep_best_sql`), and the streaming corpus end-state
    * (`cdc_keepbest_stream`) so the three surfaces cannot drift. Ends with
    * CTEs `kept` (batch-1 kept ids incl. sketchless), `evict` (batch-0
    * docs replaced by better batch-1 docs), and `e_kept_ids` (batch-0 kept
    * ids incl. sketchless). */
  private lazy val DuckKeepBestCtes: String = duckKeepBestCtes("")

  /** The same replay with a LIVE-rows filter on the index side (`liveWhere`
    * filters `e_kept` into `e_live`): the delete-maintenance variant
    * (`x1_keep_best_delete`) is this oracle restricted to the survivors of
    * the delete epoch, everything else identical. */
  private def duckKeepBestCtes(liveWhere: String): String =
    s"""WITH toks AS (SELECT doc_id, $DuckToks AS w FROM documents),
       |th AS (SELECT doc_id, CAST(concat('0x', substring(md5(t), 1, 15)) AS BIGINT) AS h
       |       FROM (SELECT doc_id, unnest(w) AS t FROM toks) u),
       |bits AS (SELECT doc_id, b, SUM(CASE WHEN (h >> CAST(b AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS s
       |         FROM th, range(60) r(b) GROUP BY doc_id, b),
       |sk AS (SELECT doc_id, CAST(SUM(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) ELSE 0 END) AS BIGINT) AS simhash
       |       FROM bits GROUP BY doc_id),
       |tc AS (SELECT doc_id, t AS term, CAST(COUNT(*) AS BIGINT) AS tf
       |       FROM (SELECT doc_id, unnest(w) AS t FROM toks) u GROUP BY 1, 2),
       |qs AS (SELECT doc_id,
       |         SUM((CAST(concat('0x', substring(md5(term), 1, 15)) AS BIGINT) % 1001 - 500) * tf) AS wsum,
       |         CAST(SUM(tf) AS BIGINT) AS n
       |       FROM tc GROUP BY doc_id),
       |lg AS (SELECT t.doc_id,
       |         CASE WHEN coalesce(q.n, 0) = 0 THEN 0.0
       |              ELSE CAST(q.wsum AS DOUBLE) / (q.n * 500.0) END AS logit
       |       FROM toks t LEFT JOIN qs q USING (doc_id)),
       |ch AS (SELECT sk.doc_id, c AS band, (simhash >> CAST(c * 15 AS INTEGER)) & 32767 AS chunk, lg.logit
       |       FROM sk, range(4) r(c) JOIN lg ON lg.doc_id = sk.doc_id),
       |e AS (SELECT * FROM ch WHERE doc_id % 2 = 0),
       |o AS (SELECT * FROM ch WHERE doc_id % 2 = 1),
       |e_lose AS (SELECT DISTINCT a.doc_id FROM e a JOIN e b
       |           ON b.band = a.band AND b.chunk = a.chunk AND b.doc_id <> a.doc_id
       |             AND (b.logit > a.logit OR (b.logit = a.logit AND b.doc_id < a.doc_id))),
       |e_kept AS (SELECT * FROM e WHERE doc_id NOT IN (SELECT doc_id FROM e_lose)),
       |e_live AS (SELECT * FROM e_kept $liveWhere),
       |o_clos AS (SELECT DISTINCT a.doc_id FROM o a JOIN e_live i
       |           ON i.band = a.band AND i.chunk = a.chunk
       |             AND (i.logit > a.logit OR (i.logit = a.logit AND i.doc_id < a.doc_id))),
       |cand AS (SELECT * FROM o WHERE doc_id NOT IN (SELECT doc_id FROM o_clos)),
       |o_blos AS (SELECT DISTINCT a.doc_id FROM cand a JOIN cand b
       |           ON b.band = a.band AND b.chunk = a.chunk AND b.doc_id <> a.doc_id
       |             AND (b.logit > a.logit OR (b.logit = a.logit AND b.doc_id < a.doc_id))),
       |kept AS (SELECT DISTINCT doc_id FROM cand
       |         WHERE doc_id NOT IN (SELECT doc_id FROM o_blos)
       |         UNION ALL
       |         SELECT doc_id FROM toks WHERE doc_id % 2 = 1 AND len(w) = 0),
       |kb AS (SELECT c.* FROM cand c JOIN kept USING (doc_id)),
       |evict AS (SELECT DISTINCT i.doc_id FROM e_live i JOIN kb k
       |          ON k.band = i.band AND k.chunk = i.chunk AND k.doc_id <> i.doc_id),
       |e_kept_ids AS (SELECT DISTINCT doc_id FROM e_kept
       |               UNION ALL
       |               SELECT doc_id FROM toks WHERE doc_id % 2 = 0 AND len(w) = 0)""".stripMargin

  val all: Seq[Q] = Seq(

    // Per-document top-3 terms by TF-IDF (tf × ln(N/df), the plain-ratio idf).
    // The score itself is kept out of the output: Java's Math.log and libm's
    // log differ by 1 ulp on some inputs, so only the RANKING (which both
    // engines agree on — ulp gaps never straddle a rank boundary on this
    // fixture) plus the exact integer tf/df counts are emitted — the same
    // convention x3_cosine_topk uses for its cosine.
    Q("x4_tfidf",
      (s, d) => {
        val docs = Tables.load(s, d, "documents")
        // tf IN-ROW (TermCounts kernel): a document's tokens all live in one
        // row, so counting them never needs the (doc_id, term) shuffle the
        // explode→groupBy form pays. The pairs leaving the kernel are
        // already distinct per doc.
        val tf = docs
          .select(col("doc_id"), explode(TextOps.termCounts(col("text"))).as("tc"))
          .select(col("doc_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))
        // df: the ONE wide exchange left (keyed by term, map-side partial
        // agg over already-distinct pairs)
        val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        // term-dictionary BROADCAST: distinct terms ≪ corpus (a BPE-ish
        // vocabulary stays ~1e6 entries at any corpus scale), so the df leg
        // ships to every executor and the scoring join is exchange-free —
        // no skew cliff either, hot terms never concentrate on one task.
        // The 1-row corpus count rides INSIDE the broadcast leg (df ⨯ n):
        // one broadcast materialization instead of two sequential jobs.
        val scored = tf.join(broadcast(df.crossJoin(n)), "term")
          .withColumn("tfidf",
            col("tf").cast("double") * log(col("n_docs").cast("double") / col("df").cast("double")))
        val w = Window.partitionBy(col("doc_id")).orderBy(desc("tfidf"), col("term"))
        // no final ORDER BY on either side: the correctness gate value-sorts
        // rows before hashing, and a global sort of the output is pure
        // presentation (a range exchange + sampling job locally)
        scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
          .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, unnest($DuckToks) AS term FROM documents),
             |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
             |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
             |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
             |scored AS (
             |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
             |    CAST(tf.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) AS tfidf
             |  FROM tf JOIN df USING (term) CROSS JOIN n)
             |SELECT doc_id, rnk, term, tf, df FROM (
             |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS BIGINT) AS rnk
             |  FROM scored) t
             |WHERE rnk <= 3""".stripMargin),
      headline = true),

    // Stratified downsampling: per-language keep rates (1/2 en, 1/5 de, 1/10
    // rest) via a deterministic modulo predicate — the reproducible
    // class-rebalancing split (narrow filter, no shuffle, engine-agnostic).
    Q("x1_stratified_sample",
      (s, d) => {
        val rate = when(col("lang") === "en", lit(2))
          .when(col("lang") === "de", lit(5)).otherwise(lit(10))
        Tables.load(s, d, "documents")
          .filter(pmod(col("doc_id"), rate) === 0)
          .select(col("doc_id"), col("lang"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang FROM documents
             |WHERE doc_id % (CASE WHEN lang = 'en' THEN 2
             |                     WHEN lang = 'de' THEN 5 ELSE 10 END) = 0
             |ORDER BY doc_id""".stripMargin)),

    // Sequence packing for pretraining: documents laid end to end in doc_id
    // order and cut into 4096-token bins (a doc's bin = where its first token
    // lands). The global running total comes from SequenceOps.prefixSum —
    // range shuffle + per-partition windows + broadcast offsets, NO
    // single-partition global window. Oracle: DuckDB's running-sum window.
    Q("x4_pack_sequences",
      (s, d) => {
        val toks = Tables.load(s, d, "documents")
          .select(col("doc_id"),
            size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
        SequenceOps.packBins(toks, "doc_id", "n_tokens", capacity = 4096L,
            numPartitions = 8)
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"),
            min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
          .orderBy("bin")
      },
      Some(s"""WITH toks AS (
             |  SELECT doc_id, CAST(len($DuckToks) AS BIGINT) AS n_tokens FROM documents),
             |cum AS (
             |  SELECT doc_id, n_tokens,
             |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
             |  FROM toks)
             |SELECT (c - n_tokens) // 4096 AS bin,
             |  CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
             |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
             |FROM cum GROUP BY 1 ORDER BY bin""".stripMargin),
      headline = true),

    // Incremental training-data EXPORT (E184): only the corpus delta between
    // two table versions publishes — changes(v0, v1) insert images shuffle
    // deterministically into shards (md5 order), pack into 4096-token bins
    // PER SHARD (one hash exchange, per-shard local sorts — the 100 TB
    // shape), land as an immutable parquet export + fenced manifest row;
    // delete images publish as tombstones; a re-run of the same interval
    // is fenced to a no-op. Oracle: the odd-doc delta replayed through the
    // same md5 shard/order and running-sum bin arithmetic.
    Q("x1_incremental_export",
      (s, d) => {
        val docs = Tables.load(s, d, "documents").select("doc_id", "text")
        val root = java.nio.file.Files.createTempDirectory("graft_export").toString
        val corpus = graft.table.TransactionalTable.create(s, s"$root/corpus",
          org.apache.spark.sql.types.StructType.fromDDL("doc_id LONG, text STRING"),
          "doc_id", None)
        corpus.append(docs.filter(col("doc_id") % 2 === 0), batchId = 0)
        val v0 = corpus.currentVersion // the already-published snapshot
        // the delta: all odd docs arrive, and two published docs retract
        corpus.append(docs.filter(col("doc_id") % 2 === 1), batchId = 1)
        corpus.merge(corpus.scan().limit(0),
          docs.filter(col("doc_id").isin(2L, 4L)).select("doc_id"), batchId = 2)
        val v1 = corpus.currentVersion
        val r = graft.ops.ExportOps.exportDelta(corpus, s"$root/exports",
          v0, v1, nShards = 8, capacity = 4096L)
        require(r.exported, "first export of the interval must publish")
        require(r.tombstones.collect().map(_.getLong(0)).toSet == Set(2L, 4L),
          "retracted published docs must tombstone")
        // idempotence: the same interval re-runs to a fenced no-op
        val r2 = graft.ops.ExportOps.exportDelta(corpus, s"$root/exports",
          v0, v1, nShards = 8, capacity = 4096L)
        require(!r2.exported, "re-export of a published interval must no-op")
        require(graft.ops.ExportOps.manifest(s, s"$root/exports")
          .scan().count() == 1L, "manifest must hold exactly one row")
        // read back from the PUBLISHED parquet (not the plan) — the export
        // on disk is what a trainer consumes
        s.read.parquet(r.dir)
          .groupBy(col("shard"), col("bin"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"),
            min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
          .orderBy("shard", "bin")
      },
      Some(DuckExportSql)),

    // The SQL/CALL twin of the SAME incremental export (E187): the corpus
    // delta publishes through `CALL export_delta` — fenced (the re-CALL
    // reports exported=false), tombstones counted in the result row — and
    // the query reads back the PUBLISHED parquet. The oracle IS
    // x1_incremental_export's oracle, so the two surfaces cannot drift.
    Q("cdc_export_sql",
      (s, d) => {
        val docs = Tables.load(s, d, "documents").select("doc_id", "text")
        val cat = s"graft_exp${System.nanoTime()}"
        val w = java.nio.file.Files.createTempDirectory("graft_exp_sql").toString
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
        val corpus = graft.table.TransactionalTable.create(s, s"$w/db/corpus",
          org.apache.spark.sql.types.StructType.fromDDL("doc_id LONG, text STRING"),
          "doc_id", None)
        corpus.append(docs.filter(col("doc_id") % 2 === 0), batchId = 0)
        val v0 = corpus.currentVersion
        corpus.append(docs.filter(col("doc_id") % 2 === 1), batchId = 1)
        s.sql(s"DELETE FROM $cat.db.corpus WHERE doc_id IN (2, 4)")
        val v1 = graft.table.TransactionalTable.open(s, s"$w/db/corpus")
          .currentVersion
        val call = s"CALL $cat.system.export_delta('db.corpus', 'db.exports', " +
          s"$v0, $v1, 8, 4096)"
        val r = s.sql(call).collect()(0)
        require(r.getBoolean(0) && r.getLong(2) == 2L,
          s"first CALL must publish with 2 tombstones: $r")
        val r2 = s.sql(call).collect()(0)
        require(!r2.getBoolean(0), s"re-CALL must be fenced: $r2")
        s.read.parquet(r.getString(3))
          .groupBy(col("shard"), col("bin"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"),
            min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
          .orderBy("shard", "bin")
      },
      Some(DuckExportSql)),

    // Export-lifecycle observability + shard compaction from SQL (E202):
    // two published intervals (evens from a virgin root, then odds + the
    // {2,4} tombstones), status'd via `CALL export_status` (summary totals
    // are ADDITIVE — published docs stay counted after their tombstone;
    // the debt column carries the retractions), then folded via
    // `CALL export_pack` and status'd again: one consolidated interval,
    // zero remaining debt, totals now NET of the tombstoned docs — all
    // recomputable by DuckDB from the fixture's own token counts.
    Q("cdc_export_status_sql",
      (s, d) => {
        val docs = Tables.load(s, d, "documents").select("doc_id", "text")
        val cat = s"graft_exs${System.nanoTime()}"
        val w = java.nio.file.Files.createTempDirectory("graft_exs_sql").toString
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
        val corpus = graft.table.TransactionalTable.create(s, s"$w/db/corpus",
          org.apache.spark.sql.types.StructType.fromDDL("doc_id LONG, text STRING"),
          "doc_id", None)
        corpus.append(docs.filter(col("doc_id") % 2 === 0), batchId = 0)
        val v0 = corpus.currentVersion
        s.sql(s"CALL $cat.system.export_delta('db.corpus', 'db.exports', " +
          s"0, $v0, 8, 4096)").collect()
        corpus.append(docs.filter(col("doc_id") % 2 === 1), batchId = 1)
        s.sql(s"DELETE FROM $cat.db.corpus WHERE doc_id IN (2, 4)")
        val v1 = graft.table.TransactionalTable.open(s, s"$w/db/corpus")
          .currentVersion
        s.sql(s"CALL $cat.system.export_delta('db.corpus', 'db.exports', " +
          s"$v0, $v1, 8, 4096)").collect()
        val pre = s.sql(
          s"CALL $cat.system.export_status('db.exports', 'exs_detail')")
        // detail view: one manifest row per interval, queryable as SQL
        require(s.sql("SELECT COUNT(*) FROM exs_detail").collect()(0)
          .getLong(0) == 2L, "detail view must carry both intervals")
        val preRow = pre.collect()(0)
        // pack, then the post-pack status is the oracled output
        val pk = s.sql(s"CALL $cat.system.export_pack('db.exports')").collect()(0)
        require(pk.getBoolean(0) && pk.getLong(1) == 2L,
          s"pack must fold both intervals: $pk")
        s.sql(s"CALL $cat.system.export_status('db.exports', 'exs_detail2')")
          .select(lit(preRow.getLong(0)).as("pre_intervals"),
            lit(preRow.getLong(3)).as("pre_debt"),
            col("intervals"), col("n_docs"), col("n_tokens"),
            col("tombstone_debt"), col("head_version"))
      },
      Some(s"""WITH toks AS (SELECT doc_id,
             |  CAST(len($DuckToks) AS BIGINT) AS n FROM documents)
             |SELECT CAST(2 AS BIGINT) AS pre_intervals,
             |  CAST(2 AS BIGINT) AS pre_debt,
             |  CAST(1 AS BIGINT) AS intervals,
             |  (SELECT CAST(COUNT(*) - 2 AS BIGINT) FROM documents) AS n_docs,
             |  (SELECT CAST(SUM(n) AS BIGINT) FROM toks WHERE doc_id NOT IN (2, 4)) AS n_tokens,
             |  CAST(0 AS BIGINT) AS tombstone_debt,
             |  CAST(3 AS BIGINT) AS head_version""".stripMargin)),

    // X4: bounded LOG2 histogram (E193) — the fixed-size distribution
    // summary (≤ 64 buckets at any corpus size; bucket = bit-length − 1,
    // integer-exact, no libm), one map-combinable groupBy. Mergeable by
    // summing cnt per bucket.
    Q("x4_length_histogram",
      (s, d) => SketchOps.logHistogram(
        Tables.load(s, d, "documents")
          .select(size(TextOps.tokens(col("text"))).cast("long").as("n")), "n")
        .orderBy("bucket"),
      Some(s"""WITH t AS (SELECT CAST(len($DuckToks) AS BIGINT) AS n FROM documents),
             |h AS (SELECT CAST(length(bin(n)) - 1 AS INT) AS bucket,
             |        CAST(COUNT(*) AS BIGINT) AS cnt
             |      FROM t WHERE n >= 1 GROUP BY 1)
             |SELECT bucket, CAST(CAST(1 AS BIGINT) << bucket AS BIGINT) AS lo, cnt,
             |  CAST(SUM(cnt) OVER (ORDER BY bucket
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
             |FROM h ORDER BY bucket""".stripMargin)),

    // X4: histogram QUANTILES (E193) — p50/p90/p99 as the lower bound of
    // the first bucket whose cumulative reaches p% of the total; the
    // crossing rule is the integer comparison cum·100 >= p·total, so any
    // engine replays the same bucket choice.
    Q("x4_length_quantiles",
      (s, d) => {
        val hist = SketchOps.logHistogram(
          Tables.load(s, d, "documents")
            .select(size(TextOps.tokens(col("text"))).cast("long").as("n")), "n")
        SketchOps.histQuantiles(hist, Seq(50, 90, 99)).orderBy("p")
      },
      Some(s"""WITH t AS (SELECT CAST(len($DuckToks) AS BIGINT) AS n FROM documents),
             |h AS (SELECT CAST(length(bin(n)) - 1 AS INT) AS bucket,
             |        CAST(COUNT(*) AS BIGINT) AS cnt
             |      FROM t WHERE n >= 1 GROUP BY 1),
             |ch AS (SELECT bucket, CAST(CAST(1 AS BIGINT) << bucket AS BIGINT) AS lo,
             |         CAST(SUM(cnt) OVER (ORDER BY bucket
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
             |       FROM h),
             |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot FROM h),
             |ps AS (SELECT CAST(unnest([50, 90, 99]) AS INT) AS p)
             |SELECT p, est FROM (
             |  SELECT ps.p, ch.lo AS est,
             |    row_number() OVER (PARTITION BY ps.p ORDER BY ch.bucket) AS rk
             |  FROM ps, ch, tot WHERE ch.cum * 100 >= ps.p * tot.tot) z
             |WHERE rk = 1 ORDER BY p""".stripMargin)),

    // Benchmark decontamination: 3-gram containment of each "benchmark" doc
    // (doc_id < 20 stands in for the eval set) inside each corpus doc —
    // catches eval leakage that Jaccard misses (long doc ⊇ short benchmark).
    // Benchmark shingles broadcast; corpus scanned once.
    Q("x2_contamination",
      (s, d) => {
        val docs = Tables.load(s, d, "documents")
        DedupOps.containmentPairs(
          corpus = docs.filter(col("doc_id") >= 20),
          benchmark = docs.filter(col("doc_id") < 20),
          threshold = 0.5)
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS w
             |  FROM documents),
             |sh AS (SELECT DISTINCT doc_id,
             |         unnest(list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
             |       FROM toks WHERE len(w) >= 3),
             |bench AS (SELECT doc_id AS bench_id, s FROM sh WHERE doc_id < 20),
             |corp AS (SELECT doc_id, s FROM sh WHERE doc_id >= 20),
             |bsz AS (SELECT bench_id, CAST(COUNT(*) AS BIGINT) AS bn FROM bench GROUP BY 1),
             |inter AS (SELECT c.doc_id, b.bench_id, CAST(COUNT(*) AS BIGINT) AS n_common
             |          FROM corp c JOIN bench b USING (s) GROUP BY 1, 2)
             |SELECT i.doc_id, i.bench_id, i.n_common,
             |  CAST(i.n_common AS DOUBLE) / CAST(b.bn AS DOUBLE) AS containment
             |FROM inter i JOIN bsz b USING (bench_id)
             |WHERE CAST(i.n_common AS DOUBLE) / CAST(b.bn AS DOUBLE) >= 0.5""".stripMargin),
      headline = true),

    // Repetition ratio (quality signal: boilerplate/spam has a dominant
    // term): max term count / total tokens per doc. Two hash aggs, exact
    // integer counts, one final exact-int division to double.
    Q("x4_repetition_ratio",
      (s, d) => {
        val tf = Tables.load(s, d, "documents")
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))
        tf.groupBy("doc_id")
          .agg(max(col("cnt")).as("max_term_count"),
            sum(col("cnt")).as("n_tokens"),
            count(lit(1)).as("n_distinct_terms"))
          .select(col("doc_id"), col("max_term_count"), col("n_tokens"),
            col("n_distinct_terms"),
            (col("max_term_count").cast("double") / col("n_tokens").cast("double"))
              .as("repetition_ratio"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tf AS (
             |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
             |    SELECT doc_id, unnest($DuckToks) AS term FROM documents) t
             |  GROUP BY 1, 2)
             |SELECT doc_id, max(cnt) AS max_term_count,
             |  CAST(SUM(cnt) AS BIGINT) AS n_tokens,
             |  CAST(COUNT(*) AS BIGINT) AS n_distinct_terms,
             |  CAST(max(cnt) AS DOUBLE) / CAST(CAST(SUM(cnt) AS BIGINT) AS DOUBLE) AS repetition_ratio
             |FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Near-dup CLUSTERING: jaccard pairs at 0.5 → connected components →
    // every clustered doc labeled with its component's min doc id (the
    // "keep one canonical doc per duplicate group" step; pairwise dropping
    // over-deletes on chains). Spark: iterative min-label propagation;
    // oracle: DuckDB recursive CTE computing the same closure.
    Q("x1_dedup_clusters",
      (s, d) => DedupOps.dedupClusters(
        // maxDocFreq=None: exact-parity twin of the DuckDB recursive-CTE
        // closure below (uncapped); production clustering inherits the capped
        // default via jaccardPairs.
        DedupOps.jaccardPairs(Tables.load(s, d, "documents"), threshold = 0.5,
            maxDocFreq = None)
          .select(col("doc_a"), col("doc_b"))),
      Some(s"""$DuckClosureCte
             |SELECT doc_id, canonical_id FROM comp ORDER BY doc_id""".stripMargin)),

    // Quality-aware dedup representative selection: near-dup clusters keep
    // their HIGHEST-QUALITY member (classifier logit, doc_id tie-break) —
    // the curation decision real pipelines make instead of min-id. Composes
    // three oracled operators (jaccard pairs → connected components →
    // classifier); ranking is one window over cluster members only.
    Q("x1_dedup_keep_best",
      (s, d) => {
        val docs = Tables.load(s, d, "documents")
        val clusters = DedupOps.dedupClusters(
          DedupOps.jaccardPairs(docs, threshold = 0.5, maxDocFreq = None)
            .select(col("doc_a"), col("doc_b")))
        // score ONLY cluster members: the per-term hashing fold is the
        // query's dominant map cost, and cluster members are a small
        // fraction of the corpus — classifying everything then discarding
        // ~90% in the join would waste the fold
        val scored = TextOps.qualityClassify(
            clusters.select("doc_id").join(docs, Seq("doc_id")))
          .select(col("doc_id"), col("logit"))
        val w = Window.partitionBy(col("canonical_id"))
          .orderBy(desc("logit"), col("doc_id"))
        clusters.join(scored, Seq("doc_id"))
          .withColumn("kept", row_number().over(w) === 1)
          .select("doc_id", "canonical_id", "logit", "kept")
          .orderBy("doc_id")
      },
      Some(s"""$DuckClosureCte,
             |tm AS (SELECT t.doc_id, unnest(t.w) AS term
             |       FROM toks t JOIN comp USING (doc_id)),
             |tc AS (SELECT doc_id, term, count(*) AS tf FROM tm GROUP BY 1, 2),
             |q AS (SELECT doc_id,
             |        SUM((CAST(concat('0x', substring(md5(term), 1, 15)) AS BIGINT) % 1001 - 500) * tf) AS wsum,
             |        CAST(SUM(tf) AS BIGINT) AS n
             |      FROM tc GROUP BY doc_id),
             |lg AS (SELECT doc_id,
             |         CASE WHEN n = 0 THEN 0.0 ELSE CAST(wsum AS DOUBLE) / (n * 500.0) END AS logit
             |       FROM q)
             |SELECT c.doc_id, c.canonical_id, lg.logit,
             |  (row_number() OVER (PARTITION BY c.canonical_id ORDER BY lg.logit DESC, c.doc_id) = 1) AS kept
             |FROM comp c JOIN lg USING (doc_id)
             |ORDER BY c.doc_id""".stripMargin),
      // headline: the r13 verdict asks 30x coverage for keep-best dedup
      headline = true),

    // INCREMENTAL keep-best dedup over the persistent index (E203 — the
    // index-posture twin of x1_dedup_keep_best's per-run closure, which is
    // the steepest scaling curve in the bench artifact): the index keeps
    // ONE BEST representative per near-dup neighborhood; each batch pays
    // O(batch bands ⋈ index) and a better batch doc EVICTS its indexed
    // rival in the same fenced commit (the retraction the downstream
    // corpus consumes). Evens seed batch 0 (self-deduped by quality);
    // odds arrive as batch 1 — worse odds drop, better odds evict. Output:
    // batch-1 kept ids + the evicted ids, both read back from committed
    // rows. DuckDB replays banding, the md5 logit, both better-of rules,
    // and the eviction set bit-for-bit.
    Q("x1_keep_best_index",
      (s, d) => {
        val docs = Tables.load(s, d, "documents").select("doc_id", "text")
        val root = java.nio.file.Files.createTempDirectory("graft_kbi").toString + "/idx"
        val index = graft.ops.KeepBestIndex.create(s, root)
        graft.ops.KeepBestIndex.appendBatch(index,
          docs.filter(col("doc_id") % 2 === 0), batchId = 0)
        val r = graft.ops.KeepBestIndex.appendBatch(index,
          docs.filter(col("doc_id") % 2 === 1), batchId = 1, compactEvery = 1)
        r.kept.select(col("doc_id"), lit("kept").as("status"))
          .unionByName(r.evicted.select(col("doc_id"), lit("evicted").as("status")))
          .orderBy("status", "doc_id")
      },
      Some(s"""$DuckKeepBestCtes
             |SELECT doc_id, status FROM (
             |  SELECT doc_id, 'kept' AS status FROM kept
             |  UNION ALL SELECT doc_id, 'evicted' FROM evict
             |) ORDER BY status, doc_id""".stripMargin),
      // headline: the index-posture replacement for the closure's scaling.
      // streaming tier like its x2_dedup_index/x3_ann_index siblings: a
      // multi-commit fenced INDEX BUILD (2 ingest epochs + compaction +
      // read-backs) is a pipeline, not a query — health is judged by
      // per-batch wall time (BatchStats `keep_best_index_batch`) and the
      // scaled tiers' factors, not a single-query DuckDB ratio
      headline = true, streaming = true),

    // X1: DELETE maintenance on the keep-best index (r19 — the takedown
    // path): evens index as batch 0, a takedown epoch removes every
    // doc_id % 10 == 0 representative, odds arrive against the
    // POST-DELETE index as batch 2. An odd doc previously beaten by (or
    // evicting) a removed representative is re-judged against the
    // survivors only — kept AND evicted sets both shift, and both are
    // oracled via the shared replay restricted to delete survivors.
    Q("x1_keep_best_delete",
      (s, d) => {
        val docs = Tables.load(s, d, "documents").select("doc_id", "text")
        val root = java.nio.file.Files.createTempDirectory("graft_kbd").toString + "/idx"
        val index = graft.ops.KeepBestIndex.create(s, root)
        graft.ops.KeepBestIndex.appendBatch(index,
          docs.filter(col("doc_id") % 2 === 0), batchId = 0)
        graft.ops.KeepBestIndex.deleteBatch(index,
          docs.filter(col("doc_id") % 10 === 0).select("doc_id"), batchId = 1)
        val r = graft.ops.KeepBestIndex.appendBatch(index,
          docs.filter(col("doc_id") % 2 === 1), batchId = 2)
        r.kept.select(col("doc_id"), lit("kept").as("status"))
          .unionByName(r.evicted.select(col("doc_id"), lit("evicted").as("status")))
          .orderBy("status", "doc_id")
      },
      Some(s"""${duckKeepBestCtes("WHERE doc_id % 10 <> 0")}
             |SELECT doc_id, status FROM (
             |  SELECT doc_id, 'kept' AS status FROM kept
             |  UNION ALL SELECT doc_id, 'evicted' FROM evict
             |) ORDER BY status, doc_id""".stripMargin),
      streaming = true),

    // The SQL/CALL twin of the SAME keep-best flow (the new index family
    // must be reachable from SQL like its four siblings): created and
    // appended through `CALL keep_best_index_create/append`, the kept AND
    // evicted sets consumed from the registered views. The oracle shares
    // x1_keep_best_index's CTEs, so the two surfaces cannot drift.
    Q("cdc_keep_best_sql",
      (s, d) => {
        val docs = Tables.load(s, d, "documents").select("doc_id", "text")
        val cat = s"graft_kbs${System.nanoTime()}"
        val w = java.nio.file.Files.createTempDirectory("graft_kbs_sql").toString
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
        docs.filter(col("doc_id") % 2 === 0).createOrReplaceTempView("kbs_b0")
        docs.filter(col("doc_id") % 2 === 1).createOrReplaceTempView("kbs_b1")
        s.sql(s"CALL $cat.system.keep_best_index_create('db.kb')").collect()
        s.sql(s"CALL $cat.system.keep_best_index_append('db.kb', 'kbs_b0', 0, " +
          "'kbs_k0', 'kbs_e0')").collect()
        s.sql(s"CALL $cat.system.keep_best_index_append('db.kb', 'kbs_b1', 1, " +
          "'kbs_k1', 'kbs_e1')").collect()
        s.sql("""SELECT doc_id, status FROM (
                |  SELECT doc_id, 'kept' AS status FROM kbs_k1
                |  UNION ALL SELECT doc_id, 'evicted' FROM kbs_e1
                |) ORDER BY status, doc_id""".stripMargin)
      },
      Some(s"""$DuckKeepBestCtes
             |SELECT doc_id, status FROM (
             |  SELECT doc_id, 'kept' AS status FROM kept
             |  UNION ALL SELECT doc_id, 'evicted' FROM evict
             |) ORDER BY status, doc_id""".stripMargin)),

    // STREAMING keep-best corpus build (E204): the eviction-consuming twin
    // of cdc_corpus_stream — per micro-batch, the keep-best index decides
    // kept AND evicted, and ONE fenced corpus merge upserts the kept rows
    // while DELETING the evicted docs: the corpus always holds exactly the
    // index's live representatives, replay-safe (both read-backs are
    // batch-stamped). Evens stream as epoch 0, odds as epoch 1 across a
    // restart; the end state = batch-0 kept − evicted + batch-1 kept,
    // which the shared keep-best CTEs state directly.
    Q("cdc_keepbest_stream",
      (s, d) => {
        val docs = Tables.load(s, d, "documents").select("doc_id", "text")
        val work = java.nio.file.Files.createTempDirectory("graft_kb_stream").toString
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$work/in"))
        val index = graft.ops.KeepBestIndex.create(s, s"$work/idx")
        val corpus = graft.table.TransactionalTable.create(s, s"$work/corpus",
          org.apache.spark.sql.types.StructType.fromDDL("doc_id LONG, text STRING"),
          "doc_id", None)
        def drop(b: Int): Unit = {
          val stage = s"$work/stage$b"
          docs.filter(col("doc_id") % 2 === b).coalesce(1).write.json(stage)
          val part = graft.util.Fs.listSeq(java.nio.file.Paths.get(stage))
            .find(_.getFileName.toString.startsWith("part-")).get
          java.nio.file.Files.move(part, java.nio.file.Paths.get(s"$work/in/b$b.json"))
        }
        def runOnce(): Unit = {
          val q = graft.stream.CorpusPipeline.runKeepBest(s, s"$work/in",
            s"$work/ckpt", index, corpus, lit(true),
            schemaDdl = "doc_id LONG, text STRING")
          q.awaitTermination()
        }
        drop(0); runOnce() // epoch 0: evens
        drop(1); runOnce() // restart boundary; epoch 1: odds evict rivals
        corpus.scan().select("doc_id").orderBy("doc_id")
      },
      Some(s"""$DuckKeepBestCtes
             |SELECT doc_id FROM (
             |  SELECT doc_id FROM e_kept_ids WHERE doc_id NOT IN (SELECT doc_id FROM evict)
             |  UNION SELECT doc_id FROM kept
             |) ORDER BY doc_id""".stripMargin),
      streaming = true),

    // K-means assignment step: nearest (max-cosine) of k=8 fixed centroids
    // (the 8 lowest-vec_id embeddings — deterministic seeding, same rule as
    // IVF's hash-stride sampling degenerates to on this fixture). One corpus
    // scan against k broadcast rows; ties break to the lowest centroid id.
    Q("x3_kmeans_assign",
      (s, d) => {
        val e = Tables.load(s, d, "embeddings")
          .select(col("vec_id"), SimilarityOps.asDouble(col("embedding")).as("v"))
        val cents = e.orderBy("vec_id").limit(8)
          .select(col("vec_id").as("cid"), col("v").as("cv"))
        val w = Window.partitionBy(col("vec_id")).orderBy(desc("cos"), col("cid"))
        e.crossJoin(broadcast(cents))
          .withColumn("cos", SimilarityOps.cosine(col("v"), col("cv")))
          .withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
          .select(col("vec_id"), col("cid"))
          .orderBy("vec_id")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |c AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 8),
             |p AS (SELECT e.vec_id, c.cid,
             |        list_dot_product(e.v, c.cv) /
             |        (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS cos
             |      FROM e, c)
             |SELECT vec_id, cid FROM (
             |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rnk
             |  FROM p) t
             |WHERE rnk = 1 ORDER BY vec_id""".stripMargin)),

    // PRODUCT QUANTIZATION + ADC search (E185): vectors compress to m=4
    // per-subspace codes (k=8 codes each — deterministic seed codebooks, the
    // x3_kmeans_assign rule per subspace) and the top-k runs ENTIRELY in the
    // compressed domain: per query one m×k lookup table, per candidate m
    // table lookups — O(N·m), raw vectors never read. The oracle replays
    // training, encoding (argmax 2·dot−‖c‖², ties → lowest code), and every
    // ADC score bit-for-bit (left-associated subspace sum on both sides).
    Q("x3_pq_adc",
      (s, d) => {
        val e = Tables.load(s, d, "embeddings")
        val books = graft.ops.PqOps.codebooks(e, m = 4, k = 8)
        val enc = graft.ops.PqOps.encode(e, books)
        graft.ops.PqOps.adcTopK(e.filter(col("vec_id") < 8), enc, books, k = 5)
          .orderBy("qid", "rnk")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |sd AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS c, v
             |       FROM e ORDER BY vec_id LIMIT 8),
             |bk AS (SELECT CAST(r.s AS INT) AS s, sd.c,
             |         list_slice(sd.v, CAST(r.s * 16 + 1 AS INT), CAST((r.s + 1) * 16 AS INT)) AS cv
             |       FROM sd, range(4) r(s)),
             |sc AS (SELECT e.vec_id, bk.s, bk.c,
             |         2.0 * list_dot_product(list_slice(e.v, bk.s * 16 + 1, (bk.s + 1) * 16), bk.cv)
             |           - list_dot_product(bk.cv, bk.cv) AS score
             |       FROM e, bk),
             |cd AS (SELECT vec_id, s, c FROM (
             |         SELECT vec_id, s, c,
             |           row_number() OVER (PARTITION BY vec_id, s ORDER BY score DESC, c) AS rk
             |         FROM sc) t WHERE rk = 1),
             |qt AS (SELECT q.vec_id AS qid, bk.s, bk.c,
             |         list_dot_product(list_slice(q.v, bk.s * 16 + 1, (bk.s + 1) * 16), bk.cv) AS t
             |       FROM e q, bk WHERE q.vec_id < 8),
             |sc2 AS (SELECT cd.vec_id AS neighbor_id, qt.qid, qt.s, qt.t
             |        FROM cd JOIN qt ON qt.s = cd.s AND qt.c = cd.c),
             |adc AS (SELECT qid, neighbor_id,
             |          MAX(CASE WHEN s = 0 THEN t END) + MAX(CASE WHEN s = 1 THEN t END)
             |          + MAX(CASE WHEN s = 2 THEN t END) + MAX(CASE WHEN s = 3 THEN t END) AS adc
             |        FROM sc2 GROUP BY qid, neighbor_id)
             |SELECT qid, neighbor_id, adc, CAST(rnk AS INT) AS rnk FROM (
             |  SELECT qid, neighbor_id, adc,
             |    row_number() OVER (PARTITION BY qid ORDER BY adc DESC, neighbor_id) AS rnk
             |  FROM adc) z
             |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin)),

    // SemDeDup (Abbas et al. 2023): semantic near-dup pruning — cluster to
    // 8 deterministic cells, pairwise cosine WITHIN cells only (work is
    // Σ|cell|², never corpus²; cell count is the 100 TB knob), drop any
    // vector with a smaller-id neighbor above 0.4. Oracle replays the
    // identical assignment + within-cell pair algebra.
    Q("x3_semdedup",
      (s, d) => SimilarityOps.semDedup(
        Tables.load(s, d, "embeddings"), threshold = 0.4, cells = 8),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |c AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 8),
             |p AS (SELECT e.vec_id, c.cid,
             |        list_dot_product(e.v, c.cv) /
             |        (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS cos
             |      FROM e, c),
             |asg AS (SELECT vec_id, cid FROM (
             |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rnk
             |  FROM p) t WHERE rnk = 1),
             |av AS (SELECT a.vec_id, a.cid, e.v FROM asg a JOIN e ON e.vec_id = a.vec_id),
             |drops AS (SELECT DISTINCT b.vec_id
             |  FROM av a JOIN av b ON a.cid = b.cid AND a.vec_id < b.vec_id
             |  WHERE list_dot_product(a.v, b.v) /
             |        (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) > 0.4)
             |SELECT av.vec_id, av.cid, (d.vec_id IS NULL) AS kept
             |FROM av LEFT JOIN drops d ON av.vec_id = d.vec_id
             |ORDER BY av.vec_id""".stripMargin)),

    // X1: epoch-weighted UPSAMPLING — the repeat-at-read half of data
    // mixing ("3.5 epochs of wiki"): floor(f) full copies per doc plus a
    // deterministic md5-gated fractional copy; map-only explode, zero
    // shuffles. Binary-exact factors keep frac arithmetic bit-equal.
    Q("x1_upsample_epochs",
      (s, d) => DedupOps.upsampleEpochs(Tables.load(s, d, "documents"),
          epochs = Seq("src0" -> 2.5, "src1" -> 0.25, "src2" -> 0.0))
        .orderBy("doc_id", "epoch"),
      Some(DuckUpsampleSql)),

    // The CALL twin of x1_upsample_epochs (r16 verdict #6: SQL/CALL twins
    // for the sampling family) — same epochs spec through
    // `CALL graft.system.upsample_epochs`, same shared oracle, zero drift.
    Q("cdc_upsample_sql",
      (s, d) => {
        val cat = s"graft_smu${System.nanoTime()}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          java.nio.file.Files.createTempDirectory("graft_smu_sql").toString)
        Tables.load(s, d, "documents").createOrReplaceTempView("smu_docs")
        s.sql(s"CALL $cat.system.upsample_epochs('smu_docs', 'src0:2.5,src1:0.25,src2:0.0', 'source', 'doc_id', 'smu_epochs')").collect()
        s.sql("SELECT doc_id, source, epoch FROM smu_epochs ORDER BY doc_id, epoch")
      },
      Some(DuckUpsampleSql)),

    // X4: CCNet head/middle/tail quality sharding — per-language tertile
    // cutoffs (explicit percentile_disc rule over a deterministic hash
    // sample; rate 1.0 here) on the oracle-exact bigram-rarity score, then
    // a broadcast map-only bucket assignment.
    // X4: corpus QUALITY-DRIFT score (E221 — the ingest-side drift monitor):
    // PSI between the even-id docs (reference window) and the odd-id docs
    // (current window) over fixed powers-of-two token-length buckets —
    // integer CASE bucketing, Laplace-smoothed exact-integer ratios, ln/sum
    // in IEEE doubles rounded to 6 decimals (the last step absorbs ULP and
    // summation-order divergence between engines; the buckets and counts
    // beneath are exact). The fixture's halves are distribution-identical
    // by construction, so the expected score is ≈ 0 — the oracle proves the
    // arithmetic, the spec proves a planted shift flips the verdict.
    Q("x4_quality_drift",
      (s, d) => {
        val docs = Tables.load(s, d, "documents")
        graft.ops.QualityMonitor.psi(
          graft.ops.QualityMonitor.profile(docs.filter(col("doc_id") % 2 === 0)),
          graft.ops.QualityMonitor.profile(docs.filter(col("doc_id") % 2 === 1)))
          .select(round(col("psi"), 6).as("psi"), col("n_ref"), col("n_cur"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, $DuckToks AS w FROM documents),
             |n AS (SELECT doc_id, CAST(coalesce(len(w), 0) AS BIGINT) AS n FROM toks),
             |b AS (SELECT doc_id,
             |        CASE WHEN n <= 0 THEN 0 WHEN n <= 1 THEN 1 WHEN n <= 3 THEN 2
             |             WHEN n <= 7 THEN 3 WHEN n <= 15 THEN 4 WHEN n <= 31 THEN 5
             |             WHEN n <= 63 THEN 6 WHEN n <= 127 THEN 7 WHEN n <= 255 THEN 8
             |             WHEN n <= 511 THEN 9 ELSE 10 END AS bucket
             |      FROM n),
             |dom AS (SELECT CAST(unnest(range(11)) AS BIGINT) AS bucket),
             |r AS (SELECT bucket, COUNT(*) AS rn FROM b WHERE doc_id % 2 = 0 GROUP BY bucket),
             |c AS (SELECT bucket, COUNT(*) AS cn FROM b WHERE doc_id % 2 = 1 GROUP BY bucket),
             |j AS (SELECT dom.bucket, COALESCE(rn, 0) AS rn, COALESCE(cn, 0) AS cn
             |      FROM dom LEFT JOIN r USING (bucket) LEFT JOIN c USING (bucket)),
             |t AS (SELECT SUM(rn) AS rt, SUM(cn) AS ct FROM j)
             |SELECT round(SUM(
             |         (CAST(cn + 1 AS DOUBLE) / CAST(ct + 11 AS DOUBLE)
             |            - CAST(rn + 1 AS DOUBLE) / CAST(rt + 11 AS DOUBLE))
             |         * (ln(CAST(cn + 1 AS DOUBLE) / CAST(ct + 11 AS DOUBLE))
             |            - ln(CAST(rn + 1 AS DOUBLE) / CAST(rt + 11 AS DOUBLE)))), 6) AS psi,
             |       CAST(MAX(rt) AS BIGINT) AS n_ref, CAST(MAX(ct) AS BIGINT) AS n_cur
             |FROM j, t""".stripMargin)),

    // X4: PER-SOURCE quality drift (r17 review #5 — the corpus-level PSI
    // dilutes one collapsing source under the other sources' volume): the
    // same Laplace/ln arithmetic scored independently per source key, the
    // bucket domain completed per source. Same 6-decimal rounding contract;
    // one row per source.
    Q("x4_quality_drift_by_source",
      (s, d) => {
        val docs = Tables.load(s, d, "documents")
        graft.ops.QualityMonitor.psiBySource(
          graft.ops.QualityMonitor.profileBySource(docs.filter(col("doc_id") % 2 === 0)),
          graft.ops.QualityMonitor.profileBySource(docs.filter(col("doc_id") % 2 === 1)))
          .select(col("source"), round(col("psi"), 6).as("psi"),
            col("n_ref"), col("n_cur"))
          .orderBy("source")
      },
      Some(s"""WITH toks AS (SELECT doc_id, coalesce(source, '') AS source, $DuckToks AS w FROM documents),
             |n AS (SELECT doc_id, source, CAST(coalesce(len(w), 0) AS BIGINT) AS n FROM toks),
             |b AS (SELECT doc_id, source,
             |        CASE WHEN n <= 0 THEN 0 WHEN n <= 1 THEN 1 WHEN n <= 3 THEN 2
             |             WHEN n <= 7 THEN 3 WHEN n <= 15 THEN 4 WHEN n <= 31 THEN 5
             |             WHEN n <= 63 THEN 6 WHEN n <= 127 THEN 7 WHEN n <= 255 THEN 8
             |             WHEN n <= 511 THEN 9 ELSE 10 END AS bucket
             |      FROM n),
             |dom AS (SELECT source, CAST(unnest(range(11)) AS BIGINT) AS bucket
             |        FROM (SELECT DISTINCT coalesce(source, '') AS source FROM documents)),
             |r AS (SELECT source, bucket, COUNT(*) AS rn FROM b WHERE doc_id % 2 = 0 GROUP BY 1, 2),
             |c AS (SELECT source, bucket, COUNT(*) AS cn FROM b WHERE doc_id % 2 = 1 GROUP BY 1, 2),
             |j AS (SELECT dom.source, dom.bucket, COALESCE(rn, 0) AS rn, COALESCE(cn, 0) AS cn
             |      FROM dom LEFT JOIN r USING (source, bucket) LEFT JOIN c USING (source, bucket)),
             |t AS (SELECT source, SUM(rn) AS rt, SUM(cn) AS ct FROM j GROUP BY source)
             |SELECT j.source, round(SUM(
             |         (CAST(cn + 1 AS DOUBLE) / CAST(ct + 11 AS DOUBLE)
             |            - CAST(rn + 1 AS DOUBLE) / CAST(rt + 11 AS DOUBLE))
             |         * (ln(CAST(cn + 1 AS DOUBLE) / CAST(ct + 11 AS DOUBLE))
             |            - ln(CAST(rn + 1 AS DOUBLE) / CAST(rt + 11 AS DOUBLE)))), 6) AS psi,
             |       CAST(MAX(rt) AS BIGINT) AS n_ref, CAST(MAX(ct) AS BIGINT) AS n_cur
             |FROM j JOIN t USING (source) GROUP BY j.source ORDER BY j.source""".stripMargin)),

    // X4: MULTI-SIGNAL per-source drift (r19 — review missing #4: token
    // length was the only profiled dimension, so a source whose length
    // histogram stays flat while its symbol mix collapses — markup
    // regression, encoding corruption — was invisible). The same
    // Laplace/ln PSI scored per (signal, source): the token-length ladder
    // plus the symbol-to-character-ratio elevenths, both integer-exact
    // bucketers, one row per dimension per source at the same 6-decimal
    // contract.
    Q("x4_quality_drift_signals",
      (s, d) => {
        val docs = Tables.load(s, d, "documents")
        graft.ops.QualityMonitor.psiBySignals(
          graft.ops.QualityMonitor.profileSignals(docs.filter(col("doc_id") % 2 === 0)),
          graft.ops.QualityMonitor.profileSignals(docs.filter(col("doc_id") % 2 === 1)))
          .select(col("signal"), col("source"), round(col("psi"), 6).as("psi"),
            col("n_ref"), col("n_cur"))
          .orderBy("signal", "source")
      },
      Some(s"""WITH d0 AS (SELECT doc_id, coalesce(source, '') AS source, text,
             |             coalesce(text, '') AS tc FROM documents),
             |toks AS (SELECT doc_id, source, $DuckToks AS w, tc FROM d0),
             |n AS (SELECT doc_id, source,
             |        CAST(coalesce(len(w), 0) AS BIGINT) AS n,
             |        CAST(len(tc) AS BIGINT) AS nc,
             |        CAST(len(tc) - len(regexp_replace(tc, '[^A-Za-z0-9 \\t\\n]', '', 'g')) AS BIGINT) AS ns
             |      FROM toks),
             |b AS (SELECT doc_id, source, 'tok_len' AS signal,
             |        CASE WHEN n <= 0 THEN 0 WHEN n <= 1 THEN 1 WHEN n <= 3 THEN 2
             |             WHEN n <= 7 THEN 3 WHEN n <= 15 THEN 4 WHEN n <= 31 THEN 5
             |             WHEN n <= 63 THEN 6 WHEN n <= 127 THEN 7 WHEN n <= 255 THEN 8
             |             WHEN n <= 511 THEN 9 ELSE 10 END AS bucket
             |      FROM n
             |      UNION ALL
             |      SELECT doc_id, source, 'sym_ratio',
             |        LEAST(ns * 10 // GREATEST(nc, 1), 10)
             |      FROM n),
             |dom AS (SELECT signal, source, CAST(unnest(range(11)) AS BIGINT) AS bucket
             |        FROM (SELECT DISTINCT signal, source FROM b)),
             |r AS (SELECT signal, source, bucket, COUNT(*) AS rn FROM b
             |      WHERE doc_id % 2 = 0 GROUP BY 1, 2, 3),
             |c AS (SELECT signal, source, bucket, COUNT(*) AS cn FROM b
             |      WHERE doc_id % 2 = 1 GROUP BY 1, 2, 3),
             |j AS (SELECT dom.signal, dom.source, dom.bucket,
             |        COALESCE(rn, 0) AS rn, COALESCE(cn, 0) AS cn
             |      FROM dom LEFT JOIN r USING (signal, source, bucket)
             |               LEFT JOIN c USING (signal, source, bucket)),
             |t AS (SELECT signal, source, SUM(rn) AS rt, SUM(cn) AS ct
             |      FROM j GROUP BY signal, source)
             |SELECT j.signal, j.source, round(SUM(
             |         (CAST(cn + 1 AS DOUBLE) / CAST(ct + 11 AS DOUBLE)
             |            - CAST(rn + 1 AS DOUBLE) / CAST(rt + 11 AS DOUBLE))
             |         * (ln(CAST(cn + 1 AS DOUBLE) / CAST(ct + 11 AS DOUBLE))
             |            - ln(CAST(rn + 1 AS DOUBLE) / CAST(rt + 11 AS DOUBLE)))), 6) AS psi,
             |       CAST(MAX(rt) AS BIGINT) AS n_ref, CAST(MAX(ct) AS BIGINT) AS n_cur
             |FROM j JOIN t USING (signal, source) GROUP BY j.signal, j.source
             |ORDER BY j.signal, j.source""".stripMargin)),

    Q("x4_quality_buckets",
      (s, d) => TextOps.qualityBuckets(Tables.load(s, d, "documents"),
          buckets = 3, sampleRate = 1.0)
        .orderBy("doc_id"),
      Some(s"""WITH toks AS (SELECT doc_id, $DuckToks AS w FROM documents),
             |bi AS (SELECT DISTINCT doc_id,
             |         unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bigram
             |       FROM toks WHERE len(w) >= 2),
             |dfq AS (SELECT bigram, COUNT(*) AS df FROM bi GROUP BY 1),
             |sc AS (SELECT b.doc_id, COUNT(*) AS n_bigrams,
             |         CAST(SUM(CASE WHEN dfq.df <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
             |         CAST(SUM(CASE WHEN dfq.df <= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS rarity
             |       FROM bi b JOIN dfq USING (bigram) GROUP BY b.doc_id),
             |wl AS (SELECT sc.*, d.lang FROM sc JOIN documents d USING (doc_id)),
             |rk AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY rarity, doc_id) AS rn,
             |         COUNT(*) OVER (PARTITION BY lang) AS n FROM wl),
             |cut AS (SELECT DISTINCT lang, rn, rarity AS c
             |        FROM rk CROSS JOIN (SELECT unnest([1, 2]) AS k) ks
             |        WHERE rn = (k * n + 2) // 3),
             |cuts AS (SELECT lang, list_sort(list(c)) AS cs FROM cut GROUP BY lang)
             |SELECT w.doc_id, w.lang, w.n_bigrams, w.n_rare, w.rarity,
             |  CAST(1 + len(list_filter(cs, x -> w.rarity > x)) AS BIGINT) AS bucket
             |FROM wl w JOIN cuts USING (lang) ORDER BY w.doc_id""".stripMargin)),

    // CAPSTONE: the full corpus-build dataflow as ONE composed query —
    // exact content dedup → funnel cleaning rules → per-lang quality
    // tertiles (tail shard drops) → deterministic 50% mixture gate. Every
    // stage is an individually-oracled operator; the composition proves
    // they chain (stage order matters: tertile cutoffs are computed on the
    // CLEANED corpus, as a real pipeline would). All map-only or
    // thin-exchange shapes — the whole build is one Catalyst plan.
    Q("x4_corpus_build",
      (s, d) => {
        val docs = Tables.load(s, d, "documents")
        // 1. exact dedup: keep the lowest doc_id per identical text — ONE
        // window exchange on the content hash (a groupBy+semi-join pays two
        // exchanges and a join for the same answer)
        val wDedup = Window.partitionBy(col("_h")).orderBy(col("doc_id"))
        val deduped = docs.withColumn("_h", TextOps.md5Hash60(col("text")))
          .withColumn("_rn", row_number().over(wDedup))
          .filter(col("_rn") === 1).drop("_h", "_rn")
        // 2. funnel (FunnelRules — the same predicates x4_filter_funnel
        // labels with; one source of truth for the thresholds)
        val cleaned = deduped.filter(FunnelRules.keep)
        // 3. per-lang tertiles on the cleaned corpus; the tail shard drops.
        // `source` rides the bucket op's own lang join (carry) — no
        // re-join of the corpus for stage 4's output columns.
        val bucketed = TextOps.qualityBuckets(cleaned, buckets = 3,
            carry = Seq("source"))
          .filter(col("bucket") <= 2L)
        // 4. deterministic 50% mixture gate. No final ORDER BY on either
        // side: the gate value-sorts rows before hashing, and a global sort
        // of the output is pure presentation (a range exchange + sampling
        // job the 100 TB pipeline would never run).
        bucketed
          .filter(TextOps.md5Hash60(col("doc_id")).cast("double") <
            lit(0.5 * (1L << 60).toDouble))
          .select("doc_id", "lang", "source", "bucket")
      },
      Some(s"""WITH t0 AS (SELECT doc_id, text, lang, source, $DuckToks AS w FROM documents),
             |k1 AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
             |dd AS (SELECT t0.* FROM t0 JOIN k1 USING (doc_id)),
             |st AS (SELECT doc_id, len(w) AS n,
             |         coalesce(list_sum(list_transform(w, x -> len(x))), 0) AS chars
             |       FROM dd),
             |tm AS (SELECT doc_id, unnest(w) AS term FROM dd),
             |tc AS (SELECT doc_id, term, count(*) AS tf FROM tm GROUP BY 1, 2),
             |cls AS (SELECT doc_id,
             |          SUM((CAST(concat('0x', substring(md5(term), 1, 15)) AS BIGINT) % ${FunnelRules.ClassifierMod} - ${FunnelRules.ClassifierShift}) * tf) AS wsum
             |        FROM tc GROUP BY doc_id),
             |cln AS (SELECT dd.doc_id, dd.lang, dd.source, dd.w
             |        FROM dd JOIN st USING (doc_id) LEFT JOIN cls USING (doc_id)
             |        WHERE st.n >= ${FunnelRules.MinTokens} AND st.n <= ${FunnelRules.MaxTokens}
             |          AND st.chars >= st.n * ${FunnelRules.MinCharsPerToken} AND st.chars <= st.n * ${FunnelRules.MaxCharsPerToken}
             |          AND coalesce(cls.wsum, 0) >= 0),
             |bi AS (SELECT DISTINCT doc_id,
             |         unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bigram
             |       FROM cln WHERE len(w) >= 2),
             |dfq AS (SELECT bigram, COUNT(*) AS df FROM bi GROUP BY 1),
             |sc AS (SELECT b.doc_id, COUNT(*) AS n_bigrams,
             |         CAST(SUM(CASE WHEN dfq.df <= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS rarity
             |       FROM bi b JOIN dfq USING (bigram) GROUP BY b.doc_id),
             |wl AS (SELECT sc.doc_id, sc.rarity, c.lang, c.source FROM sc JOIN cln c USING (doc_id)),
             |rk AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY rarity, doc_id) AS rn,
             |         COUNT(*) OVER (PARTITION BY lang) AS nn FROM wl),
             |cut AS (SELECT DISTINCT lang, rn, rarity AS cv
             |        FROM rk CROSS JOIN (SELECT unnest([1, 2]) AS k) ks
             |        WHERE rn = (k * nn + 2) // 3),
             |cuts AS (SELECT lang, list_sort(list(cv)) AS cs FROM cut GROUP BY lang)
             |SELECT w2.doc_id, w2.lang, w2.source,
             |  CAST(1 + len(list_filter(cs, x -> w2.rarity > x)) AS BIGINT) AS bucket
             |FROM wl w2 JOIN cuts USING (lang)
             |WHERE 1 + len(list_filter(cs, x -> w2.rarity > x)) <= 2
             |  AND CAST(CAST(concat('0x', substring(md5(CAST(w2.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE)
             |      < 0.5 * 1152921504606846976.0""".stripMargin),
      headline = true),

    // STREAMING MEDIA CORPUS BUILD (the multimodal twin of
    // cdc_corpus_stream): an image stream — two base64 JSON-lines drops —
    // drives perceptual-hash dedup against the persistent Hamming index →
    // replay-fenced merges of the KEPT payloads into a binary corpus
    // engine table per micro-batch (MediaPipeline inside foreachBatch;
    // the second drop resumes from the checkpoint). Fixtures are the
    // closed-form 8×8 gradients, so DuckDB replays banding, BOTH batches'
    // dedup rules, and the hashless-kept path exactly: batch 0 seeds two
    // distinct images; batch 1 brings a brightness-shifted re-encode of
    // image 1 (dropped), a 2-bit near-dup (dropped), a fresh image (kept),
    // its in-batch copy (dropped), and a non-image payload (kept).
    Q("cdc_media_stream",
      (s, _) => {
        import java.nio.file.{Files, Paths}
        def img(rowBits: Seq[Int], base: Int, fmt: String): Array[Byte] = {
          val bi = new java.awt.image.BufferedImage(
            8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
          for (r <- 0 until 8) {
            var v = base
            bi.setRGB(0, r, (v << 16) | (v << 8) | v)
            for (c <- 0 until 7) {
              v += (if (((rowBits(r) >> c) & 1) == 1) 10 else -10)
              bi.setRGB(c + 1, r, (v << 16) | (v << 8) | v)
            }
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(bi, fmt, bos)
          bos.toByteArray
        }
        val bitsA = Seq(0x55, 0x2A, 0x55, 0x2A, 0x55, 0x2A, 0x55, 0x2A)
        val bitsC = Seq(0x54, 0x2A, 0x54, 0x2A, 0x55, 0x2A, 0x55, 0x2A)
        val bitsD = bitsA.map(_ ^ 0x7f)
        val bitsE = Seq.fill(8)(0x33)
        val in = Files.createTempDirectory("graft_media_in").toString
        val ckpt = Files.createTempDirectory("graft_media_ckpt").toString
        val index = graft.ops.ImageDedupIndex.create(s,
          Files.createTempDirectory("graft_media_idx").toString + "/idx")
        val corpus = graft.table.TransactionalTable.create(s,
          Files.createTempDirectory("graft_media_tbl").toString + "/corpus",
          org.apache.spark.sql.types.StructType.fromDDL(
            graft.stream.MediaPipeline.CorpusSchemaDdl), "media_id")
        def b64(b: Array[Byte]): String =
          java.util.Base64.getEncoder.encodeToString(b)
        def drop(name: String, rows: Seq[(Long, Array[Byte])]): Unit =
          Files.writeString(Paths.get(in, name), rows.map { case (id, bytes) =>
            s"""{"media_id":$id,"content_b64":"${b64(bytes)}"}"""
          }.mkString("", "\n", "\n"))
        def runOnce(): Unit = {
          val q = graft.stream.MediaPipeline.run(s, in, ckpt, index, corpus)
          q.awaitTermination()
        }
        drop("b0.json", Seq(
          (1L, img(bitsA, 100, "png")), (4L, img(bitsD, 100, "png"))))
        runOnce()
        drop("b1.json", Seq(
          (11L, img(bitsA, 140, "bmp")),
          (13L, img(bitsC, 100, "png")),
          (15L, img(bitsE, 100, "png")),
          (16L, img(bitsE, 120, "png")),
          (17L, "not an image".getBytes)))
        runOnce()
        // end state + payload-intactness proof: the STORED binaries must
        // reproduce their closed-form hashes after the base64 → stream →
        // fenced-merge round trip (engine-side assert; the oracle checks
        // the kept-id set, which the dedup rules derive from these hashes)
        val rehash = graft.ops.MultimodalOps.imageHashes(corpus.scan())
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        require(rehash == Map(1L -> 24019198012642645L,
          4L -> 48038396025285290L, 15L -> 28936514141215155L),
          s"stored payloads must re-hash to the closed-form literals: $rehash")
        corpus.scan().select("media_id").orderBy("media_id")
      },
      Some("""WITH h AS (SELECT * FROM (VALUES
             |    (CAST(1 AS BIGINT), 0, CAST(24019198012642645 AS BIGINT)),
             |    (4, 0, 48038396025285290),
             |    (11, 1, 24019198012642645),
             |    (13, 1, 24019198012626260),
             |    (15, 1, 28936514141215155),
             |    (16, 1, 28936514141215155)) AS t(media_id, batch, phash)),
             |ch AS (SELECT media_id, batch, phash, c AS band,
             |         (phash >> CAST(c * 14 AS INTEGER)) & 16383 AS chunk
             |       FROM h, range(4) r(c)),
             |b0dup AS (SELECT DISTINCT a.media_id FROM ch a JOIN ch b
             |          ON a.batch = 0 AND b.batch = 0 AND a.band = b.band
             |            AND a.chunk = b.chunk AND b.media_id < a.media_id
             |            AND bit_count(xor(a.phash, b.phash)) <= 3),
             |b0k AS (SELECT * FROM ch WHERE batch = 0
             |        AND media_id NOT IN (SELECT media_id FROM b0dup)),
             |cdup AS (SELECT DISTINCT b.media_id FROM ch b JOIN b0k i
             |         ON b.batch = 1 AND b.band = i.band AND b.chunk = i.chunk
             |           AND bit_count(xor(b.phash, i.phash)) <= 3),
             |cand AS (SELECT * FROM ch WHERE batch = 1
             |         AND media_id NOT IN (SELECT media_id FROM cdup)),
             |bdup AS (SELECT DISTINCT a.media_id FROM cand a JOIN cand b
             |         ON a.band = b.band AND a.chunk = b.chunk
             |           AND b.media_id < a.media_id
             |           AND bit_count(xor(a.phash, b.phash)) <= 3)
             |SELECT media_id FROM (
             |  SELECT DISTINCT media_id FROM b0k
             |  UNION ALL SELECT DISTINCT media_id FROM cand
             |    WHERE media_id NOT IN (SELECT media_id FROM bdup)
             |  UNION ALL SELECT CAST(17 AS BIGINT)
             |) ORDER BY media_id""".stripMargin)),

    // STREAMING MEDIA CORPUS BUILD, VIDEO KERNEL: the same MediaPipeline
    // stream bound to the TEMPORAL dedup kernel (VideoDedupIndex — frame-
    // position-keyed banding, clip fraction rule), completing the kernel
    // triad (image/audio/video) on one streaming ingest path. Fixtures are
    // the x5_video_index GIF clips (closed-form per-frame dHashes): batch 0
    // seeds a clip and its inverse; batch 1 (a restart — the second drop
    // resumes from the checkpoint) brings a brightness-shifted 3/3 copy
    // (dropped), a 2/3 partial edit (dropped — the fraction rule across the
    // index boundary), a 1/3-overlap fresh clip (kept), its in-batch copy
    // (dropped), and a non-video payload (kept, frameless). End state =
    // corpus ids; stored GIFs must re-hash to the closed-form frame
    // literals after the base64 → stream → fenced-merge round trip.
    Q("cdc_media_stream_video",
      (s, _) => {
        import java.nio.file.{Files, Paths}
        import graft.ops.ImageCodec
        def frame(rowBits: Seq[Int], base: Int): java.awt.image.BufferedImage = {
          val bi = new java.awt.image.BufferedImage(
            8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
          for (r <- 0 until 8) {
            var v = base
            bi.setRGB(0, r, (v << 16) | (v << 8) | v)
            for (c <- 0 until 7) {
              v += (if (((rowBits(r) >> c) & 1) == 1) 10 else -10)
              bi.setRGB(c + 1, r, (v << 16) | (v << 8) | v)
            }
          }
          bi
        }
        def gif(ps: Seq[Seq[Int]], base: Int): Array[Byte] =
          ImageCodec.writeGifAnimationImages(ps.map(frame(_, base)))
        val bitsP = Seq(0x55, 0x2A, 0x55, 0x2A, 0x55, 0x2A, 0x55, 0x2A)
        val bitsQ = Seq.fill(8)(0x33)
        val bitsR = Seq.fill(8)(0x0F)
        val bitsQ2 = Seq(0x32, 0x33, 0x32) ++ Seq.fill(5)(0x33)
        val bitsT = Seq.fill(8)(0x11)
        val in = Files.createTempDirectory("graft_vmedia_in").toString
        val ckpt = Files.createTempDirectory("graft_vmedia_ckpt").toString
        val index = graft.ops.VideoDedupIndex.create(s,
          Files.createTempDirectory("graft_vmedia_idx").toString + "/idx")
        val corpus = graft.table.TransactionalTable.create(s,
          Files.createTempDirectory("graft_vmedia_tbl").toString + "/corpus",
          org.apache.spark.sql.types.StructType.fromDDL(
            graft.stream.MediaPipeline.CorpusSchemaDdl), "media_id")
        def b64(b: Array[Byte]): String =
          java.util.Base64.getEncoder.encodeToString(b)
        def drop(name: String, rows: Seq[(Long, Array[Byte])]): Unit =
          Files.writeString(Paths.get(in, name), rows.map { case (id, bytes) =>
            s"""{"media_id":$id,"content_b64":"${b64(bytes)}"}"""
          }.mkString("", "\n", "\n"))
        def runOnce(): Unit = {
          val q = graft.stream.MediaPipeline.run(s, in, ckpt, index, corpus,
            kernel = graft.stream.MediaPipeline.VideoKernel)
          q.awaitTermination()
        }
        drop("b0.json", Seq(
          (1L, gif(Seq(bitsP, bitsQ, bitsR), 100)),
          (4L, gif(Seq(bitsP.map(_ ^ 0x7f), bitsQ.map(_ ^ 0x7f),
            bitsR.map(_ ^ 0x7f)), 100))))
        runOnce()
        drop("b1.json", Seq(
          (11L, gif(Seq(bitsP, bitsQ, bitsR), 140)),
          (13L, gif(Seq(bitsP, bitsQ2, bitsT), 100)),
          (15L, gif(Seq(bitsQ, bitsQ, bitsQ), 100)),
          (16L, gif(Seq(bitsQ, bitsQ, bitsQ), 120)),
          (17L, "not a video".getBytes)))
        runOnce()
        // payload-intactness proof: stored GIFs re-decode to the closed-form
        // per-frame hashes (engine-side assert; the oracle derives the
        // kept-id set from these same literals)
        val rehash = graft.ops.MultimodalOps.videoFrameHashes(corpus.scan())
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
        val want = Map(
          (1L, 0L) -> 24019198012642645L, (1L, 1L) -> 28936514141215155L,
          (1L, 2L) -> 8510739453298575L,
          (4L, 0L) -> 48038396025285290L, (4L, 1L) -> 43121079896712780L,
          (4L, 2L) -> 63546854584629360L,
          (15L, 0L) -> 28936514141215155L, (15L, 1L) -> 28936514141215155L,
          (15L, 2L) -> 28936514141215155L)
        require(rehash == want,
          s"stored payloads must re-hash to the closed-form literals: $rehash")
        corpus.scan().select("media_id").orderBy("media_id")
      },
      Some("""WITH h AS (SELECT * FROM (VALUES
             |    (CAST(1 AS BIGINT), 0, CAST(0 AS BIGINT), CAST(24019198012642645 AS BIGINT)),
             |    (1, 0, 1, 28936514141215155), (1, 0, 2, 8510739453298575),
             |    (4, 0, 0, 48038396025285290), (4, 0, 1, 43121079896712780), (4, 0, 2, 63546854584629360),
             |    (11, 1, 0, 24019198012642645), (11, 1, 1, 28936514141215155), (11, 1, 2, 8510739453298575),
             |    (13, 1, 0, 24019198012642645), (13, 1, 1, 28936514141198770), (13, 1, 2, 9645504713738385),
             |    (15, 1, 0, 28936514141215155), (15, 1, 1, 28936514141215155), (15, 1, 2, 28936514141215155),
             |    (16, 1, 0, 28936514141215155), (16, 1, 1, 28936514141215155), (16, 1, 2, 28936514141215155)
             |  ) AS t(media_id, batch, pos, fhash)),
             |cnt AS (SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n FROM h GROUP BY 1),
             |ch AS (SELECT media_id, batch, pos, fhash, c AS band,
             |         (fhash >> CAST(c * 14 AS INTEGER)) & 16383 AS chunk
             |       FROM h, range(4) r(c)),
             |p0 AS (SELECT DISTINCT a.media_id, a.pos, b.media_id AS om
             |       FROM ch a JOIN ch b ON a.batch = 0 AND b.batch = 0
             |         AND a.pos = b.pos AND a.band = b.band AND a.chunk = b.chunk
             |         AND b.media_id < a.media_id
             |         AND bit_count(xor(a.fhash, b.fhash)) <= 3),
             |d0 AS (SELECT z.media_id FROM (
             |         SELECT media_id, om, COUNT(*) AS m FROM p0 GROUP BY 1, 2) z
             |       JOIN cnt ca ON ca.media_id = z.media_id
             |       JOIN cnt cb ON cb.media_id = z.om
             |       WHERE m >= ceil(least(ca.n, cb.n) * 0.5)),
             |k0 AS (SELECT * FROM ch WHERE batch = 0
             |       AND media_id NOT IN (SELECT media_id FROM d0)),
             |p1 AS (SELECT DISTINCT b.media_id, b.pos, i.media_id AS om
             |       FROM ch b JOIN k0 i ON b.batch = 1
             |         AND b.pos = i.pos AND b.band = i.band AND b.chunk = i.chunk
             |         AND bit_count(xor(b.fhash, i.fhash)) <= 3),
             |cd AS (SELECT z.media_id FROM (
             |         SELECT media_id, om, COUNT(*) AS m FROM p1 GROUP BY 1, 2) z
             |       JOIN cnt ca ON ca.media_id = z.media_id
             |       JOIN cnt cb ON cb.media_id = z.om
             |       WHERE m >= ceil(least(ca.n, cb.n) * 0.5)),
             |cand AS (SELECT * FROM ch WHERE batch = 1
             |         AND media_id NOT IN (SELECT media_id FROM cd)),
             |p2 AS (SELECT DISTINCT a.media_id, a.pos, b.media_id AS om
             |       FROM cand a JOIN cand b ON a.pos = b.pos AND a.band = b.band
             |         AND a.chunk = b.chunk AND b.media_id < a.media_id
             |         AND bit_count(xor(a.fhash, b.fhash)) <= 3),
             |bd AS (SELECT z.media_id FROM (
             |         SELECT media_id, om, COUNT(*) AS m FROM p2 GROUP BY 1, 2) z
             |       JOIN cnt ca ON ca.media_id = z.media_id
             |       JOIN cnt cb ON cb.media_id = z.om
             |       WHERE m >= ceil(least(ca.n, cb.n) * 0.5))
             |SELECT media_id FROM (
             |  SELECT DISTINCT media_id FROM k0
             |  UNION ALL SELECT media_id FROM (
             |    SELECT DISTINCT media_id FROM cand
             |    WHERE media_id NOT IN (SELECT media_id FROM bd))
             |  UNION ALL SELECT CAST(17 AS BIGINT)
             |) ORDER BY media_id""".stripMargin)),

    // STREAMING CORPUS BUILD (the production ingest posture): a document
    // stream — fixture documents split into two JSON-lines drops, even ids
    // then odd ids — drives funnel cleaning → persistent-DedupIndex dedup →
    // replay-fenced merges into a corpus ENGINE TABLE per micro-batch
    // (CorpusPipeline inside foreachBatch; the second drop resumes from the
    // checkpoint, so the query itself exercises restart). Every rule is
    // md5-derived, so DuckDB replays funnel thresholds, sketches, banding,
    // and both batch dedup rules bit-for-bit — the streamed end state must
    // equal the batch pipeline over the same documents.
    Q("cdc_corpus_stream",
      (s, d) => {
        import java.nio.file.{Files, Paths}
        val docs = Tables.load(s, d, "documents")
          .select(col("doc_id"), col("text"), col("lang"), col("source"))
        val in = Files.createTempDirectory("graft_corpus_in").toString
        val ckpt = Files.createTempDirectory("graft_corpus_ckpt").toString
        val index = graft.ops.DedupIndex.create(s,
          Files.createTempDirectory("graft_corpus_idx").toString + "/idx")
        val corpus = graft.table.TransactionalTable.create(s,
          Files.createTempDirectory("graft_corpus_tbl").toString + "/corpus",
          org.apache.spark.sql.types.StructType.fromDDL(
            "doc_id LONG, text STRING, lang STRING, source STRING"), "doc_id")
        // one JSON-lines file per micro-batch, written distributed then moved
        def drop(cond: org.apache.spark.sql.Column, name: String): Unit = {
          val stage = Files.createTempDirectory("graft_corpus_stage").toString + "/s"
          docs.filter(cond)
            .select(to_json(struct(col("doc_id"), col("text"), col("lang"),
              col("source"))))
            .coalesce(1).write.text(stage)
          val part = graft.util.Fs.listSeq(Paths.get(stage))
            .find(_.getFileName.toString.startsWith("part-")).get
          Files.move(part, Paths.get(in, name))
        }
        def runOnce(): Unit = {
          val q = graft.stream.CorpusPipeline.run(s, in, ckpt, index, corpus,
            FunnelRules.keep)
          q.awaitTermination()
        }
        drop(col("doc_id") % 2 === 0, "b0.json"); runOnce()
        drop(col("doc_id") % 2 === 1, "b1.json"); runOnce()
        corpus.scan().select("doc_id", "lang", "source").orderBy("doc_id")
      },
      Some(s"""WITH t0 AS (SELECT doc_id, lang, source, $DuckToks AS w FROM documents),
             |st AS (SELECT doc_id, len(w) AS n,
             |         coalesce(list_sum(list_transform(w, x -> len(x))), 0) AS chars
             |       FROM t0),
             |tm AS (SELECT doc_id, unnest(w) AS term FROM t0),
             |tc AS (SELECT doc_id, term, count(*) AS tf FROM tm GROUP BY 1, 2),
             |cls AS (SELECT doc_id,
             |          SUM((CAST(concat('0x', substring(md5(term), 1, 15)) AS BIGINT) % ${FunnelRules.ClassifierMod} - ${FunnelRules.ClassifierShift}) * tf) AS wsum
             |        FROM tc GROUP BY doc_id),
             |cln AS (SELECT t0.doc_id, t0.lang, t0.source, t0.w
             |        FROM t0 JOIN st USING (doc_id) LEFT JOIN cls USING (doc_id)
             |        WHERE st.n >= ${FunnelRules.MinTokens} AND st.n <= ${FunnelRules.MaxTokens}
             |          AND st.chars >= st.n * ${FunnelRules.MinCharsPerToken} AND st.chars <= st.n * ${FunnelRules.MaxCharsPerToken}
             |          AND coalesce(cls.wsum, 0) >= 0),
             |th AS (SELECT doc_id, CAST(concat('0x', substring(md5(t), 1, 15)) AS BIGINT) AS h
             |       FROM (SELECT doc_id, unnest(w) AS t FROM cln) u),
             |bits AS (SELECT doc_id, b, SUM(CASE WHEN (h >> CAST(b AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS s
             |         FROM th, range(60) r(b) GROUP BY doc_id, b),
             |sk AS (SELECT doc_id, CAST(SUM(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) ELSE 0 END) AS BIGINT) AS simhash
             |       FROM bits GROUP BY doc_id),
             |ch AS (SELECT doc_id, c AS band, (simhash >> CAST(c * 15 AS INTEGER)) & 32767 AS chunk
             |       FROM sk, range(4) r(c)),
             |e AS (SELECT * FROM ch WHERE doc_id % 2 = 0),
             |o AS (SELECT * FROM ch WHERE doc_id % 2 = 1),
             |e_dup AS (SELECT DISTINCT a.doc_id FROM e a
             |          JOIN e b ON b.band = a.band AND b.chunk = a.chunk AND b.doc_id < a.doc_id),
             |e_kept AS (SELECT * FROM e WHERE doc_id NOT IN (SELECT doc_id FROM e_dup)),
             |o_cdup AS (SELECT DISTINCT a.doc_id FROM o a
             |           JOIN e_kept i ON i.band = a.band AND i.chunk = a.chunk),
             |cand AS (SELECT * FROM o WHERE doc_id NOT IN (SELECT doc_id FROM o_cdup)),
             |o_bdup AS (SELECT DISTINCT a.doc_id FROM cand a
             |           JOIN cand b ON b.band = a.band AND b.chunk = a.chunk AND b.doc_id < a.doc_id),
             |kept AS (SELECT DISTINCT doc_id FROM e_kept
             |         UNION
             |         SELECT doc_id FROM (SELECT DISTINCT doc_id FROM cand)
             |         WHERE doc_id NOT IN (SELECT doc_id FROM o_bdup))
             |SELECT c.doc_id, c.lang, c.source FROM cln c JOIN kept USING (doc_id)
             |ORDER BY c.doc_id""".stripMargin),
      headline = true, streaming = true),

    // X4: COUNT-MIN SKETCH heavy hitters — the fixed-size frequency summary
    // (depth x width, bounded regardless of corpus) with the one-sided
    // est >= true guarantee; md5-derived buckets so the oracle replays the
    // sketch and every estimate bit-for-bit. Emits the exact top-5 terms
    // with their true occurrence counts and the sketch estimates.
    Q("x4_cms_counts",
      (s, d) => {
        val docs = Tables.load(s, d, "documents")
        val toks = docs.select(explode(TextOps.tokens(col("text"))).as("term"))
        val tf = toks.groupBy("term").agg(count(lit(1)).as("true_cnt"))
        val top5 = tf.orderBy(desc("true_cnt"), col("term")).limit(5)
        val sketch = SketchOps.cmsSketch(docs, "text", depth = 4, width = 64)
        val est = SketchOps.cmsEstimate(sketch, top5.select("term"),
          "term", depth = 4, width = 64)
        top5.join(est, Seq("term")).select("term", "true_cnt", "est")
          .orderBy("term")
      },
      Some(s"""WITH toks AS (SELECT unnest($DuckToks) AS term FROM documents),
             |tf AS (SELECT term, COUNT(*) AS true_cnt FROM toks GROUP BY term),
             |top5 AS (SELECT term, true_cnt FROM tf ORDER BY true_cnt DESC, term LIMIT 5),
             |rs AS (SELECT unnest([0, 1, 2, 3]) AS r),
             |sk AS (SELECT r,
             |         CAST(CAST(concat('0x', substring(md5(CAST(r AS VARCHAR) || ':' || term), 1, 15)) AS BIGINT) % 64 AS BIGINT) AS bucket,
             |         COUNT(*) AS cnt
             |       FROM toks CROSS JOIN rs GROUP BY 1, 2),
             |q AS (SELECT t.term, t.true_cnt, rs.r,
             |        CAST(CAST(concat('0x', substring(md5(CAST(rs.r AS VARCHAR) || ':' || t.term), 1, 15)) AS BIGINT) % 64 AS BIGINT) AS bucket
             |      FROM top5 t CROSS JOIN rs)
             |SELECT q.term, q.true_cnt, MIN(COALESCE(sk.cnt, 0)) AS est
             |FROM q LEFT JOIN sk ON sk.r = q.r AND sk.bucket = q.bucket
             |GROUP BY q.term, q.true_cnt ORDER BY q.term""".stripMargin)),

    // X3: approximate k-NN GRAPH — top-3 within-cell cosine neighbors per
    // vector (graph substrate for component-based semantic dedup / label
    // propagation); same deterministic 8-cell machinery as x3_semdedup, so
    // the oracle replays assignment → within-cell ranking exactly.
    Q("x3_knn_graph",
      (s, d) => SimilarityOps.knnGraph(Tables.load(s, d, "embeddings"),
          k = 3, cells = 8)
        .orderBy("vec_id", "rnk"),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |c AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 8),
             |p AS (SELECT e.vec_id, c.cid,
             |        list_dot_product(e.v, c.cv) /
             |        (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS cos
             |      FROM e, c),
             |asg AS (SELECT vec_id, cid FROM (
             |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rnk
             |  FROM p) t WHERE rnk = 1),
             |av AS (SELECT a.vec_id, a.cid, e.v FROM asg a JOIN e ON e.vec_id = a.vec_id),
             |pr AS (SELECT a.vec_id, b.vec_id AS neighbor_id,
             |         list_dot_product(a.v, b.v) /
             |         (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
             |       FROM av a JOIN av b ON a.cid = b.cid AND a.vec_id <> b.vec_id)
             |SELECT vec_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk FROM (
             |  SELECT vec_id, neighbor_id,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rnk
             |  FROM pr) t
             |WHERE rnk <= 3 ORDER BY vec_id, rnk""".stripMargin)))
}
