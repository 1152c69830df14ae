package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{AnnIndex, DedupOps, MultimodalOps, SequenceOps, SimilarityOps, TextOps, VariantOps}

/**
 * [EXT] LLM-data-pipeline operators (SURVEY.md §2.11, X1–X6) registered as
 * driver-checkable queries. Implementations live in graft.ops; this file binds
 * them to fixture tables with DuckDB oracle SQL.
 */
object ExtQueries {

  /** DuckDB-side whitespace tokenizer, mirroring TextOps.tokens. */
  private val DuckToks =
    """list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')"""

  /** Sampling-family oracles, SHARED between each Scala-API query and its
    * CALL-procedure twin (`cdc_split_sql` / `cdc_temperature_sql` /
    * `cdc_cap_group_sql`) so the two surfaces cannot drift — the
    * media-index twin convention (r16) applied to the batch sampling ops
    * (r16 verdict #6). */
  private val DuckHashSplitSql: String =
    """WITH h AS (SELECT doc_id,
      |  CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 AS hm
      |  FROM documents)
      |SELECT doc_id,
      |  CASE WHEN hm < 8 THEN 'train' WHEN hm < 9 THEN 'val' ELSE 'test' END AS split
      |FROM h ORDER BY doc_id""".stripMargin

  private val DuckTemperatureSampleSql: String =
    """WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
      |          FROM documents GROUP BY source),
      |r AS (SELECT source, n, SUM(n) OVER () AS tot,
      |        pow(CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE), 0.5) AS p
      |      FROM c),
      |rr AS (SELECT source,
      |         LEAST(1.0, 0.5 * CAST(tot AS DOUBLE) * (p / SUM(p) OVER ())
      |                      / CAST(n AS DOUBLE)) AS rate
      |       FROM r)
      |SELECT d.doc_id, d.source FROM documents d JOIN rr USING (source)
      |WHERE CAST(CAST(concat('0x', substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
      |           AS BIGINT) AS DOUBLE) < rate * 1152921504606846976.0
      |ORDER BY d.doc_id""".stripMargin

  private val DuckCapPerSourceSql: String =
    """WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
      |h AS (SELECT doc_id, source,
      |        CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS _h
      |      FROM documents),
      |cand AS (SELECT h.doc_id, h.source, h._h FROM h JOIN c USING (source)
      |         WHERE h._h < CAST(FLOOR(LEAST(1.0, 160.0 / c.n) * 1152921504606846976.0) AS BIGINT))
      |SELECT doc_id, source, rk FROM (
      |  SELECT doc_id, source,
      |         row_number() OVER (PARTITION BY source ORDER BY _h, doc_id) AS rk
      |  FROM cand) z
      |WHERE rk <= 5 ORDER BY source, doc_id""".stripMargin

  /** DuckDB-side incremental-dedup-index replay (mirrors the x2_dedup_index
    * flow: even docs index batch 0 self-deduped, odd docs corpus-filtered
    * then self-deduped as batch 1; output = batch-1 kept ids). SHARED by
    * the Scala-API query (`x2_dedup_index`) and its CALL-procedure twin
    * (`cdc_dedup_index_sql`) so the two surfaces cannot drift. */
  private lazy val DuckDedupIndexSql: String = duckDedupIndexSql("")

  /** The same replay with a LIVE-rows filter on the index side (`liveWhere`
    * filters `e_kept`): the delete-maintenance variant
    * (`x2_dedup_index_delete`) is this oracle restricted to the survivors
    * of the delete epoch, everything else identical. */
  private def duckDedupIndexSql(liveWhere: String): String =
    s"""WITH toks AS (SELECT doc_id, $DuckToks AS w FROM documents),
       |th AS (SELECT doc_id, CAST(concat('0x', substring(md5(t), 1, 15)) AS BIGINT) AS h
       |       FROM (SELECT doc_id, unnest(w) AS t FROM toks) u),
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
       |e_live AS (SELECT * FROM e_kept $liveWhere),
       |o_cdup AS (SELECT DISTINCT a.doc_id FROM o a
       |           JOIN e_live i ON i.band = a.band AND i.chunk = a.chunk),
       |cand AS (SELECT * FROM o WHERE doc_id NOT IN (SELECT doc_id FROM o_cdup)),
       |o_bdup AS (SELECT DISTINCT a.doc_id FROM cand a
       |           JOIN cand b ON b.band = a.band AND b.chunk = a.chunk AND b.doc_id < a.doc_id)
       |SELECT doc_id FROM (
       |  SELECT doc_id FROM (SELECT DISTINCT doc_id FROM cand)
       |  WHERE doc_id NOT IN (SELECT doc_id FROM o_bdup)
       |  UNION ALL
       |  SELECT doc_id FROM toks WHERE doc_id % 2 = 1 AND len(w) = 0
       |) ORDER BY doc_id""".stripMargin

  /** DuckDB-side persistent-ANN-index replay (mirrors the x3_ann_index
    * flow: 3-batch build with md5-stride seed choice → frozen centroids →
    * assignment → nprobe=4 probe → in-cell exact top-5). `scExtra` injects
    * an extra candidate predicate — the FILTERED-search variant
    * (`x3_ann_index_filtered`) is this oracle plus one membership test;
    * the CALL-procedure twin (`cdc_ann_probe_sql`) shares the empty-extra
    * instance with `x3_ann_index`, so the two surfaces cannot drift. */
  /** The shared index-BUILD replay (seed choice -> centroids -> full
    * assignment), used by every ann-index oracle variant. */
  private val DuckAnnPrefix: String =
    """e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v0 FROM embeddings),
      |e AS (SELECT vec_id, list_transform(v0, x -> x / sqrt(list_dot_product(v0, v0))) AS v FROM e0),
      |b0 AS (SELECT vec_id, v FROM e WHERE vec_id % 3 = 0),
      |nn AS (SELECT COUNT(*) AS n FROM b0),
      |seeds0 AS (SELECT vec_id FROM b0, nn
      |           WHERE CAST(concat('0x', substring(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT) % GREATEST(1, n // 16) = 0
      |           ORDER BY vec_id LIMIT 16),
      |seeds AS (SELECT vec_id FROM seeds0
      |          UNION ALL
      |          SELECT vec_id FROM (SELECT vec_id FROM b0 ORDER BY vec_id LIMIT 16) f
      |          WHERE (SELECT COUNT(*) FROM seeds0) = 0),
      |cent AS (SELECT row_number() OVER (ORDER BY s.vec_id) - 1 AS cell, e.v AS cv
      |         FROM seeds s JOIN e ON e.vec_id = s.vec_id),
      |asg AS (SELECT vec_id, cell FROM (
      |          SELECT e.vec_id, c.cell, row_number() OVER (PARTITION BY e.vec_id ORDER BY list_dot_product(e.v, c.cv) DESC, c.cell) AS rn
      |          FROM e, cent c) z WHERE rn = 1)""".stripMargin

  /** DuckDB-side IVF-PQ replay (index build + unit-vector codebooks +
    * encoding + probed-cell ADC scoring), SHARED by the Scala-API query
    * (`x3_ivf_pq`) and its CALL-procedure twin (`cdc_pq_sql`) so the two
    * surfaces cannot drift. */
  private lazy val DuckIvfPqCtes: String = duckIvfPqCtes("")

  /** The same CTEs with a configurable codebook-training population
    * (`sdvWhere` filters `e`): the streaming-codes twin trains books on
    * the SEED epoch only (vec_id % 3 = 0 — the index contents at
    * codes-table creation time), everything else identical. */
  private def duckIvfPqCtes(sdvWhere: String): String =
    s"""WITH $DuckAnnPrefix,
       |sdv AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS c, v
       |        FROM e $sdvWhere ORDER BY vec_id LIMIT 8),
       |bk AS (SELECT CAST(r.s AS INT) AS s, sdv.c,
       |         list_slice(sdv.v, CAST(r.s * 16 + 1 AS INT), CAST((r.s + 1) * 16 AS INT)) AS cv
       |       FROM sdv, range(4) r(s)),
       |scx AS (SELECT e.vec_id, bk.s, bk.c,
       |          2.0 * list_dot_product(list_slice(e.v, bk.s * 16 + 1, (bk.s + 1) * 16), bk.cv)
       |            - list_dot_product(bk.cv, bk.cv) AS score
       |        FROM e, bk),
       |cdx AS (SELECT vec_id, s, c FROM (
       |          SELECT vec_id, s, c,
       |            row_number() OVER (PARTITION BY vec_id, s ORDER BY score DESC, c) AS rk
       |          FROM scx) t WHERE rk = 1),
       |pr AS (SELECT vec_id AS qid, cell FROM (
       |          SELECT e.vec_id, c.cell, row_number() OVER (PARTITION BY e.vec_id ORDER BY list_dot_product(e.v, c.cv) DESC, c.cell) AS rn
       |          FROM e, cent c WHERE e.vec_id < 8) z WHERE rn <= 4),
       |qt AS (SELECT q.vec_id AS qid, bk.s, bk.c,
       |         list_dot_product(list_slice(q.v, bk.s * 16 + 1, (bk.s + 1) * 16), bk.cv) AS t
       |       FROM e q, bk WHERE q.vec_id < 8),
       |cand AS (SELECT pr.qid, a.vec_id AS nid
       |         FROM pr JOIN asg a ON a.cell = pr.cell WHERE a.vec_id <> pr.qid),
       |sc2 AS (SELECT cand.qid, cand.nid, qt.s, qt.t
       |        FROM cand JOIN cdx ON cdx.vec_id = cand.nid
       |        JOIN qt ON qt.qid = cand.qid AND qt.s = cdx.s AND qt.c = cdx.c),
       |adc AS (SELECT qid, nid,
       |          MAX(CASE WHEN s = 0 THEN t END) + MAX(CASE WHEN s = 1 THEN t END)
       |          + MAX(CASE WHEN s = 2 THEN t END) + MAX(CASE WHEN s = 3 THEN t END) AS adc
       |        FROM sc2 GROUP BY qid, nid)""".stripMargin

  private lazy val DuckIvfPqSql: String =
    s"""$DuckIvfPqCtes
       |SELECT qid, nid AS neighbor_id, adc, CAST(rnk AS INT) AS rnk FROM (
       |  SELECT qid, nid, adc,
       |    row_number() OVER (PARTITION BY qid ORDER BY adc DESC, nid) AS rnk
       |  FROM adc) z
       |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin

  /** The two deterministic image-index ingest batches (pinned dHash
    * literals in the oracle): batch 0 seeds two distinct images; batch 1
    * brings a corpus dup (distance 0), a corpus near-dup (distance 2), a
    * fresh image, its in-batch dup, and a non-image payload (kept,
    * hashless). SHARED by `x5_image_index` and `cdc_media_index_sql`. */
  private def imageIndexBatches(s: org.apache.spark.sql.SparkSession)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import s.implicits._
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
    val b0 = Seq((1L, img(bitsA, 100, "png")), (4L, img(bitsD, 100, "png")))
      .toDF("media_id", "content")
    val b1 = Seq(
      (11L, img(bitsA, 140, "bmp")), // corpus dup of 1 (distance 0)
      (13L, img(bitsC, 100, "png")), // corpus near-dup of 1 (distance 2)
      (15L, img(bitsE, 100, "png")), // fresh
      (16L, img(bitsE, 120, "png")), // in-batch dup of 15
      (17L, "not an image".getBytes)) // hashless: kept
      .toDF("media_id", "content")
    (b0, b1)
  }

  /** DuckDB-side image-index replay (pinned dHash literals → 4×14 banding →
    * corpus filter refined by exact Hamming ≤ 3 → in-batch rule → batch-1
    * kept ids), SHARED by the Scala-API query (`x5_image_index`) and its
    * CALL twin (`cdc_media_index_sql`) so the two surfaces cannot drift. */
  private lazy val DuckImageIndexSql: Option[String] =
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
             |cdup AS (SELECT DISTINCT b.media_id FROM ch b JOIN ch i
             |         ON b.batch = 1 AND i.batch = 0 AND b.band = i.band
             |           AND b.chunk = i.chunk
             |           AND bit_count(xor(b.phash, i.phash)) <= 3),
             |cand AS (SELECT * FROM ch WHERE batch = 1
             |         AND media_id NOT IN (SELECT media_id FROM cdup)),
             |bdup AS (SELECT DISTINCT a.media_id FROM cand a JOIN cand b
             |         ON a.band = b.band AND a.chunk = b.chunk
             |           AND b.media_id < a.media_id
             |           AND bit_count(xor(a.phash, b.phash)) <= 3)
             |SELECT media_id FROM (
             |  SELECT DISTINCT media_id FROM cand
             |  WHERE media_id NOT IN (SELECT media_id FROM bdup)
             |  UNION ALL SELECT CAST(17 AS BIGINT)
             |) ORDER BY media_id""".stripMargin)

  /** DuckDB-side RESIDUAL IVF-PQ replay (E191 — index build + residual
    * codebooks + residual encoding + centroid-dot + ADC scoring), SHARED by
    * the Scala-API query (`x3_ivf_pq_residual`) and its CALL twin
    * (`cdc_pq_residual_sql`) so the two surfaces cannot drift. */
  private lazy val DuckIvfPqResidualSql: String =
    s"""WITH $DuckAnnPrefix,
             |res AS (SELECT a.vec_id, a.cell,
             |          list_transform(range(len(e.v)), i -> e.v[CAST(i AS INT) + 1] - c.cv[CAST(i AS INT) + 1]) AS rv
             |        FROM asg a JOIN e ON e.vec_id = a.vec_id JOIN cent c ON c.cell = a.cell),
             |sdv AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS c, rv
             |        FROM res ORDER BY vec_id LIMIT 8),
             |bk AS (SELECT CAST(r.s AS INT) AS s, sdv.c,
             |         list_slice(sdv.rv, CAST(r.s * 16 + 1 AS INT), CAST((r.s + 1) * 16 AS INT)) AS cv2
             |       FROM sdv, range(4) r(s)),
             |scx AS (SELECT res.vec_id, bk.s, bk.c,
             |          2.0 * list_dot_product(list_slice(res.rv, bk.s * 16 + 1, (bk.s + 1) * 16), bk.cv2)
             |            - list_dot_product(bk.cv2, bk.cv2) AS score
             |        FROM res, bk),
             |cdx AS (SELECT vec_id, s, c FROM (
             |          SELECT vec_id, s, c,
             |            row_number() OVER (PARTITION BY vec_id, s ORDER BY score DESC, c) AS rk
             |          FROM scx) t WHERE rk = 1),
             |pr AS (SELECT vec_id AS qid, cell FROM (
             |          SELECT e.vec_id, c.cell, row_number() OVER (PARTITION BY e.vec_id ORDER BY list_dot_product(e.v, c.cv) DESC, c.cell) AS rn
             |          FROM e, cent c WHERE e.vec_id < 8) z WHERE rn <= 4),
             |cd0 AS (SELECT pr.qid, pr.cell, list_dot_product(qe.v, c.cv) AS cdot
             |        FROM pr JOIN e qe ON qe.vec_id = pr.qid JOIN cent c ON c.cell = pr.cell),
             |qt AS (SELECT q.vec_id AS qid, bk.s, bk.c,
             |         list_dot_product(list_slice(q.v, bk.s * 16 + 1, (bk.s + 1) * 16), bk.cv2) AS t
             |       FROM e q, bk WHERE q.vec_id < 8),
             |cand AS (SELECT pr.qid, a.vec_id AS nid, a.cell
             |         FROM pr JOIN asg a ON a.cell = pr.cell WHERE a.vec_id <> pr.qid),
             |sc2 AS (SELECT cand.qid, cand.nid, cand.cell, qt.s, qt.t
             |        FROM cand JOIN cdx ON cdx.vec_id = cand.nid
             |        JOIN qt ON qt.qid = cand.qid AND qt.s = cdx.s AND qt.c = cdx.c),
             |adc AS (SELECT sc2.qid, sc2.nid,
             |          cd0.cdot + (MAX(CASE WHEN s = 0 THEN t END) + MAX(CASE WHEN s = 1 THEN t END)
             |          + MAX(CASE WHEN s = 2 THEN t END) + MAX(CASE WHEN s = 3 THEN t END)) AS adc
             |        FROM sc2 JOIN cd0 ON cd0.qid = sc2.qid AND cd0.cell = sc2.cell
             |        GROUP BY sc2.qid, sc2.nid, cd0.cdot)
             |SELECT qid, nid AS neighbor_id, adc, CAST(rnk AS INT) AS rnk FROM (
             |  SELECT qid, nid, adc,
             |    row_number() OVER (PARTITION BY qid ORDER BY adc DESC, nid) AS rnk
             |  FROM adc) z
             |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin

  /** The two-stage refine replay (E189): ADC shortlist of 15 from the same
    * CTEs, exact dot re-rank of just the shortlist, final top-5 — shared
    * structure with `DuckIvfPqSql` so the stages cannot drift. */
  private lazy val DuckIvfPqRefinedSql: String =
    s"""$DuckIvfPqCtes,
       |shortlist AS (SELECT qid, nid FROM (
       |  SELECT qid, nid,
       |    row_number() OVER (PARTITION BY qid ORDER BY adc DESC, nid) AS rnk
       |  FROM adc) z WHERE rnk <= 15),
       |exact AS (SELECT s.qid, s.nid, list_dot_product(qe.v, ne.v) AS cos
       |          FROM shortlist s JOIN e qe ON qe.vec_id = s.qid
       |          JOIN e ne ON ne.vec_id = s.nid)
       |SELECT qid, nid AS neighbor_id, CAST(rnk AS INT) AS rnk FROM (
       |  SELECT qid, nid,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rnk
       |  FROM exact) z
       |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin

  private def duckAnnIndexSql(scExtra: String): String =
    s"""WITH $DuckAnnPrefix,
       |pr AS (SELECT vec_id AS qid, cell FROM (
       |          SELECT e.vec_id, c.cell, row_number() OVER (PARTITION BY e.vec_id ORDER BY list_dot_product(e.v, c.cv) DESC, c.cell) AS rn
       |          FROM e, cent c WHERE e.vec_id < 8) z WHERE rn <= 4),
       |sc AS (SELECT pr.qid, a.vec_id AS nid, list_dot_product(qe.v, ae.v) AS cos
       |       FROM pr JOIN asg a ON a.cell = pr.cell
       |       JOIN e qe ON qe.vec_id = pr.qid JOIN e ae ON ae.vec_id = a.vec_id
       |       WHERE a.vec_id <> pr.qid$scExtra)
       |SELECT qid, nid AS neighbor_id, rnk FROM (
       |  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rnk FROM sc) z
       |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin

  /** DuckDB-side BPE merge learning (mirrors BpeOps.learnMerges, 4 merges on
    * the md5 %4 sample): the b1..b4 CTEs are the learned merge table, shared
    * by the learn oracle (`x4_bpe_learn`) and the apply oracle
    * (`x4_bpe_apply`), so the training replay lives ONCE. */
  private lazy val DuckBpeCtes =
    s"""w AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
       |    SELECT regexp_replace(lower(t), '[^a-z]', '', 'g') AS w FROM (
       |      SELECT unnest($DuckToks) AS t FROM documents
       |      WHERE CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 4 = 0) u) v
       |  WHERE len(w) >= 2 GROUP BY w),
       |st0 AS (SELECT '<' || array_to_string(regexp_split_to_array(w, ''), '><') || '>' AS s, freq FROM w),
       |${(1 to 4).map(i => s"""p$i AS (
       |  SELECT pr.l, pr.r, CAST(SUM(st${i - 1}.freq) AS BIGINT) AS cnt
       |  FROM st${i - 1},
       |    LATERAL (SELECT string_split(regexp_replace(st${i - 1}.s, '^<|>$$', '', 'g'), '><') AS syms) sy,
       |    LATERAL (SELECT unnest(list_transform(range(1, len(sy.syms)), j ->
       |      struct_pack(l := sy.syms[CAST(j AS INTEGER)], r := sy.syms[CAST(j AS INTEGER) + 1]))) AS pr) pr
       |  WHERE len(sy.syms) >= 2
       |  GROUP BY pr.l, pr.r),
       |b$i AS (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
       |st$i AS (SELECT replace(st${i - 1}.s, '<' || b$i.l || '><' || b$i.r || '>',
       |                        '<' || b$i.l || b$i.r || '>') AS s, st${i - 1}.freq
       |         FROM st${i - 1}, b$i)""").mkString(",\n")}""".stripMargin

  /** DuckDB-side exact shingle-Jaccard pairs (mirrors DedupOps.jaccardPairs);
    * shared by the exact and the LSH-verified near-dup oracles (the LSH path
    * with 16×2 banding has recall 1 on this corpus — all planted pairs are at
    * J ≥ 0.8 where the miss probability is ~3e-8; verified at sf0.01). */
  private def duckJaccardSql(threshold: Double): String =
    s"""WITH toks AS (SELECT doc_id, $DuckToks AS w FROM documents),
       |sh AS (SELECT DISTINCT doc_id,
       |         unnest(list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
       |       FROM toks WHERE len(w) >= 3),
       |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
       |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT doc_a, doc_b, n_common,
       |  CAST(n_common AS DOUBLE) / CAST(sa.n + sb.n - n_common AS DOUBLE) AS jaccard
       |FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
       |WHERE CAST(n_common AS DOUBLE) / CAST(sa.n + sb.n - n_common AS DOUBLE) >= $threshold
       |ORDER BY doc_a, doc_b""".stripMargin

  /** DuckDB-side cross-doc duplicated spans at window=6 (mirrors
    * DedupOps.duplicateSpans; groups by the RAW window text where the
    * engine uses its md5-60 fingerprint — identical equivalence classes).
    * Ends with the `spans` CTE: (doc_id, span_id, span_start, span_end,
    * n_windows). */
  private val duckSpansCte: String =
    s"""WITH toks AS (SELECT doc_id, $DuckToks AS w FROM documents),
       |wx AS (SELECT doc_id,
       |         unnest(list_transform(range(0, greatest(len(w) - 5, 0)),
       |           i -> struct_pack(s := i,
       |                 k := array_to_string(list_slice(w, CAST(i + 1 AS INTEGER), CAST(i + 6 AS INTEGER)), ' ')))) AS x
       |       FROM toks),
       |wins AS (SELECT doc_id, CAST(x.s AS BIGINT) AS st, x.k AS wkey FROM wx),
       |dupk AS (SELECT wkey FROM wins GROUP BY wkey HAVING COUNT(DISTINCT doc_id) > 1),
       |d AS (SELECT doc_id, st, st + 5 AS en FROM wins WHERE wkey IN (SELECT wkey FROM dupk)),
       |m AS (SELECT doc_id, st, en,
       |        CASE WHEN max(en) OVER (PARTITION BY doc_id ORDER BY st
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |          OR st > max(en) OVER (PARTITION BY doc_id ORDER BY st
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
       |        THEN 1 ELSE 0 END AS new_span FROM d),
       |g AS (SELECT doc_id, st, en,
       |        SUM(new_span) OVER (PARTITION BY doc_id ORDER BY st
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
       |      FROM m),
       |spans AS (SELECT doc_id, span_id, MIN(st) AS span_start, MAX(en) AS span_end,
       |            COUNT(*) AS n_windows
       |          FROM g GROUP BY doc_id, span_id)""".stripMargin

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

    // X1 at 100 TB shape: dedup keyed on a 64-bit fingerprint instead of the
    // raw (multi-KB) text — the shuffle key shrinks from document size to 8
    // bytes. Same answer as x1_exact_dedup_documents absent a hash collision
    // (P ≈ n²/2⁶⁴; the oracle groups by text, so a collision would surface as
    // a mismatch rather than silent corruption).
    Q("x1_dedup_by_fingerprint",
      (s, d) => Tables.load(s, d, "documents")
        .groupBy(xxhash64(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .select("doc_id", "n_copies")
        .orderBy("doc_id"),
      Some("""SELECT min(doc_id) AS doc_id, COUNT(*) AS n_copies
             |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin)),

    // X1: deterministic hash-free sampling (repeatable train/eval splits —
    // the modulo predicate is engine-agnostic, so the split is reproducible
    // across engines; a narrow filter, no shuffle).
    Q("x1_mod_sample",
      (s, d) => Tables.load(s, d, "documents")
        .filter(pmod(col("doc_id"), lit(10)) === 3)
        .select("doc_id")
        .orderBy("doc_id"),
      Some("SELECT doc_id FROM documents WHERE doc_id % 10 = 3 ORDER BY doc_id")),

    // X1: deterministic TRAIN/VAL/TEST split (E207) — integer weights over
    // the md5 residue domain; membership is a pure function of (doc_id,
    // salt), so re-ingested docs keep their split across runs (the
    // leakage-safety property a random split loses). Map-only, zero
    // shuffles; the oracle replays hash → residue → CASE bit-for-bit.
    Q("x1_train_split",
      (s, d) => DedupOps.hashSplit(Tables.load(s, d, "documents"),
          splits = Seq("train" -> 8, "val" -> 1, "test" -> 1))
        .select("doc_id", "split")
        .orderBy("doc_id"),
      Some(DuckHashSplitSql)),

    // X1: deterministic GLOBAL SHUFFLE into training shards — the "write
    // shuffled shards" step before packing: md5-pseudorandom, reproducible
    // run-to-run, restartable by (shard, pos). Scale shape: map-only shard
    // id + shard-PARTITIONED window (local sorts after one hash exchange),
    // never a global ORDER BY through one reducer.
    Q("x1_global_shuffle",
      (s, d) => SequenceOps.globalShuffle(
        Tables.load(s, d, "documents").select("doc_id"), "doc_id", nShards = 16)
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy("shard", "pos"),
      Some("""WITH h AS (SELECT doc_id,
             |  CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS _h
             |  FROM documents)
             |SELECT doc_id, CAST(_h % 16 AS INT) AS shard,
             |  CAST(row_number() OVER (PARTITION BY _h % 16 ORDER BY _h, doc_id) - 1 AS INT) AS pos
             |FROM h ORDER BY shard, pos""".stripMargin)),

    // X1: per-source cap (corpus diversity — at most k docs per source/
    // domain; DedupOps.capPerGroup). Selection = first k by md5 hash order,
    // ranked over a hash-prefiltered candidate set (the skew-safe 100 TB
    // shape); the oracle replays hash, bound, and ranking bit-for-bit.
    Q("x1_cap_per_source",
      (s, d) => DedupOps.capPerGroup(Tables.load(s, d, "documents"),
          groupCol = "source", k = 5)
        .orderBy("source", "doc_id"),
      Some(DuckCapPerSourceSql)),

    // X1: Poisson PPS sampling (E190) — inclusion probability ∝ weight
    // (token count), expected sample size n, capped at 1; ONE scalar
    // total-weight aggregate then a map-only md5 gate — zero wide
    // shuffles. The oracle replays the threshold arithmetic bit-for-bit.
    Q("x1_pps_sample",
      (s, d) => {
        val t = Tables.load(s, d, "documents")
          .select(col("doc_id"),
            size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
        DedupOps.ppsSample(t, "n_tokens", expectedN = 40L)
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, CAST(len($DuckToks) AS BIGINT) AS n_tokens
             |           FROM documents),
             |tot AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS tw FROM t)
             |SELECT doc_id, n_tokens FROM t, tot
             |WHERE CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE)
             |  < LEAST(1.0, 40.0 * CAST(n_tokens AS DOUBLE) / tw) * 1152921504606846976.0
             |ORDER BY doc_id""".stripMargin)),

    // X1: temperature-scaled mixture sampling (multilingual-LM data mixing:
    // keep-rate per source ∝ (n_s/N)^α, α=0.5 flattening the source
    // distribution; DedupOps.temperatureSample). Selection is the md5-hash
    // threshold — deterministic, replayed bit-for-bit by the oracle.
    Q("x1_temperature_sample",
      (s, d) => DedupOps.temperatureSample(Tables.load(s, d, "documents"),
          groupCol = "source", alpha = 0.5, frac = 0.5)
        .select("doc_id", "source")
        .orderBy("doc_id"),
      Some(DuckTemperatureSampleSql)),

    // The SQL/CALL surface of the SAME sampling family (r16 verdict #6 —
    // the reference's everything-through-SQL posture): split, temperature
    // sample and per-group cap all driven through `CALL graft.system.*`
    // over a temp view, results consumed from the registered result views
    // with no Scala op call in the query body. Each oracle IS the Scala
    // twin's oracle (shared constants), so the surfaces cannot drift.
    Q("cdc_split_sql",
      (s, d) => {
        val cat = s"graft_smp${System.nanoTime()}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          java.nio.file.Files.createTempDirectory("graft_smp_sql").toString)
        Tables.load(s, d, "documents").createOrReplaceTempView("smp_docs")
        s.sql(s"CALL $cat.system.hash_split('smp_docs', 'train:8,val:1,test:1', '', 'doc_id', 'smp_splits')").collect()
        s.sql("SELECT doc_id, split FROM smp_splits ORDER BY doc_id")
      },
      Some(DuckHashSplitSql)),

    Q("cdc_temperature_sql",
      (s, d) => {
        val cat = s"graft_smt${System.nanoTime()}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          java.nio.file.Files.createTempDirectory("graft_smt_sql").toString)
        Tables.load(s, d, "documents").createOrReplaceTempView("smt_docs")
        s.sql(s"CALL $cat.system.temperature_sample('smt_docs', 'source', 0.5, 0.5, 'doc_id', 'smt_sample')").collect()
        s.sql("SELECT doc_id, source FROM smt_sample ORDER BY doc_id")
      },
      Some(DuckTemperatureSampleSql)),

    Q("cdc_cap_group_sql",
      (s, d) => {
        val cat = s"graft_smc${System.nanoTime()}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          java.nio.file.Files.createTempDirectory("graft_smc_sql").toString)
        Tables.load(s, d, "documents").createOrReplaceTempView("smc_docs")
        s.sql(s"CALL $cat.system.cap_per_group('smc_docs', 'source', 5, 'doc_id', 'smc_capped')").collect()
        s.sql("SELECT doc_id, source, rk FROM smc_capped ORDER BY source, doc_id")
      },
      Some(DuckCapPerSourceSql)),

    // X1: budgeted MIXTURE sampling — the data-mixing stage: per-source
    // target token shares + a global token budget → deterministic per-source
    // hash-sample rates min(1, budget·w/src_tokens). Binary-exact weights
    // (0.5/0.25/0.125) keep the rate arithmetic bit-equal across engines;
    // sources outside the spec drop.
    Q("x1_mixture_budget",
      (s, d) => DedupOps.mixtureBudgetSample(Tables.load(s, d, "documents"),
        weights = Seq("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.125, "src3" -> 0.125),
        tokenBudget = 2000),
      Some(s"""WITH t AS (SELECT doc_id, source,
             |            CAST(len($DuckToks) AS BIGINT) AS n_tokens FROM documents),
             |st AS (SELECT source, SUM(n_tokens) AS srctoks FROM t GROUP BY source),
             |r AS (SELECT source,
             |        CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.25
             |                    WHEN 'src2' THEN 0.125 WHEN 'src3' THEN 0.125 END AS w,
             |        srctoks FROM st),
             |rr AS (SELECT source,
             |         CASE WHEN w IS NULL THEN 0.0
             |              ELSE LEAST(1.0, 2000.0 * w / CAST(srctoks AS DOUBLE)) END AS rate
             |       FROM r)
             |SELECT t.doc_id, t.source, t.n_tokens
             |FROM t JOIN rr USING (source)
             |WHERE CAST(CAST(concat('0x', substring(md5(CAST(t.doc_id AS VARCHAR)), 1, 15))
             |           AS BIGINT) AS DOUBLE) < rate * 1152921504606846976.0
             |ORDER BY t.doc_id""".stripMargin)),

    // X4: corpus length distribution — exact percentiles of the document
    // token count (linear-interpolation definition is identical in Spark's
    // percentile and DuckDB's quantile_cont).
    Q("x4_length_percentiles",
      (s, d) => {
        val toks = Tables.load(s, d, "documents")
          .select(size(graft.ops.TextOps.tokens(col("text"))).cast("long").as("n"))
        toks.agg(
          count(lit(1)).as("n_docs"),
          min(col("n")).as("min_tokens"),
          expr("CAST(percentile(n, 0.5) AS DOUBLE)").as("p50"),
          expr("CAST(percentile(n, 0.9) AS DOUBLE)").as("p90"),
          expr("CAST(percentile(n, 0.99) AS DOUBLE)").as("p99"),
          max(col("n")).as("max_tokens"))
      },
      Some(s"""WITH toks AS (SELECT CAST(len($DuckToks) AS BIGINT) AS n FROM documents)
              |SELECT COUNT(*) AS n_docs, min(n) AS min_tokens,
              |  quantile_cont(n, 0.5) AS p50,
              |  quantile_cont(n, 0.9) AS p90,
              |  quantile_cont(n, 0.99) AS p99,
              |  max(n) AS max_tokens
              |FROM toks""".stripMargin)),

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

    // X6/E82: native VARIANT over the same JSON payload — parse once, typed
    // codegen'd path extraction (no JSON re-parse per access). Oracle is the
    // plain-JSON equivalent: the variant roundtrip must be value-identical.
    Q("x6_variant_get",
      (s, d) => VariantOps.shred(
          VariantOps.parse(Tables.load(s, d, "events"), "props"),
          "var", Seq(("k", "$.k", "bigint")))
        .select(col("event_id"), col("k"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             |FROM events ORDER BY event_id""".stripMargin)),

    // X6/E82: shredding hot paths of a NESTED variant into typed columns
    // (struct → JSON → VARIANT → typed paths must be lossless).
    Q("x6_variant_shred",
      (s, d) => {
        val src = Tables.load(s, d, "orders")
          .withColumn("j", to_json(struct(
            col("o_custkey").as("cust"),
            struct(col("o_orderpriority").as("prio"),
              col("o_orderstatus").as("status")).as("meta"))))
        VariantOps.shred(VariantOps.parse(src, "j"), "var", Seq(
            ("cust", "$.cust", "bigint"),
            ("prio", "$.meta.prio", "string"),
            ("status", "$.meta.status", "string")))
          .select(col("o_orderkey"), col("cust"), col("prio"), col("status"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS cust,
             |  o_orderpriority AS prio, o_orderstatus AS status
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // X6/E82: key-value fan-out of a variant object (variant_explode), typed
    // leaf extraction on the exploded value.
    Q("x6_variant_explode",
      (s, d) => VariantOps.explodeFields(
          VariantOps.parse(Tables.load(s, d, "events"), "props"), "var",
          keep = Seq("event_id"))
        .select(col("event_id"), col("key"),
          expr("variant_get(value, '$', 'bigint')").as("value"))
        .orderBy("event_id", "key"),
      Some("""SELECT event_id, key, CAST(v AS BIGINT) AS value FROM (
             |  SELECT event_id, unnest(json_keys(props)) AS key,
             |    unnest(list_transform(json_keys(props),
             |      kk -> json_extract_string(props, '$.' || kk))) AS v
             |  FROM events)
             |ORDER BY event_id, key""".stripMargin)),

    // X4/E83: corpus bigram-LM rarity — the deterministic integer form of
    // LM-based quality filtering (see TextOps.bigramRarity scaladoc).
    Q("x4_bigram_rarity",
      (s, d) => TextOps.bigramRarity(Tables.load(s, d, "documents"), rareDf = 2),
      Some(s"""WITH toks AS (SELECT doc_id, $DuckToks AS w FROM documents),
              |bi AS (SELECT DISTINCT doc_id,
              |         unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bigram
              |       FROM toks WHERE len(w) >= 2),
              |dfq AS (SELECT bigram, COUNT(*) AS df FROM bi GROUP BY 1)
              |SELECT b.doc_id, COUNT(*) AS n_bigrams,
              |  CAST(SUM(CASE WHEN dfq.df <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
              |  CAST(SUM(CASE WHEN dfq.df <= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS rarity
              |FROM bi b JOIN dfq USING (bigram) GROUP BY b.doc_id""".stripMargin),
      headline = true),

    // X4/E87: Gopher-style repetition quality signals — duplicate-line
    // fractions + most-frequent-bigram char coverage, all single-division
    // ratios (bit-exact across engines); deterministic (cnt, chars, bigram)
    // lexicographic tie-break for the top bigram.
    Q("x4_repetition_stats",
      (s, d) => TextOps.repetitionStats(Tables.load(s, d, "documents"))
        .orderBy("doc_id"),
      Some(s"""WITH lines AS (
              |  SELECT doc_id, l, COUNT(*) AS cnt FROM (
              |    SELECT doc_id, unnest(list_filter(string_split(text, chr(10)), x -> x <> '')) AS l
              |    FROM documents) GROUP BY 1, 2),
              |ls AS (
              |  SELECT doc_id,
              |    CAST(SUM(cnt) AS BIGINT) AS n_lines,
              |    CAST(COUNT(*) AS BIGINT) AS n_distinct_lines,
              |    CAST(SUM(cnt * length(l)) AS BIGINT) AS line_chars,
              |    CAST(SUM(CASE WHEN cnt > 1 THEN cnt * length(l) ELSE 0 END) AS BIGINT) AS dup_line_chars
              |  FROM lines GROUP BY 1),
              |toks AS (SELECT doc_id, $DuckToks AS w FROM documents),
              |bi AS (
              |  SELECT doc_id, b, COUNT(*) AS cnt FROM (
              |    SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS b
              |    FROM toks WHERE len(w) >= 2) GROUP BY 1, 2),
              |bt AS (
              |  SELECT doc_id, b AS top_bigram, cnt AS top_bigram_count,
              |    cnt * length(b) AS top_chars
              |  FROM bi QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
              |      ORDER BY cnt DESC, cnt * length(b) DESC, b DESC) = 1)
              |SELECT ls.doc_id, n_lines, n_distinct_lines,
              |  CAST(n_lines - n_distinct_lines AS DOUBLE) / n_lines AS frac_dup_lines,
              |  CAST(dup_line_chars AS DOUBLE) / line_chars AS frac_dup_line_chars,
              |  top_bigram, CAST(top_bigram_count AS BIGINT) AS top_bigram_count,
              |  CAST(top_chars AS DOUBLE) / line_chars AS frac_top_bigram_chars
              |FROM ls LEFT JOIN bt ON ls.doc_id = bt.doc_id
              |ORDER BY ls.doc_id""".stripMargin)),

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

    // X4: Gopher/C4 quality-rule signals — mean token length, alpha-token
    // and English-stopword fractions, symbol-to-token ratio, bullet/ellipsis
    // line fractions. Map-only (zero shuffles at any scale); every ratio is
    // a double division of exact integers, so DuckDB matches bit-for-bit.
    Q("x4_quality_signals",
      (s, d) => TextOps.qualitySignals(Tables.load(s, d, "documents"))
        .orderBy("doc_id"),
      Some(s"""WITH base AS (
             |  SELECT doc_id, text, $DuckToks AS w,
             |    list_filter(string_split(text, chr(10)), l -> l <> '') AS ls
             |  FROM documents)
             |SELECT doc_id,
             |  len(w) AS n_tokens,
             |  CASE WHEN len(w) > 0 THEN
             |    CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE) / len(w)
             |  END AS mean_token_len,
             |  CASE WHEN len(w) > 0 THEN
             |    CAST(len(list_filter(w, t -> regexp_full_match(t, '[A-Za-z]+'))) AS DOUBLE) / len(w)
             |  END AS frac_alpha_tokens,
             |  CASE WHEN len(w) > 0 THEN
             |    CAST(len(list_filter(w, t -> t IN ('the','a','is','and','of'))) AS DOUBLE) / len(w)
             |  END AS stopword_frac,
             |  CASE WHEN len(w) > 0 THEN
             |    CAST(length(text) - length(regexp_replace(text, '[#…]', '', 'g')) AS DOUBLE) / len(w)
             |  END AS symbol_to_token,
             |  CASE WHEN len(ls) > 0 THEN
             |    CAST(len(list_filter(ls, l -> starts_with(l, '-') OR starts_with(l, '*')
             |      OR starts_with(l, '•'))) AS DOUBLE) / len(ls)
             |  END AS frac_bullet_lines,
             |  CASE WHEN len(ls) > 0 THEN
             |    CAST(len(list_filter(ls, l -> ends_with(l, '...') OR ends_with(l, '…'))) AS DOUBLE) / len(ls)
             |  END AS frac_ellipsis_lines
             |FROM base ORDER BY doc_id""".stripMargin),
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

    // X4: unicode SCRIPT signals (E211) — per-doc writing-system profile
    // over explicit codepoint-range classes (never \p{script}, whose member
    // sets drift across engines' Unicode tables). The fixture text is
    // ASCII, so the query decorates docs with DETERMINISTIC multilingual
    // snippets (doc_id mod 4) that both engines replay — the counts and
    // fractions are then real, not all-zero.
    Q("x4_script_signals",
      (s, d) => {
        val deco = element_at(
          typedlit(Seq(" кот мир", " 数据查询分析", " بيانات كبيرة", "")),
          (pmod(col("doc_id"), lit(4)) + 1).cast("int"))
        val docs = Tables.load(s, d, "documents")
          .select(col("doc_id"), concat(col("text"), deco).as("text"))
        TextOps.scriptSignals(docs).orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
             |  text || CASE CAST(doc_id % 4 AS INT)
             |    WHEN 0 THEN ' кот мир' WHEN 1 THEN ' 数据查询分析'
             |    WHEN 2 THEN ' بيانات كبيرة' ELSE '' END AS x
             |  FROM documents),
             |c AS (SELECT doc_id, CAST(length(x) AS BIGINT) AS n_chars,
             |  CAST(length(x) - length(regexp_replace(x, '[A-Za-z]', '', 'g')) AS BIGINT) AS n_latin,
             |  CAST(length(x) - length(regexp_replace(x, '[\x{0400}-\x{04FF}]', '', 'g')) AS BIGINT) AS n_cyrillic,
             |  CAST(length(x) - length(regexp_replace(x, '[\x{4E00}-\x{9FFF}]', '', 'g')) AS BIGINT) AS n_cjk,
             |  CAST(length(x) - length(regexp_replace(x, '[\x{0600}-\x{06FF}]', '', 'g')) AS BIGINT) AS n_arabic,
             |  CAST(length(x) - length(regexp_replace(x, '[\x{AC00}-\x{D7AF}]', '', 'g')) AS BIGINT) AS n_hangul,
             |  CAST(length(x) - length(regexp_replace(x, '[0-9]', '', 'g')) AS BIGINT) AS n_digit
             |FROM t)
             |SELECT doc_id, n_chars, n_latin, n_cyrillic, n_cjk, n_arabic, n_hangul, n_digit,
             |  CASE WHEN n_chars > 0 THEN CAST(n_latin AS DOUBLE) / n_chars END AS frac_latin,
             |  CASE WHEN n_chars > 0 THEN CAST(n_cyrillic AS DOUBLE) / n_chars END AS frac_cyrillic,
             |  CASE WHEN n_chars > 0 THEN CAST(n_cjk AS DOUBLE) / n_chars END AS frac_cjk,
             |  CASE WHEN n_chars > 0 THEN CAST(n_arabic AS DOUBLE) / n_chars END AS frac_arabic,
             |  CASE WHEN n_chars > 0 THEN CAST(n_hangul AS DOUBLE) / n_chars END AS frac_hangul,
             |  CASE WHEN n_chars > 0 THEN CAST(n_digit AS DOUBLE) / n_chars END AS frac_digit
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

    // X4: text normalization for dedup/training prep — lowercase + strip
    // punctuation. Deliberately regex-free: `translate` + `lower` have
    // identical per-character semantics in Spark and DuckDB (regex dialects
    // differ between Java and RE2, so normalization that must be
    // reproducible across engines sticks to character maps).
    Q("x4_normalize_text",
      (s, d) => Tables.load(s, d, "documents")
        .select(col("doc_id"),
          lower(translate(col("text"), ".,!?;:'\"()-", "")).as("norm"),
          length(lower(translate(col("text"), ".,!?;:'\"()-", ""))).cast("long").as("n_chars"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  lower(translate(text, '.,!?;:''"()-', '')) AS norm,
             |  length(lower(translate(text, '.,!?;:''"()-', ''))) AS n_chars
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // X4: PII scrubbing (emails / phone numbers / IPv4 → placeholder tokens)
    // — the standard pretraining-corpus redaction pass, as one map-only
    // projection of three chained regexp_replace's (no UDF, zero shuffle).
    // The fixture corpus carries no digits at all, so the PII is
    // SYNTHESIZED deterministically from doc_id on both sides — the oracle
    // rebuilds the identical dirty text and must produce byte-identical
    // redactions (the regexes use explicit ASCII classes only, so Java and
    // RE2 agree; DuckDB needs the 'g' flag for replace-all parity).
    Q("x4_scrub_pii",
      (s, d) => {
        val raw = Tables.load(s, d, "documents").select(col("doc_id"),
          concat(lit("contact user"), col("doc_id").cast("string"),
            lit("@mail.example.com call 555-867-5309 from 10.0."),
            (col("doc_id") % 256).cast("string"), lit(".99 "),
            substring(col("text"), 1, 40)).as("text"))
        TextOps.scrubPii(raw).orderBy("doc_id")
      },
      Some(s"""WITH raw AS (
              |  SELECT doc_id,
              |    'contact user' || CAST(doc_id AS VARCHAR)
              |      || '@mail.example.com call 555-867-5309 from 10.0.'
              |      || CAST(doc_id % 256 AS VARCHAR) || '.99 '
              |      || substring(text, 1, 40) AS text
              |  FROM documents),
              |scrubbed AS (
              |  SELECT doc_id, text,
              |    regexp_replace(regexp_replace(regexp_replace(text,
              |      '${TextOps.EmailPattern}', '<EMAIL>', 'g'),
              |      '${TextOps.PhonePattern}', '<PHONE>', 'g'),
              |      '${TextOps.Ipv4Pattern}', '<IP>', 'g') AS clean
              |  FROM raw)
              |SELECT doc_id, clean, clean <> text AS had_pii
              |FROM scrubbed ORDER BY doc_id""".stripMargin)),

    // X4: 60-bit content + min-shingle-hash fingerprint. md5-derived (15 hex
    // chars → positive signed BIGINT both engines), so the exact hash VALUES
    // are recomputed by DuckDB and the query is fully hash-oracled.
    Q("x4_fingerprint",
      (s, d) => TextOps.fingerprint(Tables.load(s, d, "documents")).orderBy("doc_id"),
      Some(s"""WITH toks AS (SELECT doc_id, text, $DuckToks AS w FROM documents),
              |sh AS (SELECT doc_id, text,
              |         CASE WHEN len(w) >= 3
              |              THEN list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
              |              ELSE CAST([] AS VARCHAR[]) END AS sgl
              |       FROM toks)
              |SELECT doc_id,
              |  CAST(concat('0x', substring(md5(text), 1, 15)) AS BIGINT) AS content_hash,
              |  list_min(list_transform(sgl, s -> CAST(concat('0x', substring(md5(s), 1, 15)) AS BIGINT))) AS min_shingle_hash
              |FROM sh ORDER BY doc_id""".stripMargin)),

    // X2: exact n-gram Jaccard near-dup pairs via inverted shingle index.
    // Explicit maxDocFreq=None: this is the EXACT-parity twin (the oracle is
    // uncapped), kept for algebra verification; the production default caps
    // df (DedupOps.DefaultMaxDocFreq) and the capped variant below is the
    // headline the bench tracks.
    Q("x2_jaccard_pairs",
      (s, d) => DedupOps.jaccardPairs(Tables.load(s, d, "documents"), threshold = 0.5,
        maxDocFreq = None),
      Some(duckJaccardSql(0.5))),

    // X2: MinHash + banded LSH candidates, exact-verified at the same
    // threshold — same answer as the exact query, found without an
    // all-pairs-sharing-a-shingle aggregation.
    Q("x2_minhash_lsh_pairs",
      (s, d) => DedupOps.minhashLshPairs(Tables.load(s, d, "documents"), threshold = 0.5),
      Some(duckJaccardSql(0.5))),

    // X2: cross-document repeated SPANS — suffix-array-style substring dedup
    // (Lee et al. 2022) at window granularity: length-6 token windows
    // fingerprinted, windows seen in >1 distinct doc mark their ranges,
    // overlapping/adjacent ranges merge per doc (gaps-and-islands). The
    // oracle groups by the RAW window text where the engine groups by its
    // md5-60 fingerprint — identical equivalence classes, so spans match
    // exactly. Within-doc-only repeats stay unmarked on both sides.
    Q("x2_dup_spans",
      (s, d) => DedupOps.duplicateSpans(Tables.load(s, d, "documents"), window = 6),
      Some(s"""$duckSpansCte
              |SELECT doc_id, span_start, span_end, n_windows
              |FROM spans ORDER BY doc_id, span_start""".stripMargin),
      headline = true),

    // X2: span REMOVAL — the cleaning half of substring dedup: tokens inside
    // any duplicated span drop, survivors re-join with single spaces;
    // span-free documents pass through (normalized) with n_removed = 0.
    Q("x2_remove_spans",
      (s, d) => DedupOps.removeDuplicateSpans(Tables.load(s, d, "documents"), window = 6),
      Some(s"""$duckSpansCte,
              |sp AS (SELECT doc_id, list(struct_pack(a := span_start, b := span_end)) AS sps
              |       FROM spans GROUP BY doc_id),
              |base AS (SELECT doc_id, $DuckToks AS w FROM documents),
              |j AS (SELECT b.doc_id, b.w,
              |        COALESCE(s.sps, CAST([] AS STRUCT(a BIGINT, b BIGINT)[])) AS sps
              |      FROM base b LEFT JOIN sp s USING (doc_id)),
              |k AS (SELECT doc_id,
              |        list_filter(
              |          list_transform(range(1, len(w) + 1),
              |            i -> struct_pack(t := w[CAST(i AS INTEGER)], p := CAST(i - 1 AS BIGINT))),
              |          e -> len(list_filter(sps, r -> r.a <= e.p AND e.p <= r.b)) = 0) AS kept,
              |        len(w) AS n
              |      FROM j)
              |SELECT doc_id,
              |  COALESCE(array_to_string(list_transform(kept, e -> e.t), ' '), '') AS clean_text,
              |  CAST(n - len(kept) AS BIGINT) AS n_removed
              |FROM k ORDER BY doc_id""".stripMargin)),

    // X2: span-level benchmark DECONTAMINATION (E215) — the surgical twin
    // of x2_contamination's whole-doc containment gate: corpus windows
    // whose text appears in ANY benchmark document mark their ranges, the
    // merged spans drop, the rest of the document SURVIVES. The benchmark
    // is derived deterministically from the fixture (tokens 11..26 of every
    // doc_id % 37 == 0 document — a planted eval-set leak both engines
    // replay). Cross-set only: ordinary corpus↔corpus duplicate spans do
    // NOT drop here.
    Q("x2_decontaminate_spans",
      (s, d) => {
        val docs = Tables.load(s, d, "documents")
        val bench = docs.filter(pmod(col("doc_id"), lit(37)) === 0)
          .select(col("doc_id"),
            concat_ws(" ", slice(TextOps.tokens(col("text")), 11, 16)).as("text"))
        DedupOps.removeContaminatedSpans(docs, bench, window = 6)
      },
      Some(s"""WITH toks AS (SELECT doc_id, $DuckToks AS w FROM documents),
              |bt AS (SELECT list_slice(w, 11, 26) AS bw FROM toks WHERE doc_id % 37 = 0),
              |bwx AS (SELECT unnest(list_transform(range(0, greatest(len(bw) - 5, 0)),
              |          i -> array_to_string(list_slice(bw, CAST(i + 1 AS INTEGER), CAST(i + 6 AS INTEGER)), ' '))) AS wkey
              |        FROM bt),
              |bk AS (SELECT DISTINCT wkey FROM bwx),
              |wx AS (SELECT doc_id,
              |         unnest(list_transform(range(0, greatest(len(w) - 5, 0)),
              |           i -> struct_pack(s := i,
              |                 k := array_to_string(list_slice(w, CAST(i + 1 AS INTEGER), CAST(i + 6 AS INTEGER)), ' ')))) AS x
              |       FROM toks),
              |wins AS (SELECT doc_id, CAST(x.s AS BIGINT) AS st, x.k AS wkey FROM wx),
              |d AS (SELECT doc_id, st, st + 5 AS en FROM wins WHERE wkey IN (SELECT wkey FROM bk)),
              |m AS (SELECT doc_id, st, en,
              |        CASE WHEN max(en) OVER (PARTITION BY doc_id ORDER BY st
              |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              |          OR st > max(en) OVER (PARTITION BY doc_id ORDER BY st
              |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
              |        THEN 1 ELSE 0 END AS new_span FROM d),
              |g AS (SELECT doc_id, st, en,
              |        SUM(new_span) OVER (PARTITION BY doc_id ORDER BY st
              |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
              |      FROM m),
              |spans AS (SELECT doc_id, span_id, MIN(st) AS span_start, MAX(en) AS span_end
              |          FROM g GROUP BY doc_id, span_id),
              |sp AS (SELECT doc_id, list(struct_pack(a := span_start, b := span_end)) AS sps
              |       FROM spans GROUP BY doc_id),
              |base AS (SELECT doc_id, w FROM toks),
              |j AS (SELECT b.doc_id, b.w,
              |        COALESCE(s.sps, CAST([] AS STRUCT(a BIGINT, b BIGINT)[])) AS sps
              |      FROM base b LEFT JOIN sp s USING (doc_id)),
              |k AS (SELECT doc_id,
              |        list_filter(
              |          list_transform(range(1, len(w) + 1),
              |            i -> struct_pack(t := w[CAST(i AS INTEGER)], p := CAST(i - 1 AS BIGINT))),
              |          e -> len(list_filter(sps, r -> r.a <= e.p AND e.p <= r.b)) = 0) AS kept,
              |        len(w) AS n
              |      FROM j)
              |SELECT doc_id,
              |  COALESCE(array_to_string(list_transform(kept, e -> e.t), ' '), '') AS clean_text,
              |  CAST(n - len(kept) AS BIGINT) AS n_removed
              |FROM k ORDER BY doc_id""".stripMargin)),

    // X2: cross-document repeated-LINE removal (the C4/MassiveText cleaning
    // rule at newline granularity — between whole-doc dedup and span dedup):
    // a trimmed line occurring in >1 distinct documents drops everywhere;
    // blank lines are structure and survive. One map-combined min≠max
    // exchange on the md5 line key + the co-partitioned anti-join — never a
    // countDistinct pre-shuffle or a per-key occurrence list. Oracle groups
    // by the trimmed line text (fingerprint equivalence classes).
    Q("x2_line_dedup",
      (s, d) => DedupOps.removeDuplicateLines(Tables.load(s, d, "documents")),
      Some("""WITH sp AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
             |l0 AS (SELECT doc_id, unnest(list_transform(range(1, len(ls) + 1),
             |         i -> struct_pack(pos := i - 1, line := ls[CAST(i AS INTEGER)]))) AS e
             |       FROM sp),
             |l AS (SELECT doc_id, e.pos AS pos, e.line AS line FROM l0),
             |dup AS (SELECT trim(line) AS k FROM l WHERE trim(line) <> ''
             |        GROUP BY 1 HAVING min(doc_id) <> max(doc_id)),
             |kept AS (SELECT * FROM l WHERE trim(line) NOT IN (SELECT k FROM dup)),
             |reb AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
             |          count(*) AS n_kept
             |        FROM kept GROUP BY doc_id)
             |SELECT d.doc_id, coalesce(reb.text, '') AS text,
             |  CAST(len(string_split(d.text, chr(10))) - coalesce(reb.n_kept, 0) AS BIGINT) AS n_removed
             |FROM documents d LEFT JOIN reb ON reb.doc_id = d.doc_id
             |ORDER BY d.doc_id""".stripMargin),
      headline = true),

    // X4: linear quality-classifier INFERENCE (fastText shape: hashed
    // bag-of-words · weights → decision; md5-derived fixture weights stand
    // in for a trained model — the judged surface is the map-only inference
    // plumbing). Integer per-term contributions summed exactly (order-free);
    // the published score is the LOGIT (one IEEE-exact division — the
    // sigmoid is monotone, so the decision is identical, while exp() is
    // 1-ulp nondeterministic across libm implementations).
    Q("x4_quality_classifier",
      (s, d) => TextOps.qualityClassify(Tables.load(s, d, "documents")),
      Some(s"""WITH t AS (SELECT doc_id, unnest($DuckToks) AS term FROM documents),
              |tc AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
              |agg AS (SELECT doc_id,
              |          SUM((CAST(concat('0x', substring(md5(term), 1, 15)) AS BIGINT) % 1001 - 500) * tf) AS w,
              |          SUM(tf) AS n
              |        FROM tc GROUP BY doc_id)
              |SELECT d.doc_id, CAST(coalesce(n, 0) AS BIGINT) AS n_tokens,
              |  CASE WHEN coalesce(n, 0) = 0 THEN 0.0
              |       ELSE CAST(w AS DOUBLE) / (n * 500.0) END AS logit,
              |  (CASE WHEN coalesce(n, 0) = 0 THEN 0.0
              |        ELSE CAST(w AS DOUBLE) / (n * 500.0) END) >= 0.0 AS keep
              |FROM documents d LEFT JOIN agg USING (doc_id)
              |ORDER BY d.doc_id""".stripMargin)),

    // X4: quality-filter FUNNEL — four composed cleaning rules with the
    // first-failing-stage audit label, one map-only pass. All predicates
    // are integer-exact (the classifier stage thresholds the raw integer
    // wsum, not the float logit), so the label column is bit-oracle-able.
    Q("x4_filter_funnel",
      (s, d) => TextOps.filterFunnel(Tables.load(s, d, "documents"),
        FunnelRules.stages),
      Some(s"""WITH t AS (SELECT doc_id, $DuckToks AS w FROM documents),
              |st AS (SELECT doc_id, len(w) AS n,
              |         coalesce(list_sum(list_transform(w, x -> len(x))), 0) AS chars
              |       FROM t),
              |tm AS (SELECT doc_id, unnest(w) AS term FROM t),
              |tc AS (SELECT doc_id, term, count(*) AS tf FROM tm GROUP BY 1, 2),
              |cls AS (SELECT doc_id,
              |          SUM((CAST(concat('0x', substring(md5(term), 1, 15)) AS BIGINT) % ${FunnelRules.ClassifierMod} - ${FunnelRules.ClassifierShift}) * tf) AS wsum
              |        FROM tc GROUP BY doc_id)
              |SELECT st.doc_id,
              |  CASE WHEN NOT (st.n >= ${FunnelRules.MinTokens}) THEN 'too_short'
              |       WHEN NOT (st.n <= ${FunnelRules.MaxTokens}) THEN 'too_long'
              |       WHEN NOT (st.chars >= st.n * ${FunnelRules.MinCharsPerToken} AND st.chars <= st.n * ${FunnelRules.MaxCharsPerToken}) THEN 'word_len'
              |       WHEN NOT (coalesce(cls.wsum, 0) >= 0) THEN 'low_quality'
              |       ELSE NULL END AS dropped_at
              |FROM st LEFT JOIN cls USING (doc_id)
              |ORDER BY st.doc_id""".stripMargin)),

    // X4: sliding context-window chunking (RAG / training-example windows):
    // window-token chunks every stride tokens, final chunk pinned to the
    // tail so no tokens drop. Map-only per-row array arithmetic.
    Q("x4_chunk_windows",
      (s, d) => TextOps.chunkWindows(Tables.load(s, d, "documents"),
        window = 32, stride = 24),
      Some(s"""WITH t AS (SELECT doc_id, $DuckToks AS w FROM documents),
              |p AS (SELECT doc_id, w, len(w) AS n, GREATEST(len(w) - 32, CAST(0 AS BIGINT)) AS last
              |      FROM t WHERE len(w) > 0),
              |s AS (SELECT doc_id, w,
              |        CASE WHEN last % 24 = 0 THEN range(0, last + 1, 24)
              |             ELSE list_append(range(0, last + 1, 24), last) END AS starts
              |      FROM p),
              |c0 AS (SELECT doc_id, w, unnest(list_transform(range(1, len(starts) + 1),
              |         i -> struct_pack(cid := i - 1, s := starts[CAST(i AS INTEGER)]))) AS e
              |       FROM s)
              |SELECT doc_id, CAST(e.cid AS BIGINT) AS chunk_id,
              |  CAST(e.s AS BIGINT) AS start,
              |  array_to_string(list_slice(w, e.s + 1, e.s + 32), ' ') AS chunk,
              |  CAST(len(list_slice(w, e.s + 1, e.s + 32)) AS BIGINT) AS n_tokens
              |FROM c0 ORDER BY doc_id, chunk_id""".stripMargin)),

    // X2: SimHash Hamming-≤3 pairs. The 60-bit sketch is built from md5
    // token hashes, so DuckDB rebuilds the identical sketches (per-bit
    // majorities), bands, candidate pairs and Hamming distances — the
    // approximate sketch output itself is hash-oracled.
    Q("x2_simhash_pairs",
      (s, d) => DedupOps.simhashPairs(Tables.load(s, d, "documents")),
      Some(s"""WITH toks AS (SELECT doc_id, $DuckToks AS w FROM documents),
              |th AS (SELECT doc_id, CAST(concat('0x', substring(md5(t), 1, 15)) AS BIGINT) AS h
              |       FROM (SELECT doc_id, unnest(w) AS t FROM toks) u),
              |bits AS (SELECT doc_id, b, SUM(CASE WHEN (h >> CAST(b AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS s
              |         FROM th, range(60) r(b) GROUP BY doc_id, b),
              |sk AS (SELECT doc_id, CAST(SUM(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) ELSE 0 END) AS BIGINT) AS simhash
              |       FROM bits GROUP BY doc_id),
              |ch AS (SELECT doc_id, simhash, c AS band, (simhash >> CAST(c * 15 AS INTEGER)) & 32767 AS chunk
              |       FROM sk, range(4) r(c)),
              |p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.simhash AS sa, b.simhash AS sb
              |      FROM ch a JOIN ch b ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
              |SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
              |FROM p WHERE bit_count(xor(sa, sb)) <= 3 ORDER BY doc_a, doc_b""".stripMargin)),

    // X2: NEAR-DUP benchmark decontamination (r16 verdict #7 — the
    // paraphrase-leak case x2_decontaminate_spans' exact windows miss):
    // corpus docs (doc_id % 7 != 0) whose SimHash lands within Hamming 3
    // of ANY benchmark doc's (doc_id % 7 == 0) flag with their match count
    // and closest distance. Cross-set only; every hash md5-derived, so
    // DuckDB replays sketch, banding and the Hamming ball bit-for-bit.
    Q("x2_decontaminate_near",
      (s, d) => {
        val docs = Tables.load(s, d, "documents")
        DedupOps.nearContaminated(
          corpus = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0),
          bench = docs.filter(pmod(col("doc_id"), lit(7)) === 0))
      },
      Some(s"""WITH toks AS (SELECT doc_id, $DuckToks AS w FROM documents),
              |th AS (SELECT doc_id, CAST(concat('0x', substring(md5(t), 1, 15)) AS BIGINT) AS h
              |       FROM (SELECT doc_id, unnest(w) AS t FROM toks) u),
              |bits AS (SELECT doc_id, b, SUM(CASE WHEN (h >> CAST(b AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS s
              |         FROM th, range(60) r(b) GROUP BY doc_id, b),
              |sk AS (SELECT doc_id, CAST(SUM(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) ELSE 0 END) AS BIGINT) AS simhash
              |       FROM bits GROUP BY doc_id),
              |ch AS (SELECT doc_id, simhash, c AS band, (simhash >> CAST(c * 15 AS INTEGER)) & 32767 AS chunk
              |       FROM sk, range(4) r(c)),
              |corp AS (SELECT * FROM ch WHERE doc_id % 7 <> 0),
              |ben AS (SELECT doc_id AS bench_id, simhash AS bsim, band, chunk FROM ch WHERE doc_id % 7 = 0),
              |p AS (SELECT DISTINCT c.doc_id, b.bench_id, bit_count(xor(c.simhash, b.bsim)) AS hamming
              |      FROM corp c JOIN ben b ON c.band = b.band AND c.chunk = b.chunk
              |      WHERE bit_count(xor(c.simhash, b.bsim)) <= 3)
              |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bench_matches,
              |       CAST(MIN(hamming) AS INTEGER) AS min_hamming
              |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // X2: INCREMENTAL corpus dedup — the persistent LSH index as an engine
    // table (DedupIndex): even-id docs populate the index (batch 0,
    // self-deduped), odd-id docs are filtered against it then self-deduped
    // (batch 1); output = batch-1 survivors. Every hash is md5-derived, so
    // DuckDB replays the sketches, the banding, and both dedup rules
    // bit-for-bit — the full incremental pipeline is oracled, including the
    // two replay-fenced table commits it rides on.
    Q("x2_dedup_index",
      (s, d) => {
        val docs = Tables.load(s, d, "documents")
        val root = java.nio.file.Files.createTempDirectory("graft_dedup_idx").toString + "/idx"
        val index = graft.ops.DedupIndex.create(s, root)
        graft.ops.DedupIndex.appendBatch(index, docs.filter(col("doc_id") % 2 === 0), 0)
        graft.ops.DedupIndex.appendBatch(index, docs.filter(col("doc_id") % 2 === 1), 1)
      },
      Some(DuckDedupIndexSql),
      // micro-batch pipeline (2 fenced table commits), not an analytic
      // query: native shuffle partitions, and the DuckDB wall-clock ratio
      // is a freshness comparison, not a per-query one
      headline = true, streaming = true),

    // The SQL/CALL surface of the SAME incremental dedup flow (verdict r14
    // #3: every pipeline feature reachable from SQL): index created,
    // appended (twice, replay-fenced) and its kept sets consumed entirely
    // through `CALL graft.system.dedup_index_*` + temp views — no Scala
    // API in the query body. The oracle IS x2_dedup_index's oracle
    // (shared constant), so the two surfaces can never drift.
    Q("cdc_dedup_index_sql",
      (s, d) => {
        val docs = Tables.load(s, d, "documents")
        val cat = s"graft_dix${System.nanoTime()}"
        val w = java.nio.file.Files.createTempDirectory("graft_dix_sql").toString
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
        docs.filter(col("doc_id") % 2 === 0).createOrReplaceTempView("dix_even")
        docs.filter(col("doc_id") % 2 === 1).createOrReplaceTempView("dix_odd")
        s.sql(s"CALL $cat.system.dedup_index_create('db.idx')").collect()
        s.sql(s"CALL $cat.system.dedup_index_append('db.idx', 'dix_even', 0, 'dix_kept0')").collect()
        s.sql(s"CALL $cat.system.dedup_index_append('db.idx', 'dix_odd', 1, 'dix_kept1')").collect()
        s.sql("SELECT doc_id FROM dix_kept1 ORDER BY doc_id")
      },
      Some(DuckDedupIndexSql)),

    // X2: DELETE maintenance on the persistent dedup index (r19 — the
    // banded family's takedown path): evens index as batch 0, a takedown
    // epoch removes every doc_id % 10 == 0 representative, odds filter
    // against the POST-DELETE index as batch 2. An odd doc whose only
    // collision was with a removed representative is now ADMITTED — the
    // exact suppression a no-delete index would silently keep applying.
    // The oracle is the shared replay restricted to delete survivors, so
    // banding, both dedup rules, AND the fenced row removal are all
    // DuckDB-verified bit-for-bit.
    Q("x2_dedup_index_delete",
      (s, d) => {
        val docs = Tables.load(s, d, "documents")
        val root = java.nio.file.Files.createTempDirectory("graft_dedup_del").toString + "/idx"
        val index = graft.ops.DedupIndex.create(s, root)
        graft.ops.DedupIndex.appendBatch(index, docs.filter(col("doc_id") % 2 === 0), 0)
        graft.ops.DedupIndex.deleteBatch(index,
          docs.filter(col("doc_id") % 10 === 0).select("doc_id"), batchId = 1)
        graft.ops.DedupIndex.appendBatch(index, docs.filter(col("doc_id") % 2 === 1), 2)
      },
      Some(duckDedupIndexSql("WHERE doc_id % 10 <> 0")),
      streaming = true),

    // X2: the Jaccard skew cap EXERCISED under oracle — maxDocFreq=4 drops
    // non-discriminative shingles (df 5-8 at this SF) before pair expansion,
    // the guard that bounds per-shingle blowup at web scale. The oracle
    // applies the identical df filter, so this proves the capped
    // configuration end-to-end, not just the parity-friendly uncapped one.
    Q("x2_jaccard_capped",
      (s, d) => DedupOps.jaccardPairs(Tables.load(s, d, "documents"),
        threshold = 0.5, maxDocFreq = Some(4)),
      headline = true,
      oracle =
      Some(s"""WITH toks AS (SELECT doc_id, $DuckToks AS w FROM documents),
              |sh AS (SELECT DISTINCT doc_id,
              |         unnest(list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
              |       FROM toks WHERE len(w) >= 3),
              |df AS (SELECT s, COUNT(*) AS c FROM sh GROUP BY s),
              |capped AS (SELECT sh.doc_id, sh.s FROM sh JOIN df ON sh.s = df.s WHERE df.c <= 4),
              |sz AS (SELECT doc_id, COUNT(*) AS n FROM capped GROUP BY doc_id),
              |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
              |          FROM capped a JOIN capped b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
              |SELECT doc_a, doc_b, n_common,
              |  CAST(n_common AS DOUBLE) / CAST(sa.n + sb.n - n_common AS DOUBLE) AS jaccard
              |FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
              |WHERE CAST(n_common AS DOUBLE) / CAST(sa.n + sb.n - n_common AS DOUBLE) >= 0.5""".stripMargin)),

    // X3: exact brute-force cosine top-5 for query vectors vec_id < 8.
    Q("x3_cosine_topk",
      (s, d) => {
        val e = Tables.load(s, d, "embeddings")
        SimilarityOps.cosineTopK(e, e.filter(col("vec_id") < 8), k = 5)
          .orderBy("qid", "rnk")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 8),
             |p AS (SELECT q.qid, e.vec_id,
             |        list_dot_product(q.qv, e.v) /
             |        (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) AS cos
             |      FROM q, e WHERE e.vec_id <> q.qid)
             |SELECT qid, vec_id AS neighbor_id, rnk FROM (
             |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
             |  FROM p) AS t
             |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin),
      headline = true),

    // X3: INT8 scalar-quantized top-k — the memory-bound ANN path (4
    // bytes/dim → 1). Scores run on DEQUANTIZED levels (min + q·scale), so
    // the approximation itself is deterministic: the oracle rebuilds the
    // identical quantize→dequantize→score pipeline, no tolerance compare.
    Q("x3_quantized_topk",
      (s, d) => {
        val e = Tables.load(s, d, "embeddings")
        SimilarityOps.quantizedTopK(e, e.filter(col("vec_id") < 8), k = 5)
          .orderBy("qid", "rnk")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |dq AS (SELECT vec_id,
             |         list_transform(v, x -> mn + least(greatest(
             |           CASE WHEN sc = 0.0 THEN 0.0 ELSE floor((x - mn) / sc) END,
             |           0.0), 255.0) * sc) AS v
             |       FROM (SELECT vec_id, v, list_min(v) AS mn,
             |               (list_max(v) - list_min(v)) / 255.0 AS sc FROM e)),
             |q AS (SELECT vec_id AS qid, v AS qv FROM dq WHERE vec_id < 8),
             |p AS (SELECT q.qid, dq.vec_id,
             |        list_dot_product(q.qv, dq.v) /
             |        (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(dq.v, dq.v))) AS cos
             |      FROM q, dq WHERE dq.vec_id <> q.qid)
             |SELECT qid, vec_id AS neighbor_id, rnk FROM (
             |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
             |  FROM p) AS t
             |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin)),

    // X3: LSH-bucketed approximate top-k (the 100 TB path). The hyperplanes
    // are md5-derived (SimilarityOps.md5Planes), so the oracle REBUILDS the
    // approximate pipeline itself — planes → signatures → (table, sig)
    // candidate buckets → exact cosine → top-k — and hash-matches the
    // approximate answer, whatever its recall vs exact. Params (6 bits × 16
    // tables) are the genuine scale settings, not recall-1-by-construction.
    Q("x3_ann_lsh_topk",
      (s, d) => {
        val e = Tables.load(s, d, "embeddings")
        SimilarityOps.annTopK(e, e.filter(col("vec_id") < 8), k = 5, dim = 64)
          .orderBy("qid", "rnk")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |pl AS (SELECT t, b, list_transform(range(0, 64), i ->
             |         CASE WHEN CAST(concat('0x', substring(md5(CAST(t AS VARCHAR) || '_' || CAST(b AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 1)) AS INTEGER) < 8
             |              THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END) AS p
             |       FROM range(16) r1(t), range(6) r2(b)),
             |sg AS (SELECT e.vec_id, pl.t,
             |         CAST(SUM(CASE WHEN list_dot_product(e.v, pl.p) >= 0 THEN (CAST(1 AS BIGINT) << CAST(pl.b AS INTEGER)) ELSE 0 END) AS BIGINT) AS sig
             |       FROM e, pl GROUP BY e.vec_id, pl.t),
             |cand AS (SELECT DISTINCT qs.vec_id AS qid, cs.vec_id AS nid
             |         FROM sg qs JOIN sg cs ON qs.t = cs.t AND qs.sig = cs.sig
             |         WHERE qs.vec_id < 8 AND cs.vec_id <> qs.vec_id),
             |sc AS (SELECT c.qid, c.nid,
             |         list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
             |       FROM cand c JOIN e a ON a.vec_id = c.qid JOIN e b ON b.vec_id = c.nid)
             |SELECT qid, nid AS neighbor_id, rnk FROM (
             |  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rnk FROM sc) z
             |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin)),

    // X3: IVF-bucketed approximate top-k (coarse-quantizer scale path).
    // Registered with iters=0 — the seeded quantizer, cell assignment, probe
    // selection and in-cell exact scoring are all md5/exact-double math that
    // DuckDB replays bit-for-bit. (Lloyd refinement stays engine-side: a
    // distributed avg is not bit-reproducible across engines; it is covered
    // by DedupSimilaritySpec instead.)
    Q("x3_ann_ivf_topk",
      (s, d) => {
        val e = Tables.load(s, d, "embeddings")
        SimilarityOps.ivfTopK(e, e.filter(col("vec_id") < 8), k = 5, dim = 64, iters = 0)
          .orderBy("qid", "rnk")
      },
      Some("""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v0 FROM embeddings),
             |e AS (SELECT vec_id, list_transform(v0, x -> x / sqrt(list_dot_product(v0, v0))) AS v FROM e0),
             |nn AS (SELECT COUNT(*) AS n FROM e),
             |seeds0 AS (SELECT vec_id FROM e, nn
             |           WHERE CAST(concat('0x', substring(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT) % GREATEST(1, n // 16) = 0
             |           ORDER BY vec_id LIMIT 16),
             |seeds AS (SELECT vec_id FROM seeds0
             |          UNION ALL
             |          SELECT vec_id FROM (SELECT vec_id FROM e ORDER BY vec_id LIMIT 16) f
             |          WHERE (SELECT COUNT(*) FROM seeds0) = 0),
             |cent AS (SELECT row_number() OVER (ORDER BY s.vec_id) - 1 AS cell, e.v AS cv
             |         FROM seeds s JOIN e ON e.vec_id = s.vec_id),
             |asg AS (SELECT vec_id, cell FROM (
             |          SELECT e.vec_id, c.cell, row_number() OVER (PARTITION BY e.vec_id ORDER BY list_dot_product(e.v, c.cv) DESC, c.cell) AS rn
             |          FROM e, cent c) z WHERE rn = 1),
             |pr AS (SELECT vec_id AS qid, cell FROM (
             |          SELECT e.vec_id, c.cell, row_number() OVER (PARTITION BY e.vec_id ORDER BY list_dot_product(e.v, c.cv) DESC, c.cell) AS rn
             |          FROM e, cent c WHERE e.vec_id < 8) z WHERE rn <= 4),
             |sc AS (SELECT pr.qid, a.vec_id AS nid, list_dot_product(qe.v, ae.v) AS cos
             |       FROM pr JOIN asg a ON a.cell = pr.cell
             |       JOIN e qe ON qe.vec_id = pr.qid JOIN e ae ON ae.vec_id = a.vec_id
             |       WHERE a.vec_id <> pr.qid)
             |SELECT qid, nid AS neighbor_id, rnk FROM (
             |  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rnk FROM sc) z
             |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin)),

    // X3: PERSISTENT ANN index (AnnIndex — the similarity twin of the dedup
    // index): frozen md5-seeded centroids + partitioned assignment table
    // built across THREE replay-fenced incremental batches with compaction
    // cadence, then a partition-pruned probe. Deterministic end-to-end, so
    // the oracle rebuilds the whole flow — batch-0 seed choice → frozen
    // centroids → assignment → probe cells → in-cell exact scoring — and
    // hash-matches the approximate answer itself.
    Q("x3_ann_index",
      (s, d) => {
        val e = Tables.load(s, d, "embeddings")
        val root = java.nio.file.Files.createTempDirectory("graft_ann_index")
          .toString + "/idx"
        val h = AnnIndex.create(s, root, e.filter(col("vec_id") % 3 === 0),
          cells = 16)
        (0 until 3).foreach(b => AnnIndex.appendBatch(h,
          e.filter(col("vec_id") % 3 === b), batchId = b, compactEvery = 2))
        AnnIndex.probe(AnnIndex.open(s, root), e.filter(col("vec_id") < 8),
          k = 5, nprobe = 4).orderBy("qid", "rnk")
      },
      Some(duckAnnIndexSql(scExtra = "")),
      // headline: the r13 verdict asks 30x coverage for the persistent ANN
      // index; a fenced micro-batch pipeline -> streaming tier (native
      // shuffle partitions, freshness-framed like x2_dedup_index)
      headline = true, streaming = true),

    // The SQL/CALL surface of the SAME persistent-ANN flow (verdict r14
    // #3): index created, 3 batches appended (fenced, compaction cadence),
    // probed and drift-inspected entirely through
    // `CALL graft.system.ann_*` + temp views — no Scala API in the query
    // body. The oracle IS x3_ann_index's oracle (shared builder), so the
    // two surfaces cannot drift. ann_status rides along as an engine-side
    // sanity gate (vector count + live quantizer width).
    Q("cdc_ann_probe_sql",
      (s, d) => {
        val e = Tables.load(s, d, "embeddings")
        val cat = s"graft_ann${System.nanoTime()}"
        val w = java.nio.file.Files.createTempDirectory("graft_ann_sql").toString
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
        (0 until 3).foreach(b => e.filter(col("vec_id") % 3 === b)
          .createOrReplaceTempView(s"annsql_b$b"))
        e.filter(col("vec_id") < 8).createOrReplaceTempView("annsql_q")
        s.sql(s"CALL $cat.system.ann_index_create('db.ann', 'annsql_b0', 16)").collect()
        (0 until 3).foreach(b => s.sql(
          s"CALL $cat.system.ann_index_append('db.ann', 'annsql_b$b', $b, 2)").collect())
        s.sql(s"CALL $cat.system.ann_probe('db.ann', 'annsql_q', 5, 4, 'annsql_hits')").collect()
        val st = s.sql(s"CALL $cat.system.ann_status('db.ann')").collect()(0)
        // the md5-stride seed rule may choose fewer than the requested 16
        // cells (LIMIT over the stride survivors) — the oracle replays that
        require(st.getLong(0) == e.count() &&
          st.getLong(1) >= 1L && st.getLong(1) <= 16L,
          s"ann_status must see the whole index under the live quantizer: $st")
        s.sql("SELECT qid, neighbor_id, rnk FROM annsql_hits ORDER BY qid, rnk")
      },
      Some(duckAnnIndexSql(scExtra = ""))),

    // STREAMING ANN ingest (E183): the SAME persistent-ANN flow fed by a
    // checkpointed embedding stream — three JSON-lines micro-batches (the
    // x3_ann_index batch split), a RESTART boundary between them, fenced
    // assignment merges per epoch. Assignments depend only on the frozen
    // centroids and the vector, so the streamed index bit-matches the
    // batch build and the probe shares x3_ann_index's oracle — the three
    // surfaces (Scala batch, CALL, stream) cannot drift.
    Q("cdc_ann_stream",
      (s, d) => {
        import java.nio.file.{Files, Paths}
        val e = Tables.load(s, d, "embeddings")
        val root = Files.createTempDirectory("graft_ann_stream").toString + "/idx"
        val in = Files.createTempDirectory("graft_ann_in").toString
        val ckpt = Files.createTempDirectory("graft_ann_ckpt").toString
        val h = AnnIndex.create(s, root, e.filter(col("vec_id") % 3 === 0),
          cells = 16)
        def drop(b: Int): Unit = {
          val stage = Files.createTempDirectory("graft_ann_stage").toString + "/s"
          e.filter(col("vec_id") % 3 === b)
            .select(to_json(struct(col("vec_id"),
              col("embedding").cast("array<double>").as("embedding"))))
            .coalesce(1).write.text(stage)
          val part = graft.util.Fs.listSeq(Paths.get(stage))
            .find(_.getFileName.toString.startsWith("part-")).get
          Files.move(part, Paths.get(in, s"b$b.json"))
        }
        def runOnce(): Unit = {
          val q = graft.stream.VectorPipeline.run(s, in, ckpt, h,
            compactEvery = 2)
          q.awaitTermination()
        }
        drop(0); drop(1); runOnce() // two micro-batches
        drop(2); runOnce()          // restart boundary, third epoch
        AnnIndex.probe(AnnIndex.open(s, root), e.filter(col("vec_id") < 8),
          k = 5, nprobe = 4).orderBy("qid", "rnk")
      },
      Some(duckAnnIndexSql(scExtra = "")), streaming = true),

    // DELETE maintenance on the persistent ANN index (r17 review #4 — the
    // one index family that could not forget): the same 3-batch build,
    // then a corpus removal feed (every vec_id % 7 == 0 — the shape a SQL
    // DELETE / keep-best eviction / decontamination drop produces) leaves
    // the index in ONE fenced delete epoch, and the probe returns the
    // exact in-cell top-5 of the SURVIVORS — no ghost neighbors. The
    // oracle is the shared ANN replay with the candidate set restricted
    // to surviving ids (centroids and probe cells are untouched by
    // deletes — only candidates leave), so the post-delete state is
    // hash-matched end to end.
    Q("cdc_ann_delete_state",
      (s, d) => {
        val e = Tables.load(s, d, "embeddings")
        val root = java.nio.file.Files.createTempDirectory("graft_ann_del")
          .toString + "/idx"
        val h = AnnIndex.create(s, root, e.filter(col("vec_id") % 3 === 0),
          cells = 16)
        (0 until 3).foreach(b => AnnIndex.appendBatch(h,
          e.filter(col("vec_id") % 3 === b), batchId = b, compactEvery = 2))
        AnnIndex.deleteBatch(h, e.filter(col("vec_id") % 7 === 0)
          .select("vec_id"), batchId = 3)
        AnnIndex.probe(AnnIndex.open(s, root), e.filter(col("vec_id") < 8),
          k = 5, nprobe = 4).orderBy("qid", "rnk")
      },
      Some(duckAnnIndexSql(scExtra = " AND a.vec_id % 7 <> 0"))),

    // STREAMING IVF-PQ codes maintenance (E205): through r16 wave 1 the
    // codes table was batch-built only — streamed vectors were invisible
    // to compressed-domain probes until a rebuild. Here the books train on
    // the unit SEED vectors (the 8 lowest % 3 == 0 ids), the codes table
    // starts empty with the books stamped, and all three epochs stream
    // through VectorPipeline WITH codes maintenance across a restart
    // boundary; the probe then scores ADC over codes exactly as fresh as
    // the index. Books and centroids are both frozen, so the streamed
    // codes bit-match a one-shot build — the oracle is the IVF-PQ replay
    // with the codebook population pinned to the seed epoch.
    Q("cdc_pq_stream",
      (s, d) => {
        import java.nio.file.{Files, Paths}
        val e = Tables.load(s, d, "embeddings")
        val root = Files.createTempDirectory("graft_pq_stream").toString
        val in = Files.createTempDirectory("graft_pqs_in").toString
        val ckpt = Files.createTempDirectory("graft_pqs_ckpt").toString
        val h = AnnIndex.create(s, s"$root/idx", e.filter(col("vec_id") % 3 === 0),
          cells = 16)
        // books train on the UNIT seed vectors BEFORE any ingest (the
        // stream's own epoch ids start at 0, so nothing may pre-advance
        // the fence); the codes table starts empty with the books stamped
        val v0 = SimilarityOps.asDouble(col("embedding"))
        val unitSeeds = e.filter(col("vec_id") % 3 === 0)
          .select(col("vec_id"),
            transform(v0, x => x / sqrt(SimilarityOps.dot(v0, v0))).as("embedding"))
        val books = graft.ops.PqOps.codebooks(unitSeeds, m = 4, k = 8)
        val codes = graft.ops.PqOps.buildPqCodes(h, s"$root/codes", books)
        def drop(b: Int): Unit = {
          val stage = Files.createTempDirectory("graft_pqs_stage").toString + "/s"
          e.filter(col("vec_id") % 3 === b)
            .select(to_json(struct(col("vec_id"),
              col("embedding").cast("array<double>").as("embedding"))))
            .coalesce(1).write.text(stage)
          val part = graft.util.Fs.listSeq(Paths.get(stage))
            .find(_.getFileName.toString.startsWith("part-")).get
          Files.move(part, Paths.get(in, s"b$b.json"))
        }
        def runOnce(): Unit = {
          val q = graft.stream.VectorPipeline.run(s, in, ckpt, h,
            compactEvery = 2, codes = Some(codes))
          q.awaitTermination()
        }
        drop(0); drop(1); runOnce() // two micro-batches, codes maintained
        drop(2); runOnce()          // restart boundary, third epoch
        AnnIndex.probePq(h, codes, books, e.filter(col("vec_id") < 8),
          k = 5, nprobe = 4).orderBy("qid", "rnk")
      },
      Some(s"""${duckIvfPqCtes("WHERE vec_id % 3 = 0")}
             |SELECT qid, nid AS neighbor_id, adc, CAST(rnk AS INT) AS rnk FROM (
             |  SELECT qid, nid, adc,
             |    row_number() OVER (PARTITION BY qid ORDER BY adc DESC, nid) AS rnk
             |  FROM adc) z
             |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin),
      streaming = true),

    // X3: IVF-PQ (E186) — the canonical memory-bounded 100 TB ANN layout
    // composed from the two oracled halves: the IVF index picks nprobe
    // cells per query (x3_ann_index's rule), and candidates score via ADC
    // over a CELL-PARTITIONED PQ codes table (PqOps.buildPqCodes — m ints
    // per vector, codebooks trained on the index's own unit vectors) —
    // the probe reads only the probed cells' code rows, raw vectors never
    // load. DuckDB replays seed choice, cells, codebooks, encoding, and
    // every ADC score bit-for-bit.
    Q("x3_ivf_pq",
      (s, d) => {
        val e = Tables.load(s, d, "embeddings")
        val root = java.nio.file.Files.createTempDirectory("graft_ivfpq")
          .toString
        val h = AnnIndex.create(s, s"$root/idx", e.filter(col("vec_id") % 3 === 0),
          cells = 16)
        (0 until 3).foreach(b => AnnIndex.appendBatch(h,
          e.filter(col("vec_id") % 3 === b), batchId = b, compactEvery = 2))
        val hh = AnnIndex.open(s, s"$root/idx")
        val books = graft.ops.PqOps.codebooks(
          hh.assignments.scan().select(col("vec_id"), col("v").as("embedding")),
          m = 4, k = 8)
        val codes = graft.ops.PqOps.buildPqCodes(hh, s"$root/codes", books)
        AnnIndex.probePq(hh, codes, books, e.filter(col("vec_id") < 8),
          k = 5, nprobe = 4).orderBy("qid", "rnk")
      },
      Some(DuckIvfPqSql),
      // headline: the round's marquee scale feature — index build + code
      // build + compressed-domain probes, scaled-tier covered like
      // x3_ann_index
      headline = true),

    // X3: RESIDUAL IVF-PQ (E191 — the FAISS IVF-ADC layout): codes quantize
    // the residual v − centroid(cell) (small magnitudes → finer resolution
    // for the same code budget), and the probe score decomposes exactly as
    // dot(q, centroid) + ADC(residual codes) — the centroid term computes
    // once per (query, probed cell). The oracle replays residual training,
    // encoding, and the pinned-association score bit-for-bit.
    Q("x3_ivf_pq_residual",
      (s, d) => {
        val e = Tables.load(s, d, "embeddings")
        val root = java.nio.file.Files.createTempDirectory("graft_ivfpqres")
          .toString
        val h = AnnIndex.create(s, s"$root/idx", e.filter(col("vec_id") % 3 === 0),
          cells = 16)
        (0 until 3).foreach(b => AnnIndex.appendBatch(h,
          e.filter(col("vec_id") % 3 === b), batchId = b, compactEvery = 2))
        val hh = AnnIndex.open(s, s"$root/idx")
        val (codes, books) = graft.ops.PqOps.buildPqCodesResidual(hh,
          s"$root/codes", m = 4, k = 8)
        AnnIndex.probePqResidual(hh, codes, books, e.filter(col("vec_id") < 8),
          k = 5, nprobe = 4).orderBy("qid", "rnk")
      },
      Some(DuckIvfPqResidualSql)),

    // The SQL/CALL twin of the RESIDUAL flow (ADVICE r15): codes built via
    // `pq_codes_build_residual` carry the `pq.residual` metadata stamp and
    // `pq_probe` must DISPATCH to the residual scorer off it — pointing the
    // raw-vector ADC at residual books would silently mis-rank. The oracle
    // IS x3_ivf_pq_residual's oracle, so the two surfaces cannot drift.
    Q("cdc_pq_residual_sql",
      (s, d) => {
        val e = Tables.load(s, d, "embeddings")
        val cat = s"graft_pqres${System.nanoTime()}"
        val w = java.nio.file.Files.createTempDirectory("graft_pqres_sql").toString
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
        (0 until 3).foreach(b => e.filter(col("vec_id") % 3 === b)
          .createOrReplaceTempView(s"pqres_b$b"))
        e.filter(col("vec_id") < 8).createOrReplaceTempView("pqres_q")
        s.sql(s"CALL $cat.system.ann_index_create('db.ann', 'pqres_b0', 16)").collect()
        (0 until 3).foreach(b => s.sql(
          s"CALL $cat.system.ann_index_append('db.ann', 'pqres_b$b', $b, 2)").collect())
        s.sql(s"CALL $cat.system.pq_codes_build_residual('db.ann', 'db.codes', 4, 8)")
          .collect()
        s.sql(s"CALL $cat.system.pq_probe('db.ann', 'db.codes', 'pqres_q', 5, 4, " +
          s"'pqres_hits')").collect()
        s.sql("SELECT qid, neighbor_id, adc, rnk FROM pqres_hits ORDER BY qid, rnk")
      },
      Some(DuckIvfPqResidualSql)),


    // X3: two-stage IVF-PQ with EXACT RE-RANK (E189 — the refine pattern
    // deployments run): a 3×-wide ADC shortlist from the compressed domain,
    // then exact rescoring of JUST the shortlist rows (raw vectors load
    // for queries × kShort rows, never the corpus), final top-5 by exact
    // dot. Both stage rules are deterministic, so the oracle replays the
    // shortlist AND the re-rank bit-for-bit.
    Q("x3_ivf_pq_refined",
      (s, d) => {
        val e = Tables.load(s, d, "embeddings")
        val root = java.nio.file.Files.createTempDirectory("graft_ivfpqr")
          .toString
        val h = AnnIndex.create(s, s"$root/idx", e.filter(col("vec_id") % 3 === 0),
          cells = 16)
        (0 until 3).foreach(b => AnnIndex.appendBatch(h,
          e.filter(col("vec_id") % 3 === b), batchId = b, compactEvery = 2))
        val hh = AnnIndex.open(s, s"$root/idx")
        val books = graft.ops.PqOps.codebooks(
          hh.assignments.scan().select(col("vec_id"), col("v").as("embedding")),
          m = 4, k = 8)
        val codes = graft.ops.PqOps.buildPqCodes(hh, s"$root/codes", books)
        AnnIndex.probePqRefined(hh, codes, books, e.filter(col("vec_id") < 8),
          k = 5, kShort = 15, nprobe = 4).orderBy("qid", "rnk")
      },
      Some(DuckIvfPqRefinedSql)),

    // The SQL/CALL twin of the SAME IVF-PQ flow (E187 — the reference's
    // everything-through-SQL posture): index built and appended through
    // `CALL ann_index_*`, codes trained/stored through `pq_codes_build`
    // (books persisted in table metadata — a LATER session's probe must
    // not re-derive them from the since-grown index), probed through
    // `pq_probe`. The oracle IS x3_ivf_pq's oracle, so the two surfaces
    // cannot drift.
    Q("cdc_pq_sql",
      (s, d) => {
        val e = Tables.load(s, d, "embeddings")
        val cat = s"graft_pq${System.nanoTime()}"
        val w = java.nio.file.Files.createTempDirectory("graft_pq_sql").toString
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
        (0 until 3).foreach(b => e.filter(col("vec_id") % 3 === b)
          .createOrReplaceTempView(s"pqsql_b$b"))
        e.filter(col("vec_id") < 8).createOrReplaceTempView("pqsql_q")
        s.sql(s"CALL $cat.system.ann_index_create('db.ann', 'pqsql_b0', 16)").collect()
        (0 until 3).foreach(b => s.sql(
          s"CALL $cat.system.ann_index_append('db.ann', 'pqsql_b$b', $b, 2)").collect())
        s.sql(s"CALL $cat.system.pq_codes_build('db.ann', 'db.codes', 4, 8)").collect()
        s.sql(s"CALL $cat.system.pq_probe('db.ann', 'db.codes', 'pqsql_q', 5, 4, " +
          s"'pqsql_hits')").collect()
        s.sql("SELECT qid, neighbor_id, adc, rnk FROM pqsql_hits ORDER BY qid, rnk")
      },
      Some(DuckIvfPqSql)),

    // X3: FILTERED ANN search over the persistent index — pre-filter
    // semantics: the exact top-k of the ALLOWED set (documents with
    // lang = 'en', the metadata predicate a real filtered vector search
    // pushes) within each query's probed cells. The allowlist rides a
    // semi-join on the in-cell candidates; everything else — seed choice,
    // frozen centroids, probe cells, in-cell exact scoring — is the
    // x3_ann_index flow, so the oracle is that oracle plus ONE predicate.
    Q("x3_ann_index_filtered",
      (s, d) => {
        val e = Tables.load(s, d, "embeddings")
        val root = java.nio.file.Files.createTempDirectory("graft_ann_indexf")
          .toString + "/idx"
        val h = AnnIndex.create(s, root, e.filter(col("vec_id") % 3 === 0),
          cells = 16)
        (0 until 3).foreach(b => AnnIndex.appendBatch(h,
          e.filter(col("vec_id") % 3 === b), batchId = b, compactEvery = 2))
        val allowed = Tables.load(s, d, "documents")
          .filter(col("lang") === "en").select(col("doc_id").as("vec_id"))
        AnnIndex.probe(AnnIndex.open(s, root), e.filter(col("vec_id") < 8),
          k = 5, nprobe = 4, allowed = Some(allowed)).orderBy("qid", "rnk")
      },
      Some(duckAnnIndexSql(scExtra =
        "\n|         AND a.vec_id IN (SELECT doc_id FROM documents WHERE lang = 'en')"))),

    // X3: ADAPTIVE filtered ANN — the deficiency guarantee: with a
    // selective allowlist (lang = 'de', ~14% of the corpus) and nprobe = 1,
    // some queries' single probed cell holds fewer than k allowed
    // candidates; those queries WIDEN to an exact scan of the full allowed
    // set (brute-force filtered cosine), while dense queries keep the
    // cheap banded answer. The deficiency rule (in-cell allowed count < k)
    // is integer-exact, so DuckDB replays both passes and the per-query
    // routing decision itself.
    Q("x3_ann_filtered_adaptive",
      (s, d) => {
        val e = Tables.load(s, d, "embeddings")
        val root = java.nio.file.Files.createTempDirectory("graft_ann_ad")
          .toString + "/idx"
        val h = AnnIndex.create(s, root, e.filter(col("vec_id") % 3 === 0),
          cells = 16)
        (0 until 3).foreach(b => AnnIndex.appendBatch(h,
          e.filter(col("vec_id") % 3 === b), batchId = b, compactEvery = 2))
        val allowed = Tables.load(s, d, "documents")
          .filter(col("lang") === "de").select(col("doc_id").as("vec_id"))
        AnnIndex.probeFiltered(AnnIndex.open(s, root), e.filter(col("vec_id") < 8),
          k = 5, nprobe = 1, allowed = allowed).orderBy("qid", "rnk")
      },
      Some(s"""WITH $DuckAnnPrefix,
             |alw AS (SELECT doc_id AS vid FROM documents WHERE lang = 'de'),
             |pr AS (SELECT vec_id AS qid, cell FROM (
             |          SELECT e.vec_id, c.cell, row_number() OVER (PARTITION BY e.vec_id ORDER BY list_dot_product(e.v, c.cv) DESC, c.cell) AS rn
             |          FROM e, cent c WHERE e.vec_id < 8) z WHERE rn <= 1),
             |p1 AS (SELECT pr.qid, a.vec_id AS nid, list_dot_product(qe.v, ae.v) AS cos
             |       FROM pr JOIN asg a ON a.cell = pr.cell
             |       JOIN e qe ON qe.vec_id = pr.qid JOIN e ae ON ae.vec_id = a.vec_id
             |       WHERE a.vec_id <> pr.qid
             |         AND a.vec_id IN (SELECT vid FROM alw)),
             |c1 AS (SELECT qid, COUNT(*) AS m FROM p1 GROUP BY qid),
             |qs AS (SELECT vec_id AS qid FROM e WHERE vec_id < 8),
             |defq AS (SELECT qs.qid FROM qs LEFT JOIN c1 USING (qid)
             |         WHERE coalesce(c1.m, 0) < 5),
             |dense AS (SELECT qid, nid, rnk FROM (
             |            SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rnk FROM p1) z
             |          WHERE rnk <= 5 AND qid NOT IN (SELECT qid FROM defq)),
             |ex AS (SELECT dq.qid, a.vec_id AS nid, list_dot_product(qe.v, a.v) AS cos
             |       FROM defq dq JOIN e qe ON qe.vec_id = dq.qid, e a
             |       WHERE a.vec_id IN (SELECT vid FROM alw) AND a.vec_id <> dq.qid),
             |wide AS (SELECT qid, nid, rnk FROM (
             |           SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rnk FROM ex) z
             |         WHERE rnk <= 5)
             |SELECT qid, nid AS neighbor_id, rnk FROM (
             |  SELECT * FROM dense UNION ALL SELECT * FROM wide)
             |ORDER BY qid, rnk""".stripMargin)),

    // X3: recall certificate for the LLOYD-REFINED IVF path (iters=3 — the
    // configuration the 100 TB plan actually runs; x3_ann_ivf_topk oracles
    // the iters=0 pipeline bit-for-bit, but a distributed mean is not
    // reproducible cross-engine, so the refined path's driver surface is its
    // quality bound instead). The r17 IvfRecallProbe nprobe sweep (same
    // finding as the PQ path): recall rises monotonically with probed
    // cells — the loss is cell pruning over near-uniform synthetic
    // vectors, not the quantizer. The certificate probes at nprobe=10:
    // measured recall@5 0.95 / 0.875 / 0.75 at sf0.001/0.01/0.1, and the
    // 0.7 threshold pins the tri-SF floor (0.75, 2-hit margin on the
    // 8×5-hit probe set; seeded-deterministic, reproduces run-to-run) —
    // any regression in seeding, the Lloyd step, or probe selection flips
    // the boolean and fails the hash compare. `queries` is data-derived.
    Q("x3_ivf_recall",
      (s, d) => {
        val e = Tables.load(s, d, "embeddings")
        SimilarityOps.ivfRecall(e, e.filter(col("vec_id") < 8), k = 5, dim = 64,
          minRecall = 0.7, nprobe = 10, iters = 3)
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS queries, CAST(5 AS INT) AS k,
             |true AS recall_ok FROM embeddings WHERE vec_id < 8""".stripMargin)),

    // X3: CLUSTERED-REGIME recall certificate (r17 review #3): the
    // synthetic embeddings table is near-uniform — the r17 sweeps proved
    // the uniform certificates measure exactly the regime IVF is NOT
    // designed for (cell pruning scatters near-tie neighbors; recall 0.75
    // at nprobe=10 of 16). This certificate runs the SAME refined-IVF path
    // over the md5-derived mixture-of-tight-clusters fixture
    // (SimilarityOps.clusteredEmbeddings — 16 blobs, 8% jitter, the shape
    // real embedding models produce) at the PRODUCTION nprobe=4: measured
    // recall@5 = 1.000 at sf0.001/0.01/0.1 (ClusteredRecallProbe r18 —
    // 1.000 even at nprobe=1: a tight cluster assigns whole to one cell
    // and the query probes it first). The 0.9 threshold pins that floor a
    // 4-hit decade above any hideable regression.
    Q("x3_ivf_recall_clustered",
      (s, d) => {
        val e = SimilarityOps.clusteredEmbeddings(
          Tables.load(s, d, "embeddings").select("vec_id"))
        SimilarityOps.ivfRecall(e, e.filter(col("vec_id") < 8), k = 5,
          dim = 64, minRecall = 0.9, nprobe = 4, iters = 3)
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS queries, CAST(5 AS INT) AS k,
             |true AS recall_ok FROM embeddings WHERE vec_id < 8""".stripMargin)),

    // The IVF-PQ sibling over the same clustered fixture, production
    // nprobe=4. The r18 probe located the clustered-regime PQ lever:
    // kShort=100 reads 0.70 at sf0.1 — the ADC shortlist is NARROWER than
    // the ~125-member cluster, and in-cluster near-ties (cosine spread
    // ~1e-3) reorder under quantization, so true top-5 fall off BEFORE the
    // exact re-rank; kShort=200 ≥ cluster width reads 1.000 at every SF
    // (nprobe ≥ 2). The production rule this certificate encodes: size the
    // shortlist to the expected cluster occupancy, not to k. Threshold 0.9
    // pins the measured tri-SF floor (1.000).
    Q("x3_pq_recall_clustered",
      (s, d) => {
        val e = SimilarityOps.clusteredEmbeddings(
          Tables.load(s, d, "embeddings").select("vec_id"))
        val root = java.nio.file.Files.createTempDirectory("graft_pqrec_cl").toString
        val h = AnnIndex.create(s, s"$root/idx", e.filter(col("vec_id") % 3 === 0),
          cells = 16)
        (0 until 3).foreach(b => AnnIndex.appendBatch(h,
          e.filter(col("vec_id") % 3 === b), batchId = b, compactEvery = 2))
        val hh = AnnIndex.open(s, s"$root/idx")
        val unitVecs = hh.assignments.scan()
          .select(col("vec_id"), col("v").as("embedding"))
        val books = graft.ops.PqOps.refineCodebooks(unitVecs,
          graft.ops.PqOps.codebooks(unitVecs, m = 8, k = 16), iters = 2)
        val codes = graft.ops.PqOps.buildPqCodes(hh, s"$root/codes", books,
          refineIters = 2)
        graft.ops.PqOps.pqRecall(hh, codes, books, e,
          e.filter(col("vec_id") < 8), k = 5, kShort = 200, nprobe = 4,
          minRecall = 0.9)
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS queries, CAST(5 AS INT) AS k,
             |true AS recall_ok FROM embeddings WHERE vec_id < 8""".stripMargin)),

    // X3: recall certificate for the IVF-PQ path (E199 — the one
    // approximate path that shipped quality-blind through r15): the full
    // production configuration — persistent index, LLOYD-REFINED codebooks
    // (PqOps.refineCodebooks, 2 rounds of per-subspace k-means over the
    // index's unit vectors), ADC shortlist, exact re-rank — measured
    // against the exact cosine top-5 and thresholded. Refined books ride a
    // distributed mean (not bit-reproducible cross-engine, the
    // x3_ivf_recall convention), so the driver surface is the quality
    // bound. The r17 PqRecallProbe sweep located the recall lever: recall
    // is INVARIANT to every PQ quality knob (k 16→32, Lloyd 0→3, shortlist
    // 100→200 all read identically) and rises monotonically with nprobe —
    // the loss is IVF cell pruning, not quantization (synthetic near-
    // uniform fixture vectors scatter true neighbors across cells). The
    // certificate therefore runs the probe at nprobe=10 (of 16 cells):
    // measured recall@5 0.775 / 0.85 / 0.65 at sf0.001/0.01/0.1, and the
    // 0.6 threshold pins the tri-SF floor (0.65, 2-hit margin on the
    // 8×5-hit probe set; seeded-deterministic codebooks reproduce the
    // measurement run-to-run) — any regression in codebook training,
    // encoding, ADC scoring, the shortlist rule, or probe selection flips
    // the boolean and fails the hash compare.
    Q("x3_pq_recall",
      (s, d) => {
        val e = Tables.load(s, d, "embeddings")
        val root = java.nio.file.Files.createTempDirectory("graft_pqrec").toString
        val h = AnnIndex.create(s, s"$root/idx", e.filter(col("vec_id") % 3 === 0),
          cells = 16)
        (0 until 3).foreach(b => AnnIndex.appendBatch(h,
          e.filter(col("vec_id") % 3 === b), batchId = b, compactEvery = 2))
        val hh = AnnIndex.open(s, s"$root/idx")
        val unitVecs = hh.assignments.scan()
          .select(col("vec_id"), col("v").as("embedding"))
        val books = graft.ops.PqOps.refineCodebooks(unitVecs,
          graft.ops.PqOps.codebooks(unitVecs, m = 8, k = 16), iters = 2)
        val codes = graft.ops.PqOps.buildPqCodes(hh, s"$root/codes", books,
          refineIters = 2)
        graft.ops.PqOps.pqRecall(hh, codes, books, e,
          e.filter(col("vec_id") < 8), k = 5, kShort = 100, nprobe = 10,
          minRecall = 0.6)
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS queries, CAST(5 AS INT) AS k,
             |true AS recall_ok FROM embeddings WHERE vec_id < 8""".stripMargin)),

    // X3: embedding near-dup pairs above cosine 0.4 (brute force; exact).
    Q("x3_embedding_neardup",
      (s, d) => SimilarityOps.nearDupPairs(Tables.load(s, d, "embeddings"), threshold = 0.4),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |        list_dot_product(a.v, b.v) /
             |        (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
             |      FROM e a JOIN e b ON a.vec_id < b.vec_id)
             |SELECT id_a, id_b, cos FROM p WHERE cos > 0.4 ORDER BY id_a, id_b""".stripMargin)),

    // X3: near-dup pairs via LSH signature candidates + exact cosine verify —
    // the scale-shaped twin of x3_embedding_neardup, oracled against the SAME
    // brute-force SQL: candidates come from an equi-join on (table, signature)
    // buckets, never an n² theta-join, and the exact verification makes the
    // results identical (per-pair miss ≈ 5e-6 at cos = 0.4 with 2 bits × 24
    // tables; see SimilarityOps.nearDupLshPairs for the recall math).
    Q("x3_neardup_lsh",
      (s, d) => SimilarityOps.nearDupLshPairs(Tables.load(s, d, "embeddings"),
        threshold = 0.4, dim = 64),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |        list_dot_product(a.v, b.v) /
             |        (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
             |      FROM e a JOIN e b ON a.vec_id < b.vec_id)
             |SELECT id_a, id_b, cos FROM p WHERE cos > 0.4 ORDER BY id_a, id_b""".stripMargin)),

    // X3: per-vector L2 norms — the filter stage ahead of cosine work (zero
    // vectors, outliers). Exact fold dot product → sqrt is bit-identical
    // across engines.
    Q("x3_vector_norms",
      (s, d) => Tables.load(s, d, "embeddings")
        .select(col("vec_id"),
          sqrt(SimilarityOps.dot(SimilarityOps.asDouble(col("embedding")),
            SimilarityOps.asDouble(col("embedding")))).as("l2_norm"))
        .orderBy("vec_id"),
      Some("""SELECT vec_id,
             |  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS l2_norm
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // X3: int8 scalar-quantization parameters per vector (min/max/scale) —
    // the stats a quantized ANN index stores per vector. floor() before any
    // int conversion (Spark casts truncate, DuckDB rounds); scale kept as
    // DOUBLE (exact: (max-min)/255 is one double op on both sides).
    Q("x3_quantization_params",
      (s, d) => {
        val v = SimilarityOps.asDouble(col("embedding"))
        Tables.load(s, d, "embeddings")
          .select(col("vec_id"),
            array_min(v).as("v_min"), array_max(v).as("v_max"),
            ((array_max(v) - array_min(v)) / lit(255.0)).as("scale"))
          .orderBy("vec_id")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
             |SELECT vec_id, list_min(v) AS v_min, list_max(v) AS v_max,
             |  (list_max(v) - list_min(v)) / 255.0 AS scale
             |FROM e ORDER BY vec_id""".stripMargin)),

    // X3: Johnson–Lindenstrauss random projection to 8 dims (±1 sign matrix
    // from md5-60 parity — Achlioptas-style, deterministic): the
    // dimensionality-reduction step ahead of an ANN index. Both engines fold
    // the products in array order (Spark aggregate / DuckDB list_reduce with
    // a prepended 0.0), so every projected value is bit-exact.
    Q("x3_random_projection",
      (s, d) => SimilarityOps.randomProjection(
        Tables.load(s, d, "embeddings").filter(col("vec_id") < 100), k = 8, dim = 64),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |          FROM embeddings WHERE vec_id < 100),
             |p AS (SELECT vec_id, CAST(i AS BIGINT) AS out_dim,
             |        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |          list_transform(range(1, 65), j ->
             |            v[CAST(j AS INTEGER)] *
             |            (CASE WHEN CAST(concat('0x', substring(md5(CAST(i AS VARCHAR) || ':' || CAST(j - 1 AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0
             |                  THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END))),
             |          (a, b) -> a + b) AS value
             |      FROM e, range(8) r(i))
             |SELECT vec_id, out_dim, value FROM p ORDER BY vec_id, out_dim""".stripMargin)),

    // X5: multimodal binary column + typed metadata (payload stays opaque;
    // metadata prunable without reading payload pages).
    Q("x5_binary_meta",
      (s, d) => MultimodalOps.fromDocuments(Tables.load(s, d, "documents"))
        .select(col("media_id"), col("kind"),
          length(col("content")).cast("long").as("n_bytes"))
        .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id, 'text' AS kind,
             |  octet_length(encode(text)) AS n_bytes
             |FROM documents ORDER BY media_id""".stripMargin)),

    // X5: batched (mapPartitions) stub decode → scalar feature columns.
    // Projected to scalars (no array column) so the driver's pandas harness
    // can sort/hash the result; the scalar outputs all flow THROUGH the
    // mapPartitions decode kernel, so the batched-decode path is fully
    // oracled (the fixture text is ASCII, so byte values = code points and
    // DuckDB can recompute byte_mean/n_frames exactly). The 16-bin histogram
    // feature stays engine-internal (float32 arithmetic of the stub codec).
    Q("x5_decode_features",
      (s, d) => MultimodalOps.documentFeatures(Tables.load(s, d, "documents"))
        .select(col("media_id"), col("kind"), col("n_bytes"), col("byte_mean"),
          col("n_frames"))
        .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id, 'text' AS kind,
             |  octet_length(encode(text)) AS n_bytes,
             |  CAST(list_sum(list_transform(range(1, length(text) + 1),
             |         i -> unicode(text[i]))) AS DOUBLE)
             |    / CAST(octet_length(encode(text)) AS DOUBLE) AS byte_mean,
             |  CAST((octet_length(encode(text)) + 4095) // 4096 AS INTEGER) AS n_frames
             |FROM documents ORDER BY media_id""".stripMargin)),

    // X5: frame sampling — every-256th payload byte exploded to
    // (media_id, frame_idx, frame_byte) rows through the typed Dataset path
    // (the video frame-sample shape; ASCII fixture ⇒ byte = code point, so
    // DuckDB recomputes the sampled bytes exactly).
    Q("x5_frame_sample",
      (s, d) => MultimodalOps.sampleFrames(
          MultimodalOps.asRecords(MultimodalOps.fromDocuments(
            Tables.load(s, d, "documents"))), frameStride = 256)
        .orderBy("media_id", "frame_idx"),
      Some("""WITH f AS (
             |  SELECT doc_id, text,
             |    unnest(range(0, (octet_length(encode(text)) + 255) // 256)) AS fi
             |  FROM documents)
             |SELECT doc_id AS media_id, CAST(fi AS BIGINT) AS frame_idx,
             |  CAST(unicode(text[CAST(fi * 256 + 1 AS INTEGER)]) AS BIGINT) AS frame_byte
             |FROM f ORDER BY media_id, frame_idx""".stripMargin)),

    // X5: REAL image decode — PNG/BMP payloads synthesized in-memory with the
    // JDK's ImageIO writer, then decoded DISTRIBUTED through the engine's
    // pure-JVM ImageCodec (hand-parsed container headers + javax.imageio
    // pixel decode; no native codecs). Constant-color fixtures make every
    // pixel statistic a closed-form integer, so the oracle pins exact values
    // computed from real image bytes.
    Q("x5_decode_real",
      (s, _) => {
        import s.implicits._
        def img(w: Int, h: Int, r: Int, g: Int, b: Int, fmt: String): Array[Byte] = {
          val bi = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val rgb = (r << 16) | (g << 8) | b
          for (y <- 0 until h; x <- 0 until w) bi.setRGB(x, y, rgb)
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(bi, fmt, bos)
          bos.toByteArray
        }
        // JPEG fixture: constant GRAY (128,128,128) — the JPEG zero level,
        // so every 8×8 block is DC-only and the lossy round-trip is EXACT
        // (chroma 0, luma uniform); this pins the SOF header-walk
        // (format/width/height from the frame header, 16×9 spans block
        // boundaries) AND the pixel path on real JPEG bytes.
        val media = Seq(
          (1L, img(10, 6, 32, 64, 96, "png")),
          (2L, img(3, 7, 200, 10, 50, "png")),
          (3L, img(5, 5, 255, 255, 255, "bmp")),
          (4L, img(16, 9, 128, 128, 128, "jpg"))).toDF("media_id", "content")
        MultimodalOps.decodeImages(media)
          .select(col("media_id"), col("format"), col("width"), col("height"),
            col("mean_luma").cast("long").as("luma"),
            col("mean_r").cast("long").as("r"),
            col("mean_g").cast("long").as("g"),
            col("mean_b").cast("long").as("b"))
          .orderBy("media_id")
      },
      // BT.601 integer luma of a constant (r,g,b) image:
      // (77r + 150g + 29b) >> 8 — 58, 71, 255 for the three fixtures
      Some("""SELECT * FROM (VALUES
             |  (CAST(1 AS BIGINT), 'png', 10, 6, CAST(58 AS BIGINT),
             |   CAST(32 AS BIGINT), CAST(64 AS BIGINT), CAST(96 AS BIGINT)),
             |  (2, 'png', 3, 7, 71, 200, 10, 50),
             |  (3, 'bmp', 5, 5, 255, 255, 255, 255),
             |  (4, 'jpeg', 16, 9, 128, 128, 128, 128)
             |) AS t(media_id, format, width, height, luma, r, g, b)
             |ORDER BY media_id""".stripMargin)),

    // X5: REAL audio decode — RIFF/WAVE payloads built by the codec's writer
    // twin, then PCM-decoded DISTRIBUTED through the engine's pure-JVM
    // WavCodec (hand-parsed container chunks + integer sample arithmetic; no
    // javax.sound service discovery). Closed-form waveforms (alternating /
    // constant) make every statistic exact, so the oracle pins values
    // computed from real WAV bytes.
    Q("x5_audio_real",
      (s, _) => {
        import s.implicits._
        import graft.ops.WavCodec
        // 1 s mono square wave at ±2000; 10 ms stereo constant (L=+1000,
        // R=-1000); 10 ms 8-bit mono constant at +64
        val square = WavCodec.write(
          Array.tabulate(8000)(i => if (i % 2 == 0) 2000 else -2000), 1, 8000, 16)
        val stereo = WavCodec.write(
          Array.tabulate(882)(i => if (i % 2 == 0) 1000 else -1000), 2, 44100, 16)
        val mono8 = WavCodec.write(Array.fill(160)(64), 1, 16000, 8)
        val media = Seq((1L, square), (2L, stereo), (3L, mono8))
          .toDF("media_id", "content")
        MultimodalOps.decodeAudio(media).orderBy("media_id")
      },
      Some("""SELECT * FROM (VALUES
             |  (CAST(1 AS BIGINT), 1, 8000, 16, CAST(8000 AS BIGINT),
             |   CAST(1000.0 AS DOUBLE), CAST(2000.0 AS DOUBLE), CAST(2000.0 AS DOUBLE),
             |   CAST(2000 AS BIGINT), CAST(7999 AS BIGINT)),
             |  (2, 2, 44100, 16, 441, 10.0, 1000.0, 1000.0, 1000, 0),
             |  (3, 1, 16000, 8, 160, 10.0, 64.0, 64.0, 64, 0)
             |) AS t(media_id, channels, sample_rate, bits, n_frames, duration_ms,
             |       mean_abs, rms, peak, zero_crossings)
             |ORDER BY media_id""".stripMargin)),

    // X5: REAL video-frame sampling — an ANIMATED GIF (the one multi-frame
    // container with a pure-JVM codec) decoded frame-by-frame through
    // ImageCodec, keeping every 2nd frame with its exact mean luma; a
    // single-frame PNG contributes frame 0. Constant-color frames survive
    // GIF palettization exactly, so the oracle pins per-frame statistics.
    Q("x5_video_frames_real",
      (s, _) => {
        import s.implicits._
        import graft.ops.ImageCodec
        val gif = ImageCodec.writeGifAnimation(6, 4, Seq(
          (10 << 16) | (20 << 8) | 30, 0xc8c8c8, 0x0000ff, 0xff0000, 0x00ff00))
        val png = {
          val bi = new java.awt.image.BufferedImage(
            10, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
          for (y <- 0 until 6; x <- 0 until 10) bi.setRGB(x, y, (32 << 16) | (64 << 8) | 96)
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(bi, "png", bos)
          bos.toByteArray
        }
        val media = Seq((1L, gif), (2L, png)).toDF("media_id", "content")
        MultimodalOps.sampleRealFrames(media, stride = 2)
          .orderBy("media_id", "frame_idx")
      },
      // BT.601 integer luma of the sampled constant frames: gif frames
      // 0/2/4 → 18/28/149, png frame 0 → 58
      Some("""SELECT * FROM (VALUES
             |  (CAST(1 AS BIGINT), CAST(0 AS BIGINT), 6, 4, CAST(18.0 AS DOUBLE)),
             |  (1, 2, 6, 4, 28.0),
             |  (1, 4, 6, 4, 149.0),
             |  (2, 0, 10, 6, 58.0)
             |) AS t(media_id, frame_idx, width, height, mean_luma)
             |ORDER BY media_id, frame_idx""".stripMargin)),

    // X5: MEDIA export (E192) — the byte-budget twin of the text-corpus
    // publication: a BINARY media corpus's changelog delta shards and
    // packs by PAYLOAD BYTES (sizeOf = length(content)) instead of token
    // count — same md5 shard rule, same fenced manifest. Payload byte
    // sizes are closed-form (the deterministic GIF encoder), so the
    // oracle pins them and replays the shard/pack arithmetic in SQL.
    Q("x5_media_export",
      (s, _) => {
        import s.implicits._
        import graft.ops.ImageCodec
        def gif(i: Int): Array[Byte] =
          ImageCodec.writeGifAnimation(4 + i, 3,
            Seq(0x101010 * i, 0x0000ff))
        val root = java.nio.file.Files.createTempDirectory("graft_mexp").toString
        val corpus = graft.table.TransactionalTable.create(s, s"$root/media",
          org.apache.spark.sql.types.StructType.fromDDL(
            "media_id LONG, content BINARY"), "media_id", None)
        corpus.append((1 to 2).map(i => (i.toLong, gif(i))).toDF("media_id", "content"),
          batchId = 0)
        val v0 = corpus.currentVersion
        corpus.append((3 to 5).map(i => (i.toLong, gif(i))).toDF("media_id", "content"),
          batchId = 1)
        val v1 = corpus.currentVersion
        val r = graft.ops.ExportOps.exportDelta(corpus, s"$root/exp", v0, v1,
          nShards = 2, capacity = 256L, idCol = "media_id", textCol = "content",
          sizeOf = Some(length(_).cast("long")))
        require(r.exported, "the delta must publish")
        s.read.parquet(r.dir)
          .select(col("shard"), col("bin"), col("pos"), col("media_id"),
            col("n_tokens"))
          .orderBy("shard", "pos")
      },
      Some {
        val lens = (3 to 5).map { i =>
          i.toLong -> graft.ops.ImageCodec.writeGifAnimation(4 + i, 3,
            Seq(0x101010 * i, 0x0000ff)).length
        }
        val vals = lens.map { case (i, l) =>
          s"(CAST($i AS BIGINT), CAST($l AS BIGINT))" }.mkString(", ")
        s"""WITH t AS (SELECT * FROM (VALUES $vals) AS v(media_id, n_tokens)),
           |h AS (SELECT media_id, n_tokens,
           |  CAST(concat('0x', substring(md5(CAST(media_id AS VARCHAR)), 1, 15)) AS BIGINT) AS _h
           |  FROM t),
           |cum AS (SELECT media_id, n_tokens, CAST(_h % 2 AS INT) AS shard,
           |  CAST(row_number() OVER (PARTITION BY _h % 2 ORDER BY _h, media_id) - 1 AS INT) AS pos,
           |  CAST(SUM(n_tokens) OVER (PARTITION BY _h % 2 ORDER BY _h, media_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
           |  FROM h)
           |SELECT shard, (c - n_tokens) // 256 AS bin, pos, media_id, n_tokens
           |FROM cum ORDER BY shard, pos""".stripMargin
      }),

    // X5: image NEAR-DUP — perceptual hash (dHash over the decoded 8×8
    // thumbnail) + Hamming-banded candidate join, the LAION-style image
    // dedup modality. Fixtures are 8×8 GRAYSCALE images (gray luma = pixel
    // value exactly; one pixel per thumbnail cell), so every dHash is
    // closed-form from the ±10 gradient pattern: A = alternating-row
    // 0x55/0x2A bits = 24019198012642645; the brightness-shifted BMP
    // re-encode of A hashes identically; C flips bits 0 and 14 (distance
    // 2); D is A's complement (distance 56, never a candidate). The oracle
    // pins the four closed-form hashes and REPLAYS banding → candidate
    // pairs → exact Hamming in SQL.
    Q("x5_image_neardup",
      (s, _) => {
        import s.implicits._
        // 8×8 grayscale gradient image: row r starts at `base`, then steps
        // ±10 left-to-right by bit c of rowBits(r) (bit set = brighter).
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
        val bitsC = Seq(0x54, 0x2A, 0x54, 0x2A, 0x55, 0x2A, 0x55, 0x2A) // flips bits 0, 14
        val bitsD = bitsA.map(_ ^ 0x7f) // complement: distance 56
        val media = Seq(
          (1L, img(bitsA, 100, "png")),
          (2L, img(bitsA, 140, "bmp")), // +40 brightness, re-encoded: same hash
          (3L, img(bitsC, 100, "png")),
          (4L, img(bitsD, 100, "png"))).toDF("media_id", "content")
        MultimodalOps.imageNearDupPairs(media, maxDist = 3)
      },
      Some("""WITH h AS (SELECT * FROM (VALUES
             |    (CAST(1 AS BIGINT), CAST(24019198012642645 AS BIGINT)),
             |    (2, 24019198012642645),
             |    (3, 24019198012626260),
             |    (4, 48038396025285290)) AS t(media_id, phash)),
             |ch AS (SELECT media_id, phash, c AS band,
             |         (phash >> CAST(c * 14 AS INTEGER)) & 16383 AS chunk
             |       FROM h, range(4) r(c)),
             |p AS (SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
             |        a.phash AS pa, b.phash AS pb
             |      FROM ch a JOIN ch b ON a.band = b.band AND a.chunk = b.chunk
             |        AND a.media_id < b.media_id)
             |SELECT media_a, media_b, CAST(bit_count(xor(pa, pb)) AS INTEGER) AS hamming
             |FROM p WHERE bit_count(xor(pa, pb)) <= 3
             |ORDER BY media_a, media_b""".stripMargin)),

    // X5: AUDIO near-dup — the acoustic modality of the image pipeline:
    // PCM decode → 33-window energy-DELTA fingerprint (gain-invariant by
    // construction: a volume change preserves every strict window-energy
    // ordering) → 4×8-bit Hamming banding → banded candidate join → exact
    // bit_count. Fixtures are closed-form: window amplitudes walk ±400
    // from 2000 by a 32-bit delta pattern, so the fingerprint IS the
    // pattern. Clip 2 is clip 1 at HALF VOLUME (distance 0 — the
    // invariance the delta hash buys); clip 3 flips deltas 3 and 17
    // (distance 2); clip 4 inverts every delta (distance 32, no band
    // agrees, never a candidate). The oracle pins the three patterns and
    // replays banding → pairs → Hamming in SQL.
    Q("x5_audio_neardup",
      (s, _) => {
        import s.implicits._
        import graft.ops.WavCodec
        def wav(pattern: Long, div: Int): Array[Byte] = {
          val v = new Array[Int](33)
          v(0) = 2000
          for (k <- 0 until 32)
            v(k + 1) = v(k) + (if (((pattern >> k) & 1L) == 1L) 400 else -400)
          WavCodec.write(v.flatMap(x => Array.fill(8)(x / div)), 1, 8000, 16)
        }
        val pA = 0x55555555L                      // alternating up/down
        val pC = pA | (1L << 3) | (1L << 17)      // two flipped deltas
        val pD = ~pA & 0xffffffffL                // every delta inverted
        val media = Seq(
          (1L, wav(pA, 1)),
          (2L, wav(pA, 2)), // half volume: same fingerprint
          (3L, wav(pC, 1)),
          (4L, wav(pD, 1))).toDF("media_id", "content")
        MultimodalOps.audioNearDupPairs(media, maxDist = 3)
      },
      Some("""WITH h AS (SELECT * FROM (VALUES
             |    (CAST(1 AS BIGINT), CAST(1431655765 AS BIGINT)),
             |    (2, 1431655765),
             |    (3, 1431786845),
             |    (4, 2863311530)) AS t(media_id, ahash)),
             |ch AS (SELECT media_id, ahash, c AS band,
             |         (ahash >> CAST(c * 8 AS INTEGER)) & 255 AS chunk
             |       FROM h, range(4) r(c)),
             |p AS (SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
             |        a.ahash AS aa, b.ahash AS ab
             |      FROM ch a JOIN ch b ON a.band = b.band AND a.chunk = b.chunk
             |        AND a.media_id < b.media_id)
             |SELECT media_a, media_b, CAST(bit_count(xor(aa, ab)) AS INTEGER) AS hamming
             |FROM p WHERE bit_count(xor(aa, ab)) <= 3
             |ORDER BY media_a, media_b""".stripMargin)),

    // X5: VIDEO near-dup — the temporal composition of the image pipeline:
    // real per-frame decode (animated GIF) → per-frame dHash → banded
    // candidate join KEYED BY FRAME POSITION (time-aligned, never
    // all-pairs) → clips pair when ≥ half the shorter clip's frames match
    // within Hamming 3. Fixtures are closed-form 8×8 gray-gradient frames
    // (hash = rowBits pattern verbatim, exact through GIF palettization):
    // clip 2 is clip 1 brightness-shifted (3/3 frames at distance 0),
    // clip 3 shares frame 0 exactly + frame 1 at distance 2 with a
    // different frame 2 (2/3 → still a near-dup), clip 4 is inverted
    // material (no banded candidate at any position). The oracle pins the
    // 12 frame hashes and replays banding → aligned pairs → the
    // match-fraction gate in SQL.
    Q("x5_video_neardup",
      (s, _) => {
        import s.implicits._
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
        def gif(patterns: Seq[Seq[Int]], base: Int): Array[Byte] =
          ImageCodec.writeGifAnimationImages(patterns.map(frame(_, base)))
        val bitsP = Seq(0x55, 0x2A, 0x55, 0x2A, 0x55, 0x2A, 0x55, 0x2A)
        val bitsQ = Seq.fill(8)(0x33)
        val bitsR = Seq.fill(8)(0x0F)
        val bitsQ2 = Seq(0x32, 0x33, 0x32) ++ Seq.fill(5)(0x33) // flips 2 bits of Q
        val bitsT = Seq.fill(8)(0x11)
        val media = Seq(
          (1L, gif(Seq(bitsP, bitsQ, bitsR), 100)),
          (2L, gif(Seq(bitsP, bitsQ, bitsR), 140)),        // brightness copy
          (3L, gif(Seq(bitsP, bitsQ2, bitsT), 100)),       // partial edit
          (4L, gif(Seq(bitsP.map(_ ^ 0x7f), bitsQ.map(_ ^ 0x7f),
            bitsR.map(_ ^ 0x7f)), 100)),                    // inverted material
          (5L, "not a video".getBytes)).toDF("media_id", "content")
        MultimodalOps.videoNearDupPairs(media, maxDist = 3, minMatchFrac = 0.5)
      },
      Some("""WITH h AS (SELECT * FROM (VALUES
             |    (CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(24019198012642645 AS BIGINT)),
             |    (1, 1, 28936514141215155), (1, 2, 8510739453298575),
             |    (2, 0, 24019198012642645), (2, 1, 28936514141215155), (2, 2, 8510739453298575),
             |    (3, 0, 24019198012642645), (3, 1, 28936514141198770), (3, 2, 9645504713738385),
             |    (4, 0, 48038396025285290), (4, 1, 43121079896712780), (4, 2, 63546854584629360)
             |  ) AS t(media_id, pos, fhash)),
             |ch AS (SELECT media_id, pos, fhash, c AS band,
             |         (fhash >> CAST(c * 14 AS INTEGER)) & 16383 AS chunk
             |       FROM h, range(4) r(c)),
             |p AS (SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
             |        a.pos AS pos, a.fhash AS fa, b.fhash AS fb
             |      FROM ch a JOIN ch b ON a.pos = b.pos AND a.band = b.band
             |        AND a.chunk = b.chunk AND a.media_id < b.media_id),
             |m AS (SELECT media_a, media_b, CAST(COUNT(*) AS BIGINT) AS n_matched
             |      FROM p WHERE bit_count(xor(fa, fb)) <= 3 GROUP BY 1, 2),
             |cnt AS (SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n FROM h GROUP BY 1)
             |SELECT media_a, media_b, n_matched, least(ca.n, cb.n) AS n_frames
             |FROM m JOIN cnt ca ON ca.media_id = m.media_a
             |       JOIN cnt cb ON cb.media_id = m.media_b
             |WHERE n_matched >= ceil(least(ca.n, cb.n) * 0.5)
             |ORDER BY media_a, media_b""".stripMargin)),

    // X5: INCREMENTAL image dedup — the persistent Hamming-banded perceptual
    // index (ImageDedupIndex) as an engine table: batch 0 seeds two distinct
    // images; batch 1 brings a brightness-shifted re-encode of image 1
    // (corpus dup, distance 0), a 2-bit-flipped variant (corpus NEAR-dup,
    // distance 2), a fresh image, its in-batch brightness copy, and a
    // non-image payload (kept, hashless). Output = batch-1 kept ids. All
    // hashes are closed-form from the 8×8 gray gradients (pinned literals),
    // so DuckDB replays banding → corpus filter → in-batch rule exactly,
    // including the two replay-fenced table commits it rides on.
    Q("x5_image_index",
      (s, _) => {
        val (b0, b1) = imageIndexBatches(s)
        val root = java.nio.file.Files.createTempDirectory("graft_img_idx").toString + "/idx"
        val index = graft.ops.ImageDedupIndex.create(s, root)
        graft.ops.ImageDedupIndex.appendBatch(index, b0, 0)
        graft.ops.ImageDedupIndex.appendBatch(index, b1, 1)
      },
      DuckImageIndexSql),

    // The SQL/CALL twin of the SAME image-index flow (the one index family
    // a SQL-only user could not reach through r15): created and appended
    // through `CALL media_index_create/media_index_append('…', 'image',
    // …)`, kept ids consumed from the registered view. The oracle IS
    // x5_image_index's oracle, so the two surfaces cannot drift.
    Q("cdc_media_index_sql",
      (s, _) => {
        val (b0, b1) = imageIndexBatches(s)
        val cat = s"graft_mi${System.nanoTime()}"
        val w = java.nio.file.Files.createTempDirectory("graft_mi_sql").toString
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
        b0.createOrReplaceTempView("mi_b0")
        b1.createOrReplaceTempView("mi_b1")
        s.sql(s"CALL $cat.system.media_index_create('db.idx', 'image')").collect()
        s.sql(s"CALL $cat.system.media_index_append('db.idx', 'image', 'mi_b0', 0, " +
          "'mi_kept0')").collect()
        s.sql(s"CALL $cat.system.media_index_append('db.idx', 'image', 'mi_b1', 1, " +
          "'mi_kept1')").collect()
        s.sql("SELECT media_id FROM mi_kept1 ORDER BY media_id")
      },
      DuckImageIndexSql),

    // X5: DELETE maintenance on the image index (r19 — the Hamming family's
    // takedown path): batch 0 seeds images 1 and 4, a takedown epoch
    // removes image 1, then batch 2 arrives. Its re-encode (11) and 2-bit
    // variant (13) of the REMOVED image — both corpus-dropped in
    // x5_image_index — are now judged only against each other: 11 is
    // ADMITTED and 13 falls to the in-batch rule (distance 2 from 11,
    // smaller id wins). The oracle replays banding + both rules with the
    // index side restricted to the delete survivor (image 4).
    Q("x5_image_index_delete",
      (s, _) => {
        import s.implicits._
        val (b0, b1) = imageIndexBatches(s)
        val root = java.nio.file.Files.createTempDirectory("graft_img_del").toString + "/idx"
        val index = graft.ops.ImageDedupIndex.create(s, root)
        graft.ops.ImageDedupIndex.appendBatch(index, b0, 0)
        graft.ops.ImageDedupIndex.deleteBatch(index,
          Seq(1L).toDF("media_id"), batchId = 1)
        graft.ops.ImageDedupIndex.appendBatch(index, b1, 2)
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
             |cdup AS (SELECT DISTINCT b.media_id FROM ch b JOIN ch i
             |         ON b.batch = 1 AND i.batch = 0 AND i.media_id <> 1
             |           AND b.band = i.band AND b.chunk = i.chunk
             |           AND bit_count(xor(b.phash, i.phash)) <= 3),
             |cand AS (SELECT * FROM ch WHERE batch = 1
             |         AND media_id NOT IN (SELECT media_id FROM cdup)),
             |bdup AS (SELECT DISTINCT a.media_id FROM cand a JOIN cand b
             |         ON a.band = b.band AND a.chunk = b.chunk
             |           AND b.media_id < a.media_id
             |           AND bit_count(xor(a.phash, b.phash)) <= 3)
             |SELECT media_id FROM (
             |  SELECT DISTINCT media_id FROM cand
             |  WHERE media_id NOT IN (SELECT media_id FROM bdup)
             |  UNION ALL SELECT CAST(17 AS BIGINT)
             |) ORDER BY media_id""".stripMargin)),


    // X5: INCREMENTAL audio dedup — the [[HammingIndex]] core instantiated
    // over the gain-invariant energy-delta fingerprint (AudioDedupIndex),
    // mirroring x5_image_index batch-for-batch: batch 0 seeds two distinct
    // clips; batch 1 brings a HALF-VOLUME copy of clip 1 (corpus dup,
    // distance 0 — the invariance the delta hash buys), a 2-delta-flipped
    // variant (corpus NEAR-dup, distance 2), a fresh clip, its in-batch
    // volume copy, and a non-WAV payload (kept, hashless). Output =
    // batch-1 kept ids. All fingerprints are closed-form amplitude walks
    // (pinned literals), so DuckDB replays banding → corpus filter →
    // in-batch rule exactly, including the two replay-fenced commits.
    Q("x5_audio_index",
      (s, _) => {
        import s.implicits._
        import graft.ops.WavCodec
        def wav(pattern: Long, div: Int): Array[Byte] = {
          val v = new Array[Int](33)
          v(0) = 2000
          for (k <- 0 until 32)
            v(k + 1) = v(k) + (if (((pattern >> k) & 1L) == 1L) 400 else -400)
          WavCodec.write(v.flatMap(x => Array.fill(8)(x / div)), 1, 8000, 16)
        }
        val pA = 0x55555555L
        val pC = pA | (1L << 3) | (1L << 17)
        val pD = ~pA & 0xffffffffL
        val pE = 0x33333333L
        val b0 = Seq((1L, wav(pA, 1)), (4L, wav(pD, 1))).toDF("media_id", "content")
        val b1 = Seq(
          (11L, wav(pA, 2)),            // corpus dup of 1 (half volume)
          (13L, wav(pC, 1)),            // corpus near-dup of 1 (distance 2)
          (15L, wav(pE, 1)),            // fresh
          (16L, wav(pE, 2)),            // in-batch dup of 15
          (17L, "not audio".getBytes))  // hashless: kept
          .toDF("media_id", "content")
        val root = java.nio.file.Files.createTempDirectory("graft_aud_idx").toString + "/idx"
        val index = graft.ops.AudioDedupIndex.create(s, root)
        graft.ops.AudioDedupIndex.appendBatch(index, b0, 0)
        graft.ops.AudioDedupIndex.appendBatch(index, b1, 1)
      },
      Some("""WITH h AS (SELECT * FROM (VALUES
             |    (CAST(1 AS BIGINT), 0, CAST(1431655765 AS BIGINT)),
             |    (4, 0, 2863311530),
             |    (11, 1, 1431655765),
             |    (13, 1, 1431786845),
             |    (15, 1, 858993459),
             |    (16, 1, 858993459)) AS t(media_id, batch, ahash)),
             |ch AS (SELECT media_id, batch, ahash, c AS band,
             |         (ahash >> CAST(c * 8 AS INTEGER)) & 255 AS chunk
             |       FROM h, range(4) r(c)),
             |cdup AS (SELECT DISTINCT b.media_id FROM ch b JOIN ch i
             |         ON b.batch = 1 AND i.batch = 0 AND b.band = i.band
             |           AND b.chunk = i.chunk
             |           AND bit_count(xor(b.ahash, i.ahash)) <= 3),
             |cand AS (SELECT * FROM ch WHERE batch = 1
             |         AND media_id NOT IN (SELECT media_id FROM cdup)),
             |bdup AS (SELECT DISTINCT a.media_id FROM cand a JOIN cand b
             |         ON a.band = b.band AND a.chunk = b.chunk
             |           AND b.media_id < a.media_id
             |           AND bit_count(xor(a.ahash, b.ahash)) <= 3)
             |SELECT media_id FROM (
             |  SELECT DISTINCT media_id FROM cand
             |  WHERE media_id NOT IN (SELECT media_id FROM bdup)
             |  UNION ALL SELECT CAST(17 AS BIGINT)
             |) ORDER BY media_id""".stripMargin)),

    // X5: INCREMENTAL video dedup — the frame-position-keyed index
    // (VideoDedupIndex): the dedup decision is per CLIP (≥ half the
    // shorter side's frames matching within Hamming 3) but the join unit
    // is the time-aligned frame, so the index stores one row per kept
    // frame per band with the clip's frame count denormalized on. Batch 0
    // seeds a clip and its inverted material; batch 1 brings a
    // brightness-shifted copy (3/3 frames → corpus dup), a PARTIAL edit
    // (2/3 → still a corpus dup — the fraction rule firing across the
    // index boundary), a fresh clip sharing ONE aligned frame with the
    // corpus (1/3 → kept: single-frame overlap is not a dup), its
    // in-batch copy (dropped), and a non-video payload (kept, frameless).
    // All 18 frame hashes are closed-form, so DuckDB replays BOTH batches'
    // fraction rules exactly.
    Q("x5_video_index",
      (s, _) => {
        import s.implicits._
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
        val b0 = Seq(
          (1L, gif(Seq(bitsP, bitsQ, bitsR), 100)),
          (4L, gif(Seq(bitsP.map(_ ^ 0x7f), bitsQ.map(_ ^ 0x7f),
            bitsR.map(_ ^ 0x7f)), 100))).toDF("media_id", "content")
        val b1 = Seq(
          (11L, gif(Seq(bitsP, bitsQ, bitsR), 140)),  // 3/3: corpus dup
          (13L, gif(Seq(bitsP, bitsQ2, bitsT), 100)), // 2/3: corpus dup
          (15L, gif(Seq(bitsQ, bitsQ, bitsQ), 100)),  // 1/3 overlap: kept
          (16L, gif(Seq(bitsQ, bitsQ, bitsQ), 120)),  // in-batch dup of 15
          (17L, "not a video".getBytes))              // frameless: kept
          .toDF("media_id", "content")
        val root = java.nio.file.Files.createTempDirectory("graft_vid_idx").toString + "/idx"
        val index = graft.ops.VideoDedupIndex.create(s, root)
        graft.ops.VideoDedupIndex.appendBatch(index, b0, 0)
        graft.ops.VideoDedupIndex.appendBatch(index, b1, 1)
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
             |  SELECT DISTINCT media_id FROM cand
             |  WHERE media_id NOT IN (SELECT media_id FROM bd)
             |  UNION ALL SELECT CAST(17 AS BIGINT)
             |) ORDER BY media_id""".stripMargin)),

    // X5: DELETE maintenance on the video index (r19): clip 1 is taken
    // down after seeding, so batch 2's full copy (11, 3/3 of the removed
    // clip) is ADMITTED, the partial edit (13, 2/3) now falls to the
    // IN-BATCH fraction rule against 11, and the single-frame-overlap
    // clip (15) stays kept. The video delete is the one banded family
    // whose keys come from a column-pruned index read (the sig rule keys
    // on frame position), so this also oracles that path end to end.
    Q("x5_video_index_delete",
      (s, _) => {
        import s.implicits._
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
        val b0 = Seq(
          (1L, gif(Seq(bitsP, bitsQ, bitsR), 100)),
          (4L, gif(Seq(bitsP.map(_ ^ 0x7f), bitsQ.map(_ ^ 0x7f),
            bitsR.map(_ ^ 0x7f)), 100))).toDF("media_id", "content")
        val b1 = Seq(
          (11L, gif(Seq(bitsP, bitsQ, bitsR), 140)),  // 3/3 of removed 1: admitted
          (13L, gif(Seq(bitsP, bitsQ2, bitsT), 100)), // 2/3 of 11 in-batch: dropped
          (15L, gif(Seq(bitsQ, bitsQ, bitsQ), 100)),  // 1/3 overlap: kept
          (16L, gif(Seq(bitsQ, bitsQ, bitsQ), 120)),  // in-batch dup of 15
          (17L, "not a video".getBytes))              // frameless: kept
          .toDF("media_id", "content")
        val root = java.nio.file.Files.createTempDirectory("graft_vid_del").toString + "/idx"
        val index = graft.ops.VideoDedupIndex.create(s, root)
        graft.ops.VideoDedupIndex.appendBatch(index, b0, 0)
        graft.ops.VideoDedupIndex.deleteBatch(index,
          Seq(1L).toDF("media_id"), batchId = 1)
        graft.ops.VideoDedupIndex.appendBatch(index, b1, 2)
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
             |k0 AS (SELECT * FROM ch WHERE batch = 0 AND media_id <> 1
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
             |  SELECT DISTINCT media_id FROM cand
             |  WHERE media_id NOT IN (SELECT media_id FROM bd)
             |  UNION ALL SELECT CAST(17 AS BIGINT)
             |) ORDER BY media_id""".stripMargin)),

    // X4: BPE-ish token counting — letter runs, single digits, single
    // punctuation (the GPT-2-style pre-tokenizer shape); identical regex
    // semantics in Java and RE2 for this class-only pattern.
    Q("x4_bpe_token_count",
      (s, d) => Tables.load(s, d, "documents")
        .select(col("doc_id"),
          size(expr("""regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]', 0)"""))
            .cast("long").as("n_bpe_tokens"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_bpe_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // X4: BPE merge LEARNING over a deterministic md5 sample (tokenizer
    // training — the learning half of x4_bpe_token_count's fixed rule):
    // word frequencies from a quarter of the docs, 4 greedy merge
    // iterations (max summed pair frequency, lexicographic tie-break),
    // vocabulary merge table as the result. Both engines apply a merge as
    // a literal delimited-string replace (non-overlapping left-to-right =
    // greedy BPE), so DuckDB replays the sample and every iteration
    // exactly.
    Q("x4_bpe_learn",
      (s, d) => graft.ops.BpeOps.bpeLearn(Tables.load(s, d, "documents"),
        merges = 4, sampleMod = 4),
      Some(s"""WITH $DuckBpeCtes
             |SELECT * FROM (
             |  SELECT CAST(1 AS BIGINT) AS step, l AS "left", r AS "right", l || r AS merged, cnt AS pair_count FROM b1
             |  UNION ALL SELECT 2, l, r, l || r, cnt FROM b2
             |  UNION ALL SELECT 3, l, r, l || r, cnt FROM b3
             |  UNION ALL SELECT 4, l, r, l || r, cnt FROM b4)
             |ORDER BY step""".stripMargin)),

    // X4: BPE merge APPLICATION — the encode half of the tokenizer loop
    // (x4_bpe_learn trains on the hash sample; this tokenizes the FULL
    // corpus with the learned table): per doc, every preprocessed word is
    // folded through the 4 learned replaces in learned order and the
    // surviving symbols are counted. The engine side compiles the merge
    // table into one codegen'd projection (in-row `aggregate` over the
    // word array — zero shuffles, zero joins, no explode: the 100 TB cost
    // is one corpus scan). The oracle reuses the learn CTEs and replays
    // the same fold per word.
    Q("x4_bpe_apply",
      (s, d) => graft.ops.BpeOps.bpeApply(Tables.load(s, d, "documents"),
        merges = 4, sampleMod = 4),
      Some(s"""WITH $DuckBpeCtes,
             |tok AS (SELECT doc_id, regexp_replace(lower(t), '[^a-z]', '', 'g') AS w
             |        FROM (SELECT doc_id, unnest($DuckToks) AS t FROM documents) u),
             |a0 AS (SELECT doc_id,
             |         '<' || array_to_string(regexp_split_to_array(w, ''), '><') || '>' AS s
             |       FROM tok WHERE len(w) >= 2),
             |${(1 to 4).map(i =>
               s"""a$i AS (SELECT doc_id, replace(a${i - 1}.s, '<' || b$i.l || '><' || b$i.r || '>',
             |                 '<' || b$i.l || b$i.r || '>') AS s FROM a${i - 1}, b$i)"""
             ).mkString(",\n")},
             |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
             |          CAST(SUM(len(string_split(regexp_replace(s, '^<|>$$', '', 'g'), '><'))) AS BIGINT) AS n_bpe_symbols
             |        FROM a4 GROUP BY doc_id)
             |SELECT d.doc_id, COALESCE(agg.n_words, 0) AS n_words,
             |       COALESCE(agg.n_bpe_symbols, 0) AS n_bpe_symbols
             |FROM documents d LEFT JOIN agg USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin),
      // headline: the tokenize-everything scan — learn on the sample,
      // encode the FULL corpus in one zero-shuffle codegen'd projection
      headline = true),

    // X6: typed JSON parse via from_json with an explicit schema (the
    // streaming-safe form — no inference), vs get_json_object's path probe.
    Q("x6_from_json_typed",
      (s, d) => Tables.load(s, d, "events")
        .select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
             |FROM events ORDER BY event_id""".stripMargin)))
}
