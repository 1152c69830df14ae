package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * X1/X2: dedup operators for a training-data pipeline.
 *
 *  - exact: hash-groupBy on content (or a fingerprint of it — TextOps).
 *  - n-gram Jaccard: exact set similarity via an inverted shingle index —
 *    one shuffle on the shingle, never an all-pairs join.
 *  - MinHash + banded LSH: signature → band buckets → candidate pairs →
 *    exact verification. The scale path: pair generation is bounded by
 *    bucket collisions, not n².
 *  - SimHash: 64-bit sketch; Hamming-≤3 pairs found via 16-bit chunk
 *    pigeonhole banding (any pair within distance 3 shares ≥1 of 4 chunks).
 *
 * No UDFs: shingling/hashing are higher-order functions + xxhash64.
 */
object DedupOps {

  /**
   * Per-group cap — corpus diversity ("at most k docs per source/domain/
   * language"): keep k rows per group, chosen deterministically by the
   * md5-derived hash of the id, so the selection is reproducible across
   * engines (the DuckDB oracle replays it bit-for-bit) and across runs.
   *
   * Scale shape: the per-group ranking window runs over a HASH-PREFILTERED
   * candidate set, never the raw group. Group counts come from one
   * map-side-combinable aggregate (broadcast back); a group of n rows
   * admits only hashes below ~32k/n of the hash space — expected 32k
   * candidates. The margin is sized for the CONTRACT, not just the mean:
   * the group's true top-k-by-hash all fall under the bound unless fewer
   * than k of n uniform hashes land in a 32k/n slice, P ≈ P[Poisson(32k)
   * < k] ≤ e^-32 even at k=1 — negligible across any real number of
   * groups (a thinner 8k bound would silently drop ~e^-8 ≈ 3·10⁻⁴ of
   * k=1 groups). A skewed group (one domain = half the corpus) still
   * never funnels its full volume through a single window partition. For
   * n ≤ 32k the bound is the whole range: small groups rank exactly
   * as-is. The bound arithmetic is plain IEEE-double + floor, identical
   * in both engines.
   */
  def capPerGroup(docs: DataFrame, groupCol: String, k: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(k > 0, s"cap must be positive, got $k")
    val hashSpace = (1L << 60).toDouble // md5Hash60 range
    val counts = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("_n"))
    val bound = floor(least(lit(1.0), lit(32.0 * k) / col("_n")) * lit(hashSpace))
      .cast("long")
    val w = Window.partitionBy(col(groupCol)).orderBy(col("_h"), col(idCol))
    docs.select(col(idCol), col(groupCol))
      .withColumn("_h", TextOps.md5Hash60(col(idCol)))
      .join(broadcast(counts), Seq(groupCol))
      .filter(col("_h") < bound)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col(groupCol), col("rk"))
  }

  /**
   * Temperature-scaled mixture sampling (the multilingual-LM data-mixing
   * move: sample sources with probability ∝ (n_s/N)^α, α<1 flattening the
   * distribution so low-resource groups are up-weighted relative to their
   * share). `frac` is the overall target fraction of the corpus; each
   * group's keep-rate is `min(1, frac·N·p_s/n_s)` with p_s the normalized
   * tempered share. Selection is DETERMINISTIC — keep iff
   * md5Hash60(id)/2^60 < rate — so the sample is reproducible across runs
   * and engines (md5 is bit-identical everywhere; same convention as
   * [[capPerGroup]]).
   *
   * 100 TB shape: one tiny per-group count aggregate (|groups| rows),
   * broadcast back, then a map-only filter over the corpus — zero wide
   * shuffles, no per-group window. Rates above 1 saturate (a group never
   * yields more docs than it has — standard α-sampling-without-replacement
   * behavior; upsampling beyond 1× is a repeat-at-read concern, not a
   * materialization one).
   */
  def temperatureSample(docs: DataFrame, groupCol: String, alpha: Double,
      frac: Double, idCol: String = "doc_id"): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    require(frac > 0 && frac <= 1, s"frac must be in (0,1], got $frac")
    val hashSpace = (1L << 60).toDouble // md5Hash60 range
    val wAll = Window.partitionBy() // |groups| rows — never corpus-wide
    // NB: column names must differ case-INsensitively ("_n" vs "_N" would
    // silently collide under spark.sql.caseSensitive=false).
    val rates = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("_n"))
      .withColumn("_tot", sum(col("_n")).over(wAll))
      .withColumn("_p", pow(col("_n").cast("double") / col("_tot").cast("double"), alpha))
      .withColumn("_rate",
        least(lit(1.0),
          lit(frac) * col("_tot").cast("double") * (col("_p") / sum(col("_p")).over(wAll))
            / col("_n").cast("double")))
      .select(col(groupCol), col("_rate"))
    docs.join(broadcast(rates), Seq(groupCol))
      .filter(TextOps.md5Hash60(col(idCol)).cast("double") < col("_rate") * lit(hashSpace))
      .drop("_rate")
  }

  /**
   * Budgeted mixture sampling — the data-MIXING stage: given per-source
   * target TOKEN shares (the mixture spec a training run is built from) and
   * a global token budget, each source keeps the deterministic hash-sample
   * fraction that lands its expected token contribution on
   * `budget · weight_s`: rate_s = min(1, budget·w_s / tokens_s). Sources
   * absent from the spec are dropped; a source too small for its share
   * saturates at 1 (sampling-without-replacement semantics, as
   * [[temperatureSample]] — upsampling is a repeat-at-read concern).
   * Weights are used AS-GIVEN (the caller normalizes) so the rate
   * arithmetic is reproducible to the bit in any engine.
   *
   * 100 TB shape: one map-side-combinable per-source token aggregate
   * (|sources| rows, broadcast back), then a map-only keep-iff
   * md5Hash60(id) < rate·2⁶⁰ filter — zero wide shuffles.
   */
  def mixtureBudgetSample(docs: DataFrame, weights: Seq[(String, Double)],
      tokenBudget: Long, groupCol: String = "source",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget must be positive, got $tokenBudget")
    val hashSpace = (1L << 60).toDouble // md5Hash60 range
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      col(groupCol).as("_grp"),
      size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens"))
    val w = weights.foldLeft(lit(null).cast("double")) { case (acc, (src, wt)) =>
      when(col("_grp") === src, lit(wt)).otherwise(acc)
    }
    val rates = base.groupBy("_grp").agg(sum(col("n_tokens")).as("_srctoks"))
      .withColumn("_w", w)
      .withColumn("_rate", when(col("_w").isNull, lit(0.0)).otherwise(
        least(lit(1.0),
          lit(tokenBudget.toDouble) * col("_w") / col("_srctoks").cast("double"))))
      .select(col("_grp"), col("_rate"))
    base.join(broadcast(rates), Seq("_grp"))
      .filter(TextOps.md5Hash60(col("doc_id")).cast("double") < col("_rate") * lit(hashSpace))
      .select(col("doc_id"), col("_grp").as(groupCol), col("n_tokens"))
      .orderBy("doc_id")
  }

  /**
   * Poisson PPS sampling (E190) — probability-proportional-to-size, the
   * classic weighted downsampling (keep long/high-quality documents with
   * probability ∝ their weight): each row keeps with
   * p_i = min(1, n·w_i / W), so the expected sample size is n (modulo the
   * cap) and every inclusion decision is the deterministic
   * md5Hash60(id) < p·2⁶⁰ gate — replayable bit-for-bit by an external
   * oracle, no transcendentals.
   *
   * 100 TB shape: ONE map-side-combinable scalar aggregate (total weight,
   * a 1-row broadcast), then a map-only filter — zero wide shuffles.
   */
  def ppsSample(docs: DataFrame, weightCol: String, expectedN: Long,
      idCol: String = "doc_id"): DataFrame = {
    require(expectedN > 0, s"expectedN must be positive, got $expectedN")
    val hashSpace = (1L << 60).toDouble // md5Hash60 range
    val tot = docs.agg(sum(col(weightCol)).cast("double").as("_totw"))
    docs.crossJoin(broadcast(tot))
      .filter(TextOps.md5Hash60(col(idCol)).cast("double") <
        least(lit(1.0),
          lit(expectedN.toDouble) * col(weightCol).cast("double") / col("_totw"))
          * lit(hashSpace))
      .drop("_totw")
  }

  /**
   * Deterministic TRAIN/VAL/TEST split (E207) — the partition every
   * training pipeline cuts before anything else ships: integer weights
   * (e.g. train 8 / val 1 / test 1) over the md5-hash residue domain —
   * a row's split is the first label whose cumulative weight exceeds
   * md5Hash60(id ++ salt) mod Σweights. Properties the random `split()`
   * loses:
   *
   *  - membership is a pure function of (id, salt): a re-crawled or
   *    re-ingested document lands in the SAME split in every run — the
   *    leakage-safety property (a doc drifting from test into train
   *    across pipeline runs silently contaminates evaluation);
   *  - `salt` re-cuts the corpus without code changes (new salt = a
   *    fresh independent split of the same ids);
   *  - integer modulus only — an external engine replays every
   *    assignment bit-for-bit.
   *
   * 100 TB shape: map-only — ONE codegen'd hash + CASE projection, zero
   * shuffles at any scale. The hash residue binds once per row (array
   * let-binding) so the md5 kernel runs once however many labels chain.
   */
  def hashSplit(docs: DataFrame, splits: Seq[(String, Int)],
      salt: String = "", idCol: String = "doc_id"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      s"split weights must be positive: $splits")
    val w = splits.map(_._2.toLong).sum
    val hRaw = pmod(TextOps.md5Hash60(
      concat(col(idCol).cast("string"), lit(salt))), lit(w))
    val cums = splits.map(_._2.toLong).scanLeft(0L)(_ + _).tail
    // transform over a 1-element array = a let-binding in Column algebra:
    // the md5 evaluates once per row, not once per CASE branch
    val label = element_at(transform(array(hRaw), h =>
      splits.map(_._1).zip(cums).init.foldRight(lit(splits.last._1): Column) {
        case ((name, cum), acc) => when(h < cum, lit(name)).otherwise(acc)
      }), 1)
    docs.withColumn("split", label)
  }

  /**
   * Epoch-weighted UPSAMPLING — the repeat-at-read half of data mixing
   * ([[mixtureBudgetSample]] handles the subsample-only half): per-source
   * epoch factors f ≥ 0 emit each document ⌊f⌋ full copies plus one
   * fractional copy iff md5Hash60(doc_id) < frac(f)·2⁶⁰ — the SAME
   * documents carry the fractional epoch in every run, never a random
   * residue (the training-recipe posture: "3.5 epochs of wiki" must mean
   * one reproducible row set). Output carries `epoch` (0-based copy index)
   * so a downstream shard shuffle can de-correlate copies (feed
   * (doc_id, epoch) to [[SequenceOps.globalShuffle]]'s key). Sources absent
   * from the spec default to factor 1.0 (pass 0.0 to drop a source).
   *
   * 100 TB shape: ZERO shuffles — the factor spec folds in as a literal
   * CASE chain (|spec| is the mixture recipe, always tiny) and the copy
   * fan-out is a map-only explode(sequence): row count scales by the mean
   * factor, work stays embarrassingly parallel. Factors should be
   * binary-exact fractions (x.0, x.25, x.5) when bit-reproducibility across
   * engines matters; any double works within one engine.
   */
  def upsampleEpochs(docs: DataFrame, epochs: Seq[(String, Double)],
      groupCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    require(epochs.forall(_._2 >= 0), s"epoch factors must be >= 0: $epochs")
    val hashSpace = (1L << 60).toDouble // md5Hash60 range
    val f = epochs.foldLeft(lit(1.0)) { case (acc, (src, fac)) =>
      when(col(groupCol) === src, lit(fac)).otherwise(acc)
    }
    docs
      .select(col(idCol).cast("long").as("doc_id"), col(groupCol), f.as("_f"))
      .withColumn("n_copies",
        floor(col("_f")).cast("long") +
          when(TextOps.md5Hash60(col("doc_id")).cast("double") <
            (col("_f") - floor(col("_f"))) * lit(hashSpace), 1L).otherwise(0L))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col(groupCol),
        explode(sequence(lit(0L), col("n_copies") - 1)).as("epoch"))
  }

  /** Default doc-frequency cap for Jaccard's inverted index: shingles in more
    * docs than this are dropped before pair expansion. Per-shingle work is
    * df², so an uncapped boilerplate shingle ("all rights reserved …") in a
    * web corpus expands to billions of pairs from a single index row — the
    * one quadratic hazard in the otherwise-linear inverted-index shape. A
    * shingle shared by >128 docs carries no near-dup signal anyway (it cannot
    * push any pair over a 0.5 threshold on realistic doc sizes by itself, and
    * discriminative shingles are rare by definition). Callers wanting exact
    * uncapped semantics (small corpora, oracle parity) pass
    * `maxDocFreq = None` explicitly. */
  val DefaultMaxDocFreq = 128

  /** (id, shingle) inverted index — shingles are DISTINCT per doc (set
    * semantics; TextOps.shingles). `maxDocFreq` optionally drops
    * non-discriminative shingles occurring in more than that many docs — the
    * skew guard for web-scale corpora (boilerplate shingles otherwise
    * produce quadratic bucket blowup); leave None for exact oracle parity. */
  def shingleIndex(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      n: Int = 3, maxDocFreq: Option[Int] = None): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
      explode(TextOps.shingles(col(textCol), n)).as("sh"))
    maxDocFreq match {
      case None => sh
      case Some(cap) =>
        val freq = sh.groupBy("sh").agg(count(lit(1)).as("df")).filter(col("df") <= cap)
        sh.join(freq.select("sh"), "sh")
    }
  }

  /**
   * Exact word-n-gram Jaccard similarity for all pairs sharing ≥1 shingle,
   * kept when ≥ `threshold`.
   *
   * Plan shape (the scale-correct inverted-index form): explode → ONE hash
   * shuffle grouping doc-ids per shingle → per-shingle pair expansion
   * (bounded by df², capped by `maxDocFreq`) → pair-count agg → joins against
   * per-doc set sizes (small; auto-broadcast). This replaces a shingle
   * self-join, which scans/shuffles the exploded index twice and recomputes
   * the shingling three times. Division is exact-integer → double, so results
   * match the SQL oracle bit-for-bit.
   */
  def jaccardPairs(docs: DataFrame, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text", n: Int = 3,
      maxDocFreq: Option[Int] = Some(DefaultMaxDocFreq)): DataFrame = {
    // Shuffle key = xxhash64(shingle), not the raw string: the inverted
    // index is this query's widest exchange and a 3-token shingle is
    // ~25-40 bytes vs 8 — same equivalence classes modulo a 64-bit
    // birthday collision (P ≈ pairs²/2⁶⁴; a collision would merge two
    // shingles' doc lists and surface as an oracle mismatch, the
    // x1_dedup_by_fingerprint posture — never silent corruption).
    val exploded = docs.select(col(idCol).as("doc_id"),
      explode(TextOps.shingles(col(textCol), n)).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("shk"))
    val byShingle = exploded.groupBy("shk")
      .agg(sort_array(collect_list("doc_id")).as("ds"))
    // Skew guard first (so set sizes below see the same capped index), then
    // keep only shingles that can produce a pair.
    val capped = maxDocFreq.fold(byShingle)(cap => byShingle.filter(size(col("ds")) <= cap))
    // Per-doc set sizes from the (capped) inverted index: this re-reads the
    // byShingle SHUFFLE output (Catalyst reuses the exchange), which beats
    // re-shingling the raw text — the shingling HOF is this query's dominant
    // per-row cost (measured: a shingle-recompute variant was ~15% slower).
    val sizes = capped.select(explode(col("ds")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    // All a<b combinations within one shingle's (sorted) doc list.
    val combos = flatten(transform(col("ds"), (a, i) =>
      transform(slice(col("ds"), i + lit(2), size(col("ds"))),
        b => struct(a.as("a"), b.as("b")))))
    val inter = capped.filter(size(col("ds")) > 1)
      .select(explode(combos).as("p"))
      .groupBy(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    val jac = col("n_common").cast("double") /
      (col("sa.n_sh") + col("sb.n_sh") - col("n_common")).cast("double")
    // no final sort: the result is a pair SET (callers order if they
    // present it); a global sort would add a range exchange + sampling job
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("n_common"), jac.as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /**
   * Benchmark decontamination: for each (corpus doc, benchmark doc) pair, the
   * CONTAINMENT of the benchmark's n-gram set in the document —
   * |sh(doc) ∩ sh(bench)| / |sh(bench)| — kept when ≥ `threshold`. This is
   * the asymmetric cousin of Jaccard used to purge eval-set leakage from
   * training corpora: a long document that embeds a short benchmark item has
   * low Jaccard but containment ≈ 1.
   *
   * Scale shape: the benchmark is the small side by construction (an eval
   * suite, not a corpus) — its distinct shingle set is broadcast; the corpus
   * is scanned ONCE (explode → broadcast-join → one hash agg on (doc,
   * bench)). No corpus self-join, no shuffle of the corpus by shingle.
   */
  def containmentPairs(corpus: DataFrame, benchmark: DataFrame, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text", n: Int = 3): DataFrame = {
    // NO distinct() on either side: the Shingles kernel already emits the
    // DISTINCT shingle set per document, so (id, sh) pairs are unique by
    // construction — a distinct here would re-shuffle the whole corpus
    // pair stream just to remove nothing (was this query's widest exchange)
    val corpSh = corpus.select(col(idCol).as("doc_id"),
      explode(TextOps.shingles(col(textCol), n)).as("sh"))
    val benchSh = benchmark.select(col(idCol).as("bench_id"),
      explode(TextOps.shingles(col(textCol), n)).as("sh"))
    val benchSizes = benchSh.groupBy("bench_id").agg(count(lit(1)).as("bn"))
    val inter = corpSh.join(broadcast(benchSh), "sh")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_common"))
    inter.join(broadcast(benchSizes), "bench_id")
      .select(col("doc_id"), col("bench_id"), col("n_common"),
        (col("n_common").cast("double") / col("bn").cast("double")).as("containment"))
      .filter(col("containment") >= threshold)
  }

  /**
   * Cross-document repeated-LINE removal (the C4/MassiveText cleaning rule
   * — Raffel et al. 2020 §2.2 discard repeated lines; Gopher's pipeline
   * applies the same newline-granular pass): a line whose TRIMMED text
   * occurs in more than one DISTINCT document is boilerplate (navigation,
   * cookie banners, license headers) and is dropped from every document it
   * appears in; everything else — including blank lines, which are
   * document structure, not boilerplate — re-joins in original order.
   * Returns (doc_id, text, n_removed); callers threshold `n_removed` to
   * drop documents that became mostly empty.
   *
   * Scale shape (the [[duplicateSpans]] pattern one level up): lines
   * fingerprint to md5-60 keys; the cross-doc test is min≠max over doc ids
   * — ONE map-side-combined exchange on the well-spread line key, never a
   * countDistinct pre-shuffle and never a per-key occurrence list (a
   * hot boilerplate line stays one aggregate row). Removal is the
   * co-partitioned anti-join back on the same key, then a per-document
   * reassembly groupBy — no broadcast assumption on the boilerplate set.
   */
  def removeDuplicateLines(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val exploded = docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("lkey", TextOps.md5Hash60(trim(col("line"))))
    // blank-after-trim lines are excluded from the dup test (structure)
    val dupKeys = exploded.where(trim(col("line")) =!= "")
      .groupBy("lkey")
      .agg(min(col("doc_id")).as("_d0"), max(col("doc_id")).as("_d1"))
      .where(col("_d0") =!= col("_d1"))
    val kept = exploded.join(dupKeys.select("lkey"), Seq("lkey"), "left_anti")
    val rebuilt = kept.groupBy("doc_id")
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line")), "\n").as("text"),
        count(lit(1)).as("n_kept"))
    // left join: a document whose every line dropped still surfaces (empty)
    docs.select(col(idCol).cast("long").as("doc_id"),
        size(split(col(textCol), "\n")).cast("long").as("n_lines"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
      .orderBy("doc_id")
  }

  /**
   * Cross-document repeated-SPAN detection — the distributed shape of
   * suffix-array substring dedup (Lee et al. 2022, "Deduplicating Training
   * Data Makes Language Models Better"): exact duplicated passages are
   * found at sub-document granularity, so boilerplate shared by otherwise
   * distinct documents (licenses, headers, templated paragraphs) is
   * locatable and removable without dropping whole documents.
   *
   * Construction: every length-`window` token window is fingerprinted —
   * md5-60 per TOKEN (computed once, shared by every window containing it)
   * combined position-sensitively with a rotate-xor over the window
   * (O(tokens) digests total, long arithmetic per window; measured ~15%
   * faster than hashing the joined window string, with 6× fewer digested
   * bytes — SpanProbe, spans bit-identical). A window duplicated ACROSS
   * documents (fingerprint seen in >1 distinct doc) marks its token range;
   * per document, overlapping/adjacent marked ranges merge into maximal
   * spans. Within-document repeats alone do NOT mark (they are
   * compression, not cross-corpus contamination). The oracle contract is
   * the fingerprint's EQUIVALENCE CLASSES (= window content, modulo ~2⁻²¹
   * birthday collisions at 10⁷ windows), not its values — DuckDB groups by
   * the raw window text.
   *
   * Scale shape: the window index is exploded and shuffled on the
   * fingerprint twice — once map-side-combined into the per-key min/max
   * doc aggregate (≤1 row per key per task crosses the wire), once as the
   * semi-join probe — co-partitioned, so the join itself is local; the
   * inverted index never expands into pairs (unlike Jaccard there is no
   * df² term, and no per-key occurrence list that a hot boilerplate window
   * would blow up). Span merge is a per-document window (partitioned by
   * doc_id — well spread, no global sort). Output: (doc_id, span_start,
   * span_end, n_windows) with 0-based inclusive token positions.
   */
  /** The fingerprinted window index behind the span family: one row per
    * length-`window` token window, (doc_id, start, wkey) — md5-60 per
    * TOKEN (computed once, shared by every window containing it) combined
    * position-sensitively with a rotate-xor (token at in-window offset k
    * contributes rotated by 5·(W−1−k) bits; position-sensitive for any
    * window ≤ 12). O(tokens) digests total. */
  private def windowIndex(docs: DataFrame, window: Int,
      idCol: String, textCol: String): DataFrame = {
    require(window >= 2, "window must be >= 2")
    val nWins = size(col("toks")) - (window - 1)
    // guard: sequence(0, -1) DESCENDS in Spark — short docs must yield an
    // empty index list, not a [0, -1] one
    val idxs = when(nWins > 0, sequence(lit(0), nWins - 1))
      .otherwise(array().cast("array<int>"))
    val combine = (acc: Column, h: Column) =>
      shiftleft(acc, 5).bitwiseOR(shiftrightunsigned(acc, 59)).bitwiseXOR(h)
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        transform(TextOps.tokens(col(textCol)), t => TextOps.md5Hash60(t)).as("toks"))
      .select(col("doc_id"), explode(transform(idxs, i => struct(
        i.as("start"),
        aggregate(slice(col("toks"), i + 1, lit(window)), lit(0L), combine).as("wkey"))))
        .as("w"))
      .select(col("doc_id"), col("w.start").cast("long").as("start"), col("w.wkey").as("wkey"))
  }

  /** Gaps-and-islands merge of marked (doc_id, start, end) token ranges
    * into maximal per-doc spans: a window starts a NEW span iff it begins
    * past every previous window's end + 1 (adjacent coverage merges).
    * Doc-partitioned window — well spread, no global sort. */
  private def mergeSpans(marked: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("start")
    val prevMaxEnd = max(col("end"))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    marked
      .withColumn("new_span",
        when(prevMaxEnd.isNull || col("start") > prevMaxEnd + 1, 1L).otherwise(0L))
      .withColumn("span_id",
        sum(col("new_span")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(min(col("start")).as("span_start"), max(col("end")).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col("doc_id"), col("span_start"), col("span_end"), col("n_windows"))
      .orderBy("doc_id", "span_start")
  }

  def duplicateSpans(docs: DataFrame, window: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val wins = windowIndex(docs, window, idCol, textCol)
    // cross-doc test as min≠max OVER A WINDOW on wkey (r16 — replaces the
    // groupBy + semi-join-back form): the aggregate+join shape paid TWO
    // wkey exchanges and computed the rotate-xor fold over every window
    // TWICE (once per `wins` evaluation); the unbounded-frame window pays
    // ONE exchange and one fold, and each wkey group it buffers is a few
    // rows (documents sharing one window hash). countDistinct would
    // re-shuffle on (wkey, doc_id); min≠max needs neither.
    val byKey = Window.partitionBy("wkey")
    val marked = wins
      .withColumn("_dup",
        min(col("doc_id")).over(byKey) =!= max(col("doc_id")).over(byKey))
      .where(col("_dup"))
      .select(col("doc_id"), col("start"), (col("start") + lit(window - 1)).as("end"))
    mergeSpans(marked)
  }

  /**
   * Span-level benchmark DECONTAMINATION (E215 — the surgical half the
   * whole-document containment gate ([[containmentPairs]]) cannot give: a
   * long document embedding one eval example should lose the EXAMPLE, not
   * its other 10k tokens): a corpus window whose fingerprint appears in
   * ANY benchmark document marks its token range; marked ranges merge to
   * maximal per-doc spans. CROSS-SET only — corpus↔corpus duplicates do
   * not mark (that is [[duplicateSpans]]' business) and benchmark docs
   * never surface in the output.
   *
   * Scale shape — the [[duplicateSpans]] one-exchange plan with a side
   * bit: both window indexes union, `max(side) OVER (PARTITION BY wkey)`
   * answers "does any benchmark doc share this window" in the SAME single
   * wkey exchange — no join, no pair expansion; the benchmark (always ≪
   * corpus) rides the corpus's shuffle. Oracle contract: fingerprint
   * equivalence classes (DuckDB groups by raw window text).
   */
  def contaminatedSpans(docs: DataFrame, bench: DataFrame, window: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    contaminatedSpansPre(docs,
      benchmarkWindows(bench, window, idCol, textCol), window, idCol, textCol)

  /** A benchmark's fingerprinted window index, precomputed for REPEATED
    * [[contaminatedSpansPre]] calls — the streaming posture scrubs every
    * micro-batch against the SAME benchmark, and re-tokenizing it per
    * batch is pure waste; callers may `.persist()` the result. */
  def benchmarkWindows(bench: DataFrame, window: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    windowIndex(bench, window, idCol, textCol)

  /** [[contaminatedSpans]] against a PRECOMPUTED (possibly cached)
    * [[benchmarkWindows]] frame — `window` must match the one the frame
    * was built with (the fingerprints are window-length-specific). */
  def contaminatedSpansPre(docs: DataFrame, benchWins: DataFrame,
      window: Int = 8, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val cw = windowIndex(docs, window, idCol, textCol).withColumn("_b", lit(0))
    val bw = benchWins.withColumn("_b", lit(1))
    val byKey = Window.partitionBy("wkey")
    val marked = cw.unionByName(bw)
      .withColumn("_hasb", max(col("_b")).over(byKey))
      .where(col("_b") === 0 && col("_hasb") === 1)
      .select(col("doc_id"), col("start"), (col("start") + lit(window - 1)).as("end"))
    mergeSpans(marked)
  }

  /**
   * Span REMOVAL — the cleaning half of substring dedup: drop every token
   * inside a [[duplicateSpans]] span and re-join the survivors. Documents
   * with no duplicated span pass through unchanged (left join + null
   * guard); `n_removed` counts dropped tokens, so the caller can threshold
   * (e.g. drop documents that became mostly empty).
   *
   * Scale shape: the span list per doc is tiny (merged maximal spans), so
   * the join back to the corpus is a plain equi-join on doc_id and the
   * token filtering is one codegen'd higher-order function pass — map-only
   * beyond [[duplicateSpans]]'s own shuffles.
   */
  def removeDuplicateSpans(docs: DataFrame, window: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    removeSpans(docs, duplicateSpans(docs, window, idCol, textCol),
      idCol, textCol)

  /** Benchmark-decontaminated corpus (the removal half of
    * [[contaminatedSpans]]): every token inside a contaminated span drops,
    * survivors re-join; clean documents pass through (normalized) with
    * n_removed = 0. Same map-only removal kernel as
    * [[removeDuplicateSpans]]. */
  def removeContaminatedSpans(docs: DataFrame, bench: DataFrame,
      window: Int = 8, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    removeSpans(docs, contaminatedSpans(docs, bench, window, idCol, textCol),
      idCol, textCol)

  /** The span-removal kernel over an EXPLICIT span list (doc_id,
    * span_start, span_end) — for callers that computed spans themselves
    * (e.g. [[contaminatedSpansPre]] against a cached benchmark index). */
  def removeSpansOf(docs: DataFrame, spanList: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    removeSpans(docs, spanList, idCol, textCol)

  /** Drop every token of `docs` covered by a span list (doc_id,
    * span_start, span_end) and re-join survivors. The span list per doc is
    * tiny (merged maximal spans), so the join back is a plain equi-join on
    * doc_id and the filtering one codegen'd higher-order-function pass —
    * map-only beyond the span detector's own shuffles. */
  private def removeSpans(docs: DataFrame, spanList: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val spans = spanList
      .groupBy("doc_id")
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("sp"))
    val toksIdx = transform(TextOps.tokens(col("text")),
      (t, i) => struct(t.as("t"), i.cast("long").as("i")))
    val kept = filter(toksIdx, s => !exists(col("sp"),
      r => r("span_start") <= s("i") && s("i") <= r("span_end")))
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .join(spans, Seq("doc_id"), "left")
      .withColumn("sp", coalesce(col("sp"),
        array().cast("array<struct<span_start:bigint,span_end:bigint>>")))
      .select(col("doc_id"),
        concat_ws(" ", transform(kept, s => s("t"))).as("clean_text"),
        (size(toksIdx) - size(kept)).cast("long").as("n_removed"))
      .orderBy("doc_id")
  }

  /**
   * Near-dup CLUSTERING: collapse a pair list (doc_a, doc_b) into connected
   * components, labeling every member with its component's minimum doc id —
   * the step that turns pairwise similarity into "keep one canonical doc per
   * duplicate group" (pairs alone over-delete: a~b, b~c must drop b AND c,
   * keeping only a).
   *
   * Iterative min-label propagation (the standard large-scale CC shape, same
   * loop GraphX/Pregel run): each round, every node takes the min of its own
   * label and its neighbors' labels; converges in O(component diameter)
   * rounds — near-dup clusters are tiny-diameter, so 3-5 rounds in practice.
   * Each round is one join + one aggregation on the edge list; the driver
   * only checks a scalar convergence count. `maxIters` bounds pathological
   * chains; the loop exits early on fixpoint.
   */
  def dedupClusters(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val (labels, converged, iters) = dedupClustersStatus(pairs, maxIters)
    // A partial clustering is a WRONG answer silently shaped like a right
    // one (two docs of one component under different canonical ids) — fail
    // the budget loudly; callers that want best-effort labels use
    // dedupClustersStatus and inspect the flag.
    if (!converged) throw new IllegalStateException(
      s"dedupClusters did not converge within $maxIters rounds ($iters ran): " +
        "a component's diameter exceeds the budget — raise maxIters or use " +
        "dedupClustersStatus for best-effort labels")
    labels
  }

  /** [[dedupClusters]] with the convergence status exposed:
    * (labels, converged, roundsRun). Non-strict — a non-converged result is
    * returned as-is with `converged = false`. */
  def dedupClustersStatus(pairs: DataFrame, maxIters: Int = 20)
      : (DataFrame, Boolean, Int) = {
    // undirected: propagate both ways
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct().persist()
    try {
      // localCheckpoint each round: materializes AND truncates lineage — an
      // iterative DataFrame loop otherwise accretes a plan whose depth grows
      // per round (re-planning cost explodes, and any cache miss replays the
      // whole history).
      var labels = edges.select(col("src").as("id")).distinct()
        .withColumn("label", col("id")).localCheckpoint(true)
      var converged = false
      var it = 0
      while (!converged && it < maxIters) {
        val prop = edges.join(labels.withColumnRenamed("id", "src"), "src")
          .groupBy(col("dst").as("id")).agg(min(col("label")).as("nlabel"))
        val next = labels.join(prop, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
          .localCheckpoint(true)
        val changed = next.join(labels.withColumnRenamed("label", "old"), "id")
          .filter(col("label") =!= col("old")).limit(1).count()
        labels = next
        converged = changed == 0
        it += 1
      }
      (labels.select(col("id").as("doc_id"), col("label").as("canonical_id"))
        .orderBy("doc_id"), converged, it)
    } finally edges.unpersist(blocking = false)
  }

  /** MinHash signature: `numPerm` salted-xxhash64 minima over the doc's
    * shingle set (one column of array<long>). */
  def minhashSignature(textCol: Column, n: Int = 3, numPerm: Int = 32): Column = {
    val sh = TextOps.shingles(textCol, n)
    array((0 until numPerm).map { p =>
      array_min(transform(sh, s => xxhash64(s, lit(p))))
    }: _*)
  }

  /**
   * Near-duplicate pairs via banded MinHash LSH + exact Jaccard verification.
   *
   * Signature of `bands`×`rowsPerBand` minima; candidate pairs share at least
   * one band hash (join on (band, bandHash) — collisions only, never n²);
   * candidates are then verified with exact shingle-set intersection, keeping
   * pairs with true Jaccard ≥ `threshold`. With the default 16×2, a pair at
   * J=0.5 is caught with p≈0.99, at J=0.8 with p≈1-3e-8.
   */
  def minhashLshPairs(docs: DataFrame, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text", n: Int = 3,
      bands: Int = 16, rowsPerBand: Int = 2): DataFrame = {
    val numPerm = bands * rowsPerBand
    val withSig = docs.select(col(idCol).as("doc_id"),
      TextOps.shingles(col(textCol), n).as("shset"),
      minhashSignature(col(textCol), n, numPerm).as("sig"))
      .filter(size(col("shset")) > 0)

    val bandHashes = array((0 until bands).map { b =>
      val rows = (0 until rowsPerBand).map(r => get(col("sig"), lit(b * rowsPerBand + r)))
      struct(lit(b).as("band"), xxhash64(lit(b) +: rows: _*).as("bh"))
    }: _*)
    val banded = withSig.select(col("doc_id"), col("shset"),
        explode(bandHashes).as("x"))
      .select(col("doc_id"), col("shset"), col("x.band").as("band"), col("x.bh").as("bh"))

    val cands = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.shset").as("sha"), col("b.shset").as("shb"))
      .dropDuplicates("doc_a", "doc_b")

    val interSize = size(array_intersect(col("sha"), col("shb"))).cast("long")
    val unionSize = (size(col("sha")) + size(col("shb"))).cast("long") - interSize
    cands
      .withColumn("n_common", interSize)
      .withColumn("jaccard", col("n_common").cast("double") / unionSize.cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "n_common", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /**
   * SimHash near-dup pairs with Hamming distance ≤ `maxDist` (default 3).
   * Pigeonhole banding: the 60-bit sketch splits into 4 chunks of 15 bits;
   * any pair within distance 3 agrees on ≥1 chunk, so candidates come from a
   * join on (chunk index, chunk value) — never n². Token hashes are
   * [[TextOps.md5Hash60]] (60 bits, md5-derived) rather than xxhash64, so the
   * whole sketch — per-bit majorities, banding, Hamming distances — is
   * DuckDB-recomputable and the query is driver-oracled end to end.
   */
  /** The 60-bit majority SimHash sketch per document (md5 token hashes, so
    * every bit is DuckDB-recomputable). Construction is fully vectorized:
    * explode token hashes, sum the per-bit contributions with bitwise
    * column math in ONE codegen'd hash aggregation (map-side partial
    * combine ships ≤1 row per doc per task), then assemble the sketch.
    * Docs with zero tokens drop out via the explode. */
  def simhashSketch(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val exploded = docs.select(col(idCol).as("doc_id"),
      explode(transform(TextOps.tokens(col(textCol)), t => TextOps.md5Hash60(t))).as("h"))
    val bitSums = (0 until 60).map(i =>
      sum(shiftright(col("h"), i).bitwiseAND(1)).as(s"_b$i"))
    val counted = exploded.groupBy("doc_id")
      .agg(count(lit(1)).as("_n"), bitSums: _*)
    val sketch = (0 until 60).map { i =>
      when(col(s"_b$i") * 2 >= col("_n"), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    counted.select(col("doc_id"), sketch.as("simhash"))
  }

  /** Pigeonhole banding of the sketch: 4 chunks of 15 bits — any pair
    * within Hamming distance 3 agrees on ≥1 chunk. */
  def simhashBands(sketches: DataFrame): DataFrame =
    sketches.select(col("doc_id"), col("simhash"),
        explode(expr(
          "transform(sequence(0, 3), c -> named_struct('band', c, 'chunk', (simhash >> (c * 15)) & 32767))"
        )).as("x"))
      .select(col("doc_id"), col("simhash"), col("x.band").cast("long").as("band"),
        col("x.chunk").as("chunk"))

  def simhashPairs(docs: DataFrame, maxDist: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    requireBandSound(maxDist)
    val chunked = simhashBands(simhashSketch(docs, idCol, textCol))

    chunked.as("a").join(chunked.as("b"),
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sim_a"), col("b.simhash").as("sim_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", expr("bit_count(sim_a ^ sim_b)"))
      .filter(col("hamming") <= maxDist)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** The 4-chunk pigeonhole is SOUND only to Hamming distance 3 (4 chunks,
    * ≤ 3 flipped bits → some chunk untouched); a wider ball silently loses
    * candidates whose flips spread across all 4 chunks — a false negative
    * shaped like a clean answer, so the bound is enforced, not documented
    * (review r17). */
  private def requireBandSound(maxDist: Int): Unit =
    require(maxDist >= 0 && maxDist <= 3,
      s"maxDist must be in [0, 3]: the 4x15-bit banding guarantees a " +
        s"band collision only to Hamming distance 3 — a $maxDist-ball " +
        "would silently miss pairs whose differing bits span all 4 chunks")

  /** A benchmark's banded SimHash sketch (band, chunk, bench_id,
    * bench_sim), precomputed for REPEATED [[nearContaminatedPre]] calls —
    * the streaming posture probes every micro-batch against the SAME
    * benchmark; callers may `.persist()` the result (the
    * [[benchmarkWindows]] convention). */
  def benchmarkBands(bench: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    simhashBands(simhashSketch(bench, idCol, textCol))
      .select(col("band"), col("chunk"), col("doc_id").as("bench_id"),
        col("simhash").as("bench_sim"))

  /**
   * NEAR-DUP benchmark decontamination (the paraphrase half exact n-gram
   * decontamination misses): a corpus document whose SimHash lands within
   * Hamming distance ≤ `maxDist` of ANY benchmark document's is flagged —
   * the near-duplicate leak case ([[contaminatedSpans]] catches verbatim
   * spans; a lightly reworded eval example sails through exact windows but
   * not through a 3-bit sketch ball). CROSS-SET only: corpus↔corpus
   * near-dups are [[simhashPairs]]' business, and benchmark docs never
   * surface in the output. Returns one row per contaminated corpus doc:
   * (doc_id, n_bench_matches, min_hamming).
   *
   * Scale shape: the benchmark is an eval set — thousands of docs, ≪
   * corpus by construction — so its banded sketch BROADCASTS and the probe
   * is a map-only hash join on (band, chunk) over the corpus's one sketch
   * aggregation; the per-doc flag is a doc-keyed hash aggregate. Pigeonhole
   * soundness is [[simhashPairs]]': distance ≤ 3 over 4×15-bit chunks
   * always agrees on ≥ 1 chunk — zero false negatives at the sketch level.
   */
  def nearContaminated(corpus: DataFrame, bench: DataFrame, maxDist: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    nearContaminatedPre(corpus, benchmarkBands(bench, idCol, textCol),
      maxDist, idCol, textCol)

  /** [[nearContaminated]] against a PRECOMPUTED (possibly cached)
    * [[benchmarkBands]] frame — the per-micro-batch posture. */
  def nearContaminatedPre(corpus: DataFrame, benchBands: DataFrame,
      maxDist: Int = 3, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    requireBandSound(maxDist)
    simhashBands(simhashSketch(corpus, idCol, textCol))
      .join(broadcast(benchBands), Seq("band", "chunk"))
      .select(col("doc_id"), col("bench_id"),
        expr("bit_count(simhash ^ bench_sim)").as("hamming"))
      .filter(col("hamming") <= maxDist)
      .dropDuplicates("doc_id", "bench_id")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bench_matches"),
        min(col("hamming")).cast("int").as("min_hamming"))
      .orderBy("doc_id")
  }
}
