package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * BPE merge LEARNING (tokenizer training — the X4 completeness piece next
 * to `x4_bpe_token_count`'s fixed-rule counting): the classic byte-pair
 * algorithm over a deterministic hash sample of the corpus, with the
 * learned merge table as the output DataFrame.
 *
 * Shapes chosen for 100 TB and for oracle replay:
 *  - the SAMPLE is an md5-mod filter on doc id (distributed narrow filter,
 *    reproducible by any engine — tokenizer training never needs the full
 *    corpus, it needs a representative, DETERMINISTIC slice);
 *  - the unit of state is the distinct WORD with its corpus frequency
 *    (groupBy word — the one shuffle; every iteration then works on the
 *    bounded vocabulary, not the corpus);
 *  - a word's symbol sequence is a DELIMITED STRING (`<h><e><l><l><o>`),
 *    so one merge step is a literal string `replace` of `<l><r>` with
 *    `<lr>` — non-overlapping left-to-right in both Spark and DuckDB,
 *    which IS greedy BPE pair application;
 *  - each of the `merges` iterations counts adjacent pairs
 *    (explode + one hash agg), picks the best (max summed frequency,
 *    lexicographic tie-break — total order, no RNG), and rewrites the
 *    state map-only. Iteration count is bounded by the caller: driver
 *    work is `merges` 1-row collects.
 *
 * Preprocessing: lowercased, alpha-only, length ≥ 2 — keeps the `<` `>`
 * delimiters collision-free and the merge algebra engine-agnostic.
 */
object BpeOps {

  /** Learn `merges` BPE merges; returns (step, left, right, merged,
    * pair_count) in learned order — the vocabulary's merge table. */
  def bpeLearn(docs: DataFrame, merges: Int, sampleMod: Long = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val learned = learnMerges(docs, merges, sampleMod, idCol, textCol)
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(learned).asJava),
      org.apache.spark.sql.types.StructType.fromDDL(
        "step BIGINT, left STRING, right STRING, merged STRING, pair_count BIGINT"))
  }

  /** The learning loop itself; the merge table is driver-local BY DESIGN
    * (`merges` rows — the tokenizer vocabulary, never data-proportional). */
  private def learnMerges(docs: DataFrame, merges: Int, sampleMod: Long,
      idCol: String, textCol: String): Seq[Row] = {
    require(merges >= 1, "merges must be >= 1")
    val words = docs
      .filter(pmod(TextOps.md5Hash60(col(idCol)), lit(sampleMod)) === 0)
      .select(explode(TextOps.tokens(lower(col(textCol)))).as("w0"))
      .select(regexp_replace(col("w0"), "[^a-z]", "").as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    // initial state: every character its own symbol. localCheckpoint:
    // the per-iteration jobs re-read the materialized vocabulary instead
    // of re-running the sample + shuffle `merges` times.
    var state = words.select(
      concat(lit("<"), concat_ws("><", split(col("w"), "")), lit(">")).as("s"),
      col("freq"))
      .localCheckpoint(true)
    val learned = (1 to merges).map { step =>
      val syms = split(regexp_replace(col("s"), "^<|>$", ""), "><")
      val pairs = state
        .withColumn("_syms", syms)
        .filter(size(col("_syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(_syms) - 2), " +
            "i -> struct(_syms[i] AS l, _syms[i + 1] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
      val best = pairs.orderBy(desc("cnt"), col("l"), col("r")).limit(1).collect()
      require(best.nonEmpty, s"BPE step $step: no adjacent pairs left to merge")
      val (l, r, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      // one literal replace = greedy left-to-right application of the merge
      // (symbols are alpha-only by construction, so inlining is safe)
      state = state.withColumn("s",
        expr(s"replace(s, '<$l><$r>', '<$l$r>')"))
      // Re-materialize periodically: without this, step k's pair count
      // re-executes all k−1 prior replaces over the vocabulary (O(merges²)
      // total work) and the accumulated plan nests `merges` expressions
      // deep — an analyzer stack overflow in the low thousands. Checkpoint
      // cadence keeps per-step work O(vocab) and plan depth ≤ 64 at any
      // real vocab size (32k merges); semantics unchanged — the state is
      // the same vocabulary either way.
      if (step % 64 == 0) state = state.localCheckpoint(true)
      Row(step.toLong, l, r, l + r, cnt)
    }
    learned
  }

  /** Apply learned merges to the FULL corpus — the encode half of the
    * tokenizer loop (learn on a sample, tokenize everything): per doc, the
    * preprocessed word stream (the exact preprocessing [[bpeLearn]] trains
    * on) is folded through the learned replaces IN LEARNED ORDER and the
    * surviving symbols are counted.
    *
    * The 100 TB shape: learning touches only the hash sample; application
    * compiles the merge table into ONE codegen'd projection (the replace
    * chain is a literal fold — `merges` nested `replace` calls inside an
    * in-row `aggregate` over the doc's words), so encoding is map-only —
    * ZERO shuffles, zero joins, no explode: corpus cost is one scan.
    * Docs with no qualifying word encode to (0, 0) rather than dropping. */
  def bpeApply(docs: DataFrame, merges: Int, sampleMod: Long = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val learned = learnMerges(docs, merges, sampleMod, idCol, textCol)
    // symbol string of one word, with every learned merge applied in order
    // (symbols are alpha-only by construction — literal inlining is safe)
    val symed = learned.foldLeft(
      "concat('<', concat_ws('><', split(w, '')), '>')") { (e, m) =>
      val (l, r) = (m.getString(1), m.getString(2))
      s"replace($e, '<$l><$r>', '<$l$r>')"
    }
    docs.select(col(idCol),
        expr(s"""filter(transform(filter(split(lower($textCol), '\\\\s+'),
                 t -> t != ''), t -> regexp_replace(t, '[^a-z]', '')),
                 w -> length(w) >= 2)""").as("_ws"))
      .select(col(idCol),
        size(col("_ws")).cast("long").as("n_words"),
        expr(s"""aggregate(_ws, 0L, (acc, w) ->
                 acc + size(split(regexp_replace($symed, '^<|>$$', ''), '><')))""")
          .cast("long").as("n_bpe_symbols"))
      .orderBy(idCol)
  }
}
