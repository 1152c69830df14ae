package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** The funnel fixture rules shared by `x4_filter_funnel` and the
  * `x4_corpus_build` capstone — ONE source of truth for the thresholds and
  * the classifier hash rule, in both the Spark predicates and the SQL
  * constants the oracles interpolate, so a rule tweak can never leave the
  * capstone silently applying stale thresholds (each query's own oracle
  * would drift with it and keep matching). Public: the streaming
  * corpus-build ([[graft.stream.CorpusPipeline]] call sites and specs)
  * cleans with the same rules. */
object FunnelRules {
  val MinTokens = 20L
  val MaxTokens = 2000L
  val MinCharsPerToken = 2L
  val MaxCharsPerToken = 14L
  /** Hashed-classifier weight rule: md5-60(term) mod `ClassifierMod`,
    * shifted to be zero-centered. */
  val ClassifierMod = 1001L
  val ClassifierShift = 500L

  /** The ordered stage predicates (`TextOps.filterFunnel` input shape). */
  def stages: Seq[(String, Column)] = {
    val toks = TextOps.tokens(col("text"))
    val n = size(toks).cast("long")
    val chars = aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
    val wsum = aggregate(TextOps.termCounts(col("text")), lit(0L), (acc, e) =>
      acc + (pmod(TextOps.md5Hash60(e.getField("term")), lit(ClassifierMod)) -
        lit(ClassifierShift)) * e.getField("tf").cast("long"))
    Seq(
      "too_short" -> (n >= MinTokens),
      "too_long" -> (n <= MaxTokens),
      "word_len" -> (chars >= n * MinCharsPerToken && chars <= n * MaxCharsPerToken),
      "low_quality" -> (wsum >= 0L))
  }

  /** The keep-only conjunction (the capstone's filter form). */
  def keep: Column = stages.map(_._2).reduce(_ && _)
}
