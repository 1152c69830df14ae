package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.table.TransactionalTable

/**
 * Corpus QUALITY-DRIFT monitor (E221 — the ingest-side twin of the ANN
 * index's cell-skew drift trigger): a crawler gone bad, a source flipped
 * to boilerplate, or a parser regression shows up as a SHIFT in the
 * token-length distribution long before any single funnel rule fires.
 * The monitor keeps one tiny bucket-histogram row set (≤ 11 rows) per
 * micro-batch in an engine table and scores Population Stability Index
 * (PSI) between a reference window and the current batch — the standard
 * drift statistic (PSI < 0.1 stable, 0.1–0.25 moderate, > 0.25 shifted).
 *
 * Determinism (the oracle contract): buckets are FIXED powers-of-two
 * token-count ranges expressed as an integer CASE chain (no float log),
 * probabilities are Laplace-smoothed exact-integer ratios, and PSI is a
 * sum of IEEE double ln/multiply over those ratios — replayable by an
 * external engine term-for-term.
 *
 * 100 TB shape: per-batch cost is ONE map-side-combinable aggregation to
 * ≤ 11 rows (the histogram), and the drift score is arithmetic over two
 * ≤ 11-row frames — the monitor adds no wide shuffle to the ingest path
 * at any corpus size.
 */
object QualityMonitor {

  /** Upper bounds (inclusive) of the token-count buckets: 2^k − 1 ladder,
    * final bucket unbounded. Integer boundaries = exact bucketing in any
    * engine. */
  val BucketBounds: Seq[Long] = Seq(0L, 1L, 3L, 7L, 15L, 31L, 63L, 127L, 255L, 511L)

  /** Bucket index for a token count — a codegen'd integer CASE chain. */
  def tokenBucket(n: Column): Column =
    BucketBounds.zipWithIndex.foldRight(lit(BucketBounds.size): Column) {
      case ((bound, i), acc) => when(n <= bound, lit(i)).otherwise(acc)
    }

  /** Token count for bucketing, NULL-total: a NULL text counts 0 tokens in
    * EVERY engine (ADVICE r17 — Spark's legacy sizeOfNull returns -1 where
    * DuckDB's CASE over len(NULL) falls through to the top bucket; both are
    * clamped here and the oracle mirrors the coalesce, so the replayable
    * determinism claim covers NULL rows too). */
  private def tokenCount(text: Column): Column =
    greatest(coalesce(size(TextOps.tokens(text)).cast("long"), lit(0L)), lit(0L))

  /** The ≤ 11-row histogram of a document frame: (bucket, n_docs). */
  def profile(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(tokenBucket(tokenCount(col(textCol))).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_docs"))

  /** A pluggable profile DIMENSION (r19 — review missing #4: token length
    * was the only profiled signal, so a source whose length distribution
    * stays flat while its symbol mix collapses — a parser regression
    * emitting markup, encoding corruption — was invisible): `name` keys
    * the stored rows, `bucketOf` maps the text column to a bucket in
    * 0..10 using INTEGER-EXACT arithmetic only (the same ≤ 11-bucket /
    * replayable-oracle contract as the token ladder). */
  final case class Signal(name: String, bucketOf: Column => Column)

  /** Token-length powers-of-two ladder — the original E221 dimension. */
  val TokenLength: Signal = Signal("tok_len", t => tokenBucket(tokenCount(t)))

  /** Symbol-to-character ratio in elevenths: bucket = ⌊10 · n_symbols /
    * n_chars⌋ (integer division, clamped; empty/NULL text → 0), where a
    * symbol is any char outside [A-Za-z0-9], space, tab, newline. The
    * markup/encoding-collapse detector. */
  val SymbolRatio: Signal = Signal("sym_ratio", symbolBucket)

  /** The dimensions [[appendBatch]] records by default. */
  val DefaultSignals: Seq[Signal] = Seq(TokenLength, SymbolRatio)

  def symbolBucket(text: Column): Column = {
    val t = coalesce(text, lit(""))
    val nChar = length(t).cast("long")
    val nSym = nChar - length(regexp_replace(t, "[^A-Za-z0-9 \t\n]", "")).cast("long")
    least(nSym * lit(10L) / greatest(nChar, lit(1L)), lit(10L)).cast("long")
  }

  /** ONE-PASS multi-signal per-source histogram: each doc explodes into
    * |signals| (signal, bucket) pairs (a 2-element literal array — not a
    * join), then one map-side-combinable aggregation to
    * ≤ 11 × |signals| × |sources| rows. Docs without the source column
    * profile under source "" (the [[profileBySource]] rule). */
  def profileSignals(docs: DataFrame, signals: Seq[Signal] = DefaultSignals,
      textCol: String = "text", sourceCol: String = "source"): DataFrame = {
    require(signals.nonEmpty, "at least one signal")
    val src =
      if (docs.columns.contains(sourceCol))
        coalesce(col(sourceCol).cast("string"), lit(""))
      else lit("")
    val pairs = array(signals.map(sig => struct(
      lit(sig.name).as("signal"),
      sig.bucketOf(col(textCol)).cast("long").as("bucket"))): _*)
    docs.select(src.as("source"), explode(pairs).as("sb"))
      .select(col("sb.signal").as("signal"), col("source"),
        col("sb.bucket").as("bucket"))
      .groupBy("signal", "source", "bucket").agg(count(lit(1)).as("n_docs"))
  }

  /** PER-SOURCE histogram (r17 review, "What's missing" #5): one ≤ 11-row
    * block per source — the corpus-level profile dilutes a single source
    * flipping to boilerplate under the other sources' volume, which is
    * exactly the failure the monitor's own motivation names. Still one
    * map-side-combinable aggregation; the frame is ≤ 11 × |sources| rows.
    * NULL sources bucket under "" so the domain join stays total. */
  def profileBySource(docs: DataFrame, textCol: String = "text",
      sourceCol: String = "source"): DataFrame =
    docs.select(coalesce(col(sourceCol).cast("string"), lit("")).as("source"),
        tokenBucket(tokenCount(col(textCol))).as("bucket"))
      .groupBy("source", "bucket").agg(count(lit(1)).as("n_docs"))

  /** PSI between a reference and a current histogram (both
    * (bucket, n_docs)): one row (psi, n_ref, n_cur). Laplace smoothing
    * (+1 per bucket over the full bucket domain) keeps empty buckets
    * finite and the arithmetic exact-rational up to the final ln. */
  def psi(ref: DataFrame, cur: DataFrame): DataFrame = {
    val k = BucketBounds.size + 1
    val spark = ref.sparkSession
    import spark.implicits._
    val buckets = (0 until k).map(_.toLong).toDF("bucket")
    val r = ref.groupBy("bucket").agg(sum("n_docs").as("rn"))
    val c = cur.groupBy("bucket").agg(sum("n_docs").as("cn"))
    val joined = buckets.join(r, Seq("bucket"), "left").join(c, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("rn"), lit(0L)).as("rn"),
        coalesce(col("cn"), lit(0L)).as("cn"))
    // totals via an empty-partition window over the ≤ (k+1)-row histogram —
    // never corpus-wide (the temperatureSample precedent), and no
    // 1-row-cross-join operator for a plan audit to flag
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val pc = (col("cn") + 1).cast("double") / (col("ct") + k).cast("double")
    val pr = (col("rn") + 1).cast("double") / (col("rt") + k).cast("double")
    joined
      .withColumn("rt", sum("rn").over(wAll))
      .withColumn("ct", sum("cn").over(wAll))
      .select(((pc - pr) * (log(pc) - log(pr))).as("term"),
        col("rt"), col("ct"))
      .groupBy(col("rt").as("n_ref"), col("ct").as("n_cur"))
      .agg(sum(col("term")).as("psi"))
      .select(col("psi"), col("n_ref"), col("n_cur"))
  }

  /** PSI per source between two (source, bucket, n_docs) histograms —
    * (source, psi, n_ref, n_cur), one row per source seen in EITHER
    * window. Identical Laplace/ln arithmetic to [[psi]], so the 6-decimal
    * oracle contract carries over term for term; the bucket domain is
    * completed per source (an explode over the ≤ 11 fixed buckets — never
    * a cross join for the plan audit to flag) and the per-source totals
    * ride a source-partitioned window over the ≤ 11 × |sources| frame. */
  def psiBySource(ref: DataFrame, cur: DataFrame): DataFrame =
    psiKeyed(ref, cur, Seq("source"))

  /** PSI per (signal, source) between two (signal, source, bucket, n_docs)
    * histograms ([[profileSignals]] frames) — one row per key pair seen in
    * EITHER window, same arithmetic/oracle contract. */
  def psiBySignals(ref: DataFrame, cur: DataFrame): DataFrame =
    psiKeyed(ref, cur, Seq("signal", "source"))

  /** The shared keyed-PSI plan: bucket domain completed per key tuple via
    * an explode over the ≤ 11 fixed buckets (never a cross join), totals
    * via a key-partitioned window over the ≤ 11 × |keys| frame. */
  private def psiKeyed(ref: DataFrame, cur: DataFrame,
      keys: Seq[String]): DataFrame = {
    val k = BucketBounds.size + 1
    val kc = keys.map(col)
    val seen = ref.select(kc: _*).unionByName(cur.select(kc: _*)).distinct()
    val buckets = seen.select(
      kc :+ explode(typedLit((0L until k.toLong).toArray)).as("bucket"): _*)
    val joinKeys = keys :+ "bucket"
    val r = ref.groupBy(joinKeys.map(col): _*).agg(sum("n_docs").as("rn"))
    val c = cur.groupBy(joinKeys.map(col): _*).agg(sum("n_docs").as("cn"))
    val joined = buckets
      .join(r, joinKeys, "left")
      .join(c, joinKeys, "left")
      .select(kc ++ Seq(col("bucket"),
        coalesce(col("rn"), lit(0L)).as("rn"),
        coalesce(col("cn"), lit(0L)).as("cn")): _*)
    val wKey = org.apache.spark.sql.expressions.Window.partitionBy(kc: _*)
    val pc = (col("cn") + 1).cast("double") / (col("ct") + k).cast("double")
    val pr = (col("rn") + 1).cast("double") / (col("rt") + k).cast("double")
    joined
      .withColumn("rt", sum("rn").over(wKey))
      .withColumn("ct", sum("cn").over(wKey))
      .select(kc ++ Seq(((pc - pr) * (log(pc) - log(pr))).as("term"),
        col("rt"), col("ct")): _*)
      .groupBy(kc ++ Seq(col("rt").as("n_ref"), col("ct").as("n_cur")): _*)
      .agg(sum(col("term")).as("psi"))
      .select(kc ++ Seq(col("psi"), col("n_ref"), col("n_cur")): _*)
  }

  /** Create/open the per-batch histogram table at `root`
    * (PK = (batch, signal, source, bucket), flattened into stat_id).
    * Since r18 the table carries the SOURCE key and since r19 the SIGNAL
    * key — [[appendBatch]] still accepts the older shapes (no source
    * column → corpus-level rows; no signal column → token-length only),
    * so an existing monitor root keeps working unchanged. */
  def statsTable(spark: org.apache.spark.sql.SparkSession,
      root: String): TransactionalTable =
    if (TransactionalTable.exists(root)) {
      // pre-r19 stats tables gain the history bound on first open (no-op
      // once the key exists, including an operator's explicit off)
      val t = TransactionalTable.open(spark, root)
      t.defaultSnapshotExpiry(keepLast = 8)
      t
    }
    else {
      val t = TransactionalTable.create(spark, root,
        org.apache.spark.sql.types.StructType.fromDDL(
          "stat_id STRING, batch LONG, signal STRING, source STRING, " +
            "bucket LONG, n_docs LONG"),
        "stat_id", None)
      // one append per micro-batch forever → expire snapshot history at
      // cadence (r19 — review missing #5); the per-batch fence map is
      // inherited into every newer manifest, so replay fencing survives
      t.setSnapshotExpiry(keepLast = 8)
      t
    }

  /** Append one micro-batch's histogram (replay-fenced: a re-delivered
    * epoch recomputes the identical ≤ 11 rows and the commit no-ops).
    * Returns FALSE when the fence dropped the append — an out-of-order
    * backfill or a second pipeline behind this writer's high-water mark
    * must be VISIBLE to the caller, not silently absorbed (review r17);
    * pipelines sharing one stats table pass distinct `writerId`s (the
    * ExportOps per-consumer convention) so neither fences the other out. */
  def appendBatch(stats: TransactionalTable, docs: DataFrame, batchId: Long,
      textCol: String = "text",
      writerId: String = "quality-monitor",
      /** Source key for the per-source histogram blocks (r18): resolved
        * against the BATCH — a batch without the column (or a pre-r18
        * stats table without the source field) records corpus-level rows
        * under source "", so every caller keeps working and per-source
        * drift lights up wherever the data carries the key. */
      sourceCol: String = "source",
      /** Profile dimensions to record (r19 — stats tables with the signal
        * column store one ≤ 11-row block per signal per source; older
        * tables degrade to the token-length dimension only). */
      signals: Seq[Signal] = DefaultSignals): Boolean = {
    if (batchId <= stats.snapshot.writerFences.getOrElse(writerId, -1L))
      return false
    val spark = docs.sparkSession
    import spark.implicits._
    val perSource = stats.schema.fieldNames.contains("source")
    val perSignal = stats.schema.fieldNames.contains("signal")
    val rows =
      if (!perSource)
        profile(docs, textCol)
          .select(concat_ws(":", lit(batchId), col("bucket")).as("stat_id"),
            lit(batchId).as("batch"), col("bucket"), col("n_docs"))
      else if (!perSignal) {
        val hist =
          if (docs.columns.contains(sourceCol)) profileBySource(docs, textCol, sourceCol)
          else profile(docs, textCol).select(lit("").as("source"),
            col("bucket"), col("n_docs"))
        hist.select(
          concat_ws(":", lit(batchId), col("source"), col("bucket")).as("stat_id"),
          lit(batchId).as("batch"), col("source"), col("bucket"), col("n_docs"))
      } else {
        profileSignals(docs, signals, textCol, sourceCol).select(
          concat_ws(":", lit(batchId), col("signal"), col("source"),
            col("bucket")).as("stat_id"),
          lit(batchId).as("batch"), col("signal"), col("source"),
          col("bucket"), col("n_docs"))
      }
    // materialized once (≤ 11 × |signals| × |sources| rows): the merge
    // consumes the frame twice (key-pruning collect + data-file write) and
    // each consumption would re-aggregate the WHOLE batch otherwise (r19)
    val mat = graft.util.JobLabel.labeled(spark, "quality-monitor:histogram") {
      rows.localCheckpoint(true)
    }
    stats.merge(mat, spark.emptyDataset[String].toDF("stat_id"),
      batchId = batchId, writerId = Some(writerId))
    true
  }

  final case class Drift(psi: Double, nRef: Long, nCur: Long, drifted: Boolean)

  /** Score the batches AFTER `refUpToBatch` against the reference window
    * (batches ≤ `refUpToBatch`) from the STORED histograms — the check an
    * operator (or an ingest-gate hook) runs at cadence. An EMPTY window on
    * either side never flags: Laplace smoothing turns zero evidence into a
    * uniform distribution, which scores ~0.84 against any concentrated
    * real profile — a loud false alarm from no data at all (review r17);
    * psi is still reported so the caller can see the degenerate score. */
  /** The stored rows of ONE signal dimension: a signal-keyed (r19) table
    * filters to `sig`; older tables hold token-length rows only, which IS
    * the [[TokenLength]] dimension — so the pre-signal drift surfaces stay
    * bit-identical across the schema generations. */
  private def signalRows(stats: TransactionalTable, sig: Signal): DataFrame = {
    val s = stats.scan()
    if (stats.schema.fieldNames.contains("signal"))
      s.where(col("signal") === sig.name)
    else if (sig.name == TokenLength.name) s
    else s.where(lit(false))
  }

  def drift(stats: TransactionalTable, refUpToBatch: Long,
      threshold: Double = 0.25): Drift = {
    val s = signalRows(stats, TokenLength)
      .select(col("batch"), col("bucket"), col("n_docs"))
    val r = psi(
      s.where(col("batch") <= refUpToBatch).select("bucket", "n_docs"),
      s.where(col("batch") > refUpToBatch).select("bucket", "n_docs"))
      .collect()(0)
    Drift(r.getDouble(0), r.getLong(1), r.getLong(2),
      drifted = r.getDouble(0) > threshold && r.getLong(1) > 0 && r.getLong(2) > 0)
  }

  final case class SourceDrift(source: String, psi: Double, nRef: Long,
      nCur: Long, drifted: Boolean)

  /** PER-SOURCE drift verdicts (r17 review #5 — the corpus-level score
    * dilutes a single collapsing source under the other sources' volume):
    * one [[SourceDrift]] per source, worst first. The empty-window
    * never-flag rule applies PER SOURCE — a source with zero evidence in
    * either window reports its (degenerate) psi but never flags; in
    * particular a source APPEARING or DISAPPEARING between the windows is
    * a membership change for the operator's allowlist, not a distribution
    * drift. Driver-side size is |sources| rows — the monitor's own bound.
    * A pre-r18 stats table (no source column) scores as ONE "" source —
    * exactly the corpus-level verdict. */
  def driftBySource(stats: TransactionalTable, refUpToBatch: Long,
      threshold: Double = 0.25): Seq[SourceDrift] = {
    val perSource = stats.schema.fieldNames.contains("source")
    val s0 = signalRows(stats, TokenLength)
    val s =
      if (perSource) s0.select(col("batch"), col("source"), col("bucket"), col("n_docs"))
      else s0.select(col("batch"), lit("").as("source"), col("bucket"), col("n_docs"))
    psiBySource(
      s.where(col("batch") <= refUpToBatch).select("source", "bucket", "n_docs"),
      s.where(col("batch") > refUpToBatch).select("source", "bucket", "n_docs"))
      .collect()
      .map(r => SourceDrift(r.getString(0), r.getDouble(1), r.getLong(2),
        r.getLong(3),
        drifted = r.getDouble(1) > threshold && r.getLong(2) > 0 && r.getLong(3) > 0))
      .sortBy(d => (-d.psi, d.source)).toSeq
  }

  /** The alerting order over per-source verdicts: flagged first, then by
    * psi descending — ONE definition shared by the Scala API and the
    * `quality_drift_by_source` CALL so the two surfaces cannot key a
    * different worst row. */
  def worstOf(all: Seq[SourceDrift]): Option[SourceDrift] =
    all.sortBy(d => (!d.drifted, -d.psi, d.source)).headOption

  final case class SignalDrift(signal: String, source: String, psi: Double,
      nRef: Long, nCur: Long, drifted: Boolean)

  /** PER-(SIGNAL, SOURCE) drift verdicts (r19 — review missing #4): one
    * row per profiled dimension per source, so a source whose token-LENGTH
    * histogram stays flat while its symbol mix collapses (markup
    * regression, encoding corruption) flags on the [[SymbolRatio]] row.
    * Same empty-window never-flag rule per key pair. A pre-r19 stats
    * table (no signal column) scores its rows as the [[TokenLength]]
    * dimension only. */
  def driftBySignals(stats: TransactionalTable, refUpToBatch: Long,
      threshold: Double = 0.25): Seq[SignalDrift] = {
    val fields = stats.schema.fieldNames
    val s0 = stats.scan()
    val s1 =
      if (fields.contains("signal")) s0
      else s0.withColumn("signal", lit(TokenLength.name))
    val s =
      if (fields.contains("source")) s1
      else s1.withColumn("source", lit(""))
    val cols = Seq("signal", "source", "bucket", "n_docs").map(col)
    psiBySignals(
      s.where(col("batch") <= refUpToBatch).select(cols: _*),
      s.where(col("batch") > refUpToBatch).select(cols: _*))
      .collect()
      .map(r => SignalDrift(r.getString(0), r.getString(1), r.getDouble(2),
        r.getLong(3), r.getLong(4),
        drifted = r.getDouble(2) > threshold && r.getLong(3) > 0 && r.getLong(4) > 0))
      .sortBy(d => (-d.psi, d.signal, d.source)).toSeq
  }

  /** The alerting order over per-(signal, source) verdicts — shared by the
    * Scala API and the `quality_drift_signals` CALL. */
  def worstOfSignals(all: Seq[SignalDrift]): Option[SignalDrift] =
    all.sortBy(d => (!d.drifted, -d.psi, d.signal, d.source)).headOption

  /** The worst per-source verdict — the single row an alerting hook keys
    * on (None only when the stats table is empty). */
  def driftWorstSource(stats: TransactionalTable, refUpToBatch: Long,
      threshold: Double = 0.25): Option[SourceDrift] =
    worstOf(driftBySource(stats, refUpToBatch, threshold))
}
