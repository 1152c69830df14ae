package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.ops.DedupIndex
import graft.queries.FunnelRules
import graft.stream.CorpusPipeline
import graft.table.TransactionalTable

/** Streaming corpus build ([[graft.stream.CorpusPipeline]]): funnel →
  * persistent-index dedup → fenced corpus commits per micro-batch, with the
  * batch pipeline as the golden twin and restart/replay safety proven. */
class CorpusStreamSpec extends SparkSpec {
  import spark.implicits._

  // ≥20 tokens of ≥2 chars each so the length/word-len funnel stages pass;
  // whether the hashed classifier keeps each doc is decided identically on
  // the stream and batch sides (one source of truth: FunnelRules.keep).
  private def longText(seed: String): String =
    (1 to 24).map(k => s"${seed}word$k").mkString(" ")

  private val b0Docs = Seq(
    (2L, longText("alpha"), "en", "src0"),
    (4L, longText("omega"), "de", "src1"),
    (6L, "too short", "en", "src0")) // funnel-dropped: < 20 tokens
  private val b1Docs = Seq(
    (1L, longText("alpha"), "en", "src0"), // exact dup of doc 2: index-dropped
    (3L, longText("gamma"), "fr", "src2"),
    (5L, longText("gamma"), "fr", "src2")) // in-batch dup of doc 3

  private def writeBatch(dir: String, name: String,
      docs: Seq[(Long, String, String, String)]): Unit =
    Files.write(Paths.get(dir, name),
      docs.map { case (id, t, l, s) =>
        s"""{"doc_id": $id, "text": "$t", "lang": "$l", "source": "$s"}"""
      }.mkString("", "\n", "\n").getBytes)

  /** The batch twin: the same funnel + index rules, no stream machinery. */
  private def batchTwin(): Set[Long] = {
    val all = (b0Docs ++ b1Docs).toDF("doc_id", "text", "lang", "source")
    val index = DedupIndex.create(spark, tmpDir("corpus-twin-idx") + "/idx")
    val cleaned = all.filter(FunnelRules.keep)
    val k0 = DedupIndex.appendBatch(index, cleaned.filter($"doc_id" % 2 === 0), 0)
      .as[Long].collect().toSet
    val k1 = DedupIndex.appendBatch(index, cleaned.filter($"doc_id" % 2 === 1), 1)
      .as[Long].collect().toSet
    k0 ++ k1
  }

  test("streamed end state bit-matches the batch pipeline; restart resumes; replay fenced") {
    val in = tmpDir("corpus-stream-in")
    val cp = tmpDir("corpus-stream-cp")
    val index = DedupIndex.create(spark, tmpDir("corpus-stream-idx") + "/idx")
    val corpus = TransactionalTable.create(spark, tmpDir("corpus-stream-tbl") + "/c",
      org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id LONG, text STRING, lang STRING, source STRING"), "doc_id")
    def runOnce(): Unit = {
      val q = CorpusPipeline.run(spark, in, cp, index, corpus, FunnelRules.keep)
      q.awaitTermination()
    }
    // batch 0, then STOP (AvailableNow drains and terminates = the restart
    // boundary), then batch 1 resumes from the checkpoint
    writeBatch(in, "b0.json", b0Docs)
    runOnce()
    val afterB0 = corpus.scan().select("doc_id").as[Long].collect().toSet
    assert(afterB0 === Set(2L, 4L), s"batch 0 corpus: $afterB0")
    writeBatch(in, "b1.json", b1Docs)
    runOnce()
    val streamed = corpus.scan().select("doc_id").as[Long].collect().toSet
    // golden: the batch pipeline over the same documents
    val expected = batchTwin()
    assert(streamed === expected, s"streamed=$streamed batch=$expected")
    assert(streamed === Set(2L, 3L, 4L), "dup + funnel-dropped docs absent")
    // full row content matches the input docs (lossless through the stream)
    val rows = corpus.scan().as[(Long, String, String, String)].collect().toSet
    val src = (b0Docs ++ b1Docs).filter(d => streamed(d._1)).toSet
    assert(rows === src)

    // RE-DELIVERED epoch (the crash-between-commit-and-checkpoint case):
    // processing batch 1 again must recompute the identical kept set and
    // no-op both tables
    val idxRows = index.scan().count()
    val corpusV = corpus.currentVersion
    val replayKept = CorpusPipeline.processBatch(index, corpus,
      b1Docs.toDF("doc_id", "text", "lang", "source"), 1L, FunnelRules.keep)
      .as[Long].collect().toSet
    assert(replayKept === Set(3L), s"replayed kept set: $replayKept")
    assert(index.scan().count() === idxRows, "replay must not grow the index")
    assert(corpus.currentVersion === corpusV, "replay must not commit to the corpus")
    assert(corpus.scan().select("doc_id").as[Long].collect().toSet === streamed)
  }

  test("streaming decontamination (E215): leaked benchmark spans drop at ingest; restart + replay safe") {
    val in = tmpDir("decon-stream-in")
    val cp = tmpDir("decon-stream-cp")
    val index = DedupIndex.create(spark, tmpDir("decon-stream-idx") + "/idx")
    val corpus = TransactionalTable.create(spark, tmpDir("decon-stream-tbl") + "/c",
      org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id LONG, text STRING, lang STRING, source STRING"), "doc_id")
    // the eval set: a fixed 8-token example; doc 2 embeds it mid-document
    val benchText = (1 to 8).map(k => s"evaltok$k").mkString(" ")
    val bench = Seq((900L, benchText)).toDF("doc_id", "text")
    val leaky = longText("alpha").split(" ").take(12).mkString(" ") +
      s" $benchText " + longText("alpha").split(" ").drop(12).mkString(" ")
    // doc 6 is CLEAN and carries a double space: it must ship byte-exact
    // (only contaminated docs are rewritten by the token-rejoin kernel)
    val cleanOdd = longText("delta") + "  doublespaced tail"
    val docs0 = Seq((2L, leaky, "en", "src0"), (4L, longText("omega"), "de", "src1"),
      (6L, cleanOdd, "en", "src0"))
    def runOnce(): Unit = {
      val q = CorpusPipeline.run(spark, in, cp, index, corpus, FunnelRules.keep,
        decontaminate = Some(bench), decontaminateWindow = 6)
      q.awaitTermination()
    }
    writeBatch(in, "b0.json", docs0)
    runOnce()
    val t2 = corpus.scan().filter($"doc_id" === 2L)
      .select("text").as[String].head()
    assert(!t2.contains("evaltok"), s"benchmark spans must drop at ingest: $t2")
    assert(t2 === longText("alpha"), "everything around the leak survives")
    // clean docs keep their byte-exact input (whitespace structure intact)
    assert(corpus.scan().filter($"doc_id" === 6L).select("text").as[String]
      .head() === cleanOdd, "clean docs must not be token-rejoined")
    // restart boundary: a later batch carrying the SAME leak cleans too
    writeBatch(in, "b1.json", Seq((3L, s"$benchText " + longText("gamma"), "fr", "src2")))
    runOnce()
    val t3 = corpus.scan().filter($"doc_id" === 3L)
      .select("text").as[String].head()
    assert(!t3.contains("evaltok") && t3 === longText("gamma"), t3)
    // re-delivered epoch: identical recompute, both tables no-op
    val (ir, cv) = (index.scan().count(), corpus.currentVersion)
    CorpusPipeline.processBatch(index, corpus,
      Seq((3L, s"$benchText " + longText("gamma"), "fr", "src2"))
        .toDF("doc_id", "text", "lang", "source"),
      1L, FunnelRules.keep,
      decontaminate = Some(CorpusPipeline.Decontaminate.of(bench, 6)))
    assert(index.scan().count() === ir && corpus.currentVersion === cv,
      "replayed decontaminated epoch must no-op")
  }

  test("near-dup benchmark gate (r17): docs in the benchmark's Hamming ball drop whole; replay safe") {
    val in = tmpDir("near-stream-in")
    val cp = tmpDir("near-stream-cp")
    val index = DedupIndex.create(spark, tmpDir("near-stream-idx") + "/idx")
    val corpus = TransactionalTable.create(spark, tmpDir("near-stream-tbl") + "/c",
      org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id LONG, text STRING, lang STRING, source STRING"), "doc_id")
    // the eval set: doc 11 re-publishes its text verbatim under a new id
    // (SimHash distance 0 — the leak span scrubbing cannot express: the
    // WHOLE doc is the eval example); doc 13 is unrelated and must ship
    val bench = Seq((901L, longText("omega"))).toDF("doc_id", "text")
    writeBatch(in, "b0.json", Seq(
      (11L, longText("omega"), "en", "src0"),
      (13L, longText("gamma"), "en", "src0")))
    val q = CorpusPipeline.run(spark, in, cp, index, corpus, FunnelRules.keep,
      nearDecontaminate = Some(bench))
    q.awaitTermination()
    assert(corpus.scan().select("doc_id").as[Long].collect().toSet === Set(13L),
      "benchmark-ball docs must drop whole; unrelated docs ship")
    assert(index.scan().filter($"doc_id" === 11L).count() === 0L,
      "gated docs must never enter the dedup index")
    // re-delivered epoch recomputes the identical drop set: both no-op
    val (ir, cv) = (index.scan().count(), corpus.currentVersion)
    CorpusPipeline.processBatch(index, corpus,
      Seq((11L, longText("omega"), "en", "src0"),
        (13L, longText("gamma"), "en", "src0"))
        .toDF("doc_id", "text", "lang", "source"),
      0L, FunnelRules.keep,
      nearDecontaminate = Some(CorpusPipeline.NearDecontaminate.of(bench)))
    assert(index.scan().count() === ir && corpus.currentVersion === cv,
      "replayed near-gated epoch must no-op")
  }

  test("quality-drift monitor (E221): a planted length shift flips the verdict; stable traffic does not; replay fenced") {
    import graft.ops.QualityMonitor
    val in = tmpDir("qm-stream-in")
    val cp = tmpDir("qm-stream-cp")
    val index = DedupIndex.create(spark, tmpDir("qm-stream-idx") + "/idx")
    val corpus = TransactionalTable.create(spark, tmpDir("qm-stream-tbl") + "/c",
      org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id LONG, text STRING, lang STRING, source STRING"), "doc_id")
    val stats = QualityMonitor.statsTable(spark, tmpDir("qm-stream-st") + "/stats")
    def runOnce(): Unit = {
      val q = CorpusPipeline.run(spark, in, cp, index, corpus, FunnelRules.keep,
        monitor = Some(stats))
      q.awaitTermination()
    }
    // batch 0: 24-token docs (the reference window)
    writeBatch(in, "b0.json",
      (1L to 8L).map(i => (i, longText(s"ref$i"), "en", "src0")))
    runOnce()
    // batch 1: same length profile → stable
    writeBatch(in, "b1.json",
      (11L to 18L).map(i => (i, longText(s"cur$i"), "en", "src0")))
    runOnce()
    val stable = QualityMonitor.drift(stats, refUpToBatch = 0)
    assert(!stable.drifted && stable.nRef === 8L && stable.nCur === 8L,
      s"identical length profiles must not drift: $stable")
    // batch 2: the crawler goes bad — everything collapses to 2 tokens
    writeBatch(in, "b2.json",
      (21L to 28L).map(i => (i, "tiny doc", "en", "src0")))
    runOnce()
    val shifted = QualityMonitor.drift(stats, refUpToBatch = 1)
    assert(shifted.drifted && shifted.psi > 0.25,
      s"a wholesale length collapse must trip the monitor: $shifted")
    // drift observes the RAW input: the funnel DROPPED the tiny docs (< 20
    // tokens), so the corpus never saw them — only the monitor did
    assert(corpus.scan().filter($"doc_id" >= 21L).count() === 0L,
      "the shifted batch must be funnel-dropped from the corpus")
    // re-delivered epoch: identical ≤ 11 histogram rows, fenced no-op
    val sv = stats.currentVersion
    CorpusPipeline.processBatch(index, corpus,
      (21L to 28L).map(i => (i, "tiny doc", "en", "src0"))
        .toDF("doc_id", "text", "lang", "source"),
      2L, FunnelRules.keep, monitor = Some(stats))
    assert(stats.currentVersion === sv, "replayed monitor epoch must no-op")
    // an EMPTY current window never flags (smoothing would score a uniform
    // no-data profile ~0.84 against any real traffic — a false alarm)
    val empty = QualityMonitor.drift(stats, refUpToBatch = 2)
    assert(!empty.drifted && empty.nCur === 0L,
      s"zero current evidence must not read as drift: $empty")
  }

  test("per-source quality drift (r18): a single collapsing source flags while the corpus-level score stays quiet") {
    import graft.ops.QualityMonitor
    val stats = QualityMonitor.statsTable(spark, tmpDir("qm-src-st") + "/stats")
    // ref: 40 healthy docs from src_main + 4 from src_a, all ~24 tokens
    val ref = ((1 to 40).map(i => (i.toLong, longText(s"m$i"), "en", "src_main")) ++
      (101 to 104).map(i => (i.toLong, longText(s"a$i"), "en", "src_a")))
      .toDF("doc_id", "text", "lang", "source")
    // cur: src_main unchanged, src_a collapses to 2-token boilerplate —
    // 4 of 44 docs, diluted to invisibility at the corpus level
    val cur = ((41 to 80).map(i => (i.toLong, longText(s"m$i"), "en", "src_main")) ++
      (141 to 144).map(i => (i.toLong, "tiny doc", "en", "src_a")))
      .toDF("doc_id", "text", "lang", "source")
    assert(QualityMonitor.appendBatch(stats, ref, 0L))
    assert(QualityMonitor.appendBatch(stats, cur, 1L))
    // corpus-level: the 4-doc shift hides under the 40-doc healthy volume
    val corpus = QualityMonitor.drift(stats, refUpToBatch = 0)
    assert(!corpus.drifted && corpus.psi < 0.25,
      s"the diluted corpus-level score must stay quiet: $corpus")
    // per-source: src_a's collapse is undiluted and flags
    val bySrc = QualityMonitor.driftBySource(stats, refUpToBatch = 0)
      .map(d => d.source -> d).toMap
    assert(bySrc("src_a").drifted && bySrc("src_a").psi > 0.25,
      s"the collapsing source must flag on its own key: ${bySrc("src_a")}")
    assert(!bySrc("src_main").drifted && bySrc("src_main").psi < 0.05,
      s"the healthy source must not: ${bySrc("src_main")}")
    assert(QualityMonitor.driftWorstSource(stats, 0).map(_.source) ===
      Some("src_a"), "the worst-source verdict keys the alert")
    // a source with evidence in only ONE window is a membership change,
    // never a drift flag (the empty-window rule, per source)
    val cur2 = (201 to 204).map(i => (i.toLong, longText(s"n$i"), "en", "src_new"))
      .toDF("doc_id", "text", "lang", "source")
    assert(QualityMonitor.appendBatch(stats, cur2, 2L))
    val newcomer = QualityMonitor.driftBySource(stats, refUpToBatch = 0)
      .find(_.source === "src_new").get
    assert(!newcomer.drifted && newcomer.nRef === 0L,
      s"a newly appearing source must not read as drift: $newcomer")
  }

  test("multi-signal drift (r19): a markup regression flags on symbol ratio while the length histogram stays flat") {
    import graft.ops.QualityMonitor
    val stats = QualityMonitor.statsTable(spark, tmpDir("qm-sig-st") + "/stats")
    // ref: 24 plain tokens per doc — cur: the SAME token count per doc,
    // but every token wrapped in markup (a parser regression shipping
    // HTML): the token-LENGTH histogram is bucket-identical, only the
    // symbol mix moves
    def plain(i: Int) = (1 to 24).map(k => s"tok$i$k").mkString(" ")
    def markup(i: Int) = (1 to 24).map(k => s"<b>tok$i$k</b>").mkString(" ")
    val ref = (1 to 20).map(i => (i.toLong, plain(i), "en", "src_b"))
      .toDF("doc_id", "text", "lang", "source")
    val cur = (21 to 40).map(i => (i.toLong, markup(i), "en", "src_b"))
      .toDF("doc_id", "text", "lang", "source")
    assert(QualityMonitor.appendBatch(stats, ref, 0L))
    assert(QualityMonitor.appendBatch(stats, cur, 1L))
    // every token-length surface stays quiet: corpus-level, per-source,
    // and the tok_len dimension row — the regression is length-invisible
    assert(!QualityMonitor.drift(stats, refUpToBatch = 0).drifted,
      "corpus-level token-length drift must stay quiet")
    assert(!QualityMonitor.driftBySource(stats, refUpToBatch = 0)
      .find(_.source == "src_b").get.drifted,
      "per-source token-length drift must stay quiet")
    val sig = QualityMonitor.driftBySignals(stats, refUpToBatch = 0)
      .map(d => (d.signal, d.source) -> d).toMap
    assert(!sig(("tok_len", "src_b")).drifted &&
      sig(("tok_len", "src_b")).psi < 0.05,
      s"the length dimension is flat by construction: ${sig(("tok_len", "src_b"))}")
    // ... while the symbol-ratio dimension flags it undiluted
    assert(sig(("sym_ratio", "src_b")).drifted &&
      sig(("sym_ratio", "src_b")).psi > 0.25,
      s"the markup collapse must flag on sym_ratio: ${sig(("sym_ratio", "src_b"))}")
    assert(QualityMonitor.worstOfSignals(
      QualityMonitor.driftBySignals(stats, 0)).map(_.signal) ===
      Some("sym_ratio"), "the worst-dimension verdict keys the alert")
  }

  test("quality-drift histogram counts NULL text as 0 tokens (ADVICE r17): bucket 0 in every engine, never the top bucket") {
    import graft.ops.QualityMonitor
    // Spark's legacy size(NULL) is -1 where DuckDB's CASE over len(NULL)
    // falls through to ELSE — the profile clamps both to bucket 0 and the
    // x4_quality_drift oracle mirrors the coalesce, so a NULL-text fixture
    // row can never split the engines
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "three tokens here"))
      .toDF("doc_id", "text")
    val hist = QualityMonitor.profile(docs)
      .as[(Int, Long)].collect().toMap
    assert(hist === Map(0 -> 2L, 2 -> 1L),
      s"NULL and empty text both land in bucket 0; 3 tokens in bucket 2: $hist")
  }

  test("continuous publication (E188): per-batch exports chain the manifest fence; union = corpus") {
    import graft.ops.ExportOps
    val in = tmpDir("pub-stream-in")
    val cp = tmpDir("pub-stream-cp")
    val exp = tmpDir("pub-stream-exp")
    val index = DedupIndex.create(spark, tmpDir("pub-stream-idx") + "/idx")
    val corpus = TransactionalTable.create(spark, tmpDir("pub-stream-tbl") + "/c",
      org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id LONG, text STRING, lang STRING, source STRING"), "doc_id")
    val pub = Some(CorpusPipeline.Publish(exp, nShards = 2, capacity = 64))
    def runOnce(): Unit = {
      val q = CorpusPipeline.run(spark, in, cp, index, corpus, FunnelRules.keep,
        publish = pub)
      q.awaitTermination()
    }
    writeBatch(in, "b0.json", b0Docs); runOnce()
    writeBatch(in, "b1.json", b1Docs); runOnce()
    val m = ExportOps.manifest(spark, exp)
    val intervals = m.scan().select("from_v", "to_v").as[(Long, Long)]
      .collect().sortBy(_._2)
    assert(intervals.nonEmpty)
    // fence-chained: each publication starts where the previous ended
    intervals.sliding(2).foreach {
      case Array((_, t1), (f2, _)) => assert(f2 === t1, "intervals must chain")
      case _ =>
    }
    // the union of published docs IS the corpus — nothing missed, nothing
    // published twice (no updates/deletes in this stream)
    val published = intervals.toSeq.flatMap { case (f, t) =>
      spark.read.parquet(s"$exp/exp_${f}_$t").select("doc_id").as[Long]
        .collect().toSeq
    }
    val corpusIds = corpus.scan().select("doc_id").as[Long].collect().toSet
    assert(published.toSet === corpusIds, s"published=$published")
    assert(published.size === published.toSet.size, "a doc published twice")
    // a replayed batch publishes nothing new
    val mv = m.currentVersion
    CorpusPipeline.processBatch(index, corpus,
      b1Docs.toDF("doc_id", "text", "lang", "source"), 1L, FunnelRules.keep,
      publish = pub)
    assert(m.currentVersion === mv, "replayed batch must not re-publish")
    // packEvery (E202): the in-pipeline compaction cadence folds the
    // accumulated intervals into one and the reader-visible corpus is
    // unchanged
    val preSet = ExportOps.readCorpus(spark, exp).select("doc_id")
      .as[Long].collect().toSet
    CorpusPipeline.processBatch(index, corpus,
      Seq((50L, longText("delta"), "en", "s")).toDF("doc_id", "text", "lang", "source"),
      2L, FunnelRules.keep,
      publish = Some(CorpusPipeline.Publish(exp, nShards = 2, capacity = 64,
        packEvery = 2)))
    assert(ExportOps.intervals(spark, exp).size === 1,
      "packEvery must fold the interval chain")
    assert(ExportOps.readCorpus(spark, exp).select("doc_id")
      .as[Long].collect().toSet === preSet + 50L,
      "packed reader corpus must equal the pre-pack corpus plus the new batch")
  }

  test("keep-best stream (E204): evictions retract from the corpus; replay fenced; crash between commits heals") {
    import graft.ops.KeepBestIndex
    import graft.stream.CorpusPipeline
    // pinned near-dup texts (KeepBestIndexSpec): textB > textA in quality,
    // bucket-adjacent by construction
    val base = (1 to 30).map(k => s"commonword$k").mkString(" ")
    val textA = s"$base extra8"
    val textB = s"$base extra4"
    val work = tmpDir("kb-stream")
    val in = s"$work/in"
    Files.createDirectories(Paths.get(in))
    val index = KeepBestIndex.create(spark, s"$work/idx")
    val corpus = TransactionalTable.create(spark, s"$work/corpus",
      org.apache.spark.sql.types.StructType.fromDDL("doc_id LONG, text STRING"),
      "doc_id", None)
    def runOnce(): Unit = {
      val q = CorpusPipeline.runKeepBest(spark, in, s"$work/ckpt", index, corpus,
        lit(true), schemaDdl = "doc_id LONG, text STRING")
      q.awaitTermination()
    }
    def corpusIds(): Seq[Long] =
      corpus.scan().select("doc_id").as[Long].collect().toSeq.sorted
    Files.write(Paths.get(in, "b0.json"),
      s"""{"doc_id": 10, "text": "$textA"}""".getBytes)
    runOnce()
    assert(corpusIds() === Seq(10L))
    // epoch 1 across a restart: the better near-dup EVICTS 10 from the corpus
    Files.write(Paths.get(in, "b1.json"),
      s"""{"doc_id": 5, "text": "$textB"}""".getBytes)
    runOnce()
    assert(corpusIds() === Seq(5L), "the eviction must retract from the corpus")
    // replay of epoch 1: both commits fence to no-ops
    val cv = corpus.currentVersion
    CorpusPipeline.processBatchKeepBest(index, corpus,
      Seq((5L, textB)).toDF("doc_id", "text"), batchId = 1, lit(true))
    assert(corpus.currentVersion === cv && corpusIds() === Seq(5L),
      "replayed epoch must not re-commit")
    // CRASH BETWEEN THE TWO COMMITS: the index commit of epoch 2 lands
    // (doc 3 = identical text, lower id → evicts 5) but the corpus merge
    // does not; the re-delivered epoch must still apply the retraction
    KeepBestIndex.appendBatch(index, Seq((3L, textB)).toDF("doc_id", "text"),
      batchId = 2)
    assert(corpusIds() === Seq(5L), "premise: corpus merge not yet applied")
    CorpusPipeline.processBatchKeepBest(index, corpus,
      Seq((3L, textB)).toDF("doc_id", "text"), batchId = 2, lit(true))
    assert(corpusIds() === Seq(3L),
      "the re-delivered epoch must replay the ORIGINAL eviction read-back")
  }

  test("keep-best evictions forget the evicted doc's vector in the ANN index (r17 review #4); replay fenced") {
    import graft.ops.{AnnIndex, KeepBestIndex}
    import graft.stream.CorpusPipeline
    val base = (1 to 30).map(k => s"commonword$k").mkString(" ")
    val textA = s"$base extra8"
    val textB = s"$base extra4" // better near-dup of textA (pinned pair)
    val work = tmpDir("kb-vec")
    val index = KeepBestIndex.create(spark, s"$work/idx")
    val corpus = TransactionalTable.create(spark, s"$work/corpus",
      org.apache.spark.sql.types.StructType.fromDDL("doc_id LONG, text STRING"),
      "doc_id", None)
    // per-doc embeddings share the id space (the vectorIndex contract)
    def vec(i: Int): Seq[Float] = {
      val a = Array.fill(8)(0.05f); a(i % 4) = 1f; a.toSeq
    }
    val vecs = Seq((10L, vec(10)), (5L, vec(5))).toDF("vec_id", "embedding")
    val h = AnnIndex.create(spark, s"$work/ann", vecs, cells = 2)
    AnnIndex.appendBatch(h, vecs, batchId = 0)
    CorpusPipeline.processBatchKeepBest(index, corpus,
      Seq((10L, textA)).toDF("doc_id", "text"), batchId = 0, lit(true),
      vectorIndex = Some(h))
    assert(h.assignments.countRows === 2L, "no eviction yet — both vectors live")
    // epoch 1: the better near-dup evicts doc 10 from the corpus AND its
    // vector from the index, same epoch
    CorpusPipeline.processBatchKeepBest(index, corpus,
      Seq((5L, textB)).toDF("doc_id", "text"), batchId = 1, lit(true),
      vectorIndex = Some(h))
    assert(corpus.scan().select("doc_id").as[Long].collect().toSeq === Seq(5L))
    assert(h.assignments.scan().select("vec_id").as[Long].collect().toSeq ===
      Seq(5L), "the evicted doc's vector must leave the index with it")
    // replayed epoch: every commit (index, corpus, vector delete) fences
    val (cv, av) = (corpus.currentVersion, h.assignments.currentVersion)
    CorpusPipeline.processBatchKeepBest(index, corpus,
      Seq((5L, textB)).toDF("doc_id", "text"), batchId = 1, lit(true),
      vectorIndex = Some(h))
    assert(corpus.currentVersion === cv && h.assignments.currentVersion === av,
      "replayed epoch must no-op everywhere, the vector delete included")
  }

  test("media stream continuous publication: byte-budget shards off the payload type, pack cadence folds") {
    import graft.ops.ExportOps
    import graft.stream.{CorpusPipeline, MediaPipeline}
    val work = tmpDir("media-pub")
    val index = graft.ops.ImageDedupIndex.create(spark, s"$work/idx")
    val corpus = TransactionalTable.create(spark, s"$work/corpus",
      org.apache.spark.sql.types.StructType.fromDDL(MediaPipeline.CorpusSchemaDdl),
      "media_id", None)
    def payload(i: Int): Array[Byte] = Array.fill(20 + i)(i.toByte) // not an image: kept hashless
    val pub = Some(CorpusPipeline.Publish(s"$work/exp", nShards = 2,
      capacity = 128, packEvery = 2))
    MediaPipeline.processBatch(index, corpus,
      Seq((1L, payload(1)), (2L, payload(2))).toDF("media_id", "content"),
      batchId = 0, publish = pub)
    MediaPipeline.processBatch(index, corpus,
      Seq((3L, payload(3))).toDF("media_id", "content"), batchId = 1, publish = pub)
    // the reader resolves the BINARY contract from the manifest stamp; the
    // publication sizes are payload BYTES (the type-dispatched default)
    val rows = ExportOps.readCorpus(spark, s"$work/exp")
      .select("media_id", "n_tokens").as[(Long, Long)].collect().toSet
    assert(rows === Set((1L, 21L), (2L, 22L), (3L, 23L)),
      s"published media must size by bytes: $rows")
    // packEvery=2 fired at batch 2: one consolidated interval
    MediaPipeline.processBatch(index, corpus,
      Seq((4L, payload(4))).toDF("media_id", "content"), batchId = 2, publish = pub)
    assert(ExportOps.intervals(spark, s"$work/exp").size === 1,
      "pack cadence must fold the media interval chain")
    assert(ExportOps.readCorpus(spark, s"$work/exp").select("media_id")
      .as[Long].collect().toSet === Set(1L, 2L, 3L, 4L))
  }

  test("media stream: perceptual dedup per micro-batch; restart resumes; replay fenced; payloads intact") {
    import graft.stream.MediaPipeline
    def img(codeword: Int, base: Int, fmt: String = "png"): Array[Byte] = {
      val bi = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (r <- 0 until 8) {
        var v = base
        bi.setRGB(0, r, (v << 16) | (v << 8) | v)
        for (c <- 0 until 7) {
          v += (if (((codeword >> c) & 1) == 1) 10 else -10)
          bi.setRGB(c + 1, r, (v << 16) | (v << 8) | v)
        }
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, fmt, bos)
      bos.toByteArray
    }
    def b64(b: Array[Byte]): String = java.util.Base64.getEncoder.encodeToString(b)
    def writeMedia(dir: String, name: String, rows: Seq[(Long, Array[Byte])]): Unit =
      Files.write(Paths.get(dir, name), rows.map { case (id, bytes) =>
        s"""{"media_id":$id,"content_b64":"${b64(bytes)}"}"""
      }.mkString("", "\n", "\n").getBytes)
    val in = tmpDir("media-stream-in")
    val cp = tmpDir("media-stream-cp")
    val index = graft.ops.ImageDedupIndex.create(spark, tmpDir("media-stream-idx") + "/idx")
    val corpus = TransactionalTable.create(spark, tmpDir("media-stream-tbl") + "/c",
      org.apache.spark.sql.types.StructType.fromDDL(MediaPipeline.CorpusSchemaDdl),
      "media_id")
    def runOnce(): Unit = {
      val q = MediaPipeline.run(spark, in, cp, index, corpus)
      q.awaitTermination()
    }
    val b0 = Seq((1L, img(0x55, 100)), (4L, img(0x2A, 100)))
    val b1 = Seq(
      (11L, img(0x55, 140, "bmp")),   // brightness re-encode of 1: dropped
      (15L, img(0x33, 100)),          // fresh
      (16L, img(0x33, 120)),          // in-batch copy of 15: dropped
      (17L, "not an image".getBytes)) // hashless: kept
    writeMedia(in, "b0.json", b0)
    runOnce()
    assert(corpus.scan().select("media_id").as[Long].collect().toSet === Set(1L, 4L))
    writeMedia(in, "b1.json", b1)
    runOnce() // restart boundary: resumes from the checkpoint
    val kept = corpus.scan().select("media_id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L, 15L, 17L), s"end state: $kept")
    // payloads round-trip base64 → stream → merge byte-exactly
    val stored = corpus.scan().as[(Long, Array[Byte])].collect()
      .map { case (id, b) => id -> b.toSeq }.toMap
    (b0 ++ b1).filter(r => kept(r._1)).foreach { case (id, bytes) =>
      assert(stored(id) === bytes.toSeq, s"payload $id mutated in flight")
    }
    // re-delivered epoch: identical kept set, no commit on either table
    val idxRows = index.scan().count()
    val corpusV = corpus.currentVersion
    val replayKept = MediaPipeline.processBatch(index, corpus,
      b1.toDF("media_id", "content"), 1L).as[Long].collect().toSet
    assert(replayKept === Set(15L, 17L), s"replayed kept: $replayKept")
    assert(index.scan().count() === idxRows)
    assert(corpus.currentVersion === corpusV)
  }

  test("media stream with the AUDIO kernel: same pipeline, acoustic fingerprint dedup") {
    import graft.stream.MediaPipeline
    import graft.ops.WavCodec
    def wav(pattern: Long, div: Int): Array[Byte] = {
      val v = new Array[Int](33)
      v(0) = 2000
      for (k <- 0 until 32)
        v(k + 1) = v(k) + (if (((pattern >> k) & 1L) == 1L) 400 else -400)
      WavCodec.write(v.flatMap(x => Array.fill(8)(x / div)), 1, 8000, 16)
    }
    def b64(b: Array[Byte]): String = java.util.Base64.getEncoder.encodeToString(b)
    def writeMedia(dir: String, name: String, rows: Seq[(Long, Array[Byte])]): Unit =
      Files.write(Paths.get(dir, name), rows.map { case (id, bytes) =>
        s"""{"media_id":$id,"content_b64":"${b64(bytes)}"}"""
      }.mkString("", "\n", "\n").getBytes)
    val in = tmpDir("audio-stream-in")
    val cp = tmpDir("audio-stream-cp")
    val index = graft.ops.AudioDedupIndex.create(spark, tmpDir("audio-stream-idx") + "/idx")
    val corpus = TransactionalTable.create(spark, tmpDir("audio-stream-tbl") + "/c",
      org.apache.spark.sql.types.StructType.fromDDL(MediaPipeline.CorpusSchemaDdl),
      "media_id")
    def runOnce(): Unit = {
      val q = MediaPipeline.run(spark, in, cp, index, corpus,
        kernel = MediaPipeline.AudioKernel)
      q.awaitTermination()
    }
    writeMedia(in, "b0.json", Seq((1L, wav(0x55555555L, 1))))
    runOnce()
    writeMedia(in, "b1.json", Seq(
      (11L, wav(0x55555555L, 2)), // half-volume copy of 1: dropped
      (15L, wav(0x33333333L, 1)), // fresh: kept
      (17L, "not audio".getBytes))) // hashless: kept
    runOnce()
    assert(corpus.scan().select("media_id").as[Long].collect().toSet ===
      Set(1L, 15L, 17L))
  }

  test("vector stream: fenced ANN ingest bit-matches the batch build; restart + replay safe") {
    import graft.ops.AnnIndex
    import graft.stream.VectorPipeline
    val vecs: Seq[(Long, Seq[Double])] = Seq(
      1L -> Seq(1.0, 0.0, 0.0), 2L -> Seq(0.9, 0.1, 0.0),
      3L -> Seq(0.0, 1.0, 0.0), 4L -> Seq(0.1, 0.9, 0.0),
      5L -> Seq(0.95, 0.05, 0.0), 6L -> Seq(0.05, 0.95, 0.0),
      7L -> Seq(0.8, 0.2, 0.0), 8L -> Seq(0.2, 0.8, 0.0))
    def frame(ids: Long => Boolean) =
      vecs.filter(v => ids(v._1)).toDF("vec_id", "embedding")
    def writeVecs(dir: String, name: String, ids: Long => Boolean): Unit =
      Files.write(Paths.get(dir, name),
        vecs.filter(v => ids(v._1)).map { case (id, e) =>
          s"""{"vec_id": $id, "embedding": [${e.mkString(", ")}]}"""
        }.mkString("", "\n", "\n").getBytes)
    val in = tmpDir("vec-stream-in")
    val cp = tmpDir("vec-stream-cp")
    val h = AnnIndex.create(spark, tmpDir("vec-stream-idx") + "/idx",
      frame(_ <= 2), cells = 2)
    def runOnce(): Unit = {
      val q = VectorPipeline.run(spark, in, cp, h)
      q.awaitTermination()
    }
    // batch 0, STOP (restart boundary), batch 1 resumes from the checkpoint
    writeVecs(in, "b0.json", _ <= 4); runOnce()
    writeVecs(in, "b1.json", _ > 4); runOnce()
    def assignments(x: AnnIndex.Handle): Set[(Long, Int)] =
      x.assignments.scan()
        .select($"vec_id", $"cell".cast("int"))
        .as[(Long, Int)].collect().toSet
    // golden twin: a batch build with the same seeds and batch split
    val g = AnnIndex.create(spark, tmpDir("vec-twin-idx") + "/idx",
      frame(_ <= 2), cells = 2)
    AnnIndex.appendBatch(g, frame(_ <= 4), batchId = 0)
    AnnIndex.appendBatch(g, frame(_ > 4), batchId = 1)
    assert(assignments(h) === assignments(g),
      "streamed assignments must bit-match the batch build")
    assert(assignments(h).map(_._1) === (1L to 8L).toSet)
    // RE-DELIVERED epoch: the fenced merge must no-op
    val v0 = h.assignments.currentVersion
    VectorPipeline.processBatch(h, frame(_ > 4), batchId = 1)
    assert(h.assignments.currentVersion === v0, "replay must not commit")
    // and probes over the streamed index answer (exactness is the oracled
    // cdc_ann_stream query's business)
    assert(AnnIndex.probe(h, frame(_ == 1), k = 3, nprobe = 2).count() === 3L)
  }
}
