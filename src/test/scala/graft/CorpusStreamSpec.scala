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
}
