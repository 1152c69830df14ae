package graft

import org.apache.spark.sql.functions._

import graft.ops.KeepBestIndex

/** Incremental keep-best dedup over the persistent index (E203): better
  * batch docs EVICT their indexed rivals, worse ones drop, ties break to
  * the lower id, and BOTH result sets replay-read-back from committed
  * rows — the index-posture twin of x1_dedup_keep_best's per-run closure.
  *
  * Fixture texts are PINNED offline: `base` = 30 shared words; A/B/C add
  * one word each chosen so that A(doc 10, logit −0.0396) and B(doc 5,
  * logit +0.0141) share 3 SimHash bands, and C(doc 20, logit −0.0426)
  * shares a band with B — near-dup adjacency and the quality order are
  * both deterministic. */
class KeepBestIndexSpec extends SparkSpec {
  import spark.implicits._

  private val base = (1 to 30).map(k => s"commonword$k").mkString(" ")
  private val textA = s"$base extra8"  // worse
  private val textB = s"$base extra4"  // best
  private val textC = s"$base extra30" // worst

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("doc_id").as[Long].collect().toSeq.sorted

  test("lifecycle: better evicts, worse drops, ties break low, replay reads back BOTH sets") {
    val root = tmpDir("keep-best-idx") + "/idx"
    val index = KeepBestIndex.create(spark, root)
    // batch 0 seeds A
    val r0 = KeepBestIndex.appendBatch(index,
      Seq((10L, textA)).toDF("doc_id", "text"), batchId = 0)
    assert(ids(r0.kept) === Seq(10L) && ids(r0.evicted) === Nil)
    // batch 1: B is BETTER and bucket-adjacent — kept, A evicted
    val r1 = KeepBestIndex.appendBatch(index,
      Seq((5L, textB)).toDF("doc_id", "text"), batchId = 1)
    assert(ids(r1.kept) === Seq(5L), "the better doc must be kept")
    assert(ids(r1.evicted) === Seq(10L), "the worse indexed rival must evict")
    // A's band rows are gone: only B's representative rows remain live
    assert(index.scan().where(col("band") >= 0).select("doc_id").distinct()
      .as[Long].collect().toSeq === Seq(5L))
    val rowsAfter1 = index.scan().count()
    // REPLAY of batch 1 (crash-between-commit-and-checkpoint): the merge
    // fences to a no-op and BOTH sets read back bit-for-bit — a
    // recomputation would return an EMPTY evicted set (A's rows are gone)
    // and the downstream corpus would miss the retraction
    val r1b = KeepBestIndex.appendBatch(index,
      Seq((5L, textB)).toDF("doc_id", "text"), batchId = 1)
    assert(ids(r1b.kept) === Seq(5L) && ids(r1b.evicted) === Seq(10L),
      "replay must read back the ORIGINAL kept and evicted sets")
    assert(index.scan().count() === rowsAfter1, "replay must not grow the index")
    // batch 2: C is WORSE than the indexed B — dropped, nothing evicted;
    // a zero-token doc is kept bandless
    val r2 = KeepBestIndex.appendBatch(index,
      Seq((20L, textC), (30L, "")).toDF("doc_id", "text"), batchId = 2)
    assert(ids(r2.kept) === Seq(30L), s"worse near-dup must drop: ${ids(r2.kept)}")
    assert(ids(r2.evicted) === Nil)
    // batch 3: an IDENTICAL copy of B with a LOWER id — tie breaks low,
    // the old representative evicts
    val r3 = KeepBestIndex.appendBatch(index,
      Seq((3L, textB)).toDF("doc_id", "text"), batchId = 3)
    assert(ids(r3.kept) === Seq(3L) && ids(r3.evicted) === Seq(5L),
      "equal quality must break to the lower doc_id")
    assert(index.scan().where(col("band") >= 0).select("doc_id").distinct()
      .as[Long].collect().toSeq === Seq(3L),
      "exactly one live representative per neighborhood")
  }

  test("pruneEvictLog (E209): stale log rows drop, latest batch's read-back intact, live rows untouched") {
    val root = tmpDir("keep-best-prune") + "/idx"
    val index = KeepBestIndex.create(spark, root)
    // three eviction-bearing batches: each replaces the previous rep
    KeepBestIndex.appendBatch(index, Seq((30L, textA)).toDF("doc_id", "text"), 0)
    KeepBestIndex.appendBatch(index, Seq((20L, textB)).toDF("doc_id", "text"), 1)
    val r2 = KeepBestIndex.appendBatch(index,
      Seq((5L, textB)).toDF("doc_id", "text"), 2)
    assert(ids(r2.evicted) === Seq(20L))
    def logBatches = index.scan().where(col("band") === -1)
      .select("batch").distinct().as[Long].collect().toSet
    assert(logBatches === Set(1L, 2L), "two eviction-log generations accrued")
    // prune everything before the latest batch: only batch-2 log rows live
    val pruned = KeepBestIndex.pruneEvictLog(index, beforeBatch = 2)
    assert(pruned === 1L)
    assert(logBatches === Set(2L))
    // the MOST RECENT batch's replay read-back (the documented contract)
    // still returns both original sets bit-for-bit
    val r2b = KeepBestIndex.appendBatch(index,
      Seq((5L, textB)).toDF("doc_id", "text"), 2)
    assert(ids(r2b.kept) === Seq(5L) && ids(r2b.evicted) === Seq(20L),
      "post-prune replay of the latest batch must read back both sets")
    // live representative rows untouched
    assert(index.scan().where(col("band") >= 0).select("doc_id").distinct()
      .as[Long].collect().toSeq === Seq(5L))
    // nothing stale left: a re-prune is a version-stable no-op
    val v = index.currentVersion
    assert(KeepBestIndex.pruneEvictLog(index, beforeBatch = 2) === 0L)
    assert(index.currentVersion === v, "no-op prune must not commit")
    // the in-append cadence: batch 4 with pruneEvictEvery=2 clears batch 2's
    // log rows in the same call that commits batch 4's
    val r4 = KeepBestIndex.appendBatch(index,
      Seq((2L, textB)).toDF("doc_id", "text"), batchId = 4, pruneEvictEvery = 2)
    assert(ids(r4.evicted) === Seq(5L))
    assert(logBatches === Set(4L), s"cadence prune left: $logBatches")
    // an operator's "prune everything" clamps to the latest COMMITTED batch:
    // the current epoch's log survives and its replay still reads back
    assert(KeepBestIndex.pruneEvictLog(index, beforeBatch = Long.MaxValue) === 0L)
    assert(logBatches === Set(4L), "clamp must keep the latest batch's log")
    val r4b = KeepBestIndex.appendBatch(index,
      Seq((2L, textB)).toDF("doc_id", "text"), batchId = 4)
    assert(ids(r4b.kept) === Seq(2L) && ids(r4b.evicted) === Seq(5L),
      "post-clamp replay must read back both original sets")
  }

  test("incremental result matches the one-shot ingest; compaction keeps probes intact") {
    val docs = (0 until 60).map { i =>
      val extra = s"uniq${i}x" // mostly distinct docs + planted dup pairs
      val t = if (i % 10 == 3) textA else if (i % 10 == 7) textB
        else s"$base $extra"
      (i.toLong, t)
    }.toDF("doc_id", "text")
    val rootInc = tmpDir("keep-best-inc") + "/idx"
    val inc = KeepBestIndex.create(spark, rootInc)
    (0 until 3).foreach { b =>
      KeepBestIndex.appendBatch(inc, docs.filter(col("doc_id") % 3 === b),
        batchId = b, compactEvery = 2)
    }
    val rootOne = tmpDir("keep-best-one") + "/idx"
    val one = KeepBestIndex.create(spark, rootOne)
    KeepBestIndex.appendBatch(one, docs, batchId = 0)
    def live(t: graft.table.TransactionalTable): Set[Long] =
      t.scan().where(col("band") >= 0).select("doc_id").distinct()
        .as[Long].collect().toSet
    // batch-split changes WHICH representative survives transient chains,
    // but the planted exact-dup families must each collapse to one doc
    val l = live(inc)
    val aFamily = (0 until 60).filter(_ % 10 == 3).map(_.toLong).toSet
    val bFamily = (0 until 60).filter(_ % 10 == 7).map(_.toLong).toSet
    assert((l & aFamily).size <= 1, s"textA family not collapsed: ${l & aFamily}")
    assert((l & bFamily).size <= 1, s"textB family not collapsed: ${l & bFamily}")
    // the one-shot build collapses the same families
    val lo = live(one)
    assert((lo & aFamily).size <= 1 && (lo & bFamily).size <= 1)
  }
}
