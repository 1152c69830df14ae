package graft

import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, SimilarityOps}

class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs away fast"),
    (2L, "the quick brown fox jumps over the lazy dog and runs away slowly"), // near-dup of 1
    (3L, "completely different words about spark catalyst optimizer internals"),
    (4L, "another unrelated document mentioning parquet files and shuffles"),
    (5L, "the quick brown fox jumps over the lazy dog and runs away fast")) // exact dup of 1
    .toDF("doc_id", "text")

  test("jaccardPairs: finds planted near/exact dups, nothing else") {
    val got = DedupOps.jaccardPairs(corpus, threshold = 0.5)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (1L, 5L), (2L, 5L)))
    val exact = DedupOps.jaccardPairs(corpus, threshold = 0.999)
      .select($"doc_a", $"doc_b", $"jaccard").as[(Long, Long, Double)].collect()
    assert(exact.map(r => (r._1, r._2)).toSet === Set((1L, 5L)))
    assert(exact.head._3 === 1.0)
  }

  test("minhashLshPairs: agrees with exact jaccardPairs on the planted dups") {
    val lsh = DedupOps.minhashLshPairs(corpus, threshold = 0.5)
      .select($"doc_a", $"doc_b", $"jaccard").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val exact = DedupOps.jaccardPairs(corpus, threshold = 0.5)
      .select($"doc_a", $"doc_b", $"jaccard").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(lsh === exact) // verified candidates carry the exact jaccard values
  }

  test("containmentPairs: embedded benchmark found at ~1.0; jaccard would miss it") {
    val bench = Seq((100L, "the secret benchmark question about spark internals")).toDF("doc_id", "text")
    val long = (1 to 40).map(i => s"filler$i").mkString(" ") +
      " the secret benchmark question about spark internals " +
      (41 to 80).map(i => s"filler$i").mkString(" ")
    val corpus = Seq((1L, long), (2L, "entirely unrelated content here with many words")).toDF("doc_id", "text")
    val got = DedupOps.containmentPairs(corpus, bench, threshold = 0.5)
      .select($"doc_id", $"bench_id", $"containment").as[(Long, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSeq === Seq((1L, 100L)))
    assert(got.head._3 === 1.0) // every benchmark shingle appears in doc 1
    // the same planted pair is BELOW any useful jaccard threshold (long doc)
    val jac = DedupOps.jaccardPairs(corpus.unionByName(bench), threshold = 0.3)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    assert(!jac.contains((1L, 100L)))
  }

  test("dedupClusters: chains collapse to one component, min id canonical") {
    // components: {1,2,5} (chain 1-2, 2-5), {7,9}, {3,4} via 4-3
    val pairs = Seq((1L, 2L), (2L, 5L), (7L, 9L), (4L, 3L)).toDF("doc_a", "doc_b")
    val got = DedupOps.dedupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 7L -> 7L, 9L -> 7L, 3L -> 3L, 4L -> 3L))
    // a longer chain still converges (diameter > 2)
    val chain = (0L until 12L).sliding(2).map(s => (s(1), s(0))).toSeq.toDF("doc_a", "doc_b")
    val got2 = DedupOps.dedupClusters(chain).as[(Long, Long)].collect()
    assert(got2.forall(_._2 === 0L))
  }

  test("dedupClusters: a too-small iteration budget fails loudly, not partially") {
    // a diameter-11 chain cannot converge in 2 min-propagation rounds
    val chain = (0L until 12L).sliding(2).map(s => (s(1), s(0))).toSeq.toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException](DedupOps.dedupClusters(chain, maxIters = 2))
    assert(e.getMessage.contains("did not converge"))
    // the status variant returns the best-effort labels with the flag down
    val (labels, converged, iters) = DedupOps.dedupClustersStatus(chain, maxIters = 2)
    assert(!converged && iters === 2)
    assert(labels.count() === 12L) // partial labels still cover every node
    // and with budget restored the same input converges
    val (_, ok, _) = DedupOps.dedupClustersStatus(chain, maxIters = 20)
    assert(ok)
  }

  test("DedupIndex: incremental LSH dedup against a persistent engine table") {
    import graft.ops.DedupIndex
    val root = tmpDir("dedup-index")
    val index = DedupIndex.create(spark, root)
    val b0 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "something completely different entirely unrelated content right here"))
      .toDF("doc_id", "text")
    assert(DedupIndex.appendBatch(index, b0, 0).as[Long].collect().toSeq === Seq(1L, 2L))
    assert(index.scan().count() === 8L) // 2 docs x 4 bands
    val b1 = Seq(
      // near-dup of doc 1 (one word changed): shares >=1 simhash band
      (10L, "the quick brown fox jumps over the lazy cat again and again today"),
      // exact dup of doc 2: shares all 4 bands
      (11L, "something completely different entirely unrelated content right here"),
      // fresh
      (12L, "catalyst plans tungsten codegen parquet row groups and bloom filters"))
      .toDF("doc_id", "text")
    val k1 = DedupIndex.appendBatch(index, b1, 1).as[Long].collect().toSeq
    assert(k1 === Seq(12L), s"expected only the fresh doc kept, got $k1")
    val rowsAfter = index.scan().count()
    assert(rowsAfter === 12L) // + doc 12's 4 bands
    // replayed batch: fence no-ops the append AND the kept set recomputes
    // identically (self-matches excluded from the corpus filter)
    assert(DedupIndex.appendBatch(index, b1, 1).as[Long].collect().toSeq === Seq(12L))
    assert(index.scan().count() === rowsAfter, "replay must not grow the index")
    // in-batch dups: two identical fresh docs in one batch -> smaller id
    // wins; a zero-token doc has no sketch and is kept bandless
    val b2 = Seq(
      (20L, "brand new paragraph with wholly original vocabulary throughout it"),
      (21L, "brand new paragraph with wholly original vocabulary throughout it"),
      (22L, "   "))
      .toDF("doc_id", "text")
    assert(DedupIndex.appendBatch(index, b2, 2).as[Long].collect().toSeq.sorted
      === Seq(20L, 22L))
  }

  test("DedupIndex: replayed batch returns the COMMITTED kept set on chain-bearing real data") {
    import graft.ops.DedupIndex
    import org.apache.spark.sql.functions.col
    // The sf0.001 documents fixture contains transitive bucket chains
    // (A<B<C with A,B and B,C sharing simhash bands but not A,C): a replay
    // that RECOMPUTED the kept set would corpus-filter B via the
    // now-indexed A and keep chain-orphaned C — growing kept across
    // deliveries. The read-back contract (ADVICE r14) returns the original
    // committed set instead, so the downstream corpus merge can never
    // diverge from the index.
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val index = DedupIndex.create(spark, tmpDir("dedup-index-chain") + "/idx")
    DedupIndex.appendBatch(index, docs.filter(col("doc_id") % 2 === 0), 0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    val k1 = DedupIndex.appendBatch(index, odd, 1).as[Long].collect().toSeq
    val rowsAfter = index.scan().count()
    val k2 = DedupIndex.appendBatch(index, odd, 1).as[Long].collect().toSeq
    assert(k2 === k1, "replay diverged from the committed kept set")
    assert(index.scan().count() === rowsAfter, "replay must not grow the index")
  }

  test("DedupIndex lifecycle: compaction cadence bounds files and keeps appendBatch flat") {
    import graft.ops.DedupIndex
    val index = DedupIndex.create(spark, tmpDir("dedup-index-life") + "/idx")
    // 20 ingest batches: one fresh doc (distinct vocabulary per batch) plus
    // one exact dup of batch 0's doc — the dup must KEEP dropping after any
    // number of compactions (maintenance must preserve index content)
    val dupText = "the persistent corpus keeps exactly one copy of this sentence"
    // vocabulary chosen collision-free across all 20 batches (simhash bands
    // are 15-bit chunks — random-vocab templates can land deterministic
    // band collisions; this one was probed clean)
    def batchDf(b: Int) = Seq(
      (100L * b + 1, (1 to 12).map(k => s"batch${b}token${k}word").mkString(" ")),
      (100L * b + 2, dupText))
      .toDF("doc_id", "text")
    assert(DedupIndex.appendBatch(index, batchDf(0), 0, compactEvery = 4)
      .as[Long].collect().toSeq === Seq(1L, 2L))
    val times = (1 to 19).map { b =>
      val t0 = System.nanoTime()
      val kept = DedupIndex.appendBatch(index, batchDf(b), b, compactEvery = 4)
        .as[Long].collect().toSeq
      assert(kept === Seq(100L * b + 1),
        s"batch $b: fresh doc kept, batch-0 dup dropped (post-compaction) — got $kept")
      (System.nanoTime() - t0) / 1e9
    }
    // content: every fresh doc's bands present exactly once, 20 + the one
    // kept dup-source doc
    assert(index.scan().select("doc_id").distinct().count() === 21L)
    // file count is bounded by the compaction interval (≤ interval commits'
    // files since the last bin-pack), NOT by total batch count — without
    // the cadence this table holds ≥ 20 files after 20 commits
    val nFiles = graft.table.TransactionalTable.open(spark, index.root)
      .snapshot.files.length
    assert(nFiles <= 8, s"compaction cadence must bound the file count, got $nFiles")
    // flatness: per-batch wall time must not grow with batch count — the
    // corpus join is O(batch ⋈ index) over a bounded file set. Generous 3×
    // bound so VM noise cannot flake the spec; unbounded growth (the
    // defect this guards) shows up as 5-10× by batch 19.
    val first = times.slice(0, 5).sum / 5
    val last = times.slice(14, 19).sum / 5
    assert(last <= first * 3.0,
      f"appendBatch wall time grew: first5=$first%.2fs last5=$last%.2fs")
  }

  test("DedupIndex inside a checkpointed foreachBatch stream: restart-safe, incremental") {
    import java.nio.file.{Files, Paths}
    import graft.ops.DedupIndex
    val in = tmpDir("dedup-stream-in")
    val cp = tmpDir("dedup-stream-cp")
    val index = DedupIndex.create(spark, tmpDir("dedup-stream-idx") + "/idx")
    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("doc_id LONG, text STRING")
        .json(in)
        .writeStream
        .option("checkpointLocation", cp)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, bid: Long) =>
          DedupIndex.appendBatch(index, df, bid); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Files.write(Paths.get(in, "b0.json"), Seq(
      """{"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta eta theta"}""",
      """{"doc_id": 2, "text": "one two three four five six seven eight nine"}""")
      .mkString("", "\n", "\n").getBytes)
    runOnce()
    assert(index.scan().count() === 8L) // 2 docs x 4 bands
    // second run resumes from the checkpoint: only the NEW file processes;
    // the exact dup of doc 1 drops, the fresh doc lands
    Files.write(Paths.get(in, "b1.json"), Seq(
      """{"doc_id": 10, "text": "alpha beta gamma delta epsilon zeta eta theta"}""",
      """{"doc_id": 12, "text": "totally different words appear in this sentence here"}""")
      .mkString("", "\n", "\n").getBytes)
    runOnce()
    val ids = index.scan().select("doc_id").distinct()
      .as[Long].collect().toSet
    assert(ids === Set(1L, 2L, 12L), s"index doc set: $ids")
    assert(index.scan().count() === 12L)
  }

  test("duplicateSpans: cross-doc windows merge to maximal spans; within-doc repeats don't mark") {
    // docs 10/11 share a 7-token run ("alpha beta gamma delta epsilon zeta eta")
    // at different offsets; doc 12 repeats ITS OWN 4-gram twice (no cross-doc
    // match); doc 13 is unrelated; doc 14 is too short to have a window.
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta tail one two"),
      (11L, "head words alpha beta gamma delta epsilon zeta eta"),
      (12L, "red green blue cyan stop red green blue cyan stop"),
      (13L, "nothing in common with anything else written here at all"),
      (14L, "too short")).toDF("doc_id", "text")
    val spans = DedupOps.duplicateSpans(docs, window = 4)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // doc 10: windows 0..3 all inside the shared run → one span [0,6]
    // doc 11: run starts at token 2 → one span [2,8]
    // docs 12/13/14: nothing (within-doc repeat alone must not mark)
    assert(spans === Seq((10L, 0L, 6L, 4L), (11L, 2L, 8L, 4L)))
    // non-adjacent duplicated regions stay separate spans
    val gapped = Seq(
      (20L, "alpha beta gamma delta QQ RR SS TT red green blue cyan"),
      (21L, "alpha beta gamma delta xx yy zz ww red green blue cyan"))
      .toDF("doc_id", "text")
    val g = DedupOps.duplicateSpans(gapped, window = 4)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(g === Seq((20L, 0L, 3L, 1L), (20L, 8L, 11L, 1L),
      (21L, 0L, 3L, 1L), (21L, 8L, 11L, 1L)))
  }

  test("removeDuplicateSpans: span tokens drop, survivors re-join, clean docs pass through") {
    val docs = Seq(
      (20L, "alpha beta gamma delta QQ RR SS TT red green blue cyan"),
      (21L, "alpha beta gamma delta xx yy zz ww red green blue cyan"),
      (22L, "untouched words that appear nowhere else in this corpus"))
      .toDF("doc_id", "text")
    val got = DedupOps.removeDuplicateSpans(docs, window = 4)
      .as[(Long, String, Long)].collect().toSeq
    assert(got === Seq(
      (20L, "QQ RR SS TT", 8L),
      (21L, "xx yy zz ww", 8L),
      (22L, "untouched words that appear nowhere else in this corpus", 0L)))
    // a document that is ENTIRELY a duplicated span cleans to empty, not null
    val full = Seq(
      (30L, "one two three four five six"),
      (31L, "one two three four five six")).toDF("doc_id", "text")
    val cleaned = DedupOps.removeDuplicateSpans(full, window = 4)
      .as[(Long, String, Long)].collect().toSeq
    assert(cleaned === Seq((30L, "", 6L), (31L, "", 6L)))
  }

  test("maxDocFreq skew guard drops ubiquitous shingles") {
    val idx = DedupOps.shingleIndex(corpus, maxDocFreq = Some(2))
    // the shared fox-shingles appear in docs 1,2,5 (> 2) and must be gone
    assert(idx.filter($"sh" === "the quick brown").count() === 0)
    assert(idx.count() > 0)
  }

  test("simhashPairs: exact dup at distance 0; near-dup within 3; unrelated absent") {
    // SimHash bit majorities are only stable for long-enough documents: use
    // ~150-token docs where a single changed token moves few bit votes
    // (with the md5-derived 60-bit token hashes this fixture lands at
    // Hamming distance 1; the 100-token variant sat at 4).
    val base = (1 to 150).map(i => s"tok$i").mkString(" ")
    val oneOff = ((1 to 149).map(i => s"tok$i") :+ "CHANGED").mkString(" ")
    val other = (1 to 150).map(i => s"other$i").mkString(" ")
    val docs = Seq((1L, base), (2L, oneOff), (3L, other), (5L, base)).toDF("doc_id", "text")
    val got = DedupOps.simhashPairs(docs)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 5L)) === 0L)
    assert(got.contains((1L, 2L)) && got((1L, 2L)) <= 3L)
    assert(!got.keys.exists { case (a, b) => Set(a, b).contains(3L) })
  }

  private val vecs = {
    val rnd = new scala.util.Random(7)
    (0L until 40L).map { i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
  }

  test("cosineTopK: self-duplicate vector ranks first with cos 1") {
    val dup = vecs.filter($"vec_id" === 0).select(lit(100L).as("vec_id"), $"embedding")
    val corpus40 = vecs.unionByName(dup)
    val top = SimilarityOps.cosineTopK(corpus40, corpus40.filter($"vec_id" === 0), k = 3)
      .orderBy("rnk").as[(Long, Long, Int)].collect()
    assert(top.head === ((0L, 100L, 1)))
  }

  test("annTopK: deterministic, subset of corpus, finds exact duplicates always") {
    val dup = vecs.filter($"vec_id" === 1).select(lit(101L).as("vec_id"), $"embedding")
    val corpus41 = vecs.unionByName(dup)
    val ann = SimilarityOps.annTopK(corpus41, corpus41.filter($"vec_id" === 1), k = 3, dim = 16)
      .as[(Long, Long, Int)].collect()
    // identical vector has identical signatures in every table → always a candidate,
    // and cosine 1 ranks it first
    assert(ann.head === ((1L, 101L, 1)))
    val again = SimilarityOps.annTopK(corpus41, corpus41.filter($"vec_id" === 1), k = 3, dim = 16)
      .as[(Long, Long, Int)].collect()
    assert(ann.toSeq === again.toSeq)
  }

  test("ivfTopK: deterministic, finds exact duplicate; reasonable recall") {
    val dup = vecs.filter($"vec_id" === 3).select(lit(103L).as("vec_id"), $"embedding")
    val corpus41 = vecs.unionByName(dup)
    val q = corpus41.filter($"vec_id" === 3)
    val ivf = SimilarityOps.ivfTopK(corpus41, q, k = 3, dim = 16, cells = 4, nprobe = 2)
      .as[(Long, Long, Int)].collect()
    // the duplicate lands in the same cell as the query vector → rank 1
    assert(ivf.head === ((3L, 103L, 1)))
    val again = SimilarityOps.ivfTopK(corpus41, q, k = 3, dim = 16, cells = 4, nprobe = 2)
      .as[(Long, Long, Int)].collect()
    assert(ivf.toSeq === again.toSeq)

    // recall vs brute force over several queries
    val queries = vecs.filter($"vec_id" < 8)
    val exact = SimilarityOps.cosineTopK(vecs, queries, k = 3)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    val approx = SimilarityOps.ivfTopK(vecs, queries, k = 3, dim = 16, cells = 4, nprobe = 2)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"IVF recall too low: $recall")

    // exhaustive-probe invariant: nprobe = cells degenerates to the exact
    // brute force — recall 1 by construction, any shortfall is a cell-routing
    // bug, not an approximation artifact
    val full = SimilarityOps.ivfTopK(vecs, queries, k = 3, dim = 16, cells = 4, nprobe = 4)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    assert(full === exact, "nprobe=cells must equal exact cosineTopK")
  }

  test("randomProjection: deterministic ±1 projection, exact linearity, fixed shape") {
    val vecs = Seq(
      (1L, Array.tabulate(16)(i => (i + 1).toFloat)),
      (2L, Array.tabulate(16)(i => 2f * (i + 1))), // exactly 2 × vec 1
      (3L, Array.tabulate(16)(_ => 0f)))
      .toDF("vec_id", "embedding")
    val p = SimilarityOps.randomProjection(vecs, k = 4, dim = 16)
      .as[(Long, Long, Double)].collect()
    assert(p.length === 12) // 3 vectors × 4 output dims
    val byVec = p.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // power-of-two scaling commutes with IEEE rounding: proj(2v) == 2·proj(v) EXACTLY
    assert(byVec(2L) === byVec(1L).map(_ * 2.0))
    assert(byVec(3L) === Seq(0.0, 0.0, 0.0, 0.0))
    // deterministic across invocations (the sign matrix is md5-derived)
    val again = SimilarityOps.randomProjection(vecs, k = 4, dim = 16)
      .as[(Long, Long, Double)].collect()
    assert(again.toSeq === p.toSeq)
  }

  test("nearDupPairs: planted duplicate found at cos ~1") {
    val dup = vecs.filter($"vec_id" === 2).select(lit(102L).as("vec_id"), $"embedding")
    val got = SimilarityOps.nearDupPairs(vecs.unionByName(dup), threshold = 0.99)
      .as[(Long, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSet === Set((2L, 102L)))
  }

  test("semDedup: planted semantic duplicate drops (larger id); originals survive") {
    // two planted near-copies of vector 2: ids 102 and 103 — all three land
    // in the same cell (cos ~1 with each other ⇒ same nearest centroid);
    // the smallest id (2) is the kept representative
    val dup = vecs.filter($"vec_id" === 2)
    val planted = vecs
      .unionByName(dup.select(lit(102L).as("vec_id"), $"embedding"))
      .unionByName(dup.select(lit(103L).as("vec_id"), $"embedding"))
    val got = SimilarityOps.semDedup(planted, threshold = 0.95, cells = 4)
      .as[(Long, Long, Boolean)].collect()
    val kept = got.filter(_._3).map(_._1).toSet
    val dropped = got.filterNot(_._3).map(_._1).toSet
    assert(got.length === 42, "every input vector must appear exactly once")
    assert(Set(102L, 103L).subsetOf(dropped), s"planted dups survived: $kept")
    assert(kept.contains(2L), "the lowest-id representative must be kept")
    // random 16-dim vectors almost never exceed cos 0.95 — nothing else drops
    assert(dropped === Set(102L, 103L), s"unexpected drops: $dropped")
  }

  test("nearDupLshPairs: equals brute force; plan has no theta-join") {
    val dup = vecs.filter($"vec_id" === 2).select(lit(102L).as("vec_id"), $"embedding")
    val corpus = vecs.unionByName(dup)
    val brute = SimilarityOps.nearDupPairs(corpus, threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSeq
    val lshDf = SimilarityOps.nearDupLshPairs(corpus, threshold = 0.3, dim = 16)
    val lsh = lshDf.as[(Long, Long, Double)].collect().toSeq
    assert(lsh === brute) // exact verify ⇒ identical results (incl. bit-equal cos)
    // scale shape: candidates come from an equi-join on (table, sig) buckets,
    // never a nested-loop/cartesian pair expansion
    val physical = lshDf.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin") &&
      !physical.contains("CartesianProduct"), physical.take(2000))
  }

  test("capPerGroup: hash-prefiltered ranking equals the naive window; prefilter prunes") {
    // skewed groups: 'big' has 2000 rows, 'small' has 6
    val docs = spark.range(2006).select(col("id").as("doc_id"),
      when(col("id") < 2000, "big").otherwise("small").as("source"))
    val k = 3
    val got = DedupOps.capPerGroup(docs, "source", k, idCol = "doc_id")
      .select($"doc_id", $"source", $"rk").as[(Long, String, Int)].collect().toSet

    // naive reference: full per-group window over the same hash order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("_h", "doc_id")
    val naive = docs.withColumn("_h", graft.ops.TextOps.md5Hash60($"doc_id"))
      .withColumn("rk", row_number().over(w)).filter($"rk" <= k)
      .select($"doc_id", $"source", $"rk").as[(Long, String, Int)].collect().toSet
    assert(got === naive, "prefilter must not change the selected rows")
    assert(got.count(_._2 == "big") === k && got.count(_._2 == "small") === k)

    // the scale premise: the big group's candidate set is a small fraction
    // of the group (bound ≈ 8k/n of the hash space), the small group is
    // ranked whole
    val counts = docs.groupBy("source").agg(count(lit(1)).as("_n"))
    val bound = floor(least(lit(1.0), lit(32.0 * k) / col("_n")) *
      lit((1L << 60).toDouble)).cast("long")
    val cands = docs.withColumn("_h", graft.ops.TextOps.md5Hash60($"doc_id"))
      .join(broadcast(counts), "source").filter($"_h" < bound)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(cands("small") === 6L, "small groups pass the prefilter whole")
    assert(cands("big") < 400L,
      s"big group must be pruned to ~32k candidates, got ${cands("big")}")
  }

  test("ivf seeding is a distributed filter: no Window, no single-partition sort") {
    // Parquet-backed input: a LocalRelation would let ConvertToLocalRelation
    // evaluate the hash filter at optimize time and (when ≤`cells` rows
    // survive) EliminateLimits erase the limit — the asserted plan shape
    // only exists over a real scan, which is what production sees.
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfseed").toString
    vecs.write.mode("overwrite").parquet(dir)
    val c = spark.read.parquet(dir).select($"vec_id".as("neighbor_id"),
      SimilarityOps.asDouble($"embedding").as("cv"))
    val plan = SimilarityOps.seedCandidates(c, cells = 4, n = 40L)
      .queryExecution.executedPlan.toString
    // the old seeding used row_number() over an unpartitioned Window — the
    // whole corpus through ONE task; the fix must keep seeding windowless
    // (TakeOrderedAndProject over the hash-sampled survivors is fine)
    assert(!plan.contains("Window"), plan.take(2000))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("duplicateSpans at scale: ONE wkey exchange, one fold pass, no join (r16 plan)") {
    // The r16 plan replaces the dup-key groupBy + semi-join-back (2 wkey
    // exchanges, rotate-xor fold computed twice — once per `wins`
    // evaluation) with min≠max over an unbounded window on wkey: ONE
    // exchange, one fold pass, no join operator at all. Each wkey group
    // the window buffers is a handful of rows (docs sharing one window
    // hash). Pinned here so a refactor cannot silently reintroduce the
    // double-fold shape.
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = Seq(
        (10L, "alpha beta gamma delta epsilon zeta eta tail one two"),
        (11L, "head words alpha beta gamma delta epsilon zeta eta"),
        (13L, "nothing in common with anything else written here at all"))
        .toDF("doc_id", "text")
      val df = DedupOps.duplicateSpans(docs, window = 4)
      assert(df.as[(Long, Long, Long, Long)].collect().toSeq ===
        Seq((10L, 0L, 6L, 4L), (11L, 2L, 8L, 4L)))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Join"),
        s"the min≠max window form needs no join operator:\n$plan")
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
      val wkeyExchanges = "Exchange hashpartitioning\\(wkey".r.findAllIn(plan).length
      assert(wkeyExchanges === 1,
        s"expected exactly 1 wkey exchange (the dup-test window), got $wkeyExchanges:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("mixtureBudgetSample: rates follow the spec, saturate at 1, unknown sources drop") {
    val docs = (1L to 40L).map { i =>
      val src = if (i <= 20) "big" else if (i <= 30) "small" else "other"
      (i, src, Seq.fill(10)("tok").mkString(" "))
    }.toDF("doc_id", "source", "text")
    // big: 200 tokens, small: 100, other: unweighted. budget 160:
    // big rate = 160*0.5/200 = 0.4; small = 160*0.5/100 = 0.8
    val got = DedupOps.mixtureBudgetSample(docs,
      weights = Seq("big" -> 0.5, "small" -> 0.5), tokenBudget = 160)
      .as[(Long, String, Long)].collect()
    assert(got.forall(_._3 == 10L))
    assert(!got.exists(_._2 == "other"), "unweighted source must drop")
    val bySrc = got.groupBy(_._2).view.mapValues(_.length).toMap
    // deterministic hash sample: exact membership is fixed; rough rate check
    assert(bySrc.getOrElse("big", 0) > 0 && bySrc.getOrElse("big", 0) < 20)
    assert(bySrc.getOrElse("small", 0) > 0)
    // a huge budget saturates every weighted source at rate 1
    val all = DedupOps.mixtureBudgetSample(docs,
      weights = Seq("big" -> 0.5, "small" -> 0.5), tokenBudget = 1000000)
      .as[(Long, String, Long)].collect()
    assert(all.length === 30)
    // determinism
    val again = DedupOps.mixtureBudgetSample(docs,
      weights = Seq("big" -> 0.5, "small" -> 0.5), tokenBudget = 160)
      .as[(Long, String, Long)].collect()
    assert(again.map(_._1).toSeq === got.map(_._1).toSeq)
  }

  test("upsampleEpochs: floor copies + deterministic fractional copy; 0 drops; default 1") {
    val docs = (1L to 40L).map { i =>
      val src = if (i <= 10) "wiki" else if (i <= 20) "web" else if (i <= 30) "junk" else "other"
      (i, src)
    }.toDF("doc_id", "source")
    val up = DedupOps.upsampleEpochs(docs,
      epochs = Seq("wiki" -> 2.5, "web" -> 1.0, "junk" -> 0.0))
      .as[(Long, String, Long)].collect().toSeq
    val byDoc = up.groupBy(_._1).view.mapValues(_.map(_._3).sorted).toMap
    // junk drops entirely
    assert(!up.exists(_._2 == "junk"))
    // web and unspec'd sources emit exactly one copy at epoch 0
    (11L to 20L).foreach(i => assert(byDoc(i) === Seq(0L)))
    (31L to 40L).foreach(i => assert(byDoc(i) === Seq(0L)))
    // wiki docs get 2 or 3 copies; epochs are a contiguous 0-based range
    val wikiCounts = (1L to 10L).map(i => byDoc(i).length)
    assert(wikiCounts.forall(n => n == 2 || n == 3))
    (1L to 10L).foreach(i => assert(byDoc(i) === (0L until byDoc(i).length.toLong)))
    // expected fractional share ~0.5 — on 10 docs just require both outcomes
    assert(wikiCounts.distinct.sorted === Seq(2, 3))
    // determinism: identical membership on re-run
    val again = DedupOps.upsampleEpochs(docs,
      epochs = Seq("wiki" -> 2.5, "web" -> 1.0, "junk" -> 0.0))
      .as[(Long, String, Long)].collect().toSeq
    assert(again.sorted === up.sorted)
  }

  test("knnGraph: no self-edges, k-bounded, edges stay in-cell, dup ranks first") {
    val dim = 4
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val vecs = Seq(
      (0L, v(1, 0, 0, 0)), (1L, v(0, 1, 0, 0)), // centroids (cells = 2)
      (2L, v(0.9, 0.1, 0, 0)), (3L, v(0.9, 0.1, 0, 0)), // exact dups, cell 0
      (4L, v(0.1, 0.9, 0, 0)), (5L, v(0, 0.8, 0.2, 0))) // cell 1
      .toDF("vec_id", "embedding")
    val g = SimilarityOps.knnGraph(vecs, k = 2, cells = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(g.forall { case (a, b, _) => a != b }, "self edge")
    g.groupBy(_._1).foreach { case (_, es) =>
      assert(es.length <= 2)
      assert(es.map(_._3).sorted === (1L to es.length.toLong))
    }
    // exact duplicates are each other's rank-1 neighbor
    assert(g.contains((2L, 3L, 1L)) && g.contains((3L, 2L, 1L)))
    // cell locality: cell-0 members {0,2,3} never link to cell-1 {1,4,5}
    val cell0 = Set(0L, 2L, 3L)
    g.foreach { case (a, b, _) =>
      assert(cell0.contains(a) === cell0.contains(b), s"cross-cell edge $a->$b")
    }
  }

  test("temperatureSample: alpha<1 flattens — small groups saturate, big ones thin") {
    import graft.ops.DedupOps
    val docs = ((0L until 90L).map(i => (i, "big")) ++ (100L until 110L).map(i => (i, "small")))
      .toDF("doc_id", "source")
    // alpha=0.5, frac=0.5: q=(0.9,0.1) → p∝(0.949,0.316) → pnorm=(0.75,0.25)
    // rates: big min(1, 50·0.75/90)=0.417, small min(1, 50·0.25/10)=1.0
    val kept = DedupOps.temperatureSample(docs, "source", alpha = 0.5, frac = 0.5)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(kept("small") === 10L, "saturated small group must be kept whole")
    assert(kept("big") > 20L && kept("big") < 55L,
      s"big group should thin to ~37.5 (rate 0.417), got ${kept("big")}")
    // determinism: the same call yields the same selection
    val again = DedupOps.temperatureSample(docs, "source", alpha = 0.5, frac = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val first = DedupOps.temperatureSample(docs, "source", alpha = 0.5, frac = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again === first)
  }

  test("contaminatedSpans (E215): a planted eval leak drops surgically; corpus-corpus dups do NOT; clean docs pass") {
    import graft.ops.DedupOps
    val benchText = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      // doc 1 embeds the benchmark mid-document: ONLY that span must drop
      (1L, s"intro words here $benchText outro words tail end"),
      // docs 2 and 3 share a CORPUS-side duplicate passage — decontamination
      // must leave it (that's duplicateSpans' business, not this gate's)
      (2L, "shared corpus passage one two three four five six seven eight"),
      (3L, "shared corpus passage one two three four five six seven eight"),
      (4L, "totally clean document with nothing to remove at all here")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val spans = DedupOps.contaminatedSpans(docs, bench, window = 4)
      .select("doc_id", "span_start", "span_end")
      .as[(Long, Long, Long)].collect().toSeq
    // doc 1: benchmark tokens sit at positions 3..10 (0-based)
    assert(spans === Seq((1L, 3L, 10L)), s"got $spans")
    val cleaned = DedupOps.removeContaminatedSpans(docs, bench, window = 4)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(cleaned(0) === ((1L, "intro words here outro words tail end", 8L)))
    assert(cleaned(1)._3 === 0L && cleaned(2)._3 === 0L,
      "corpus-side duplicates must survive decontamination")
    assert(cleaned(3) === ((4L,
      "totally clean document with nothing to remove at all here", 0L)))
  }

  test("hashSplit (E207): pure function of (id, salt) — stable under corpus growth; salt re-cuts; weights hold") {
    import graft.ops.DedupOps
    val docs = (0L until 1000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val splits = Seq("train" -> 8, "val" -> 1, "test" -> 1)
    val full = DedupOps.hashSplit(docs, splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // weights hold within the hash's statistical wobble
    val counts = full.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 700 && counts("train") < 900, s"train: $counts")
    assert(counts("val") > 50 && counts("val") < 160, s"val: $counts")
    assert(counts("test") > 50 && counts("test") < 160, s"test: $counts")
    // THE property: membership depends only on (id, salt) — a shrunken or
    // re-ingested corpus keeps every surviving doc's split (no doc can
    // drift from test into train across pipeline runs)
    val half = DedupOps.hashSplit(docs.filter(col("doc_id") % 2 === 0), splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    half.foreach { case (id, s) =>
      assert(full(id) === s, s"doc $id drifted from ${full(id)} to $s")
    }
    // a new salt is a fresh independent cut of the same ids
    val salted = DedupOps.hashSplit(docs, splits, salt = "v2")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(full.count { case (id, s) => salted(id) != s } > 100,
      "a new salt must re-cut a substantial fraction")
    // single-label edge: everything lands in the one split
    val one = DedupOps.hashSplit(docs, Seq("all" -> 1))
      .select("split").distinct().as[String].collect().toSeq
    assert(one === Seq("all"))
  }
}
