package graft

import org.apache.spark.sql.functions._

import graft.ops.{PqOps, SimilarityOps}

/** Product quantization (E185): encode/ADC mechanics and compressed-domain
  * recall on a separable fixture. */
class PqOpsSpec extends SparkSpec {
  import spark.implicits._

  // 3 well-separated directions in 8 dims, 4 vectors near each; queries are
  // the cluster axes — ADC must rank the right cluster's members on top.
  private val base = Seq(
    Seq(1.0, 0, 0, 0, 1.0, 0, 0, 0),
    Seq(0, 1.0, 0, 0, 0, 1.0, 0, 0),
    Seq(0, 0, 1.0, 0, 0, 0, 1.0, 0))
  private val vecs = (0 until 12).map { i =>
    val b = base(i % 3)
    (i.toLong, b.zipWithIndex.map { case (x, j) => x + 0.01 * ((i + j) % 5) })
  }

  test("codebooks/encode: m codes per vector, each in [0, k)") {
    val df = vecs.toDF("vec_id", "embedding")
    val books = PqOps.codebooks(df, m = 2, k = 4)
    assert(books.size === 2 && books.forall(_.size === 4) &&
      books.forall(_.forall(_.size === 4)))
    val enc = PqOps.encode(df, books).collect()
    assert(enc.length === 12)
    enc.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.size === 2 && cs.forall(c => c >= 0 && c < 4), s"codes: $cs")
    }
  }

  test("ADC top-k ranks the query's own cluster first (compressed-domain recall)") {
    val df = vecs.toDF("vec_id", "embedding")
    val books = PqOps.codebooks(df, m = 2, k = 6)
    val enc = PqOps.encode(df, books)
    val queries = base.zipWithIndex.map { case (b, i) => (100L + i, b) }
      .toDF("vec_id", "embedding")
    val top = PqOps.adcTopK(queries, enc, books, k = 4)
    // every query's top-4 is exactly its own cluster (ids ≡ i mod 3)
    val byQ = top.select("qid", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    base.indices.foreach { i =>
      val want = (0 until 12).filter(_ % 3 == i).map(_.toLong).toSet
      assert(byQ(100L + i) === want, s"query $i got ${byQ(100L + i)}")
    }
    // and the ADC score of a same-cluster member beats every cross-cluster
    // exact score ordering sanity: top-1 by ADC == top-1 by exact cosine
    val exact = SimilarityOps.cosineTopK(df, queries, k = 1)
    val adcTop1 = top.filter(col("rnk") === 1)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toMap
    val exactTop1 = exact.select(col("qid"), col("neighbor_id"))
      .as[(Long, Long)].collect().toMap
    assert(adcTop1.keySet === exactTop1.keySet)
    adcTop1.foreach { case (q, n) =>
      assert(n % 3 === exactTop1(q) % 3,
        s"ADC top-1 left the exact top-1's cluster for query $q")
    }
  }

  test("refineCodebooks (E199): Lloyd rounds cut quantization error when seeds are unrepresentative; empty cells keep their seed") {
    // the k lowest ids all sit in ONE cluster — the seed rule's worst case:
    // seed books describe cluster 0 only, and both other clusters quantize
    // badly until the Lloyd rounds move codes onto them
    val skewed = (0 until 4).map { i =>
      (i.toLong, base(0).zipWithIndex.map { case (x, j) => x + 0.01 * ((i + j) % 5) })
    } ++ (4 until 16).map { i =>
      (i.toLong, base(i % 3).zipWithIndex.map { case (x, j) => x + 0.01 * ((i + j) % 5) })
    }
    val df = skewed.toDF("vec_id", "embedding")
    val seed = PqOps.codebooks(df, m = 2, k = 4)
    val refined = PqOps.refineCodebooks(df, seed, iters = 3)
    // shape preserved
    assert(refined.size === 2 && refined.forall(_.size === 4) &&
      refined.forall(_.forall(_.size === 4)))
    // quantization error (nearest-code L2 per subvector, summed): Lloyd
    // must strictly improve on the degenerate seeds
    def qErr(books: PqOps.Codebooks): Double =
      skewed.map { case (_, v) =>
        (0 until 2).map { s =>
          val sub = v.slice(s * 4, (s + 1) * 4)
          books(s).map(c =>
            sub.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum).min
        }.sum
      }.sum
    assert(qErr(refined) < qErr(seed) * 0.8,
      s"Lloyd rounds must cut quantization error: ${qErr(refined)} vs ${qErr(seed)}")
    // empty-cell rule: with k far above the cluster count, some codes
    // attract nothing and must keep their seed vector verbatim
    val wide = PqOps.codebooks(df, m = 2, k = 12)
    val wideRefined = PqOps.refineCodebooks(df, wide, iters = 1)
    val kept = (0 until 2).flatMap(s => (0 until 12).filter(c =>
      wideRefined(s)(c) == wide(s)(c)))
    assert(kept.nonEmpty, "unassigned codes must keep their seed vectors")
  }

  test("IVF-PQ: cell-partitioned codes table; probePq reads only probed cells (E186)") {
    import graft.ops.AnnIndex
    val df = vecs.toDF("vec_id", "embedding")
    val root = tmpDir("ivfpq")
    val h = AnnIndex.create(spark, s"$root/idx", df, cells = 3)
    AnnIndex.appendBatch(h, df, batchId = 0)
    val books = PqOps.codebooks(
      h.assignments.scan().select(col("vec_id"), col("v").as("embedding")),
      m = 2, k = 4)
    val codes = PqOps.buildPqCodes(h, s"$root/codes", books)
    // layout: one row per indexed vector, partitioned by cell
    assert(codes.scan().count() === 12L)
    assert(codes.partitionCol === Some("cell"))
    val queries = base.zipWithIndex.map { case (b, i) => (100L + i, b) }
      .toDF("vec_id", "embedding")
    val top = AnnIndex.probePq(h, codes, books, queries, k = 3, nprobe = 1)
    // nprobe=1 on a separable fixture: every hit shares the query's cell,
    // and with the cluster axes as queries the hits are the right cluster
    val byQ = top.select("qid", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2 % 3).toSet).toMap
    byQ.foreach { case (q, clusters) =>
      assert(clusters.size === 1, s"query $q crossed clusters: $clusters")
    }
    assert(top.groupBy("qid").count().select("count").as[Long].collect()
      .forall(_ === 3L), "k rows per query")
  }

  test("appendCodes (E205): incremental codes bit-match the one-shot build; replay no-ops; residual dispatch") {
    import graft.ops.AnnIndex
    val all = (0 until 24).map { i =>
      val b = base(i % 3)
      (i.toLong, b.zipWithIndex.map { case (x, j) => x + 0.01 * ((i + j) % 5) })
    }.toDF("vec_id", "embedding")
    def unitOf(df: org.apache.spark.sql.DataFrame) = {
      val v = SimilarityOps.asDouble(col("embedding"))
      df.select(col("vec_id"),
        transform(v, x => x / sqrt(SimilarityOps.dot(v, v))).as("embedding"))
    }
    for (residual <- Seq(false, true)) {
      val root = tmpDir(s"pq-append-$residual")
      // incremental: empty index + empty codes, 3 streamed epochs
      val hInc = AnnIndex.create(spark, s"$root/inc/idx",
        all.filter(col("vec_id") % 3 === 0), cells = 3)
      val (codesInc, books) =
        if (residual) {
          // residual books need residuals of indexed vectors — bootstrap
          // epoch 0 first, build, then stream epochs 1-2
          AnnIndex.appendBatch(hInc, all.filter(col("vec_id") % 3 === 0), batchId = 0)
          val (t, b) = PqOps.buildPqCodesResidual(hInc, s"$root/inc/codes", m = 2, k = 4)
          (1 to 2).foreach(e => PqOps.appendCodes(hInc, t,
            all.filter(col("vec_id") % 3 === e), batchId = e))
          (1 to 2).foreach(e => AnnIndex.appendBatch(hInc,
            all.filter(col("vec_id") % 3 === e), batchId = e))
          (t, b)
        } else {
          val b = PqOps.codebooks(unitOf(all.filter(col("vec_id") % 3 === 0)),
            m = 2, k = 4)
          val t = PqOps.buildPqCodes(hInc, s"$root/inc/codes", b)
          (0 to 2).foreach { e =>
            AnnIndex.appendBatch(hInc, all.filter(col("vec_id") % 3 === e), batchId = e)
            PqOps.appendCodes(hInc, t, all.filter(col("vec_id") % 3 === e), batchId = e)
          }
          (t, b)
        }
      // one-shot twin over the SAME final index with the SAME books
      val hOne = AnnIndex.create(spark, s"$root/one/idx",
        all.filter(col("vec_id") % 3 === 0), cells = 3)
      AnnIndex.appendBatch(hOne, all, batchId = 0)
      val codesOne =
        if (residual) {
          val t = graft.table.TransactionalTable.create(spark, s"$root/one/codes",
            org.apache.spark.sql.types.StructType.fromDDL(
              "vec_id LONG, cell LONG, codes ARRAY<INT>"), "vec_id", Some("cell"))
          t.setCustomMeta("pq.books", PqOps.booksToString(books))
          t.setCustomMeta("pq.residual", "true")
          PqOps.appendCodes(hOne, t, all, batchId = 0)
          t
        } else PqOps.buildPqCodes(hOne, s"$root/one/codes", books)
      def rows(t: graft.table.TransactionalTable) =
        t.scan().select("vec_id", "cell", "codes")
          .as[(Long, Long, Seq[Int])].collect().toSet
      assert(rows(codesInc) === rows(codesOne),
        s"residual=$residual: incremental codes must bit-match the one-shot build")
      // replayed epoch: fenced to a no-op
      val v = codesInc.currentVersion
      PqOps.appendCodes(hInc, codesInc, all.filter(col("vec_id") % 3 === 1), batchId = 1)
      assert(codesInc.currentVersion === v && rows(codesInc) === rows(codesOne),
        "replayed codes epoch must no-op")
    }
  }

  test("E206: probes refuse stale codes after a retrain; rebuildCodes restores a fresh-build-identical table") {
    import graft.ops.AnnIndex
    for (residual <- Seq(false, true)) {
      val root = tmpDir(s"pq-stale-$residual")
      val df = vecs.toDF("vec_id", "embedding")
      val h = AnnIndex.create(spark, s"$root/idx", df, cells = 3)
      AnnIndex.appendBatch(h, df, batchId = 0)
      def build(dir: String) =
        if (residual) PqOps.buildPqCodesResidual(h, dir, m = 2, k = 4)
        else {
          val b = PqOps.codebooks(
            h.assignments.scan().select(col("vec_id"), col("v").as("embedding")),
            m = 2, k = 4)
          (PqOps.buildPqCodes(h, dir, b), b)
        }
      val (codes, books) = build(s"$root/codes")
      val queries = base.zipWithIndex.map { case (b, i) => (100L + i, b) }
        .toDF("vec_id", "embedding")
      def probe(bk: PqOps.Codebooks) =
        if (residual) AnnIndex.probePqResidual(h, codes, bk, queries, k = 3, nprobe = 3)
        else AnnIndex.probePq(h, codes, bk, queries, k = 3, nprobe = 3)
      assert(probe(books).count() > 0, "fresh codes probe fine")
      // a retrain moves centroid vectors AND the cell layout: every stored
      // code row is now wrong, and the fence must refuse instead of serving
      // silently mis-ranked results
      AnnIndex.retrain(h, cells = 3, fenceId = 100L)
      val e1 = intercept[IllegalStateException](probe(books).collect())
      assert(e1.getMessage.contains("STALE"), e1.getMessage)
      val e2 = intercept[IllegalStateException](
        PqOps.appendCodes(h, codes, df, batchId = 9))
      assert(e2.getMessage.contains("STALE"), e2.getMessage)
      // rebuild re-trains by the table's own rule, re-encodes everything in
      // one overwrite commit, and re-stamps — the result must bit-match a
      // fresh one-shot build over the same (retrained) index
      val books2 = PqOps.rebuildCodes(h, codes)
      val (fresh, freshBooks) = build(s"$root/fresh")
      assert(books2 === freshBooks, "rebuild must re-train by the build rule")
      def rows(t: graft.table.TransactionalTable) =
        t.scan().select("vec_id", "cell", "codes")
          .as[(Long, Long, Seq[Int])].collect().toSet
      assert(rows(codes) === rows(fresh),
        s"residual=$residual: rebuilt codes must bit-match a fresh build")
      assert(probe(books2).count() > 0, "probes serve again after the rebuild")
      // crash-window guard: a pending rebuild marker refuses probes even
      // when the generation stamp happens to match
      codes.setCustomMeta("pq.rebuild.pending", "true")
      val e3 = intercept[IllegalStateException](probe(books2).collect())
      assert(e3.getMessage.contains("unfinished rebuild"), e3.getMessage)
      // re-running the rebuild heals the window
      PqOps.rebuildCodes(h, codes)
      assert(probe(books2).count() > 0)
    }
  }

  test("E213: drift retrain composes with streamed codes maintenance — auto-rebuild keeps probes fresh") {
    import graft.ops.AnnIndex
    import graft.stream.VectorPipeline
    val dim = 8
    // the AnnIndexSpec planted-drift geometry: seed region on axis 0, drift
    // region on axis 5 — drift crowds one seed cell until the trigger trips
    def vec(axis: Int, wobbleBase: Int, i: Long): Seq[Double] = {
      val a = Array.fill(dim)(0.05); a(axis) = 1.0
      a(wobbleBase + (i % 2).toInt) += 0.01 * (i % 5); a.toSeq
    }
    val root = tmpDir("pq-drift")
    val seed = (0L until 20L).map(i => (i, vec(0, 1, i))).toDF("vec_id", "embedding")
    val h = AnnIndex.create(spark, s"$root/idx", seed, cells = 4)
    VectorPipeline.processBatch(h, seed, batchId = 0, retrainWhenSkew = 0.8)
    val books = PqOps.codebooks(
      h.assignments.scan().select(col("vec_id"), col("v").as("embedding")),
      m = 2, k = 4)
    val codes = PqOps.buildPqCodes(h, s"$root/codes", books)
    assert(PqOps.codesFresh(h, codes))
    // drift epochs with the trigger ARMED and codes MAINTAINED — the
    // combination r16 wave 4 guarded off; the retrain (epoch ~5) stales the
    // codes mid-stream and the pipeline must rebuild before the epoch ends
    def batch(b: Int) = (0L until 20L)
      .map(j => (1000L * b + j, vec(5, 6, 1000L * b + j)))
      .toDF("vec_id", "embedding")
    (1 to 6).foreach { b =>
      VectorPipeline.processBatch(h, batch(b), batchId = b,
        retrainWhenSkew = 0.8, codes = Some(codes))
      assert(PqOps.codesFresh(h, codes), s"epoch $b left stale codes")
    }
    assert(AnnIndex.status(h).lastRetrain.isDefined,
      "the planted drift must have tripped a retrain")
    // the maintained codes converged to a fresh one-shot build over the
    // final (retrained) index under the rebuilt books
    val curBooks = PqOps.booksFromString(codes.customMeta("pq.books").get)
    val oneShot = PqOps.buildPqCodes(h, s"$root/fresh", curBooks)
    def rows(t: graft.table.TransactionalTable) =
      t.scan().select("vec_id", "cell", "codes")
        .as[(Long, Long, Seq[Int])].collect().toSet
    assert(rows(codes) === rows(oneShot),
      "maintained codes must bit-match a one-shot build post-retrain")
    // the E206 fence passes and compressed-domain probes serve
    assert(AnnIndex.probePq(h, codes, curBooks, seed.limit(2),
      k = 3, nprobe = 2).count() > 0)
    // a re-delivered epoch is exactly-once: no commit on either table
    val (vA, vC) = (h.assignments.currentVersion, codes.currentVersion)
    VectorPipeline.processBatch(h, batch(6), batchId = 6,
      retrainWhenSkew = 0.8, codes = Some(codes))
    assert(h.assignments.currentVersion === vA && codes.currentVersion === vC,
      "replayed epoch must no-op both tables")
  }

  test("residual IVF-PQ (E191): residual codes keep the cluster structure; books persisted") {
    import graft.ops.AnnIndex
    val df = vecs.toDF("vec_id", "embedding")
    val root = tmpDir("ivfpq-res")
    val h = AnnIndex.create(spark, s"$root/idx", df, cells = 3)
    AnnIndex.appendBatch(h, df, batchId = 0)
    val (codes, books) = PqOps.buildPqCodesResidual(h, s"$root/codes", m = 2, k = 6)
    assert(codes.customMeta("pq.books").exists(_.nonEmpty))
    assert(codes.customMeta("pq.residual") === Some("true"))
    // books round-trip exactly through the metadata encoding
    assert(PqOps.booksFromString(codes.customMeta("pq.books").get) === books)
    val queries = base.zipWithIndex.map { case (b, i) => (100L + i, b) }
      .toDF("vec_id", "embedding")
    val top = AnnIndex.probePqResidual(h, codes, books, queries, k = 3, nprobe = 1)
    val byQ = top.select("qid", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2 % 3).toSet).toMap
    byQ.foreach { case (q, clusters) =>
      assert(clusters.size === 1, s"query $q crossed clusters: $clusters")
    }
  }
}
