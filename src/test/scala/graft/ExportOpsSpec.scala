package graft

import org.apache.spark.sql.functions._

import graft.ops.ExportOps
import graft.table.TransactionalTable

/** Incremental training-data export (E184): consecutive intervals publish
  * disjoint deltas, tombstones track cross-export retractions, manifests
  * fence re-runs. */
class ExportOpsSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, words: Int): (Long, String) =
    id -> (1 to words).map(k => s"w${id}x$k").mkString(" ")

  test("consecutive exports publish disjoint deltas; cross-export tombstones; fenced re-run") {
    val root = tmpDir("export-ops")
    val corpus = TransactionalTable.create(spark, s"$root/corpus",
      org.apache.spark.sql.types.StructType.fromDDL("doc_id LONG, text STRING"),
      "doc_id", None)
    corpus.append(Seq(doc(1, 10), doc(2, 20)).toDF("doc_id", "text"), batchId = 0)
    val v0 = corpus.currentVersion
    corpus.append(Seq(doc(3, 30), doc(4, 5)).toDF("doc_id", "text"), batchId = 1)
    val v1 = corpus.currentVersion
    val e1 = ExportOps.exportDelta(corpus, s"$root/exp", v0, v1,
      nShards = 2, capacity = 16L)
    assert(e1.exported)
    val pub1 = spark.read.parquet(e1.dir).select("doc_id").as[Long].collect().toSet
    assert(pub1 === Set(3L, 4L), s"export 1 must carry only its interval: $pub1")
    assert(e1.tombstones.isEmpty)
    // interval 2: a fresh doc, an UPDATE of a published doc (re-publishes),
    // and a DELETE of a doc published in export 1 (tombstones)
    corpus.merge(Seq(doc(5, 7), (4L, "rewritten text")).toDF("doc_id", "text"),
      Seq(3L).toDF("doc_id"), batchId = 2)
    val v2 = corpus.currentVersion
    val e2 = ExportOps.exportDelta(corpus, s"$root/exp", v1, v2,
      nShards = 2, capacity = 16L)
    assert(e2.exported)
    val pub2 = spark.read.parquet(e2.dir).select("doc_id").as[Long].collect().toSet
    assert(pub2 === Set(4L, 5L), s"export 2 must carry the update + the birth: $pub2")
    assert(e2.tombstones.as[Long].collect().toSet === Set(3L),
      "the cross-export retraction must tombstone")
    // manifest: one fenced row per interval; re-running interval 2 no-ops
    val m = ExportOps.manifest(spark, s"$root/exp")
    assert(m.scan().select("to_v").as[Long].collect().toSet === Set(v1, v2))
    val mv = m.currentVersion
    val replay = ExportOps.exportDelta(corpus, s"$root/exp", v1, v2,
      nShards = 2, capacity = 16L)
    assert(!replay.exported && m.currentVersion === mv,
      "replayed interval must not re-publish")
    // the replay still returns the identical deterministic assignment
    val a1 = e2.assignment.select("shard", "bin", "pos", "doc_id")
      .as[(Int, Long, Int, Long)].collect().toSet
    val a2 = replay.assignment.select("shard", "bin", "pos", "doc_id")
      .as[(Int, Long, Int, Long)].collect().toSet
    assert(a1 === a2)
    // bin arithmetic: capacity 16 with doc sizes (20-token doc straddles)
    val bins = spark.read.parquet(e1.dir)
      .groupBy("shard").agg(max(col("bin")).as("mx"))
      .select("mx").as[Long].collect()
    assert(bins.forall(_ >= 0L))
  }

  test("streamIntervals (E212): a checkpointed consumer sees each interval exactly once; pack is skipped; restart resumes") {
    val root = tmpDir("export-stream")
    val corpus = TransactionalTable.create(spark, s"$root/corpus",
      org.apache.spark.sql.types.StructType.fromDDL("doc_id LONG, text STRING"),
      "doc_id", None)
    corpus.append(Seq(doc(1, 10), doc(2, 20)).toDF("doc_id", "text"), batchId = 0)
    val v1 = corpus.currentVersion
    ExportOps.exportDelta(corpus, s"$root/exp", 0, v1, nShards = 2, capacity = 16L)
    corpus.append(Seq(doc(3, 5)).toDF("doc_id", "text"), batchId = 1)
    val v2 = corpus.currentVersion
    ExportOps.exportDelta(corpus, s"$root/exp", v1, v2, nShards = 2, capacity = 16L)
    val ckpt = s"$root/ckpt"
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long, Long)]()
    def drain(): Unit = {
      val q = ExportOps.streamIntervals(spark, s"$root/exp")
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          df.select("from_v", "to_v").collect().foreach { r =>
            val (f, t) = (r.getLong(0), r.getLong(1))
            val (docs, tombs) = ExportOps.readInterval(spark, s"$root/exp", f, t)
            seen.add((f, t, docs.count(), tombs.count()))
          }
          ()
        }.start()
      try q.processAllAvailable() finally { q.stop(); q.awaitTermination() }
    }
    import scala.jdk.CollectionConverters._
    drain()
    assert(seen.asScala.toSet === Set((0L, v1, 2L, 0L), (v1, v2, 1L, 0L)),
      s"both published intervals exactly once: ${seen.asScala.toSeq}")
    // pack consolidates the manifest (a rewrite commit): the consumer
    // SKIPS it — its contents were already consumed interval-by-interval
    assert(ExportOps.pack(spark, s"$root/exp").packed)
    // a post-pack interval: an update + a cross-export retraction
    corpus.merge(Seq(doc(4, 6)).toDF("doc_id", "text"),
      Seq(1L).toDF("doc_id"), batchId = 2)
    val v3 = corpus.currentVersion
    ExportOps.exportDelta(corpus, s"$root/exp", v2, v3, nShards = 2, capacity = 16L)
    val before = seen.size
    drain() // restart from the checkpoint
    val fresh = seen.asScala.toSeq.drop(before).toSet
    assert(fresh === Set((v2, v3, 1L, 1L)),
      s"restart must deliver ONLY the new interval (pack skipped): $fresh")
    // the interval reader's tombstone side carries the retraction
    val (_, tombs) = ExportOps.readInterval(spark, s"$root/exp", v2, v3)
    assert(tombs.as[Long].collect().toSeq === Seq(1L))
  }

  test("pack (E202): intervals fold atomically — latest copy wins, tombstone debt zeroed, fenced re-pack, publication continues") {
    val root = tmpDir("export-ops-pack")
    val corpus = TransactionalTable.create(spark, s"$root/corpus",
      org.apache.spark.sql.types.StructType.fromDDL("doc_id LONG, text STRING"),
      "doc_id", None)
    def pub(): Unit = {
      val r = ExportOps.exportLatest(corpus, s"$root/exp", nShards = 2,
        capacity = 16L)
      assert(r.exported)
    }
    // interval A: docs 1, 2 — B: docs 3, 4 + UPDATE of 2 — C: deletes-only
    corpus.append(Seq(doc(1, 10), doc(2, 20)).toDF("doc_id", "text"), batchId = 0)
    pub()
    corpus.merge(Seq(doc(3, 5), doc(4, 7), (2L, "two rewritten")).toDF("doc_id", "text"),
      spark.emptyDataset[Long].toDF("doc_id"), batchId = 1)
    pub()
    corpus.merge(spark.emptyDataset[(Long, String)].toDF("doc_id", "text"),
      Seq(3L).toDF("doc_id"), batchId = 2)
    pub()
    def corpusRows() = ExportOps.readCorpus(spark, s"$root/exp")
      .select("doc_id", "n_tokens", "text").as[(Long, Long, String)]
      .collect().toSet
    val before = corpusRows()
    assert(before.map(_._1) === Set(1L, 2L, 4L), s"reader contract pre-pack: $before")
    assert(before.find(_._1 == 2L).get._3 === "two rewritten",
      "latest published copy must win")
    // ATOMICITY: a dir the manifest does not list is invisible to readers —
    // exactly the crash-window state (consolidated dir written, flip not
    // yet committed)
    Seq((999L, "ghost")).toDF("doc_id", "text")
      .withColumn("shard", lit(0)).withColumn("bin", lit(0L))
      .withColumn("pos", lit(0)).withColumn("n_tokens", lit(1L))
      .select("shard", "bin", "pos", "doc_id", "n_tokens", "text")
      .write.partitionBy("shard").parquet(s"$root/exp/exp_0_999")
    assert(corpusRows() === before,
      "readers must derive dirs from the manifest alone (crash-window atomicity)")
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(s"$root/exp/exp_0_999"))
    val head = corpus.currentVersion
    val p = ExportOps.pack(spark, s"$root/exp")
    assert(p.packed && p.intervalsBefore === 3L && p.nDocs === 3L)
    // one consolidated manifest row, zero remaining tombstone debt
    val ivs = ExportOps.intervals(spark, s"$root/exp")
    assert(ivs.map(iv => (iv.toV, iv.fromV, iv.nDocs, iv.nTombstones)) ===
      Seq((head, 0L, 3L, 0L)), s"manifest after pack: $ivs")
    assert(corpusRows() === before, "pack must not change the reader-visible corpus")
    // folded dirs reclaimed; only the consolidated dir remains
    val dirs = graft.util.Fs.listSeq(java.nio.file.Paths.get(s"$root/exp"))
      .map(_.getFileName.toString).filter(_.startsWith("exp_"))
    assert(dirs === Seq(s"exp_0_$head"), s"old interval dirs must be reclaimed: $dirs")
    // re-pack at the same head: fenced no-op
    val mv = ExportOps.manifest(spark, s"$root/exp").currentVersion
    assert(!ExportOps.pack(spark, s"$root/exp").packed)
    assert(ExportOps.manifest(spark, s"$root/exp").currentVersion === mv)
    // publication CONTINUES from the untouched export fence
    corpus.append(Seq(doc(9, 3)).toDF("doc_id", "text"), batchId = 3)
    pub()
    assert(corpusRows().map(_._1) === Set(1L, 2L, 4L, 9L),
      "post-pack publication must extend the consolidated corpus")
  }

  test("media (BINARY) export packs off the stamped manifest contract — no caller overrides") {
    val root = tmpDir("export-ops-media-pack")
    val corpus = TransactionalTable.create(spark, s"$root/media",
      org.apache.spark.sql.types.StructType.fromDDL("media_id LONG, content BINARY"),
      "media_id", None)
    def payload(i: Int): Array[Byte] = Array.fill(10 + i)(i.toByte)
    def pub(): Unit = {
      val m = ExportOps.manifest(spark, s"$root/exp")
      val from = math.max(0L, m.snapshot.writerFences.getOrElse("export", 0L))
      val r = ExportOps.exportDelta(corpus, s"$root/exp", from,
        corpus.currentVersion, nShards = 2, capacity = 64L,
        idCol = "media_id", textCol = "content",
        sizeOf = Some(org.apache.spark.sql.functions.length(_).cast("long")))
      assert(r.exported)
    }
    corpus.append(Seq((1L, payload(1)), (2L, payload(2))).toDF("media_id", "content"),
      batchId = 0)
    pub()
    corpus.merge(Seq((3L, payload(3)), (2L, payload(9))).toDF("media_id", "content"),
      Seq(1L).toDF("media_id"), batchId = 1)
    pub()
    // the stamped contract (media_id / content / BINARY) drives BOTH the
    // reader and the pack — the call sites pass nothing
    val before = ExportOps.readCorpus(spark, s"$root/exp")
      .select("media_id", "n_tokens").as[(Long, Long)].collect().toSet
    assert(before === Set((2L, 19L), (3L, 13L)),
      s"byte sizes must ride the stored n_tokens: $before")
    val p = ExportOps.pack(spark, s"$root/exp")
    assert(p.packed && p.nDocs === 2L)
    val after = ExportOps.readCorpus(spark, s"$root/exp")
      .select("media_id", "n_tokens").as[(Long, Long)].collect().toSet
    assert(after === before, "pack must preserve the binary reader corpus")
    // payload BYTES survive the repack bit-for-bit
    val bytes = ExportOps.readCorpus(spark, s"$root/exp")
      .select("media_id", "content").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(bytes(2L) === payload(9).toSeq && bytes(3L) === payload(3).toSeq)
  }

  test("pack respects the consumer ack low-watermark; folded-away intervals fail descriptively (ADVICE r16)") {
    val root = tmpDir("export-ops-watermark")
    val corpus = TransactionalTable.create(spark, s"$root/corpus",
      org.apache.spark.sql.types.StructType.fromDDL("doc_id LONG, text STRING"),
      "doc_id", None)
    def pub(): Long = {
      assert(ExportOps.exportLatest(corpus, s"$root/exp", nShards = 2,
        capacity = 16L).exported)
      corpus.currentVersion
    }
    corpus.append(Seq(doc(1, 10)).toDF("doc_id", "text"), batchId = 0)
    val v1 = pub()
    corpus.append(Seq(doc(2, 20)).toDF("doc_id", "text"), batchId = 1)
    val v2 = pub()
    corpus.merge(Seq(doc(3, 5), (1L, "one rewritten")).toDF("doc_id", "text"),
      Seq(2L).toDF("doc_id"), batchId = 2)
    val v3 = pub()
    // a lagging registered consumer at v1 pins the watermark: only ONE
    // interval is foldable → pack no-ops, every dir stays
    ExportOps.ackConsumed(spark, s"$root/exp", "trainer-a", v1)
    assert(!ExportOps.pack(spark, s"$root/exp").packed,
      "pack must not fold past the registered low-watermark")
    assert(ExportOps.intervals(spark, s"$root/exp").size === 3)
    // the consumer catches up to v2: the [v1, v2] prefix folds, the
    // unconsumed (v2, v3] interval survives on disk for it to read
    ExportOps.ackConsumed(spark, s"$root/exp", "trainer-a", v2)
    val p = ExportOps.pack(spark, s"$root/exp")
    assert(p.packed && p.intervalsBefore === 2L, s"prefix fold only: $p")
    val ivs = ExportOps.intervals(spark, s"$root/exp")
    assert(ivs.map(iv => (iv.fromV, iv.toV)) === Seq((0L, v2), (v2, v3)),
      s"consolidated prefix + untouched pending interval: $ivs")
    val (docs, tombs) = ExportOps.readInterval(spark, s"$root/exp", v2, v3)
    assert(docs.select("doc_id").as[Long].collect().toSet === Set(1L, 3L) &&
      tombs.as[Long].collect().toSeq === Seq(2L),
      "the lagging consumer's pending interval must read intact")
    // reader contract unchanged by the partial fold (later tombstone of
    // doc 2 still applies over the consolidated prefix)
    val read = ExportOps.readCorpus(spark, s"$root/exp")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(read.keySet === Set(1L, 3L) && read(1L) === "one rewritten",
      s"latest-wins + cross-prefix tombstones must survive the pack: $read")
    // a folded-away interval fails with the start-up contract, not a raw
    // missing-file error
    val ex = intercept[IllegalStateException] {
      ExportOps.readInterval(spark, s"$root/exp", 0L, v1)
    }
    assert(ex.getMessage.contains("pack") &&
      ex.getMessage.contains("snapshotForConsumer"), ex.getMessage)
    // snapshot-then-tail start-up: registers at ack 0 — the snapshot's
    // interval dirs cannot be folded away before the consumer MATERIALIZES
    // it (review r17: acking the head at snapshot time opened exactly that
    // window) — and hands back the manifest version to tail from
    val (snap, tailV) = ExportOps.snapshotForConsumer(spark, s"$root/exp",
      "trainer-b")
    assert(snap.select("doc_id").as[Long].collect().toSet === Set(1L, 3L))
    assert(tailV === ExportOps.manifest(spark, s"$root/exp").currentVersion)
    assert(ExportOps.consumerAcks(spark, s"$root/exp") ===
      Map("trainer-a" -> v2, "trainer-b" -> 0L))
    // the consumer acks the head AFTER consuming its snapshot
    ExportOps.ackConsumed(spark, s"$root/exp", "trainer-b", v3)
    // a stale/replayed ack never moves a consumer backwards
    ExportOps.ackConsumed(spark, s"$root/exp", "trainer-b", v1)
    assert(ExportOps.consumerAcks(spark, s"$root/exp") ===
      Map("trainer-a" -> v2, "trainer-b" -> v3))
    // a decommissioned trainer stops pinning the watermark
    ExportOps.dropConsumer(spark, s"$root/exp", "trainer-a")
    assert(ExportOps.consumerAcks(spark, s"$root/exp") === Map("trainer-b" -> v3))
    // drop-then-re-register works (the fence must not eat the comeback)
    ExportOps.ackConsumed(spark, s"$root/exp", "trainer-a", v1)
    assert(ExportOps.consumerAcks(spark, s"$root/exp")("trainer-a") === v1)
  }

  test("ackConsumed is monotone under concurrent writers (ADVICE r17): racing acks can never regress the stored watermark") {
    val root = tmpDir("export-ops-ack-race")
    val corpus = TransactionalTable.create(spark, s"$root/corpus",
      org.apache.spark.sql.types.StructType.fromDDL("doc_id LONG, text STRING"),
      "doc_id", None)
    corpus.append(Seq(doc(1, 10)).toDF("doc_id", "text"), batchId = 0)
    assert(ExportOps.exportLatest(corpus, s"$root/exp", nShards = 1,
      capacity = 16L).exported)
    // each thread acks through its OWN table instance (ackConsumed opens
    // one per call), so the race is between real optimistic commits — the
    // old check-then-act shape let a stale low ack overwrite a higher one
    // after both passed the pre-read; the version-gated merge must not
    val acks = Seq(3L, 9L, 1L, 7L, 5L, 2L, 8L, 4L)
    val threads = acks.map { v =>
      new Thread(() =>
        ExportOps.ackConsumed(spark, s"$root/exp", "trainer-r", v))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(ExportOps.consumerAcks(spark, s"$root/exp")("trainer-r") === 9L,
      "the committed ack must be the max of every racing write")
    // and a late straggler below the committed value still no-ops — no
    // write at all, not a same-value rewrite
    val reg = TransactionalTable.open(spark, s"$root/exp/_consumers")
    val tv = reg.currentVersion
    ExportOps.ackConsumed(spark, s"$root/exp", "trainer-r", 6L)
    assert(ExportOps.consumerAcks(spark, s"$root/exp")("trainer-r") === 9L)
    assert(reg.currentVersion === tv, "a stale ack must not commit")
  }

  test("deletes-only interval publishes tombstones + a zero-doc manifest row (ADVICE r15)") {
    val root = tmpDir("export-ops-delonly")
    val corpus = TransactionalTable.create(spark, s"$root/corpus",
      org.apache.spark.sql.types.StructType.fromDDL("doc_id LONG, text STRING"),
      "doc_id", None)
    corpus.append(Seq(doc(1, 10), doc(2, 20)).toDF("doc_id", "text"), batchId = 0)
    val v0 = corpus.currentVersion
    val e1 = ExportOps.exportDelta(corpus, s"$root/exp", 0, v0,
      nShards = 2, capacity = 16L)
    assert(e1.exported)
    // interval 2 carries ONLY deletions: zero insert images, one tombstone
    import spark.implicits._
    corpus.merge(spark.emptyDataset[(Long, String)].toDF("doc_id", "text"),
      Seq(1L).toDF("doc_id"), batchId = 1)
    val v1 = corpus.currentVersion
    val e2 = ExportOps.exportDelta(corpus, s"$root/exp", v0, v1,
      nShards = 2, capacity = 16L)
    assert(e2.exported, "a deletes-only interval must still publish")
    assert(e2.tombstones.as[Long].collect().toSet === Set(1L))
    assert(spark.read.parquet(s"${e2.dir}/_tombstones").as[Long].collect()
      .toSet === Set(1L), "tombstone list must be on disk")
    val m = ExportOps.manifest(spark, s"$root/exp")
    val row = m.scan().where(col("to_v") === v1)
      .select("n_docs", "n_tokens", "n_tombstones")
      .as[(Long, Long, Long)].collect()
    assert(row.toSeq === Seq((0L, 0L, 1L)),
      s"manifest must record the empty publication exactly: ${row.toSeq}")
  }

  test("pack/registration race is exactly-once (r19): a consumer registering MID-PACK keeps its dirs; deferred reclaim clears after it acks") {
    val root = tmpDir("export-ops-race")
    val corpus = TransactionalTable.create(spark, s"$root/corpus",
      org.apache.spark.sql.types.StructType.fromDDL("doc_id LONG, text STRING"),
      "doc_id", None)
    def pub(): Unit =
      assert(ExportOps.exportLatest(corpus, s"$root/exp", nShards = 2,
        capacity = 16L).exported)
    corpus.append(Seq(doc(1, 10), doc(2, 20)).toDF("doc_id", "text"), batchId = 0)
    pub()
    corpus.append(Seq(doc(3, 5)).toDF("doc_id", "text"), batchId = 1)
    pub()
    corpus.append(Seq(doc(4, 7)).toDF("doc_id", "text"), batchId = 2)
    pub()
    val expected = ExportOps.readCorpus(spark, s"$root/exp")
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toSet
    def dirsOnDisk(): Set[String] =
      graft.util.Fs.listSeq(java.nio.file.Paths.get(s"$root/exp"))
        .map(_.getFileName.toString).filter(_.startsWith("exp_")).toSet
    val oldDirs = dirsOnDisk()
    assert(oldDirs.size === 3)
    // unknown orphans age-gate before reclaim (r19 review pass 1: a stale
    // sweep must not delete a concurrent pack's freshly written
    // consolidated dir) — shrink the window so this test's deferred
    // orphans clear
    val grace0 = graft.ops.ExportOps.PackOrphanGraceMs
    graft.ops.ExportOps.PackOrphanGraceMs = 0L
    // the consumer registers + snapshots BETWEEN pack's watermark read and
    // its manifest commit — the at-most-once window ADVICE r17 documented.
    // Its snapshot plan resolves the OLD manifest's dirs.
    var captured: (org.apache.spark.sql.DataFrame, Long) = null
    graft.ops.ExportTestHooks.afterWatermarkRead = Some(() => {
      graft.ops.ExportTestHooks.afterWatermarkRead = None
      captured = ExportOps.snapshotForConsumer(spark, s"$root/exp", "late")
    })
    try {
      val p = ExportOps.pack(spark, s"$root/exp")
      assert(p.packed, "the fold itself proceeds (only deletion defers)")
    } finally graft.ops.ExportTestHooks.afterWatermarkRead = None
    // EVERY dir the registered consumer's old-manifest plan can reference
    // is still on disk — deletion deferred, not raced
    assert(oldDirs.subsetOf(dirsOnDisk()),
      s"no dir a registered consumer can reach may be deleted: ${dirsOnDisk()}")
    // the captured snapshot materializes EXACTLY the corpus — no missing
    // files, no retry needed: the pin is exactly-once now
    val got = captured._1.select("doc_id", "n_tokens")
      .as[(Long, Long)].collect().toSet
    assert(got === expected, s"mid-pack snapshot must be whole: $got")
    // consumer acks its snapshot head → the next pack call's sweep
    // reclaims the deferred orphans (the consolidated dir stays)
    val head = ExportOps.intervals(spark, s"$root/exp").map(_.toV).max
    ExportOps.ackConsumed(spark, s"$root/exp", "late", head)
    ExportOps.pack(spark, s"$root/exp") // fenced no-op + reclaim sweep
    val after = dirsOnDisk()
    assert(after === Set(s"exp_0_$head"),
      s"deferred orphans must clear once the consumer acks past them: $after")
    // and the reader contract over the consolidated root is unchanged
    assert(ExportOps.readCorpus(spark, s"$root/exp")
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toSet === expected)
    graft.ops.ExportOps.PackOrphanGraceMs = grace0
  }

  test("reclaim matches by dir NAME: a non-canonical exportRoot (trailing slash) never orphans live dirs; young unknown orphans age-gate") {
    val root = tmpDir("export-ops-norm")
    val corpus = TransactionalTable.create(spark, s"$root/corpus",
      org.apache.spark.sql.types.StructType.fromDDL("doc_id LONG, text STRING"),
      "doc_id", None)
    // exportRoot with a TRAILING SLASH: dirOf string-concatenates while
    // directory listings normalize — a raw path-string comparison graded
    // every LIVE dir an orphan and deleted the whole corpus (r19 review
    // pass 1)
    val exp = s"$root/exp/"
    corpus.append(Seq(doc(1, 10), doc(2, 20)).toDF("doc_id", "text"), batchId = 0)
    assert(ExportOps.exportLatest(corpus, exp, nShards = 2, capacity = 16L).exported)
    corpus.append(Seq(doc(3, 5)).toDF("doc_id", "text"), batchId = 1)
    assert(ExportOps.exportLatest(corpus, exp, nShards = 2, capacity = 16L).exported)
    // a YOUNG unknown orphan (a concurrent pack's freshly written
    // consolidated dir, or a just-crashed pack) must survive the sweep
    val young = java.nio.file.Paths.get(s"$root/exp/exp_0_99")
    java.nio.file.Files.createDirectories(young)
    val p = ExportOps.pack(spark, exp)
    assert(p.packed && p.nDocs === 3L)
    assert(ExportOps.readCorpus(spark, exp).select("doc_id")
      .as[Long].collect().toSet === Set(1L, 2L, 3L),
      "live consolidated data must survive a non-canonical-root sweep")
    val names = graft.util.Fs.listSeq(java.nio.file.Paths.get(s"$root/exp"))
      .map(_.getFileName.toString).filter(_.startsWith("exp_")).toSet
    assert(names.contains("exp_0_99"),
      s"a young unknown orphan must age-gate, not vanish: $names")
    assert(names.size === 2, s"the folded prefix itself must reclaim: $names")
  }
}
