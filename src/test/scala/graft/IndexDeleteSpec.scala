package graft

import org.apache.spark.sql.functions._

import graft.ops.{AnnIndex, DedupIndex, ImageDedupIndex, KeepBestIndex, VideoDedupIndex}
import graft.table.TransactionalTable

/**
 * DELETE maintenance for the banded index family (r18 review missing #2 —
 * the one index family that could not forget): fenced band-row removal by
 * id on [[DedupIndex]], [[graft.ops.HammingIndex]] (image binding),
 * [[VideoDedupIndex]] and [[KeepBestIndex]], mirroring
 * [[AnnIndex.deleteBatch]]'s contract — replay-fenced epochs, crash-heal
 * by re-run, re-ingest resurrects — plus the one-epoch corpus takedown
 * ([[graft.stream.CorpusPipeline.takedown]]) that removes doc + bands +
 * vector together.
 */
class IndexDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("DedupIndex.deleteBatch: a previously-suppressed near-dup is admitted; fenced replay no-ops; re-ingest resurrects") {
    val root = tmpDir("idx-del-text") + "/idx"
    val index = DedupIndex.create(spark, root)
    // doc 2 is an exact near-dup of doc 0 (same text -> same simhash);
    // doc 4 is unrelated
    DedupIndex.appendBatch(index,
      docs(0L -> "alpha beta gamma delta", 4L -> "omega psi chi phi"), 0)
    // suppressed while 0 is indexed
    val k1 = DedupIndex.appendBatch(index,
      docs(2L -> "alpha beta gamma delta"), 1).as[Long].collect().toSeq
    assert(k1 === Seq.empty, s"dup of an indexed doc must drop: $k1")
    // takedown of doc 0 — its 4 band rows leave
    DedupIndex.deleteBatch(index, Seq(0L).toDF("doc_id"), batchId = 2)
    val vAfterDelete = index.currentVersion
    assert(index.scan().where(col("doc_id") === 0L).count() === 0L)
    // the SAME content is now admitted: the suppression died with the rows
    val k3 = DedupIndex.appendBatch(index,
      docs(2L -> "alpha beta gamma delta"), 3).as[Long].collect().toSeq
    assert(k3 === Seq(2L), "a near-dup of removed content must be admitted")
    // fenced replay: re-delivering the delete epoch is a no-op (crash
    // between takedown legs heals by re-running the whole epoch)
    DedupIndex.deleteBatch(index, Seq(0L).toDF("doc_id"), batchId = 2)
    assert(index.scan().where(col("doc_id") === 2L).count() === 4L,
      "a replayed delete epoch must not touch later commits")
    // re-ingest of the deleted id reappears (row removal, not a tombstone)
    val k4 = DedupIndex.appendBatch(index,
      docs(0L -> "fresh words entirely new"), 4).as[Long].collect().toSeq
    assert(k4 === Seq(0L), "a deleted id must be re-ingestable")
    assert(index.currentVersion > vAfterDelete)
  }

  test("KeepBestIndex.deleteBatch: new arrivals are judged against survivors only; eviction log untouched") {
    val root = tmpDir("idx-del-kb") + "/idx"
    val index = KeepBestIndex.create(spark, root)
    val r0 = KeepBestIndex.appendBatch(index,
      docs(0L -> "alpha beta gamma delta", 4L -> "omega psi chi phi"), 0)
    assert(r0.kept.as[Long].collect().toSeq === Seq(0L, 4L))
    KeepBestIndex.deleteBatch(index, Seq(0L).toDF("doc_id"), batchId = 1)
    assert(index.scan().where(col("doc_id") === 0L && col("band") >= 0)
      .count() === 0L, "band rows of the deleted doc must leave")
    // the same content arrives: no removed rival to lose to or evict
    val r2 = KeepBestIndex.appendBatch(index,
      docs(2L -> "alpha beta gamma delta"), 2)
    assert(r2.kept.as[Long].collect().toSeq === Seq(2L),
      "a new arrival must be judged against survivors only")
    assert(r2.evicted.as[Long].collect().toSeq === Seq.empty,
      "nothing live shares its buckets — no eviction")
  }

  test("ImageDedupIndex/VideoDedupIndex deleteBatch: removal admits the re-encode; video keys recompute from the pruned index read; replays no-op") {
    // image: two identical 1-px-gradient images under different ids
    def img(bits: Seq[Int], base: Int): Array[Byte] = {
      val bi = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (r <- 0 until 8) {
        var v = base
        bi.setRGB(0, r, (v << 16) | (v << 8) | v)
        for (c <- 0 until 7) {
          v += (if (((bits(r) >> c) & 1) == 1) 10 else -10)
          bi.setRGB(c + 1, r, (v << 16) | (v << 8) | v)
        }
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, "png", bos)
      bos.toByteArray
    }
    val bits = Seq(0x55, 0x2A, 0x55, 0x2A, 0x55, 0x2A, 0x55, 0x2A)
    val iroot = tmpDir("idx-del-img") + "/idx"
    val iidx = ImageDedupIndex.create(spark, iroot)
    ImageDedupIndex.appendBatch(iidx, Seq(1L -> img(bits, 100)).toDF("media_id", "content"), 0)
    assert(ImageDedupIndex.appendBatch(iidx,
      Seq(2L -> img(bits, 140)).toDF("media_id", "content"), 1)
      .as[Long].collect().isEmpty, "brightness re-encode must drop while 1 is live")
    ImageDedupIndex.deleteBatch(iidx, Seq(1L).toDF("media_id"), batchId = 2)
    assert(ImageDedupIndex.appendBatch(iidx,
      Seq(2L -> img(bits, 140)).toDF("media_id", "content"), 3)
      .as[Long].collect().toSeq === Seq(2L), "the re-encode must be admitted post-delete")

    // video: same shape through the position-keyed index (delete keys come
    // from the column-pruned index read, not the sig rule)
    def gif(frames: Seq[Seq[Int]], base: Int): Array[Byte] =
      graft.ops.ImageCodec.writeGifAnimationImages(frames.map { b =>
        val bi = new java.awt.image.BufferedImage(
          8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (r <- 0 until 8) {
          var v = base
          bi.setRGB(0, r, (v << 16) | (v << 8) | v)
          for (c <- 0 until 7) {
            v += (if (((b(r) >> c) & 1) == 1) 10 else -10)
            bi.setRGB(c + 1, r, (v << 16) | (v << 8) | v)
          }
        }
        bi
      })
    val bitsQ = Seq.fill(8)(0x33)
    val vroot = tmpDir("idx-del-vid") + "/idx"
    val vidx = VideoDedupIndex.create(spark, vroot)
    VideoDedupIndex.appendBatch(vidx,
      Seq(1L -> gif(Seq(bits, bitsQ), 100)).toDF("media_id", "content"), 0)
    assert(VideoDedupIndex.appendBatch(vidx,
      Seq(2L -> gif(Seq(bits, bitsQ), 140)).toDF("media_id", "content"), 1)
      .as[Long].collect().isEmpty, "full copy must drop while 1 is live")
    VideoDedupIndex.deleteBatch(vidx, Seq(1L).toDF("media_id"), batchId = 2)
    assert(vidx.scan().where(col("media_id") === 1L).count() === 0L)
    // replayed delete epoch: keys recompute EMPTY and the fence no-ops
    VideoDedupIndex.deleteBatch(vidx, Seq(1L).toDF("media_id"), batchId = 2)
    assert(VideoDedupIndex.appendBatch(vidx,
      Seq(2L -> gif(Seq(bits, bitsQ), 140)).toDF("media_id", "content"), 3)
      .as[Long].collect().toSeq === Seq(2L), "the copy must be admitted post-delete")
  }

  test("CorpusPipeline.takedown: doc + bands + vector leave in one fenced epoch; re-run heals; ghost-free probes") {
    val dim = 8
    val root = tmpDir("takedown")
    val corpus = TransactionalTable.create(spark, s"$root/corpus",
      org.apache.spark.sql.types.StructType.fromDDL("doc_id BIGINT, text STRING"),
      "doc_id", None)
    val index = DedupIndex.create(spark, s"$root/idx")
    def vec(i: Long) = {
      val a = Array.fill(dim)(0.05); a((i % 4).toInt) = 1.0
      a.map(_.toFloat).toSeq
    }
    val embs = (0L until 16L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val ann = AnnIndex.create(spark, s"$root/ann", embs, cells = 4)
    AnnIndex.appendBatch(ann, embs, batchId = 0)
    val batch = docs((0L until 16L).map(i =>
      i -> s"u${i}a v${i}b w${i}c x${i}d y${i}e z${i}f"): _*)
    val kept = graft.stream.CorpusPipeline.processBatch(index, corpus, batch,
      batchId = 0, clean = lit(true))
    assert(kept.count() === 16L)
    // takedown docs 3 and 7: corpus row, band rows, and vector all leave
    val dead = Seq(3L, 7L).toDF("doc_id")
    graft.stream.CorpusPipeline.takedown(index, corpus, dead, batchId = 1,
      vectorIndex = Some(ann))
    assert(corpus.scan().where(col("doc_id").isin(3L, 7L)).count() === 0L)
    assert(index.scan().where(col("doc_id").isin(3L, 7L)).count() === 0L)
    val probes = AnnIndex.probe(ann, embs.filter(col("vec_id") < 4), k = 15,
      nprobe = 4).select("neighbor_id").as[Long].collect().toSet
    assert(!probes.contains(3L) && !probes.contains(7L),
      s"deleted vectors must not surface as ghosts: $probes")
    // crash-heal contract: re-running the SAME takedown epoch no-ops on
    // every leg (each leg is fenced in its own writer domain)
    val versions = (corpus.currentVersion, index.currentVersion,
      ann.assignments.currentVersion)
    graft.stream.CorpusPipeline.takedown(index, corpus, dead, batchId = 1,
      vectorIndex = Some(ann))
    assert((corpus.currentVersion, index.currentVersion,
      ann.assignments.currentVersion) === versions,
      "a replayed takedown epoch must no-op end to end")
    // the ingest stream's OWN fence domain is untouched: the next corpus
    // epoch applies normally
    val kept2 = graft.stream.CorpusPipeline.processBatch(index, corpus,
      docs(20L -> "completely new content here"), batchId = 1, clean = lit(true))
    assert(kept2.as[Long].collect().toSeq === Seq(20L),
      "takedown fences must not collide with ingest epoch 1")
    assert(corpus.scan().where(col("doc_id") === 20L).count() === 1L)
  }
}
