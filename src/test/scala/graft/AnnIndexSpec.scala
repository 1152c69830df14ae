package graft

import org.apache.spark.sql.functions._

import graft.ops.{AnnIndex, SimilarityOps}
import graft.table.TransactionalTable

/** Persistent ANN index lifecycle ([[graft.ops.AnnIndex]] — the similarity
  * twin of DedupIndex): frozen md5-seeded centroids, incremental
  * replay-fenced assignment batches, partition-pruned probes, compaction
  * cadence bounding index files, recall surviving incremental growth. */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  /** Deterministic little corpus: unit-ish vectors in `dim` dims whose
    * direction clusters by id % 4 with a small id-dependent wobble. */
  private def corpus(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map { i =>
      val base = Array.fill(dim)(0.05)
      base(i % 4) = 1.0
      base((i / 4) % dim) += 0.02 * (i % 7)
      (i.toLong, base.map(_.toFloat).toSeq)
    }.toDF("vec_id", "embedding")

  test("index probe equals the one-shot IVF pipeline on the same quantizer") {
    val root = tmpDir("ann-index-eq")
    val all = corpus(0 until 120)
    val h = AnnIndex.create(spark, root, all, cells = 4)
    AnnIndex.appendBatch(h, all, batchId = 0)
    val queries = all.filter(col("vec_id") < 5)
    val viaIndex = AnnIndex.probe(h, queries, k = 3, nprobe = 2)
      .orderBy("qid", "rnk").collect().toSeq
    val oneShot = SimilarityOps.ivfTopK(all, queries, k = 3, dim = dim,
      cells = 4, nprobe = 2, iters = 0).orderBy("qid", "rnk").collect().toSeq
    assert(viaIndex === oneShot,
      "persisted-index probe must reproduce the one-shot iters=0 IVF result")
  }

  test("incremental batches: exactly-once under replay; re-ingest moves a vector") {
    val root = tmpDir("ann-index-inc")
    val all = corpus(0 until 90)
    val h = AnnIndex.create(spark, root, all.filter(col("vec_id") % 3 === 0), cells = 4)
    (0 until 3).foreach { b =>
      AnnIndex.appendBatch(h, all.filter(col("vec_id") % 3 === b), batchId = b)
    }
    assert(h.assignments.countRows === 90L)
    val before = h.assignments.scan().select("vec_id", "cell")
      .as[(Long, Long)].collect().toMap
    // replayed batch: fenced to a no-op
    AnnIndex.appendBatch(h, all.filter(col("vec_id") % 3 === 1), batchId = 1)
    assert(h.assignments.countRows === 90L)
    assert(h.assignments.scan().select("vec_id", "cell")
      .as[(Long, Long)].collect().toMap === before)
    // incremental result == indexing everything in one batch
    val root2 = tmpDir("ann-index-one")
    val h2 = AnnIndex.create(spark, root2, all.filter(col("vec_id") % 3 === 0), cells = 4)
    AnnIndex.appendBatch(h2, all, batchId = 0)
    assert(h2.assignments.scan().select("vec_id", "cell")
      .as[(Long, Long)].collect().toMap === before)
  }

  test("probe plans only the probed cells' files (destroyed-file proof)") {
    val root = tmpDir("ann-index-prune")
    val all = corpus(0 until 120)
    val h = AnnIndex.create(spark, root, all, cells = 4)
    AnnIndex.appendBatch(h, all, batchId = 0)
    val queries = all.filter(col("vec_id") === 0)
    val expected = AnnIndex.probe(h, queries, k = 3, nprobe = 1)
      .orderBy("rnk").collect().toSeq
    // the probed cell for query 0 under nprobe=1
    val probedCell = h.assignments.scan()
      .filter(col("vec_id").isin(expected.map(_.getLong(1)): _*))
      .select("cell").distinct().as[Long].collect().toSet
    // destroy every file of every OTHER cell: a plan that touches them fails
    h.assignments.snapshot.files
      .filterNot(f => f.partition.exists(p => probedCell.contains(p.toLong)))
      .foreach(f => java.nio.file.Files.delete(java.nio.file.Paths.get(f.path)))
    assert(AnnIndex.probe(h, queries, k = 3, nprobe = 1)
      .orderBy("rnk").collect().toSeq === expected,
      "partition-pruned probe must not plan unprobed cells' files")
  }

  test("compaction cadence bounds index files; probe unchanged after compaction") {
    val root = tmpDir("ann-index-compact")
    val all = corpus(0 until 200)
    val h = AnnIndex.create(spark, root, all.filter(col("vec_id") < 20), cells = 4)
    (0 until 10).foreach { b =>
      AnnIndex.appendBatch(h, all.filter(col("vec_id") % 10 === b), batchId = b,
        compactEvery = 4)
    }
    val files = h.assignments.snapshot.files.size
    // without compaction: >= 10 batches x >= 1 file each (cells per batch);
    // the cadence keeps it near one file per cell
    assert(files <= 12, s"compaction cadence failed to bound files: $files")
    val queries = all.filter(col("vec_id") < 5)
    val probed = AnnIndex.probe(h, queries, k = 3, nprobe = 2)
      .orderBy("qid", "rnk").collect().toSeq
    h.assignments.compact(minFileRows = 1L << 20)
    assert(AnnIndex.probe(h, queries, k = 3, nprobe = 2)
      .orderBy("qid", "rnk").collect().toSeq === probed)
  }

  test("recall certificate holds after incremental growth") {
    val root = tmpDir("ann-index-recall")
    val all = corpus(0 until 160)
    val h = AnnIndex.create(spark, root, all.filter(col("vec_id") < 40), cells = 4)
    (0 until 4).foreach { b =>
      AnnIndex.appendBatch(h, all.filter(col("vec_id") % 4 === b), batchId = b)
    }
    val queries = all.filter(col("vec_id") < 8)
    val approx = AnnIndex.probe(h, queries, k = 5, nprobe = 2)
      .select("qid", "neighbor_id")
    val exact = SimilarityOps.cosineTopK(all, queries, k = 5)
      .select("qid", "neighbor_id")
    val hit = approx.join(exact, Seq("qid", "neighbor_id"), "leftsemi").count()
    val total = exact.count()
    assert(hit >= (total * 0.5).toLong,
      s"recall after incremental growth too low: $hit / $total")
  }
}
