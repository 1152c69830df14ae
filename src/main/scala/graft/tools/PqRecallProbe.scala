package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{AnnIndex, PqOps, SimilarityOps}
import graft.queries.Tables

/**
 * Measures actual recall@k of the IVF-PQ refined-probe path (seed vs
 * Lloyd-refined codebooks) against exact cosine top-k at each fixture
 * scale — the measurement behind the `x3_pq_recall` threshold (the driver
 * query asserts recall ≥ the chosen bound; this probe shows the margin and
 * the refinement lift). Run:
 *   sbt "runMain graft.tools.PqRecallProbe"
 */
object PqRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val e = Tables.load(spark, d, "embeddings")
      val q = e.filter(col("vec_id") < 8)
      val root = java.nio.file.Files.createTempDirectory(s"pq_recall_$sf").toString
      val h = AnnIndex.create(spark, s"$root/idx", e.filter(col("vec_id") % 3 === 0),
        cells = 16)
      (0 until 3).foreach(b => AnnIndex.appendBatch(h,
        e.filter(col("vec_id") % 3 === b), batchId = b, compactEvery = 2))
      val hh = AnnIndex.open(spark, s"$root/idx")
      val unitVecs = hh.assignments.scan()
        .select(col("vec_id"), col("v").as("embedding"))
      val exact = SimilarityOps.cosineTopK(e, q, k = 5)
        .select(col("qid"), col("neighbor_id")).cache()
      val nExact = exact.count()
      // quality-knob sweep (r17): subspace centroids k, Lloyd depth, and
      // exact-re-rank shortlist — the three levers behind the certificate
      for ((label, kSub, iters, kShort) <- Seq(
          ("k16-i2-ks100", 16, 2, 100))) { // the shipped x3_pq_recall config
        val seedBooks = PqOps.codebooks(unitVecs, m = 8, k = kSub)
        val books = if (iters > 0)
          PqOps.refineCodebooks(unitVecs, seedBooks, iters = iters)
        else seedBooks
        val codes = PqOps.buildPqCodes(hh, s"$root/codes_$label", books,
          refineIters = iters)
        for (nprobe <- Seq(6, 8, 10, 12, 16)) {
          val approx = AnnIndex.probePqRefined(hh, codes, books, q,
            k = 5, kShort = kShort, nprobe = nprobe)
            .select(col("qid"), col("neighbor_id"))
          val nHit = approx.join(exact, Seq("qid", "neighbor_id"), "leftsemi").count()
          println(f"[pq-recall] $sf cfg=$label nprobe=$nprobe recall@5 = ${nHit.toDouble / nExact}%.3f ($nHit/$nExact)")
        }
      }
      exact.unpersist()
    }
    spark.stop()
  }
}
