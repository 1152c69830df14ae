package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{AnnIndex, PqOps, SimilarityOps}
import graft.queries.Tables

/**
 * Measures recall@k of the IVF and IVF-PQ paths over the CLUSTERED-REGIME
 * fixture ([[SimilarityOps.clusteredEmbeddings]] — r17 review #3: the
 * uniform synthetic `embeddings` table certifies exactly the regime IVF is
 * not designed for; this probe measures the regime it IS designed for, at
 * the production nprobe) — the measurement behind the
 * `x3_ivf_recall_clustered` / `x3_pq_recall_clustered` thresholds. Run:
 *   sbt "runMain graft.tools.ClusteredRecallProbe"
 */
object ClusteredRecallProbe {
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
      val e = SimilarityOps.clusteredEmbeddings(
        Tables.load(spark, d, "embeddings").select("vec_id"))
      val q = e.filter(col("vec_id") < 8)
      val exact = SimilarityOps.cosineTopK(e, q, k = 5)
        .select(col("qid"), col("neighbor_id")).cache()
      val nExact = exact.count()
      for (nprobe <- Seq(1, 2, 4)) {
        val approx = SimilarityOps
          .ivfTopK(e, q, k = 5, dim = 64, nprobe = nprobe, iters = 3)
          .select(col("qid"), col("neighbor_id"))
        val nHit = approx.join(exact, Seq("qid", "neighbor_id"), "leftsemi").count()
        println(f"[clustered-recall] $sf ivf iters=3 nprobe=$nprobe recall@5 = ${nHit.toDouble / nExact}%.3f ($nHit/$nExact)")
      }
      // the persistent-index IVF-PQ path (the x3_pq_recall build, clustered)
      val root = java.nio.file.Files.createTempDirectory("graft_clrec").toString
      val h = AnnIndex.create(spark, s"$root/idx",
        e.filter(col("vec_id") % 3 === 0), cells = 16)
      (0 until 3).foreach(b => AnnIndex.appendBatch(h,
        e.filter(col("vec_id") % 3 === b), batchId = b, compactEvery = 2))
      val unitVecs = h.assignments.scan()
        .select(col("vec_id"), col("v").as("embedding"))
      val books = PqOps.refineCodebooks(unitVecs,
        PqOps.codebooks(unitVecs, m = 8, k = 16), iters = 2)
      val codes = PqOps.buildPqCodes(h, s"$root/codes", books, refineIters = 2)
      for (nprobe <- Seq(1, 2, 4); kShort <- Seq(100, 200)) {
        val approx = AnnIndex.probePqRefined(h, codes, books, q, k = 5,
          kShort = kShort, nprobe = nprobe).select(col("qid"), col("neighbor_id"))
        val nHit = approx.join(exact, Seq("qid", "neighbor_id"), "leftsemi").count()
        println(f"[clustered-recall] $sf pq m=8 k=16 nprobe=$nprobe kShort=$kShort recall@5 = ${nHit.toDouble / nExact}%.3f ($nHit/$nExact)")
      }
      exact.unpersist()
    }
    spark.stop()
  }
}
