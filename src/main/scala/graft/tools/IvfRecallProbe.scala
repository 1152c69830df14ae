package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.SimilarityOps
import graft.queries.Tables

/**
 * Measures actual recall@k of the Lloyd-refined IVF path against exact
 * cosine top-k at each fixture scale — the measurement behind the
 * `x3_ivf_recall` threshold (the driver query asserts recall ≥ the chosen
 * bound; this probe shows the margin). Run:
 *   sbt "runMain graft.tools.IvfRecallProbe"
 */
object IvfRecallProbe {
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
      for (iters <- Seq(0, 3); nprobe <- Seq(4, 6, 8, 10)) {
        val approx = SimilarityOps
          .ivfTopK(e, q, k = 5, dim = 64, nprobe = nprobe, iters = iters)
          .select(col("qid"), col("neighbor_id"))
        val exact = SimilarityOps.cosineTopK(e, q, k = 5)
          .select(col("qid"), col("neighbor_id"))
        val nExact = exact.count()
        val nHit = approx.join(exact, Seq("qid", "neighbor_id"), "leftsemi").count()
        println(f"[ivf-recall] $sf iters=$iters nprobe=$nprobe recall@5 = ${nHit.toDouble / nExact}%.3f ($nHit/$nExact)")
      }
    }
    spark.stop()
  }
}
