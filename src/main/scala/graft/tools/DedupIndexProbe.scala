package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{DedupIndex, DedupOps}
import graft.queries.Tables

/** Dev probe: stage timings of the x2_dedup_index pipeline at sf0.1. */
object DedupIndexProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val docs = Tables.load(spark, sfDir, "documents")
    println(s"[probe] docs: ${docs.count()}")
    time("warm full sketch")(
      DedupOps.simhashSketch(docs).count())
    time("sketch (count)")(
      DedupOps.simhashSketch(docs).count())
    time("bands (count)")(
      DedupOps.simhashBands(DedupOps.simhashSketch(docs)).count())
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    val root = java.nio.file.Files.createTempDirectory("graft_dip").toString + "/idx"
    val index = time("create index")(DedupIndex.create(spark, root))
    time("appendBatch even")(DedupIndex.appendBatch(index, even, 0).count())
    time("appendBatch odd")(DedupIndex.appendBatch(index, odd, 1).count())
    // second run, warm
    val root2 = java.nio.file.Files.createTempDirectory("graft_dip2").toString + "/idx"
    val index2 = DedupIndex.create(spark, root2)
    time("appendBatch even (warm)")(DedupIndex.appendBatch(index2, even, 0).count())
    time("appendBatch odd (warm)")(DedupIndex.appendBatch(index2, odd, 1).count())
    spark.stop()
  }
}
