package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TextOps
import graft.queries.Tables

/** Dev probe: A/B the x4_tfidf plan — groupBy(term) df + join (current) vs a
  * count window over term (one pass, no join).
  *
  * MEASURED (sf0.1, warm): join 1.06 s, windowed 0.75 s, bit-identical
  * results — and the windowed variant is deliberately NOT adopted: a count
  * window partitioned by term funnels every row of a hot term (a stopword
  * appears in ~every document) through ONE window partition, the classic
  * skew cliff at corpus scale, while the groupBy df aggregates map-side and
  * its term exchange is reused by the join probe. The 30% local win is the
  * scheduling floor of one fewer stage, not a plan property that survives
  * 100×. Run:
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.TfidfProbe" */
object TfidfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
    val docs = Tables.load(spark, sfDir, "documents")

    def current() = {
      val toks = docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(df, "term").crossJoin(broadcast(n))
        .withColumn("tfidf",
          col("tf").cast("double") * log(col("n_docs").cast("double") / col("df").cast("double")))
      val w = Window.partitionBy(col("doc_id")).orderBy(desc("tfidf"), col("term"))
      scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"))
    }

    def windowed() = {
      val toks = docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val withDf = tf.withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      val scored = withDf.crossJoin(broadcast(n))
        .withColumn("tfidf",
          col("tf").cast("double") * log(col("n_docs").cast("double") / col("df").cast("double")))
      val w = Window.partitionBy(col("doc_id")).orderBy(desc("tfidf"), col("term"))
      scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"))
    }

    def time(label: String)(body: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = body
        println(f"[probe] $label run$i: ${(System.nanoTime() - t0) / 1e9}%7.3f s  ($n rows)")
      }
    }
    time("current (join)")(current().count())
    time("windowed df   ")(windowed().count())
    // equality check
    val a = current().collect().map(_.toString).sorted
    val b = windowed().collect().map(_.toString).sorted
    println(s"[probe] results equal: ${a.sameElements(b)}")
    spark.stop()
  }
}
