package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TextOps
import graft.queries.Tables

/** Dev probe: A/B the x4_tfidf plans —
  *  (a) explode → groupBy(doc,term) tf → groupBy(term) df → join  (r11)
  *  (b) count window over term (one pass, no join)                (rejected)
  *  (c) TermCounts kernel in-row tf → groupBy(term) df → BROADCAST join (r12)
  *
  * MEASURED r11 (sf0.1, warm): join 1.06 s, windowed 0.75 s, bit-identical
  * results — and the windowed variant is deliberately NOT adopted: a count
  * window partitioned by term funnels every row of a hot term (a stopword
  * appears in ~every document) through ONE window partition, the classic
  * skew cliff at corpus scale, while the groupBy df aggregates map-side and
  * its term exchange is reused by the join probe. The 30% local win is the
  * scheduling floor of one fewer stage, not a plan property that survives
  * 100×.
  *
  * The r12 kernel variant removes the (doc_id, term) token shuffle entirely
  * (a doc's tokens live in one row — counting them is per-row work), leaving
  * ONE wide exchange (df on term) + the doc_id window exchange, and pins the
  * term-dictionary join as broadcast (vocabulary ≪ corpus at every scale; a
  * broadcast join has no skew cliff, hot terms stay spread across tasks).
  * Run:
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

    def kernel() = {
      val tf = docs
        .select(col("doc_id"), explode(TextOps.termCounts(col("text"))).as("tc"))
        .select(col("doc_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(broadcast(df), "term").crossJoin(broadcast(n))
        .withColumn("tfidf",
          col("tf").cast("double") * log(col("n_docs").cast("double") / col("df").cast("double")))
      val w = Window.partitionBy(col("doc_id")).orderBy(desc("tfidf"), col("term"))
      scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"))
    }

    def kernelAgg() = {
      val tf = docs
        .select(col("doc_id"), explode(TextOps.termCounts(col("text"))).as("tc"))
        .select(col("doc_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(broadcast(df), "term").crossJoin(broadcast(n))
        .withColumn("tfidf",
          col("tf").cast("double") * log(col("n_docs").cast("double") / col("df").cast("double")))
      // top-3 per doc WITHOUT a window: struct sorts field-by-field, so
      // (-tfidf, term) ascending == (tfidf desc, term asc); collect_list
      // partial-aggregates map-side (each doc's pairs are co-located — the
      // broadcast join kept the lineage narrow), the exchange carries one
      // row per doc
      val top = scored.groupBy("doc_id").agg(
        slice(array_sort(collect_list(struct((-col("tfidf")).as("k"),
          col("term"), col("tf"), col("df")))), 1, 3).as("top"))
      top.select(col("doc_id"), posexplode(col("top")).as(Seq("pos", "t")))
        .select(col("doc_id"), (col("pos") + 1).cast("int").as("rnk"),
          col("t.term").as("term"), col("t.tf").as("tf"), col("t.df").as("df"))
    }

    def time(label: String)(body: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = body
        println(f"[probe] $label run$i: ${(System.nanoTime() - t0) / 1e9}%7.3f s  ($n rows)")
      }
    }
    time("floor: scan   ")(docs.count())
    time("floor: tf only")(docs.select(col("doc_id"),
      explode(TextOps.termCounts(col("text"))).as("tc")).count())
    time("r11 (join)    ")(current().count())
    time("kernel+sorted ")(kernel().orderBy("doc_id", "rnk").count())
    time("windowed df   ")(windowed().count())
    time("kernel+bcast  ")(kernel().count())
    time("kernel+agg    ")(kernelAgg().count())
    // equality check
    val a = current().collect().map(_.toString).sorted
    val b = windowed().collect().map(_.toString).sorted
    val c = kernel().collect().map(_.toString).sorted
    val e = kernelAgg().collect().map(_.toString).sorted
    println(s"[probe] windowed equal: ${a.sameElements(b)}; kernel equal: ${a.sameElements(c)}; kernelAgg equal: ${a.sameElements(e)}")
    spark.stop()
  }
}
