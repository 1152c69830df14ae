package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, TextOps}
import graft.queries.Tables

/** Dev probe: A/B the x2_dup_spans window-fingerprint kernel —
  * md5-60 of the joined window STRING (current: one digest of ~40 chars +
  * the string build per window) vs md5-60 per TOKEN once + a rotate-xor
  * combine of the 6 token hashes per window (O(tokens) digests, long
  * arithmetic per window; rotation by 5·k bits makes the combine
  * position-sensitive, and 60-bit inputs keep window-pair collisions at
  * ~2⁻²¹ for a 10⁷-window corpus).
  *
  * Both kernels produce the same SPANS whenever neither collides (the
  * oracle groups by raw window text, so equivalence classes — not hash
  * values — are the contract). Run:
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.SpanProbe"
  */
object SpanProbe {
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
    val W = 6

    def current() = DedupOps.duplicateSpans(docs, window = W) // token md5 + rotxor

    // the REJECTED string kernel, kept inline for re-measurement: one md5
    // over the joined ~40-char window text per window
    def stringKernel() = {
      val nWins = size(col("toks")) - (W - 1)
      val idxs = when(nWins > 0, sequence(lit(0), nWins - 1))
        .otherwise(array().cast("array<int>"))
      val wins = docs
        .select(col("doc_id").cast("long").as("doc_id"),
          TextOps.tokens(col("text")).as("toks"))
        .select(col("doc_id"), explode(transform(idxs, i => struct(
          i.as("start"),
          TextOps.md5Hash60(concat_ws(" ", slice(col("toks"), i + 1, lit(W))))
            .as("wkey")))).as("w"))
        .select(col("doc_id"), col("w.start").cast("long").as("start"), col("w.wkey").as("wkey"))
      val dupKeys = wins.groupBy("wkey")
        .agg(countDistinct(col("doc_id")).as("nd")).where(col("nd") > 1)
      val marked = wins.join(dupKeys.select("wkey"), Seq("wkey"), "left_semi")
        .select(col("doc_id"), col("start"), (col("start") + lit(W - 1)).as("end"))
      val byDoc = Window.partitionBy("doc_id").orderBy("start")
      val prevMaxEnd = max(col("end"))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
      marked
        .withColumn("new_span",
          when(prevMaxEnd.isNull || col("start") > prevMaxEnd + 1, 1L).otherwise(0L))
        .withColumn("span_id",
          sum(col("new_span")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("doc_id"), col("span_id"))
        .agg(min(col("start")).as("span_start"), max(col("end")).as("span_end"),
          count(lit(1)).as("n_windows"))
        .select(col("doc_id"), col("span_start"), col("span_end"), col("n_windows"))
        .orderBy("doc_id", "span_start")
    }

    def time(label: String)(body: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = body
        println(f"[probe] $label run$i: ${(System.nanoTime() - t0) / 1e9}%7.3f s  ($n rows)")
      }
    time("string-window md5")(stringKernel().count())
    time("token md5 + rotxor")(current().count())
    val a = stringKernel().collect().map(_.toString).sorted
    val b = current().collect().map(_.toString).sorted
    println(s"[probe] spans equal: ${a.sameElements(b)}")
    spark.stop()
  }
}
