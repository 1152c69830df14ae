package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.TextOps
import graft.queries.Tables

/**
 * Micro-benchmark documenting the SimHash sketch vectorization (PERF.md):
 * the old 64-iteration interpreted HOF fold (kept here verbatim as the
 * baseline) vs the shipped explode + bitwise-sum aggregation
 * (DedupOps.simhashPairs). Run:
 *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.SimhashProbe"
 * Asserts the sketches are bit-identical before timing.
 */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // REPLICATE=k multiplies the corpus (distinct doc_ids) to probe the
    // crossover between per-doc interpreted cost and aggregation overhead.
    val rep = sys.env.getOrElse("REPLICATE", "1").toInt
    val base = Tables.load(spark, sfDir, "documents")
    val docs =
      if (rep == 1) base
      else base.crossJoin(spark.range(rep).select(col("id").as("_r")))
        .select((col("doc_id") * rep + col("_r")).as("doc_id"), col("text"))

    // OLD: per-doc 64-pass interpreted HOF fold (round-3 implementation).
    def hofSketch() = docs.select(col("doc_id"),
        transform(TextOps.tokens(col("text")), t => xxhash64(t)).as("hs"))
      .filter(size(col("hs")) > 0)
      .withColumn("simhash", expr(
        """aggregate(sequence(0, 63), 0L, (acc, i) ->
          |  acc + if(size(filter(hs, h -> ((h >> i) & 1) = 1)) * 2 >= size(hs),
          |           shiftleft(1L, i), 0L))""".stripMargin))
      .select("doc_id", "simhash")

    // NEW: explode + one codegen'd hash aggregation (mirrors DedupOps).
    def aggSketch() = {
      val exploded = docs.select(col("doc_id"),
        explode(transform(TextOps.tokens(col("text")), t => xxhash64(t))).as("h"))
      val bitSums = (0 until 64).map(i =>
        sum(shiftright(col("h"), i).bitwiseAND(1)).as(s"_b$i"))
      val counted = exploded.groupBy("doc_id").agg(count(lit(1)).as("_n"), bitSums: _*)
      val sketch = (0 until 64).map { i =>
        when(col(s"_b$i") * 2 >= col("_n"), lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
      counted.select(col("doc_id"), sketch.as("simhash"))
    }

    val mismatch = hofSketch().as("a").join(aggSketch().as("b"), "doc_id")
      .filter(col("a.simhash") =!= col("b.simhash")).count()
    require(mismatch == 0, s"sketches differ on $mismatch docs")

    def time(label: String, f: () => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        // aggregate OVER the sketch so Catalyst cannot prune it away
        // (a bare count() would skip computing the column entirely)
        f().agg(bit_xor(col("simhash"))).head()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label min=${times.min}%.3f s runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    time("hof_sketch", hofSketch _)   // warmup interleaved by min-of-3
    time("agg_sketch", aggSketch _)
    spark.stop()
  }
}
