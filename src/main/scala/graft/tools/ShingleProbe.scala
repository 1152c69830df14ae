package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Micro-probe: native Shingles kernel vs the declarative HOF chain on a
  * synthetic 100k-doc corpus (~60 tokens/doc). Forces evaluation through a
  * bit_xor aggregate over the hashed shingle arrays (count() would skip the
  * projection). Run: sbt "runMain graft.tools.ShingleProbe" */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = spark.range(100000).select(col("id"),
      concat_ws(" ", (0 until 60).map(i =>
        concat(lit(s"w$i"), pmod(col("id") * (i + 7), lit(977)))): _*).as("text"))
      .persist()
    docs.count()

    def time(label: String, c: org.apache.spark.sql.Column): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        docs.select(xxhash64(c.cast("string")).as("h"))
          .agg(expr("bit_xor(h)")).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val best = runs.min
      println(f"[probe] $label%-10s min-of-3 = $best%.3f s")
      best
    }

    val hof = time("hof", TextOps.shinglesHof(col("text")))
    val native = time("native", TextOps.shingles(col("text")))
    println(f"[probe] speedup = ${hof / native}%.2fx")
    spark.stop()
  }
}
