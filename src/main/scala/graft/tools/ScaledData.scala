package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Second bench scale point: materialize an N×-sharded copy of the fixture
 * tables (N=10 ≈ sf1 from sf0.1) so the per-round benchmark measures PLAN
 * scaling, not the local-mode scheduling floor.
 *
 * Each copy is a SELF-CONSISTENT shard: every key column is shifted by
 * `copy * Stride`, so fact↔fact joins (lineitem↔orders, orders↔customer,
 * events↔orders) keep their original 1:N densities — duplicating rows
 * without remapping would square the join fan-out per key, a duplication
 * artifact rather than a property of any plan. Dimension tables
 * (region/nation/part/supplier) are carried as-is: dims grow far slower
 * than facts at real scale, and keeping them small preserves the
 * broadcast-join story the plans rely on.
 *
 * Document text is alphabet-rotated per copy (every token distinct across
 * copies), so the scaled corpus is N× DISTINCT documents. Plain duplication
 * would multiply every shingle's document frequency by N and the per-shingle
 * pair expansion by N² — the near-dup queries would then measure the
 * duplication artifact, not their own scaling.
 */
object ScaledData {

  /** Key shift per copy — far above any fixture key (max ~6e6 at sf1). */
  val Stride: Long = 1L << 40

  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  private val asIs: Seq[String] = Seq("region", "nation", "part", "supplier")

  private val Alphabet = "abcdefghijklmnopqrstuvwxyz"

  /** Build the scaled dataset under a temp dir; returns its path. Layout
    * mirrors the fixture dirs (`<out>/<table>.parquet`), so every registered
    * query runs against it unchanged. */
  def materialize(spark: SparkSession, srcDir: String, copies: Int): String = {
    val out = Files.createTempDirectory("graft_scaled").toString
    asIs.foreach { t =>
      spark.read.parquet(s"$srcDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    keyCols.foreach { case (t, keys) =>
      val base = spark.read.parquet(s"$srcDir/$t.parquet")
      val shards = (0 until copies).map { i =>
        val shifted = keys.foldLeft(base) { (df, k) =>
          df.withColumn(k, col(k) + lit(i * Stride))
        }
        if (t == "documents" && i > 0) {
          val rot = Alphabet.drop(i % 25 + 1) + Alphabet.take(i % 25 + 1)
          shifted.withColumn("text", translate(col("text"), Alphabet, rot))
        } else shifted
      }
      shards.reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    out
  }

  def delete(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir)
    if (Files.exists(root)) graft.util.Fs.deleteRecursively(root)
  }
}
