package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Mergeable frequency SKETCHES — the fixed-size summaries a 100 TB corpus
 * pipeline keeps when the exact term dictionary no longer fits anywhere
 * (the HLL NDV sketches behind `CALL system.analyze` are the cardinality
 * twin; this is the frequency side).
 *
 * COUNT-MIN SKETCH (Cormode & Muthukrishnan 2005), expressed relationally:
 * `depth` independent md5-derived hash rows × `width` buckets. The sketch
 * IS a (row, bucket, cnt) DataFrame of at most depth·width rows — bounded
 * regardless of corpus size — built by ONE map-side-combinable groupBy
 * (the token stream fans out ×depth map-only, then combines into ≤
 * depth·width aggregate rows per partition before the exchange: the
 * shuffle carries sketch fragments, not tokens). Estimates are
 * min-over-rows — the classic one-sided guarantee: est ≥ true count, with
 * overestimate probability shrinking geometrically in depth.
 *
 * Hashing is the engine's public md5-60 arithmetic (`TextOps.md5Hash60` on
 * `"<row>:<term>"`), so an external engine replays bucket assignment —
 * and therefore the whole sketch and every estimate — bit-for-bit. Two
 * sketches with the same (depth, width) MERGE by adding counts bucketwise
 * ([[cmsMerge]]) — the property that lets per-shard sketches roll up to a
 * corpus sketch without touching data again.
 */
object SketchOps {

  private def bucketOf(row: Column, term: Column, width: Int): Column =
    pmod(TextOps.md5Hash60(concat(row.cast("string"), lit(":"), term)), lit(width.toLong))

  /**
   * Build the sketch over a whitespace-token stream: one row per OCCUPIED
   * (row, bucket) cell, `cnt` = total token OCCURRENCES hashing there.
   * Absent cells are zero by convention ([[cmsEstimate]] fills them).
   */
  def cmsSketch(df: DataFrame, textCol: String = "text",
      depth: Int = 4, width: Int = 64): DataFrame = {
    require(depth > 0 && width > 0, s"depth/width must be positive: $depth, $width")
    df.select(explode(TextOps.tokens(col(textCol))).as("term"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("row"), col("term"))
      .select(col("row").cast("long").as("row"),
        bucketOf(col("row"), col("term"), width).as("bucket"))
      .groupBy("row", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /**
   * Point estimates for `queries` (a one-column DataFrame of terms):
   * est(term) = min over hash rows of the cell count, 0 when every cell is
   * empty. The broadcast side is the SKETCH (≤ depth·width rows, by
   * construction), so estimation over any number of query terms is one
   * broadcast join + a per-term min — map-only at scale.
   */
  def cmsEstimate(sketch: DataFrame, queries: DataFrame,
      termCol: String = "term", depth: Int = 4, width: Int = 64): DataFrame = {
    require(depth > 0 && width > 0, s"depth/width must be positive: $depth, $width")
    queries.select(col(termCol).as("term")).distinct()
      .select(col("term"), explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .select(col("term"), col("row").cast("long").as("row"),
        bucketOf(col("row"), col("term"), width).as("bucket"))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy("term")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Bucketwise sum of same-shape sketches — per-shard sketches roll up to
    * the corpus sketch with no second pass over the data. Union is BY NAME
    * (a sketch re-read from storage may present columns in another order;
    * positional union would silently sum row ids into bucket ids). */
  def cmsMerge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "cmsMerge needs at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy("row", "bucket")
      .agg(sum(col("cnt")).as("cnt"))
  }

  /**
   * Bounded LOG₂ HISTOGRAM (E193) — the fixed-size distribution summary a
   * 100 TB corpus can afford: positive values land in bucket
   * ⌊log₂ v⌋ (≤ 64 buckets regardless of corpus size; the bucket index is
   * the BIT LENGTH of the value minus one — integer-exact, no libm), one
   * map-side-combinable groupBy over ≤ 64 keys. Output (bucket, lo, cnt,
   * cum) with lo = 2^bucket and the running cumulative count — mergeable
   * by summing cnt per bucket. Values < 1 are excluded (token/byte sizes
   * of kept corpus rows are ≥ 1 by construction; a caller tracking empties
   * counts them separately).
   */
  def logHistogram(df: DataFrame, valueCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket")) // ≤ 64 rows — a single-partition window is fine
    df.filter(col(valueCol) >= 1)
      .withColumn("bucket", (length(bin(col(valueCol).cast("long"))) - 1).cast("int"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
      .withColumn("lo", expr("CAST(shiftleft(1L, bucket) AS BIGINT)"))
      .withColumn("cum", sum(col("cnt")).over(w))
      .select("bucket", "lo", "cnt", "cum")
  }

  /** Quantile estimates from the histogram: for each requested percentile
    * p (integer 0–100), the LOWER BOUND (2^bucket) of the first bucket
    * whose cumulative count reaches p% of the total — the crossing rule
    * is the integer comparison cum·100 ≥ p·total (no floating point), so
    * any engine replays the same bucket choice. Estimates are
    * order-of-magnitude by construction (the honest contract of a
    * 64-bucket sketch). */
  def histQuantiles(hist: DataFrame, ps: Seq[Int]): DataFrame = {
    val spark = hist.sparkSession
    import spark.implicits._
    val total = hist.agg(sum(col("cnt")).as("_tot"))
    val pdf = ps.toDF("p")
    hist.crossJoin(broadcast(total)).crossJoin(broadcast(pdf))
      .filter(col("cum") * 100 >= col("p") * col("_tot"))
      .withColumn("_rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("p"))
          .orderBy(col("bucket"))))
      .filter(col("_rk") === 1)
      .select(col("p"), col("lo").as("est"))
  }
}
