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
}
