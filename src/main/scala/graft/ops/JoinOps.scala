package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal join operators Spark lacks natively: as-of join and
 * point-in-interval (range) join. Both are implemented with scale-correct plan
 * shapes — a single hash shuffle on the join key (as-of) or an equi-join on a
 * derived bin key (range) — never a theta/nested-loop join, which is what a
 * naive `left.join(right, cond)` with only inequality predicates degenerates to.
 *
 * Reference context: the CDC pipeline's table-as-state semantics
 * (`/root/reference/src/main/python/spark_sql_merge_into_iceberg.py:105-108`)
 * are a degenerate as-of join (latest state per key at now); the general
 * operator answers "latest right row per key at each left row's time" — the
 * standard enrichment join for event streams against slowly-changing state.
 *
 * 100 TB posture:
 *  - `asofJoin` unions both sides and runs ONE window shuffle partitioned by
 *    key: cost is a single exchange of |L|+|R| rows, no per-key blowup, skew
 *    bounded by the hottest key's history (same bound as any per-key window).
 *  - `rangeJoinBinned` turns the inequality into an equi-join on a bin id:
 *    each interval is exploded to the bins it covers (|R| × span/binWidth
 *    rows), each point maps to exactly one bin, so a qualifying (point,
 *    interval) pair meets exactly once — no post-join dedup. Bin width is the
 *    knob: wider bins = fewer replicated interval rows but more false
 *    candidates filtered after the join. This is the same strategy as
 *    Databricks' range-join optimization and Flink's interval join bucketing.
 */
object JoinOps {

  /**
   * As-of join: for each left row, find the single right row with the same key
   * and the greatest `rightTime <= leftTime` (direction = "backward", the
   * default) or the least `rightTime >= leftTime` (direction = "forward").
   * Inclusive comparison, matching DuckDB/kdb+ ASOF semantics. Left rows with
   * no qualifying right row keep NULL right columns (left-outer semantics).
   *
   * Implementation: tag and union both sides, then one window pass per key in
   * time order with `last(right_payload, ignoreNulls)` carrying the most recent
   * right row forward onto each left row. At equal timestamps the right side
   * sorts first, so an exactly-simultaneous right row IS matched (inclusive).
   * `rightTieBreak` makes the choice among right rows with identical (key,
   * time) deterministic (highest tie-break wins); without it Spark's sort is
   * free to pick any of the tied rows.
   *
   * @param rightCols right columns to carry onto the output (aliased as-is)
   */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      rightTieBreak: Option[String] = None,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")

    val leftCols = left.columns.toSeq
    val rStruct = struct(rightCols.map(col): _*)
    val rType = right.select(rStruct.as("_gr")).schema("_gr").dataType
    val tb: DataFrame => Column = df =>
      rightTieBreak.map(c => df(c)).getOrElse(lit(0L))

    val lhs = left.select(
      col(leftKey).as("_gk"), col(leftTime).as("_gt"),
      lit(1).as("_gside"), lit(null).cast("long").as("_gtb"),
      struct(leftCols.map(col): _*).as("_gl"),
      lit(null).cast(rType).as("_gr"))
    val rhs = right.select(
      col(rightKey).as("_gk"), col(rightTime).as("_gt"),
      lit(0).as("_gside"), tb(right).cast("long").as("_gtb"),
      lit(null).cast(lhs.schema("_gl").dataType).as("_gl"),
      rStruct.as("_gr"))

    // Backward: ascending time, right-before-left at ties, carry the last seen
    // right row. Forward is the mirror image: descending time so "last seen"
    // is the earliest right row at-or-after the left time.
    val timeOrd =
      if (direction == "backward") Seq(col("_gt").asc, col("_gside").asc, col("_gtb").asc)
      else Seq(col("_gt").desc, col("_gside").asc, col("_gtb").desc)
    val w = Window.partitionBy(col("_gk")).orderBy(timeOrd: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lhs.unionByName(rhs)
      .withColumn("_gm", last(col("_gr"), ignoreNulls = true).over(w))
      .filter(col("_gside") === 1)
      .select(leftCols.map(c => col(s"_gl.$c").as(c)) ++
        rightCols.map(c => col(s"_gm.$c").as(c)): _*)
  }

  /**
   * Point-in-interval join: pairs each left row whose `pointCol` falls in
   * `[startCol, endCol)` of a right-side interval (half-open). Both `pointCol`
   * and the interval bounds must be LONGs in the same unit (e.g. epoch µs) —
   * callers convert timestamps with `unix_micros` first.
   *
   * Each interval is exploded to the bin ids it covers; each point computes its
   * single bin id; the join is then a plain equi-join on bin id plus a residual
   * range filter. A qualifying pair meets in exactly one bin (the point's), so
   * no dedup is needed. Intervals longer than ~1000×binWidth should use a wider
   * bin (explosion factor = ceil(span/binWidth)).
   */
  def rangeJoinBinned(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("_gbin", floor(col(pointCol) / binWidth))
    // degenerate/invalid intervals (end <= start) admit no point; dropping
    // them BEFORE the explode matters because sequence(hi, lo) DESCENDS in
    // Spark — a malformed interval would otherwise fan out junk bin rows
    // (span/binWidth of them) that only die at the residual filter
    val iv = intervals.where(col(endCol) > col(startCol)).withColumn("_gbin",
      explode(sequence(
        floor(col(startCol) / binWidth),
        floor((col(endCol) - 1) / binWidth))))
    p.join(iv, Seq("_gbin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_gbin")
  }
}
