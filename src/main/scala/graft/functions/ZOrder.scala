package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) curve value for two columns — the clustering key behind
 * [[graft.table.TransactionalTable.compactZOrdered]] (Iceberg's
 * `rewrite_data_files` with a z-order strategy). Built entirely from
 * codegen'd bitwise builtins (shiftleft / bitwiseAND / bitwiseOR — the
 * standard magic-number bit-spread), so the whole key stays inside
 * whole-stage codegen; no UDF.
 *
 * The z-value is a CLUSTERING key, not a correctness surface: any
 * normalization error only worsens locality, never query answers (file
 * pruning reads the real per-column min/max stats the rewrite produces).
 */
object ZOrder {

  /** Spread the low 32 bits of `x` so bit i lands at position 2i. */
  private def spread(x: Column): Column = {
    var v = x.bitwiseAND(lit(0xFFFFFFFFL))
    v = v.bitwiseOR(shiftleft(v, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    v = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    v = v.bitwiseOR(shiftleft(v, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    v = v.bitwiseOR(shiftleft(v, 2)).bitwiseAND(lit(0x3333333333333333L))
    v.bitwiseOR(shiftleft(v, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Rank a column to [0, 2^31) within its global [mn, mx] span. Double
    * arithmetic: exact enough for locality, and immune to long overflow on
    * wide domains. NULLs rank 0 (they cluster at the curve's low corner). */
  private def rank(c: Column, mn: Long, mx: Long): Column = {
    val span = math.max(1L, mx - mn).toDouble
    floor((coalesce(c.cast("double"), lit(mn.toDouble)) - lit(mn.toDouble))
      / lit(span) * lit((1L << 31).toDouble - 1)).cast("long")
  }

  /** 2-D Morton code of `a` and `b`, each normalized to its global range. */
  def zValue2(a: Column, aMin: Long, aMax: Long,
      b: Column, bMin: Long, bMax: Long): Column =
    spread(rank(a, aMin, aMax)).bitwiseOR(shiftleft(spread(rank(b, bMin, bMax)), 1))
}
