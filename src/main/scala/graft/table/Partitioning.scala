package graft.table

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.PartitionTransformDesc

/**
 * Hidden-partitioning transforms (Iceberg's partition-spec idea, natively):
 * the table declares HOW a partition value derives from a source column, the
 * write path computes it (`valueExpr` → the `_p` directory value), and scans
 * prune files by reversing the transform on query predicates — the user
 * never filters on a synthetic partition column. The reference's DDL implies
 * exactly this contract (`'table_type'='iceberg'` + `PARTITIONED BY`,
 * reference `README.md:364-367`).
 *
 * Temporal transforms use raw epoch-micros arithmetic (days = floor(µs/86.4e9),
 * Iceberg's epoch-day semantics) rather than session-timezone date functions,
 * so the partition value is timezone-independent and bit-stable across
 * engines. Bucket uses Spark's `xxhash64` (seed 42); the scan-side twin
 * (graftshim.PartitionPrune) calls the same Catalyst hash, so write and prune
 * can never disagree.
 */
sealed trait PartitionTransform {
  /** Source column the partition value derives from. */
  def col: String
  def kind: String
  /** String-typed partition value expression for the `_p` write column. */
  def valueExpr: Column
  /** Schema-aware variant — transforms whose derivation depends on the
    * source column's declared type (truncate: substring vs floor-multiple)
    * override this; everything else ignores the schema. The write path
    * always calls THIS one. */
  def valueExprIn(schema: org.apache.spark.sql.types.StructType): Column = valueExpr
  /** Dependency-free mirror handed to the SQL-side ManifestFileIndex. */
  def desc: PartitionTransformDesc
}

object PartitionTransform {

  val MicrosPerDay = 86400000000L
  val MicrosPerHour = 3600000000L

  /** Plain value partitioning — what the engine always supported. */
  final case class Identity(col: String) extends PartitionTransform {
    val kind = "identity"
    def valueExpr: Column = org.apache.spark.sql.functions.col(col)
    def desc: PartitionTransformDesc = PartitionTransformDesc(kind, col)
  }

  /** Epoch-day of a timestamp column (`PARTITIONED BY (days(ts))`). */
  final case class Days(col: String) extends PartitionTransform {
    val kind = "days"
    def valueExpr: Column =
      floor(unix_micros(org.apache.spark.sql.functions.col(col).cast("timestamp")) /
        lit(MicrosPerDay.toDouble)).cast("long").cast("string")
    def desc: PartitionTransformDesc = PartitionTransformDesc(kind, col)
  }

  /** Epoch-hour of a timestamp column (`PARTITIONED BY (hours(ts))`). */
  final case class Hours(col: String) extends PartitionTransform {
    val kind = "hours"
    def valueExpr: Column =
      floor(unix_micros(org.apache.spark.sql.functions.col(col).cast("timestamp")) /
        lit(MicrosPerHour.toDouble)).cast("long").cast("string")
    def desc: PartitionTransformDesc = PartitionTransformDesc(kind, col)
  }

  /** Shared by Months/Years: the UTC calendar date of a timestamp, via its
    * epoch-day — `year()`/`month()` on a DATE are pure calendar arithmetic
    * (no session timezone), so the partition value stays engine-stable like
    * the epoch-division transforms. */
  private def utcDate(col: String): Column =
    date_add(lit(java.sql.Date.valueOf("1970-01-01")),
      floor(unix_micros(org.apache.spark.sql.functions.col(col).cast("timestamp")) /
        lit(MicrosPerDay.toDouble)).cast("int"))

  /** Months since 1970-01 (`PARTITIONED BY (months(ts))`), Iceberg's month
    * transform ordinal. */
  final case class Months(col: String) extends PartitionTransform {
    val kind = "months"
    def valueExpr: Column = {
      val d = utcDate(col)
      (((year(d) - lit(1970)) * lit(12)) + month(d) - lit(1)).cast("long").cast("string")
    }
    def desc: PartitionTransformDesc = PartitionTransformDesc(kind, col)
  }

  /** Years since 1970 (`PARTITIONED BY (years(ts))`). */
  final case class Years(col: String) extends PartitionTransform {
    val kind = "years"
    def valueExpr: Column =
      (year(utcDate(col)) - lit(1970)).cast("long").cast("string")
    def desc: PartitionTransformDesc = PartitionTransformDesc(kind, col)
  }

  /** Hash bucket (`PARTITIONED BY (bucket(n, col))`): xxhash64 mod n. */
  final case class Bucket(n: Int, col: String) extends PartitionTransform {
    require(n > 0, s"bucket count must be positive, got $n")
    val kind = "bucket"
    def valueExpr: Column =
      pmod(xxhash64(org.apache.spark.sql.functions.col(col)), lit(n.toLong)).cast("string")
    def desc: PartitionTransformDesc = PartitionTransformDesc(kind, col, n)
  }

  /** Width truncation (`PARTITIONED BY (truncate(w, col))`), Iceberg
    * semantics: integers floor to the nearest multiple of `w` (negative
    * values floor DOWN: -1 with w=10 → -10), strings keep their first `w`
    * characters. Both are ORDER-PRESERVING (`x ≤ y ⟹ trunc(x) ≤ trunc(y)`),
    * which is what makes range pruning on the source column sound; the
    * integer ordinal path additionally prunes ranges scan-side. */
  final case class Truncate(w: Int, col: String) extends PartitionTransform {
    require(w > 0, s"truncate width must be positive, got $w")
    val kind = "truncate"
    /** Integral derivation (the common case); string sources go through
      * [[valueExprIn]], which is what the write path calls. */
    def valueExpr: Column = {
      val c = org.apache.spark.sql.functions.col(col)
      (c - pmod(c, lit(w.toLong))).cast("long").cast("string")
    }
    override def valueExprIn(schema: org.apache.spark.sql.types.StructType): Column =
      schema.find(_.name.equalsIgnoreCase(col)).map(_.dataType) match {
        case Some(org.apache.spark.sql.types.StringType) =>
          substring(org.apache.spark.sql.functions.col(col), 1, w)
        case _ => valueExpr
      }
    def desc: PartitionTransformDesc = PartitionTransformDesc(kind, col, w)
  }

  def apply(kind: String, col: String, n: Int = 0): PartitionTransform = kind match {
    case "identity" => Identity(col)
    case "days" => Days(col)
    case "hours" => Hours(col)
    case "months" => Months(col)
    case "years" => Years(col)
    case "bucket" => Bucket(n, col)
    case "truncate" => Truncate(n, col)
    case other => throw new IllegalArgumentException(s"unknown partition transform '$other'")
  }
}
