package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.types.{DataType, DateType, TimestampType}

/** Dependency-free mirror of a table's hidden-partitioning transform
  * (graft.table.PartitionTransform), handed to [[ManifestFileIndex]] so the
  * SQL planner can reverse the transform on pushed predicates and prune whole
  * files by their manifest partition value — kept free of graft.table to
  * avoid a package cycle (same reason as [[ManifestEntry]]). `n` is the
  * bucket count (0 for non-bucket kinds). */
final case class PartitionTransformDesc(kind: String, col: String, n: Int = 0)

/**
 * Scan-side twin of the write-side partition-value derivation: given a
 * predicate literal on the partition SOURCE column, compute the partition
 * value string the matching rows must live in. The arithmetic is identical
 * to `PartitionTransform.valueExpr` by construction — epoch-micros floor
 * division for days/hours, Catalyst's own XxHash64 (seed 42, the `xxhash64`
 * SQL function) for bucket — so write and prune can never disagree. Every
 * helper returns Option: an unconvertible literal means "cannot prune",
 * never a wrong prune.
 */
object PartitionPrune {

  private val MicrosPerDay = 86400000000L
  private val MicrosPerHour = 3600000000L

  /** Epoch-micros of a temporal literal (internal Catalyst representation:
    * TimestampType = Long µs, DateType = Int days). */
  private def microsOf(v: Any, dt: DataType): Option[Long] = (v, dt) match {
    case (l: Long, TimestampType) => Some(l)
    case (i: Int, DateType) => Some(i.toLong * MicrosPerDay)
    case _ => None
  }

  /** Months-since-1970-01 ordinal of an epoch-micros value — UTC calendar
    * via the epoch-day, the exact mirror of `PartitionTransform.utcDate`
    * (java.time and Spark both use the proleptic Gregorian calendar). */
  private def monthOrdinal(us: Long): Long = {
    val d = java.time.LocalDate.ofEpochDay(Math.floorDiv(us, MicrosPerDay))
    (d.getYear - 1970).toLong * 12 + (d.getMonthValue - 1)
  }

  private def yearOrdinal(us: Long): Long = {
    val d = java.time.LocalDate.ofEpochDay(Math.floorDiv(us, MicrosPerDay))
    (d.getYear - 1970).toLong
  }

  /** For days/hours: Some(ordinal) iff the literal sits EXACTLY on a
    * partition boundary. The metadata-only DELETE range classification
    * needs boundary EXACTNESS — `ts >= D` covers whole day partitions only
    * when D is midnight — where ordinary pruning only needs the floor
    * ordinal ([[ordinalOf]]). */
  def exactBoundaryOrdinal(d: PartitionTransformDesc, v: Any,
      dt: DataType): Option[Long] = d.kind match {
    case "days" => microsOf(v, dt).filter(us => Math.floorMod(us, MicrosPerDay) == 0L)
      .map(Math.floorDiv(_, MicrosPerDay))
    case "hours" => microsOf(v, dt).filter(us => Math.floorMod(us, MicrosPerHour) == 0L)
      .map(Math.floorDiv(_, MicrosPerHour))
    case _ => None
  }

  /** Integral value of a literal for the truncate transform. */
  private def longOf(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    case _ => None
  }

  /** Partition value string for an EQUALITY literal under the transform. */
  def valueOf(d: PartitionTransformDesc, v: Any, dt: DataType): Option[String] =
    d.kind match {
      case "identity" => Some(strOf(v))
      case "days" => microsOf(v, dt).map(us => Math.floorDiv(us, MicrosPerDay).toString)
      case "hours" => microsOf(v, dt).map(us => Math.floorDiv(us, MicrosPerHour).toString)
      case "months" => microsOf(v, dt).map(us => monthOrdinal(us).toString)
      case "years" => microsOf(v, dt).map(us => yearOrdinal(us).toString)
      case "truncate" => v match {
        case u: org.apache.spark.unsafe.types.UTF8String =>
          // first-w-CHARS truncation (UTF8String.substring is code-point
          // indexed, same as Spark's substring the write side uses)
          Some(u.substring(0, d.n).toString)
        case other => longOf(other).map(l => (l - Math.floorMod(l, d.n.toLong)).toString)
      }
      case "bucket" =>
        try {
          val h = XxHash64Function.hash(v, dt, 42L)
          Some((((h % d.n) + d.n) % d.n).toString)
        } catch { case _: Exception => None } // un-hashable literal: no prune
      case _ => None
    }

  /** For ORDERED transforms (temporal + integral truncate): the partition
    * ordinal of a literal, and of a file's partition value — lets range
    * predicates on the source column prune by partition. None for unordered
    * transforms (bucket), string truncate (not Long-ordinal-able), or
    * unparseable values. */
  def ordinalOf(d: PartitionTransformDesc, v: Any, dt: DataType): Option[Long] =
    d.kind match {
      case "days" => microsOf(v, dt).map(Math.floorDiv(_, MicrosPerDay))
      case "hours" => microsOf(v, dt).map(Math.floorDiv(_, MicrosPerHour))
      case "months" => microsOf(v, dt).map(monthOrdinal)
      case "years" => microsOf(v, dt).map(yearOrdinal)
      // the ordinal is the truncated value itself: order-preserving, same
      // granularity comparison semantics as the temporal ordinals
      case "truncate" => longOf(v).map(l => l - Math.floorMod(l, d.n.toLong))
      case _ => None
    }

  def partitionOrdinal(d: PartitionTransformDesc, partition: String): Option[Long] =
    d.kind match {
      case "days" | "hours" | "months" | "years" | "truncate" => partition.toLongOption
      case _ => None
    }

  private def strOf(v: Any): String = v match {
    case u: org.apache.spark.unsafe.types.UTF8String => u.toString
    case other => other.toString
  }
}
