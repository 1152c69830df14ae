package graft.sql

import java.util.Locale

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types._

/**
 * Metadata-only aggregates over graft catalog tables — what Iceberg's
 * manifests give Athena for the reference's own verification query
 * (`README.md:507-513`: `SELECT COUNT(*) FROM retail_trans_iceberg`): the
 * manifest already knows the exact row count and per-file column [min,max]
 * stats, so an unfiltered COUNT(*)/MIN/MAX never needs to open a data file.
 *
 * An ungrouped Aggregate whose EVERY output is a bare `COUNT(*)`/`COUNT(lit)`
 * or a `MIN(col)`/`MAX(col)` over a manifest-stat-covered column (no
 * DISTINCT, no FILTER clause, no grouping, nothing between it and the
 * relation except attribute-only projections) over a [[GraftSqlTable]] with
 * no pending merge-on-read deletes is folded to a [[LocalRelation]] holding
 * the manifest answer of the snapshot the relation resolved at (so
 * `VERSION AS OF` answers stay snapshot-exact). With pending deletes the
 * answer depends on the anti-join → no rewrite (GraftMorScanRule has already
 * substituted the relation by then, so this rule never even sees it).
 *
 * MIN/MAX folding is conservative — a bound is used only when it is PROVEN
 * exact:
 *  - every live file carries a [min,max] for the column (the PK always does,
 *    unless its footer stats degraded to the never-prunable sentinel range;
 *    other integral/date/timestamp columns carry theirs in per-file stats —
 *    a file whose column was all-null or skipped has no entry → no fold);
 *  - a hashed (string/composite) PK's range is ORDERLESS → never folded;
 *  - parquet footer min/max ignore nulls, exactly like SQL MIN/MAX, so
 *    min-of-mins / max-of-maxes over all files is the exact answer;
 *  - an empty snapshot folds to NULL (and COUNT to 0), per SQL semantics.
 */
class GraftCountStarRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def tableOf(plan: LogicalPlan): Option[GraftSqlTable] = plan match {
    case Project(ps, child) if ps.forall(_.isInstanceOf[Attribute]) =>
      tableOf(child)
    case r: DataSourceV2Relation => r.table match {
      case g: GraftSqlTable if !g.morPending && !g.renamesPending => Some(g)
      case _ => None
    }
    case _ => None
  }

  /** Manifest-exact internal-row value for one aggregate output, when
    * provable. `Some(null)` is a REAL fold (MIN/MAX of an empty table);
    * `None` means "cannot prove — leave the plan alone". */
  private def foldValue(g: GraftSqlTable, e: NamedExpression): Option[Any] = e match {
    case Alias(ae: AggregateExpression, _) if !ae.isDistinct && ae.filter.isEmpty &&
        ae.mode == Complete =>
      ae.aggregateFunction match {
        case Count(Seq(Literal(v, _))) if v != null => Some(g.rowCount)
        case Min(a: Attribute) => statBound(g, a, isMin = true)
        case Max(a: Attribute) => statBound(g, a, isMin = false)
        case _ => None
      }
    case _ => None
  }

  private def statBound(g: GraftSqlTable, a: Attribute, isMin: Boolean): Option[Any] = {
    val supported = a.dataType match {
      case ByteType | ShortType | IntegerType | LongType | DateType | TimestampType => true
      case _ => false
    }
    if (!supported) return None
    if (g.entries.isEmpty || g.rowCount == 0L) return Some(null)
    val isPk = a.name.equalsIgnoreCase(g.pk)
    val ranges: Option[Seq[(Long, Long)]] =
      if (isPk) {
        if (g.pkHashed) None // hash key domain has no order
        else {
          val rs = g.entries.map(e => (e.pkMin, e.pkMax))
          // Absent footer stats degrade a file to the full-range sentinel —
          // conservative for pruning, but NOT a real bound: refuse the fold.
          if (rs.exists { case (mn, mx) => mn == Long.MinValue && mx == Long.MaxValue }) None
          else Some(rs)
        }
      } else {
        val key = a.name.toLowerCase(Locale.ROOT)
        val rs = g.entries.map(_.stats.get(key))
        if (rs.exists(_.isEmpty)) None else Some(rs.map(_.get))
      }
    ranges.map { rs =>
      val v = if (isMin) rs.map(_._1).min else rs.map(_._2).max
      a.dataType match {
        case ByteType => v.toByte
        case ShortType => v.toShort
        case IntegerType | DateType => v.toInt // dates: epoch days as Int
        case _ => v // longs; timestamps: epoch µs as Long
      }
    }
  }

  /** Shape of one filtered-fold output: COUNT(*), or MIN/MAX of a
    * stat-covered column (the attribute plus direction). */
  private sealed trait FoldKind
  private case object FoldCount extends FoldKind
  private final case class FoldBound(a: Attribute, isMin: Boolean) extends FoldKind

  /** Classify an ungrouped aggregate output for the FILTERED fold; None =
    * unsupported shape. Same restrictions as [[statBound]]: integral/date/
    * timestamp attributes only, hashed PK bounds are orderless → refused. */
  private def foldKind(g: GraftSqlTable, e: NamedExpression): Option[FoldKind] = e match {
    case Alias(ae: AggregateExpression, _) if !ae.isDistinct && ae.filter.isEmpty &&
        ae.mode == Complete =>
      ae.aggregateFunction match {
        case Count(Seq(Literal(v, _))) if v != null => Some(FoldCount)
        case Min(a: Attribute) => boundKind(g, a, isMin = true)
        case Max(a: Attribute) => boundKind(g, a, isMin = false)
        case _ => None
      }
    case _ => None
  }

  private def boundKind(g: GraftSqlTable, a: Attribute, isMin: Boolean): Option[FoldKind] = {
    val supported = a.dataType match {
      case ByteType | ShortType | IntegerType | LongType | DateType | TimestampType => true
      case _ => false
    }
    if (!supported) None
    else if (a.name.equalsIgnoreCase(g.pk) && g.pkHashed) None
    else Some(FoldBound(a, isMin))
  }

  /**
   * Parse a filter into the wanted IDENTITY-partition value set (Iceberg
   * metadata-aggregate parity — the filter must select WHOLE files for
   * manifest stats to be the exact answer). Supported: one equality/IN/
   * InSet conjunct on the partition column plus any IsNotNull the optimizer
   * added alongside; anything else → None, the plan stays untouched.
   */
  private def partitionValues(g: GraftSqlTable,
      cond: org.apache.spark.sql.catalyst.expressions.Expression): Option[Set[String]] = {
    import org.apache.spark.sql.catalyst.expressions._
    val pcol = g.partSpec match {
      case Some(graft.table.PartitionTransform.Identity(c)) => c
      case _ => return None
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def isPart(a: Expression): Boolean = a match {
      case at: Attribute => at.name.equalsIgnoreCase(pcol)
      case _ => false
    }
    def valueOf(l: Literal): Option[String] = l.dataType match {
      case StringType => Option(l.value).map(_.toString)
      case ByteType | ShortType | IntegerType | LongType => Option(l.value).map(_.toString)
      case _ => None
    }
    var wanted: Option[Set[String]] = None
    conjuncts(cond).foreach {
      case IsNotNull(a) if isPart(a) => ()
      case EqualTo(a, l: Literal) if isPart(a) =>
        if (wanted.nonEmpty) return None
        wanted = valueOf(l).map(Set(_)); if (wanted.isEmpty) return None
      case EqualTo(l: Literal, a) if isPart(a) =>
        if (wanted.nonEmpty) return None
        wanted = valueOf(l).map(Set(_)); if (wanted.isEmpty) return None
      case In(a, vs) if isPart(a) && vs.forall(_.isInstanceOf[Literal]) =>
        if (wanted.nonEmpty) return None
        val decoded = vs.map(v => valueOf(v.asInstanceOf[Literal]))
        if (decoded.exists(_.isEmpty)) return None
        wanted = Some(decoded.flatten.toSet)
      case InSet(a, vs) if isPart(a) =>
        if (wanted.nonEmpty) return None
        // InSet holds Catalyst values (UTF8String / boxed integrals)
        wanted = Some(vs.filter(_ != null).map(_.toString))
      case _ => return None
    }
    wanted
  }

  /** One pass over the manifest accumulating the row total plus [min,max]
    * of each requested column over the files whose identity-partition value
    * is in `values`. Wholly-inside chunks contribute their chunk-level
    * stats without loading; wholly-outside chunks are skipped; straddling
    * or stat-uncertain chunks load and accumulate per entry. Returns
    * (rows, per-column bound) — None when any needed stat is unavailable
    * or any file is off the current identity spec. */
  private def foldOverMatching(g: GraftSqlTable, values: Set[String],
      bounds: Seq[FoldBound]): Option[(Long, Map[String, (Long, Long)])] = {
    val pcol = g.partSpec match {
      case Some(graft.table.PartitionTransform.Identity(c)) => c
      case _ => return None
    }
    def identityCurrent(d: Option[org.apache.spark.sql.graftshim.PartitionTransformDesc])
        : Boolean = d.exists(x => x.kind == "identity" && x.col.equalsIgnoreCase(pcol))
    val pkName = g.pk.toLowerCase(Locale.ROOT)
    val needed: Seq[String] = bounds.map(_.a.name.toLowerCase(Locale.ROOT)).distinct
    var rows = 0L
    val acc = scala.collection.mutable.Map.empty[String, (Long, Long)]
    def mergeBound(key: String, mn: Long, mx: Long): Unit = acc.get(key) match {
      case Some((a, b)) => acc(key) = (math.min(a, mn), math.max(b, mx))
      case None => acc(key) = (mn, mx)
    }
    // Accumulate one matching unit (file or wholly-inside chunk); false = a
    // needed stat is missing. Availability is checked BEFORE any mutation so
    // a refused chunk can fall back to its per-entry stats without double
    // counting.
    def addUnit(unitRows: Long, pkMin: Long, pkMax: Long,
        stats: Map[String, (Long, Long)]): Boolean = {
      if (unitRows < 0) return false
      val available = needed.forall { key =>
        if (key == pkName && !g.pkHashed)
          !(pkMin == Long.MinValue && pkMax == Long.MaxValue) // sentinel range
        else stats.contains(key)
      }
      if (!available) return false
      rows += unitRows
      needed.foreach { key =>
        if (key == pkName && !g.pkHashed) mergeBound(key, pkMin, pkMax)
        else { val (mn, mx) = stats(key); mergeBound(key, mn, mx) }
      }
      true
    }
    def entryPass(es: Seq[org.apache.spark.sql.graftshim.ManifestEntry]): Boolean =
      es.forall { e =>
        if (!identityCurrent(e.part)) false
        else if (!e.partition.exists(values)) true
        else addUnit(e.rows, e.pkMin, e.pkMax, e.stats)
      }
    val ok = g.entries match {
      case lm: org.apache.spark.sql.graftshim.LazyManifest =>
        lm.chunkList.forall { c =>
          c.partitions match {
            case Some(ps) if identityCurrent(c.part) && !ps.exists(values) =>
              true // wholly outside — contributes nothing, never loads
            case Some(ps) if identityCurrent(c.part) && ps.forall(values) &&
                c.rows >= 0 && addUnit(c.rows, c.pkMin, c.pkMax, c.stats) =>
              true // wholly inside — chunk-level stats, zero loads
            case _ => entryPass(c.load()) // straddling / stat-less / mixed
          }
        }
      case es => entryPass(es)
    }
    if (ok) Some((rows, acc.toMap)) else None
  }

  /** Per-identity-partition manifest fold (Iceberg "partitions metadata as
    * an aggregate answer"): every file belongs to exactly ONE partition
    * value, so `GROUP BY <identity partition column>` + COUNT/MIN/MAX is
    * answerable from per-file stats alone — one row per live value, zero
    * data I/O. Single-valued chunks contribute chunk-level stats without
    * loading; mixed/straddling chunks load their entries. None = any file
    * off the current identity spec or a needed stat missing. */
  private def foldGrouped(g: GraftSqlTable, bounds: Seq[FoldBound])
      : Option[Seq[(Option[String], Long, Map[String, (Long, Long)])]] = {
    val pcol = g.partSpec match {
      case Some(graft.table.PartitionTransform.Identity(c)) => c
      case _ => return None
    }
    def identityCurrent(d: Option[org.apache.spark.sql.graftshim.PartitionTransformDesc])
        : Boolean = d.exists(x => x.kind == "identity" && x.col.equalsIgnoreCase(pcol))
    val pkName = g.pk.toLowerCase(Locale.ROOT)
    val needed: Seq[String] = bounds.map(_.a.name.toLowerCase(Locale.ROOT)).distinct
    val rows = scala.collection.mutable.LinkedHashMap
      .empty[Option[String], (Long, scala.collection.mutable.Map[String, (Long, Long)])]
    def addUnit(part: Option[String], unitRows: Long, pkMin: Long, pkMax: Long,
        stats: Map[String, (Long, Long)]): Boolean = {
      if (unitRows < 0) return false
      val available = needed.forall { key =>
        if (key == pkName && !g.pkHashed)
          !(pkMin == Long.MinValue && pkMax == Long.MaxValue)
        else stats.contains(key)
      }
      if (!available) return false
      val (n, acc) = rows.getOrElseUpdate(part,
        (0L, scala.collection.mutable.Map.empty[String, (Long, Long)]))
      needed.foreach { key =>
        val (mn, mx) =
          if (key == pkName && !g.pkHashed) (pkMin, pkMax) else stats(key)
        acc.get(key) match {
          case Some((a, b)) => acc(key) = (math.min(a, mn), math.max(b, mx))
          case None => acc(key) = (mn, mx)
        }
      }
      rows(part) = (n + unitRows, acc)
      true
    }
    def entryPass(es: Seq[org.apache.spark.sql.graftshim.ManifestEntry]): Boolean =
      es.forall { e =>
        identityCurrent(e.part) && addUnit(e.partition, e.rows, e.pkMin, e.pkMax, e.stats)
      }
    val ok = g.entries match {
      case lm: org.apache.spark.sql.graftshim.LazyManifest =>
        lm.chunkList.forall { c =>
          c.partitions match {
            case Some(Seq(one)) if identityCurrent(c.part) && c.rows >= 0 &&
                addUnit(Some(one), c.rows, c.pkMin, c.pkMax, c.stats) =>
              true // single-valued chunk — chunk-level stats, zero loads
            case _ => entryPass(c.load())
          }
        }
      case es => entryPass(es)
    }
    if (ok) Some(rows.toSeq.map { case (p, (n, acc)) => (p, n, acc.toMap) }) else None
  }

  /** Catalyst value for a stored identity-partition string under the
    * grouping attribute's type; None = unsupported type (no fold). */
  private def partValueOf(v: Option[String], dt: DataType): Option[Any] = v match {
    case None => Some(null) // __HIVE_DEFAULT_PARTITION__: the NULL group
    case Some(s) => dt match {
      case StringType => Some(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      case ByteType => scala.util.Try(s.toByte).toOption
      case ShortType => scala.util.Try(s.toShort).toOption
      case IntegerType => scala.util.Try(s.toInt).toOption
      case LongType => scala.util.Try(s.toLong).toOption
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg @ Aggregate(Nil, exprs, child, _) if exprs.nonEmpty && tableOf(child).isDefined =>
      val g = tableOf(child).get
      val vals = exprs.map(e => foldValue(g, e))
      if (vals.forall(_.isDefined))
        LocalRelation(agg.output, Seq(InternalRow.fromSeq(vals.map(_.get))))
      else agg
    // GROUP BY the identity partition column: per-file stats are exact per
    // group (a file holds exactly one partition value) — one LocalRelation
    // row per live value, zero data I/O.
    case agg @ Aggregate(Seq(ga: Attribute), exprs, child, _)
        if exprs.nonEmpty && tableOf(child).isDefined &&
          tableOf(child).get.partSpec.exists {
            case graft.table.PartitionTransform.Identity(c) =>
              c.equalsIgnoreCase(ga.name)
            case _ => false
          } =>
      val g = tableOf(child).get
      // classify outputs: the grouping attribute itself, or a foldable agg
      val kinds: Seq[Option[Either[Unit, FoldKind]]] = exprs.map {
        case a: Attribute if a.semanticEquals(ga) => Some(Left(()))
        case e => foldKind(g, e).map(Right(_))
      }
      val folded: Option[LogicalPlan] =
        if (!kinds.forall(_.isDefined)) None
        else {
          val bounds = kinds.flatten.collect { case Right(b: FoldBound) => b }
          foldGrouped(g, bounds).flatMap { groups =>
            val rows = groups.map { case (part, n, bmap) =>
              partValueOf(part, ga.dataType).map { gv =>
                InternalRow.fromSeq(kinds.flatten.map {
                  case Left(()) => gv
                  case Right(FoldCount) => n
                  case Right(FoldBound(a, isMin)) =>
                    val (mn, mx) = bmap(a.name.toLowerCase(Locale.ROOT))
                    val v = if (isMin) mn else mx
                    a.dataType match {
                      case ByteType => v.toByte
                      case ShortType => v.toShort
                      case IntegerType | DateType => v.toInt
                      case _ => v
                    }
                })
              }
            }
            if (rows.exists(_.isEmpty)) None
            else Some(LocalRelation(agg.output, rows.flatten))
          }
        }
      folded.getOrElse(agg)
    // Partition-filtered COUNT/MIN/MAX: the identity-partition filter
    // selects whole files, so per-file (and wholly-inside per-chunk) stats
    // are the exact answer — zero data I/O, straddling chunks load alone.
    case agg @ Aggregate(Nil, exprs, child, _)
        if exprs.nonEmpty && filterAndTable(child).isDefined =>
      val (cond, g) = filterAndTable(child).get
      val kinds = exprs.map(e => foldKind(g, e))
      val folded: Option[LogicalPlan] =
        if (!kinds.forall(_.isDefined)) None
        else partitionValues(g, cond).flatMap { values =>
          val bounds = kinds.flatten.collect { case b: FoldBound => b }
          foldOverMatching(g, values, bounds).map { case (n, bmap) =>
            val vals: Seq[Any] = kinds.flatten.map {
              case FoldCount => n
              case FoldBound(a, isMin) =>
                if (n == 0L) null
                else {
                  val (mn, mx) = bmap(a.name.toLowerCase(Locale.ROOT))
                  val v = if (isMin) mn else mx
                  a.dataType match {
                    case ByteType => v.toByte
                    case ShortType => v.toShort
                    case IntegerType | DateType => v.toInt
                    case _ => v
                  }
                }
            }
            LocalRelation(agg.output, Seq(InternalRow.fromSeq(vals)))
          }
        }
      folded.getOrElse(agg)
  }

  /** Peel attribute-only Projects to a single Filter directly over the
    * relation (column pruning interleaves Projects on both sides of it). */
  private def filterAndTable(plan: LogicalPlan)
      : Option[(org.apache.spark.sql.catalyst.expressions.Expression, GraftSqlTable)] =
    plan match {
      case Project(ps, child) if ps.forall(_.isInstanceOf[Attribute]) => filterAndTable(child)
      case org.apache.spark.sql.catalyst.plans.logical.Filter(cond, child) =>
        tableOf(child).map(g => (cond, g))
      case _ => None
    }
}
