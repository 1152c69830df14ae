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

  /** True when `e` is a foldable ungrouped COUNT(*)/COUNT(lit). */
  private def isCountStar(e: NamedExpression): Boolean = e match {
    case Alias(ae: AggregateExpression, _) if !ae.isDistinct && ae.filter.isEmpty &&
        ae.mode == Complete =>
      ae.aggregateFunction match {
        case Count(Seq(Literal(v, _))) if v != null => true
        case _ => false
      }
    case _ => false
  }

  /**
   * Partition-filtered COUNT(*) from manifest stats alone (Iceberg
   * metadata-aggregate parity): `SELECT COUNT(*) FROM t WHERE p = 'v'` where
   * `p` is the table's IDENTITY partition column is a per-partition row-count
   * sum — the filter selects whole files, so the manifest's exact per-file
   * counts ARE the answer. Chunk-level: a chunk whose (uniform-spec) value
   * list is entirely inside / outside the wanted set contributes its stat
   * total / zero WITHOUT loading; only straddling chunks load. Conservative:
   * any file off the current identity spec, a stat-less sentinel, or an
   * unsupported predicate shape leaves the plan alone.
   */
  private def filteredCount(g: GraftSqlTable,
      cond: org.apache.spark.sql.catalyst.expressions.Expression): Option[Long] = {
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
    // Exactly one value-constraining conjunct on the partition column (plus
    // any IsNotNull the optimizer added alongside it); anything else → bail.
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
    val values = wanted.getOrElse(return None)
    def identityCurrent(d: Option[org.apache.spark.sql.graftshim.PartitionTransformDesc])
        : Boolean = d.exists(x => x.kind == "identity" && x.col.equalsIgnoreCase(pcol))
    def entrySum(es: Seq[org.apache.spark.sql.graftshim.ManifestEntry]): Option[Long] = {
      var s = 0L
      es.foreach { e =>
        if (!identityCurrent(e.part) || e.rows < 0) return None
        if (e.partition.exists(values)) s += e.rows
      }
      Some(s)
    }
    g.entries match {
      case lm: org.apache.spark.sql.graftshim.LazyManifest =>
        var s = 0L
        lm.chunkList.foreach { c =>
          c.partitions match {
            case Some(ps) if identityCurrent(c.part) && c.rows >= 0 &&
                ps.forall(values) => s += c.rows // wholly inside — stat total
            case Some(ps) if identityCurrent(c.part) && !ps.exists(values) =>
              () // wholly outside — contributes nothing, never loads
            case _ => entrySum(c.load()) match { // straddling / stat-less
              case Some(x) => s += x
              case None => return None
            }
          }
        }
        Some(s)
      case es => entrySum(es)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg @ Aggregate(Nil, exprs, child, _) if exprs.nonEmpty && tableOf(child).isDefined =>
      val g = tableOf(child).get
      val vals = exprs.map(e => foldValue(g, e))
      if (vals.forall(_.isDefined))
        LocalRelation(agg.output, Seq(InternalRow.fromSeq(vals.map(_.get))))
      else agg
    case agg @ Aggregate(Nil, exprs, child, _)
        if exprs.nonEmpty && exprs.forall(isCountStar) && filterAndTable(child).isDefined =>
      val (cond, g) = filterAndTable(child).get
      filteredCount(g, cond) match {
        case Some(n) =>
          LocalRelation(agg.output, Seq(InternalRow.fromSeq(exprs.map(_ => n))))
        case None => agg
      }
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
