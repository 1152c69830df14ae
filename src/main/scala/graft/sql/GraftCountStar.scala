package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/**
 * Metadata-only `SELECT COUNT(*)` over graft catalog tables — what Iceberg's
 * manifests give Athena for the reference's own verification query
 * (`README.md:507-513`: `SELECT COUNT(*) FROM retail_trans_iceberg`): the
 * manifest already knows the exact row count, so an unfiltered count never
 * needs to open a single data file.
 *
 * An ungrouped Aggregate whose every output is a bare `COUNT(*)`/`COUNT(lit)`
 * (no DISTINCT, no FILTER clause, no grouping, nothing between it and the
 * relation except attribute-only projections) over a [[GraftSqlTable]] with
 * no pending merge-on-read deletes is folded to a [[LocalRelation]] holding
 * the manifest count of the snapshot the relation resolved at (so
 * `VERSION AS OF` counts stay snapshot-exact). With pending deletes the
 * count depends on the anti-join → no rewrite (GraftMorScanRule has already
 * substituted the relation by then, so this rule never even sees it).
 */
class GraftCountStarRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def manifestCount(plan: LogicalPlan): Option[Long] = plan match {
    case Project(ps, child) if ps.forall(_.isInstanceOf[Attribute]) =>
      manifestCount(child)
    case r: DataSourceV2Relation => r.table match {
      case g: GraftSqlTable if !g.morPending => Some(g.rowCount)
      case _ => None
    }
    case _ => None
  }

  private def isBareCountStar(e: NamedExpression): Boolean = e match {
    case Alias(ae: AggregateExpression, _) if !ae.isDistinct && ae.filter.isEmpty &&
        ae.mode == Complete =>
      ae.aggregateFunction match {
        case Count(Seq(Literal(v, _))) => v != null // COUNT(NULL) counts nothing
        case _ => false
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg @ Aggregate(Nil, exprs, child, _)
        if exprs.nonEmpty && exprs.forall(isBareCountStar) &&
          manifestCount(child).isDefined =>
      val n = manifestCount(child).get
      LocalRelation(agg.output, Seq(InternalRow.fromSeq(exprs.map(_ => n))))
  }
}
