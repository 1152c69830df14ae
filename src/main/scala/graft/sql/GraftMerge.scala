package graft.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Dataset, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic.ClassicConversions._
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.col

import graft.table.TransactionalTable

/**
 * SQL `MERGE INTO` for graft catalog tables — the reference's hot-path
 * statement (`spark_sql_merge_into_iceberg.py:118-122` upsert, `:133-136`
 * delete) runs verbatim against `graft.db.t`.
 *
 * Spark-first shape (brief option (c)): a custom logical Command
 * ([[GraftMergeCommand]]), an analyzer rule ([[GraftMergeRule]]) that rewrites
 * Spark's natively-parsed `MergeIntoTable` when the target is a
 * [[GraftSqlTable]], and a planner strategy ([[GraftMergeStrategy]]) producing
 * the executing node — all registered through [[GraftExtensions]]
 * (`spark.sql.extensions=graft.sql.GraftExtensions`), exactly how Iceberg
 * injects its MERGE support (reference `job:59`).
 *
 * Supported statement shapes (the reference's two, with either star or
 * name-identical explicit assignments, on a PK-equality condition):
 *  - WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN INSERT *  → upsert
 *  - WHEN MATCHED THEN DELETE                                         → delete
 * The merge itself is the engine's copy-on-write
 * `TransactionalTable.merge` — file-pruned anti-join + union, atomic snapshot
 * commit.
 */
final case class GraftMergeCommand(
    root: String,
    source: LogicalPlan,
    isDelete: Boolean,
    pk: String) extends UnaryCommand {
  override def child: LogicalPlan = source
  override protected def withNewChildInternal(newChild: LogicalPlan): GraftMergeCommand =
    copy(source = newChild)
}

/** `INSERT INTO graft.db.t ...` — transactional append through the engine. */
final case class GraftAppendCommand(root: String, source: LogicalPlan) extends UnaryCommand {
  override def child: LogicalPlan = source
  override protected def withNewChildInternal(newChild: LogicalPlan): GraftAppendCommand =
    copy(source = newChild)
}

class GraftMergeRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def stripped(plan: LogicalPlan): LogicalPlan = plan match {
    case SubqueryAlias(_, child) => stripped(child)
    case p: Project if p.projectList.forall(_.isInstanceOf[Attribute]) => stripped(p.child)
    case other => other
  }

  private def graftTarget(plan: LogicalPlan): Option[GraftSqlTable] =
    stripped(plan) match {
      case r: DataSourceV2Relation => r.table match {
        case g: GraftSqlTable => Some(g)
        case _ => None
      }
      case _ => None
    }

  /** PK-equality condition `t.pk = s.pk` (either side order). */
  private def isPkEquality(cond: Expression, pk: String, target: LogicalPlan,
      source: LogicalPlan): Boolean = cond match {
    case EqualTo(a: Attribute, b: Attribute) =>
      val (tSide, sSide) =
        if (target.outputSet.contains(a)) (a, b) else (b, a)
      target.outputSet.contains(tSide) && source.outputSet.contains(sSide) &&
        tSide.name.equalsIgnoreCase(pk) && sSide.name.equalsIgnoreCase(pk)
    case _ => false
  }

  private def identityAssignments(assigns: Seq[Assignment]): Boolean =
    assigns.forall {
      case Assignment(k: Attribute, v: Attribute) => k.name.equalsIgnoreCase(v.name)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case m @ MergeIntoTable(target, source, cond, matched, notMatched, Seq(), false)
        if m.childrenResolved =>
      graftTarget(target) match {
        case Some(g) =>
          if (g.pinnedVersion.nonEmpty)
            throw new UnsupportedOperationException(
              "MERGE INTO a VERSION AS OF relation is not allowed")
          val pk = TransactionalTable.open(spark, g.root).pk
          if (!isPkEquality(cond, pk, target, source))
            throw new UnsupportedOperationException(
              s"graft MERGE requires ON target.$pk = source.$pk")
          (matched, notMatched) match {
            case (Seq(UpdateStarAction(None)), Seq(InsertStarAction(None))) =>
              GraftMergeCommand(g.root, source, isDelete = false, pk)
            case (Seq(UpdateAction(None, as1, _)), Seq(InsertAction(None, as2)))
                if identityAssignments(as1) && identityAssignments(as2) =>
              GraftMergeCommand(g.root, source, isDelete = false, pk)
            case (Seq(DeleteAction(None)), Seq()) =>
              GraftMergeCommand(g.root, source, isDelete = true, pk)
            case _ =>
              throw new UnsupportedOperationException(
                "graft MERGE supports UPDATE SET * + INSERT * (upsert) or DELETE only")
          }
        case None => m
      }

    case a @ AppendData(target, query, _, _, _, _) if a.childrenResolved =>
      graftTarget(target) match {
        case Some(g) =>
          if (g.pinnedVersion.nonEmpty)
            throw new UnsupportedOperationException(
              "INSERT INTO a VERSION AS OF relation is not allowed")
          GraftAppendCommand(g.root, query)
        case None => a
      }
  }
}

final case class GraftMergeExec(cmd: GraftMergeCommand) extends LeafExecNode {
  override def output: Seq[Attribute] = Nil

  override def executeCollect(): Array[InternalRow] = { run; Array.empty }

  private lazy val run: Unit = {
    val spark = session
    val t = TransactionalTable.open(spark, cmd.root)
    val src = org.apache.spark.sql.graftshim.GraftShims.ofRows(spark, cmd.source)
    // SQL merges advance the replay fence by one (they are not stream
    // batches; interleaving with a checkpointed stream on the SAME table is
    // the caller's contract to avoid, as with any second writer).
    val batchId = t.snapshot.batchId + 1
    if (cmd.isDelete)
      t.merge(emptyLike(spark, t), src.select(col(cmd.pk)), batchId)
    else
      t.merge(src, emptyLike(spark, t).select(col(cmd.pk)), batchId)
  }

  private def emptyLike(spark: SparkSession, t: TransactionalTable) =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], t.schema)

  override protected def doExecute(): RDD[InternalRow] = {
    run
    sparkContext.emptyRDD
  }
}

final case class GraftAppendExec(cmd: GraftAppendCommand) extends LeafExecNode {
  override def output: Seq[Attribute] = Nil
  override def executeCollect(): Array[InternalRow] = { run; Array.empty }
  private lazy val run: Unit = {
    val t = TransactionalTable.open(session, cmd.root)
    t.append(org.apache.spark.sql.graftshim.GraftShims.ofRows(session, cmd.source))
  }
  override protected def doExecute(): RDD[InternalRow] = { run; sparkContext.emptyRDD }
}

class GraftMergeStrategy(spark: SparkSession) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case cmd: GraftMergeCommand =>
      GraftMergeExec(cmd) :: Nil
    case cmd: GraftAppendCommand =>
      GraftAppendExec(cmd) :: Nil
    case _ => Nil
  }
}

/** `spark.sql.extensions=graft.sql.GraftExtensions` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPostHocResolutionRule(s => new GraftMergeRule(s))
    ext.injectPlannerStrategy(s => new GraftMergeStrategy(s))
  }
}
