package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.table.TransactionalTable

/**
 * Delete-aware SQL reads over merge-on-read tables — the view-rewrite that
 * makes `SELECT ... FROM graft.db.t` correct while equality-delete files are
 * pending (Iceberg v2's read path; the reference's product surface is "query
 * the live table via SQL whatever the write mode", `README.md:507-513`).
 *
 * A [[GraftSqlTable]] relation flagged `morPending` is substituted during
 * analysis with the engine's delete-aware scan plan
 * (`TransactionalTable.scanWithDeletes`: data files read with their embedded
 * `_seq` commit stamp, anti-joined against the broadcast delete set), pinned
 * to the SAME snapshot version the relation was resolved at — so the rewrite
 * never observes a newer commit than the original resolution, and
 * `VERSION AS OF` time travel composes. Output attributes keep the relation's
 * exprIds (per-column Alias), so references above the relation stay valid.
 *
 * Runs as a post-hoc resolution rule AFTER [[GraftMergeRule]] (injection
 * order): `MERGE INTO` / `INSERT INTO` targets are already rewritten into
 * engine commands by then, while a MOR table read in a merge SOURCE is
 * correctly substituted here.
 */
class GraftMorScanRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def needsEngineScan(r: DataSourceV2Relation): Boolean = r.table match {
    // Same substitution serves RENAMEd columns: the engine scan coalesces
    // old-name files into the live column (TransactionalTable.readParquet).
    case g: GraftSqlTable => g.morPending || g.renamesPending
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case r: DataSourceV2Relation if needsEngineScan(r) =>
      val g = r.table.asInstanceOf[GraftSqlTable]
      val t = TransactionalTable.open(spark, g.root)
      // The relation's schema (live for plain reads, snapshot-stamped for
      // time travel) drives the rewrite — never re-derive it here, or an
      // ALTER between resolution and rewrite could skew the column set.
      val scan = t.scanAt(g.loadedVersion, r.table.schema())
      val analyzed = org.apache.spark.sql.graftshim.GraftShims.planOf(scan)
      Project(
        analyzed.output.zip(r.output).map { case (n, o) =>
          Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier)
        },
        analyzed)
    // `db.t.lineage` metadata table: the engine's row-lineage scan (delete-
    // aware, inheritance-resolving), pinned to the relation's version.
    case r: DataSourceV2Relation if r.table.isInstanceOf[LineageMetaTable] =>
      val l = r.table.asInstanceOf[LineageMetaTable]
      val t = TransactionalTable.open(spark, l.root)
      val analyzed = org.apache.spark.sql.graftshim.GraftShims.planOf(
        t.scanLineage(l.pinnedVersion))
      Project(
        analyzed.output.zip(r.output).map { case (n, o) =>
          Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier)
        },
        analyzed)
  }
}
