package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._

/**
 * Substitutes a [[DistributedMetaTable]] relation (`table.entries`,
 * `table.all_files`) with its distributed aggregation plan: a
 * `groupBy(path)` min/max over the raw chunk-partitioned scan
 * ([[ChunkEntriesTable]]). The per-path live version range falls out of
 * chunk reuse — a path's first retained version is the min over the chunks
 * containing it of the chunk's first referencing version (write-once file
 * paths are never re-added, so ranges are contiguous) — and Spark performs
 * the aggregation as an ordinary shuffle: the driver plans chunk refs,
 * never entries. Same substitution idiom (and exprId preservation) as
 * [[GraftMorScanRule]].
 */
class GraftMetadataScanRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case r: DataSourceV2Relation if r.table.isInstanceOf[DistributedMetaTable] =>
      val d = r.table.asInstanceOf[DistributedMetaTable]
      val raw = org.apache.spark.sql.graftshim.GraftShims.ofRows(
        spark, DataSourceV2Relation.create(d.raw, None, None))
      val df = d.kind match {
        case "all_files" =>
          raw.where(col("kind") === "data")
            .groupBy(col("path"), col("partition"), col("pk_min"), col("pk_max"),
              col("n_rows"), col("n_bytes"), col("spec_id"))
            .agg(min(col("first_ref")).as("first_version"),
              max(col("last_ref")).as("last_version"))
        case "entries" =>
          raw.groupBy(col("path"), col("kind"), col("n_rows"), col("n_bytes"))
            .agg(min(col("first_ref")).as("first_v"), max(col("last_ref")).as("last_v"),
              max(col("in_parent")).as("in_par"))
            // live = referenced by the current snapshot (a removed path's
            // chunks are never referenced at the current version)
            .where(col("last_v") === d.currentVersion)
            .select(
              when(col("kind") === "data",
                when(col("in_par") === 1L, 0L).otherwise(1L))
                .cast("bigint").as("status"),
              when(col("kind") === "data", col("first_v")).as("added_version"),
              col("path"), col("kind"), col("n_rows"), col("n_bytes"))
        case "partitions" =>
          raw.groupBy(col("partition"), col("spec_id"))
            .agg(count(lit(1)).as("n_files"), sum(col("n_rows")).as("n_rows"),
              sum(col("n_bytes")).as("n_bytes"))
            .select(col("partition"), col("spec_id"), col("n_files"),
              col("n_rows"), col("n_bytes"))
        case other =>
          throw new IllegalStateException(s"unknown distributed metadata kind $other")
      }
      val analyzed = org.apache.spark.sql.graftshim.GraftShims.planOf(df)
      Project(
        analyzed.output.zip(r.output).map { case (n, o) =>
          Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier)
        },
        analyzed)
  }
}

object GraftMetadataScanRule {

  /** Driver-side twin of the distributed plans above, for
    * [[DistributedMetaTable]]'s no-extensions fallback scan. Input rows are
    * in [[ChunkEntryMode.HistSchema]] order. */
  def aggregateLocally(kind: String, raws: Seq[Array[Any]], cur: Long): Seq[Array[Any]] =
    kind match {
      case "all_files" =>
        raws.filter(_(6) == "data").groupBy(_(0)).values.map { occ =>
          val first = occ.iterator.map(_(8).asInstanceOf[Long]).min
          val last = occ.iterator.map(_(9).asInstanceOf[Long]).max
          val r = occ.head
          Array[Any](r(0), r(1), r(2), r(3), r(4), r(5), r(7), first, last)
        }.toSeq
      case "entries" =>
        raws.groupBy(_(0)).values.flatMap { occ =>
          val first = occ.iterator.map(_(8).asInstanceOf[Long]).min
          val last = occ.iterator.map(_(9).asInstanceOf[Long]).max
          val inParent = occ.exists(_(10).asInstanceOf[Long] == 1L)
          if (last != cur) None
          else {
            val r = occ.head
            val isData = r(6) == "data"
            Some(Array[Any](
              if (isData) (if (inParent) 0L else 1L) else null,
              if (isData) first else null,
              r(0), r(6), r(4), r(5)))
          }
        }.toSeq
      case "partitions" =>
        // FILES-schema rows: (path, partition, pk_min, pk_max, n_rows,
        // n_bytes, kind, spec_id)
        raws.groupBy(r => (r(1), r(7))).toSeq.map { case ((p, sid), fs) =>
          Array[Any](p, sid, fs.size.toLong,
            fs.iterator.map(_(4).asInstanceOf[Long]).sum,
            fs.iterator.map(_(5).asInstanceOf[Long]).sum)
        }
      case other =>
        throw new IllegalStateException(s"unknown distributed metadata kind $other")
    }
}
