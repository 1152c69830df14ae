package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.table.DeletionVector

/**
 * Deletion-vector probe carried INSIDE the scan filter: serialized bitmaps
 * ride in the plan (one blob per target data file, bounded by delete traffic
 * between folds — the same bound the broadcast anti-join path has) and each
 * task probes them at O(1) per row, so a DV-masked scan pays a codegen'd
 * filter instead of a join. Deserialization is lazy per JVM and the
 * file→vector resolution is memoized per consecutive file run — `file` is
 * `_metadata.file_path`, constant across each parquet split, so the string
 * materialization and map lookup amortize to once per split.
 */
final class DvLookup(val blobs: Map[String, Array[Byte]]) extends Serializable {
  @transient private lazy val dvs: Map[String, DeletionVector] =
    blobs.map { case (f, b) => f -> DeletionVector.deserialize(b) }

  // Single-entry memo for the per-split-constant file path. Written as one
  // immutable pair so a (harmless) cross-thread race can never pair one
  // task's key with another's vector.
  @transient @volatile private var memo: (UTF8String, DeletionVector) = null

  def contains(file: UTF8String, pos: Long): Boolean = {
    val m = memo
    val dv =
      if (m != null && m._1.equals(file)) m._2
      else {
        val resolved = dvs.getOrElse(file.toString, null)
        memo = (file.clone(), resolved)
        resolved
      }
    dv != null && dv.contains(pos)
  }

  override def hashCode(): Int = blobs.keySet.hashCode()
  override def equals(o: Any): Boolean = o match {
    case l: DvLookup =>
      l.blobs.keySet == blobs.keySet &&
        blobs.forall { case (k, v) => java.util.Arrays.equals(v, l.blobs(k)) }
    case _ => false
  }
}

/** `dv.contains(file, pos)` as a codegen'd Catalyst expression (extension
  * tier (b)): true iff the deletion vector for data file `file` masks row
  * ordinal `pos`. Rows of files with no pending DV are never masked. */
case class DvContains(left: Expression, right: Expression, lookup: DvLookup)
  extends BinaryExpression {

  override lazy val resolved: Boolean =
    childrenResolved && left.dataType == StringType && right.dataType == LongType
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_dv_contains"

  override protected def nullSafeEval(f: Any, p: Any): Any =
    lookup.contains(f.asInstanceOf[UTF8String], p.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvLookup", lookup, classOf[DvLookup].getName)
    nullSafeCodeGen(ctx, ev, (f, p) => s"${ev.value} = $ref.contains($f, $p);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DvContains =
    copy(left = newLeft, right = newRight)
}
