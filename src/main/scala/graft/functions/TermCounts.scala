package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Per-document term frequencies over a token array, as a native Catalyst
 * expression: `array<string> → array<struct<term string, tf bigint>>` with
 * one entry per DISTINCT token (first-occurrence order).
 *
 * This is the TF-IDF hot path. The declarative form — `explode(tokens)` then
 * `groupBy(doc_id, term).count()` — pays a full shuffle of every exploded
 * token keyed on (doc_id, term) just to count duplicates that all live in the
 * SAME input row. Counting in-row makes the tf stage map-only; the pairs that
 * leave the operator are already distinct per document, so the downstream
 * document-frequency aggregate exchanges strictly less data, and no
 * (doc_id, term) exchange exists at all. At 100 TB that deletes the widest
 * shuffle of the pipeline (raw token count ≈ corpus size) and replaces it
 * with a per-row hash loop.
 *
 * Codegen emits a static call to [[TermCounts.compute]] — stays inside
 * WholeStageCodegen (no fallback plan break), same pattern as [[Shingles]].
 *
 * Input contract (graft.ops.TextOps.tokens guarantees it): array<string>
 * with no null elements.
 */
case class TermCounts(child: Expression) extends UnaryExpression {

  override lazy val resolved: Boolean =
    childrenResolved && (child.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_term_counts"

  override protected def nullSafeEval(input: Any): Any =
    TermCounts.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TermCounts.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
}

object TermCounts {
  /** One-pass in-row term counting (insertion-ordered, so output order is
    * deterministic: first occurrence position). */
  def compute(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val counts = new java.util.LinkedHashMap[UTF8String, Long]()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      counts.merge(t, 1L, (a, b) => a + b)
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(Array[Any](e.getKey, e.getValue)): InternalRow
      j += 1
    }
    new GenericArrayData(out)
  }
}
