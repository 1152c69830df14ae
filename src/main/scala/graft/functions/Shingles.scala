package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Distinct word-n-gram shingles over a token array, as a native Catalyst
 * expression — the X2 near-dup hot path. The previous form (arrays_zip of n
 * shifted slices → transform → concat_ws → array_distinct) allocates n slice
 * arrays, a zip-struct per position, and dispatches an interpreted lambda per
 * shingle; this is ONE pass building each shingle with `UTF8String.concatWs`
 * and deduplicating in an insertion-ordered set, so the output equals
 * `array_distinct` of the position-ordered shingles exactly.
 *
 * Codegen emits a static call to [[Shingles.compute]] — the expression stays
 * inside WholeStageCodegen (no fallback plan break) while the kernel runs as
 * one JIT-friendly JVM method.
 *
 * Input contract (graft.ops.TextOps guarantees it): array<string> with no
 * null elements (the tokenizer filters empties and cannot produce nulls).
 */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override lazy val resolved: Boolean =
    childrenResolved && (child.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    Shingles.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Shingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {
  private val Space = UTF8String.fromString(" ")

  /** One-pass distinct shingling (first-occurrence order, = array_distinct). */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements() - (n - 1)
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i < m) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }
}
