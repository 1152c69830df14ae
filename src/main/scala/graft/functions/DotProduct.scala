package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Native codegen'd dot product over two `array<double>` columns — the X3
 * similarity hot path as a Catalyst `Expression` (brief extension tier (b):
 * a codegen Expression beats a HOF fold beats a UDF). `doGenCode` emits a
 * tight primitive loop — no per-element lambda dispatch, no boxing — with the
 * same left-to-right accumulation order as the HOF/oracle form, so results
 * stay bit-identical.
 *
 * Null semantics: NULL if either array is NULL (BinaryExpression default);
 * mismatched lengths fold over the common prefix (zip semantics, matching
 * `zip_with` + sum over non-null pairs for equal-length inputs, which is the
 * only shape the engine produces).
 */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  // Internal-use expression: graft.ops always supplies array<double> inputs
  // (SimilarityOps.asDouble), so a resolution-time assert replaces the
  // ExpectsInputTypes machinery (non-public in Spark 4).
  override lazy val resolved: Boolean =
    childrenResolved && Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
