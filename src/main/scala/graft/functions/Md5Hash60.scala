package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native codegen'd 60-bit md5 hash — the deterministic-hash kernel behind
 * every oracle-replayable pipeline (fingerprints, samplers, SimHash, the
 * near-dup index). Bit-identical to the built-in chain
 * `conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT` (the first 15 hex
 * nibbles of the digest = the top 60 bits of its first 8 bytes), but
 * computed straight from the digest bytes: the chain materializes a 32-char
 * hex string, substrings it, and re-parses it through radix conversion PER
 * ROW — three string allocations the corpus-scale explode paths pay
 * millions of times per query. DuckDB stays
 * `CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)`.
 */
case class Md5Hash60(child: Expression) extends UnaryExpression {

  override lazy val resolved: Boolean =
    childrenResolved && child.dataType == StringType
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_60"

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

object Md5Hash60 {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits (first 15 hex nibbles) of md5(bytes of `s`), as a
    * non-negative long. */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val top =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
        ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top >>> 4
  }
}
