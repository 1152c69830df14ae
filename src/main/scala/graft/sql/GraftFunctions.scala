package graft.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/**
 * The catalog's `bucket` function — the FunctionCatalog half of
 * storage-partitioned joins (SPJ). Spark resolves each side's
 * `bucket(n, col)` partition transform against the table's catalog and
 * considers two scans co-partitioned only when both bind to a function with
 * the SAME canonical name and bucket count; the join then needs no shuffle.
 * This is exactly how Iceberg registers its bucket function for SPJ.
 *
 * Semantics are the WRITE side's transform, bit for bit
 * (`PartitionTransform.Bucket.valueExpr`, `Partitioning.scala:63-70`):
 * `pmod(xxhash64(col), n)` with Spark's default seed 42 — one shared
 * definition domain, so a bucket id computed here can never disagree with a
 * bucket id stamped into a file path or manifest.
 */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): pmod(xxhash64(col, 42), n) — the engine's bucket partition transform"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket expects (numBuckets, col), got ${inputType.catalogString}")
    GraftBucketBound(inputType.fields(1).dataType)
  }
}

final case class GraftBucketBound(colType: DataType)
    extends ScalarFunction[java.lang.Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, colType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  /** Type-qualified like Iceberg's (`iceberg.bucket(int)`): co-partitioning
    * requires identical hashing, and xxhash64 hashes each type differently. */
  override def canonicalName(): String = s"graft.bucket(${colType.catalogString})"
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): java.lang.Integer = {
    val n = input.getInt(0)
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      input.get(1, colType), colType, 42L)
    (((h % n) + n) % n).toInt
  }
}
