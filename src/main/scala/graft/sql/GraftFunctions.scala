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

/** SQL-callable `md5_60(str)` — the engine's deterministic sampling/
  * sharding/fingerprint hash (graft.functions.Md5Hash60), exposed through
  * the FunctionCatalog so SQL users can REPRODUCE every hash-gated decision
  * (mod samples, shard ids, dedup fingerprints) without the engine API:
  * `SELECT graft.system.md5_60(doc_id_str)`. The magic `invoke` method lets
  * Spark inline the call in codegen (no InternalRow boxing per row). */
object GraftMd560Function extends UnboundFunction {
  override def name(): String = "md5_60"
  override def description(): String =
    "md5_60(str): first 60 bits of md5(str) as a non-negative BIGINT — " +
      "the engine's deterministic sampling/sharding hash"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1 &&
      inputType.fields(0).dataType == org.apache.spark.sql.types.StringType,
      s"md5_60 expects (string), got ${inputType.catalogString}")
    GraftMd560Bound
  }
}

case object GraftMd560Bound extends ScalarFunction[java.lang.Long] {
  override def inputTypes(): Array[DataType] =
    Array(org.apache.spark.sql.types.StringType)
  override def resultType(): DataType = org.apache.spark.sql.types.LongType
  override def name(): String = "md5_60"
  override def canonicalName(): String = "graft.md5_60(string)"
  override def isResultNullable: Boolean = false
  /** Codegen magic method (ScalarFunction.MAGIC_METHOD_NAME). */
  def invoke(s: org.apache.spark.unsafe.types.UTF8String): Long =
    graft.functions.Md5Hash60.hash(s)
  override def produceResult(input: InternalRow): java.lang.Long =
    invoke(input.getUTF8String(0))
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
