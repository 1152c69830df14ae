package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * X6/E82: semi-structured columns via Spark 4's native VARIANT type — the
 * open-format answer to "JSON string column parsed on every access". The
 * reference's `props`-style payloads (and the multimodal metadata columns,
 * MultimodalOps) stay schemaless at ingest but get binary-encoded, typed,
 * path-indexed access afterwards:
 *
 *  - `parse_json` once at ingest → VARIANT column (binary, columnar-friendly)
 *  - `variant_get(v, '$.path', 'type')` typed extraction — codegen'd path
 *    walk over the binary encoding, no JSON re-parse per access
 *  - shredding: materialize hot paths as typed top-level columns so scans
 *    prune to plain Parquet columns (the Iceberg/Parquet variant-shredding
 *    play); cold long-tail paths stay in the variant
 *  - `variant_explode` for key-value fan-out, `schema_of_variant_agg` for
 *    corpus-level schema discovery
 *
 * All pure built-in expressions (whole-stage codegen; no UDFs). At 100 TB
 * every op here is a narrow projection — no shuffle — except
 * [[inferSchema]], a single scalar aggregate.
 */
object VariantOps {

  /** Parse a JSON string column to VARIANT (invalid JSON → error; use
    * [[tryParse]] for NULL-on-invalid ingest). */
  def parse(df: DataFrame, jsonCol: String, out: String = "var"): DataFrame =
    df.withColumn(out, parse_json(col(jsonCol)))

  /** NULL-tolerant parse for untrusted ingest feeds (CDC DLQ re-processing). */
  def tryParse(df: DataFrame, jsonCol: String, out: String = "var"): DataFrame =
    df.withColumn(out, try_parse_json(col(jsonCol)))

  /** Typed path extraction: `(outName, path, sqlType)` triples, e.g.
    * `("k", "$.k", "bigint")`. Each becomes a typed top-level column.
    * Column-API form of `variant_get` — paths are plain string ARGUMENTS,
    * never spliced into SQL text (a path containing a quote is data, not a
    * parse error). */
  def shred(df: DataFrame, varCol: String,
      fields: Seq[(String, String, String)]): DataFrame =
    fields.foldLeft(df) { case (d, (name, path, tpe)) =>
      d.withColumn(name, variant_get(col(varCol), path, tpe))
    }

  /** Key-value fan-out of a variant object: one row per top-level field,
    * `(keep..., pos, key, value)` with `value` still VARIANT (extract typed
    * leaves with `variant_get(value, '$', type)`). `variant_explode` is a
    * table function in Spark 4 — correlated through a lateral join, which
    * the planner fuses into a Generate (no actual join at runtime). */
  def explodeFields(df: DataFrame, varCol: String, keep: Seq[String]): DataFrame = {
    require(!(keep :+ varCol).exists(Seq("pos", "key", "value").contains),
      "keep/variant columns may not be named pos/key/value (variant_explode outputs)")
    // project first so base-table columns can't collide with the TVF output
    val slim = df.select((keep :+ varCol).map(col): _*)
    slim.lateralJoin(slim.sparkSession.tvf.variant_explode(col(varCol).outer()))
      .select(keep.map(col) :+ col("pos") :+ col("key") :+ col("value"): _*)
  }

  /** Corpus-level merged schema of a variant column (one scalar aggregate):
    * the discovery step before deciding which paths to shred. */
  def inferSchema(df: DataFrame, varCol: String): String =
    df.agg(schema_of_variant_agg(col(varCol)).as("schema"))
      .head().getString(0)
}
