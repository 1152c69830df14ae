package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.table.TransactionalTable

/**
 * Incremental training-data EXPORT (E184) — the publication step of the
 * corpus pipeline: the docs added or re-written between two table versions
 * (the `changes(v0, v1)` insert images) are deterministically shuffled
 * into shards, packed into fixed-capacity token bins per shard, and
 * written as one immutable parquet export directory, with a FENCED
 * manifest row recording the interval. Delete images publish as a
 * TOMBSTONE list alongside (a doc retracted after an earlier export
 * cannot be un-published from immutable shards; trainers subtract
 * tombstones at read time — the standard additive-dataset contract).
 *
 * Scale shape: shard = md5(id) mod nShards is a map-only column; ordering
 * and the running token sum are windows PARTITIONED BY shard (one hash
 * exchange, nShards independent local sorts — 100 TB into 10k shards is
 * 10k ~10 GB sorts, never a global ORDER BY); the parquet write is
 * partitioned by shard so a trainer addresses any (shard, bin) directly.
 *
 * Idempotence: the manifest append is fenced on `toVersion` — a re-run of
 * the same interval recomputes the identical assignment (md5 order, no
 * randomness) and overwrites the same directory with the same bytes, and
 * the manifest does not double-append. Crash mid-write retries into the
 * same overwrite.
 */
object ExportOps {

  final case class ExportResult(assignment: DataFrame, tombstones: DataFrame,
      exported: Boolean, dir: String)

  val ManifestSchemaDdl: String =
    "to_v LONG, from_v LONG, n_docs LONG, n_tokens LONG, n_tombstones LONG, " +
      "n_shards INT, capacity LONG"

  private val ExportWriter = "export"

  /** The manifest engine table under `exportRoot/_manifest` (created on
    * first use; PK = to_v — one row per published interval end). */
  def manifest(spark: SparkSession, exportRoot: String): TransactionalTable = {
    val root = s"$exportRoot/_manifest"
    if (TransactionalTable.exists(root)) TransactionalTable.open(spark, root)
    else TransactionalTable.create(spark, root,
      StructType.fromDDL(ManifestSchemaDdl), "to_v", None)
  }

  /** Publish everything the manifest has not seen yet: the interval runs
    * from the manifest's export fence (the last published `to_v`; 0 on a
    * virgin root — the first call publishes the whole corpus) to the
    * corpus head. An empty interval returns without touching disk — the
    * idempotent shape a streaming pipeline calls once per micro-batch
    * ([[graft.stream.CorpusPipeline]] `exportEvery`): replayed batches and
    * crash-skipped publications absorb into the next interval. */
  def exportLatest(corpus: TransactionalTable, exportRoot: String,
      nShards: Int, capacity: Long,
      idCol: String = "doc_id", textCol: String = "text"): ExportResult = {
    val spark = corpus.spark
    val m = manifest(spark, exportRoot)
    val from = math.max(0L, m.snapshot.writerFences.getOrElse(ExportWriter, 0L))
    val to = corpus.currentVersion
    if (to <= from) {
      import spark.implicits._
      ExportResult(spark.emptyDataset[Long].toDF(idCol),
        spark.emptyDataset[Long].toDF(idCol), exported = false,
        dir = s"$exportRoot/exp_${from}_$from")
    } else exportDelta(corpus, exportRoot, from, to, nShards, capacity,
      idCol, textCol)
  }

  def exportDelta(corpus: TransactionalTable, exportRoot: String,
      fromVersion: Long, toVersion: Long, nShards: Int, capacity: Long,
      idCol: String = "doc_id", textCol: String = "text",
      /** Row size for bin packing: whitespace token count by default (the
        * text-corpus contract); pass e.g. `length(_)` for BYTE-budget
        * shards over a BINARY media corpus (E192). */
      sizeOf: Column => Column = c => size(TextOps.tokens(c)).cast("long"))
      : ExportResult = {
    require(nShards > 0 && capacity > 0, "nShards and capacity must be positive")
    val spark = corpus.spark
    val m = manifest(spark, exportRoot)
    val delta = corpus.changes(fromVersion, toVersion)
    val inserts = delta.where(col("_change_type") === "insert").drop("_change_type")
    val tombs = delta.where(col("_change_type") === "delete")
      .select(col(idCol)).distinct()
      // an id re-inserted in the SAME interval is alive, not tombstoned
      .join(inserts.select(col(idCol)), Seq(idCol), "left_anti")
    val toks = inserts.select(col(idCol), col(textCol),
      sizeOf(col(textCol)).cast("long").as("n_tokens"))
    // deterministic shard + in-shard position (md5 order), then the
    // per-shard running token sum cuts capacity-sized bins — both windows
    // share the shard partitioning: ONE exchange end to end
    val sharded = SequenceOps.globalShuffle(toks, idCol, nShards)
    val w = Window.partitionBy(col("shard")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val assignment = sharded
      .withColumn("_c", sum(col("n_tokens")).over(w))
      .withColumn("bin", ((col("_c") - col("n_tokens")) / capacity).cast("long"))
      .drop("_c")
      .select(col("shard"), col("bin"), col("pos"), col(idCol),
        col("n_tokens"), col(textCol))
    val dir = s"$exportRoot/exp_${fromVersion}_$toVersion"
    val fenced = m.snapshot.writerFences.getOrElse(ExportWriter, -1L) >= toVersion
    if (!fenced) {
      assignment.write.mode("overwrite").partitionBy("shard").parquet(dir)
      tombs.write.mode("overwrite").parquet(s"$dir/_tombstones")
      // manifest stats from the PUBLISHED parquet (reads only n_tokens),
      // not a second computation of the assignment plan. The schema is
      // passed EXPLICITLY: a deletes-only interval publishes an empty data
      // dir (tombstones only), and schema inference over zero files throws —
      // the explicit-schema read returns 0 rows and the manifest row still
      // lands with n_docs = 0 (ADVICE r15).
      val stats = spark.read.schema(assignment.schema).parquet(dir).agg(
        count(lit(1)).as("n_docs"), coalesce(sum("n_tokens"), lit(0L)).as("n_tokens"))
        .collect()(0)
      val row = spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(
          toVersion, fromVersion, stats.getLong(0), stats.getLong(1),
          tombs.count(), nShards, capacity)),
        StructType.fromDDL(ManifestSchemaDdl))
      m.append(row, batchId = toVersion, writerId = Some(ExportWriter))
    }
    ExportResult(assignment, tombs, exported = !fenced, dir = dir)
  }
}
