package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}

import graft.table.{PartitionTransform, TransactionalTable}

/**
 * Persistent ANN index — the similarity twin of [[DedupIndex]], the
 * production posture at 100 TB: the coarse quantizer is NOT retrained per
 * query ([[SimilarityOps.ivfTopK]]'s per-call Lloyd loop); instead the IVF
 * state lives in two transactional engine tables under one root:
 *
 *  - `<root>/centroids` — the coarse quantizer, trained ONCE at [[create]]
 *    from the seed batch with the same deterministic md5-stride seeding rule
 *    as `ivfTopK(iters = 0)` (md5 is public arithmetic, so an external
 *    oracle replays centroid choice → assignment → probe → result
 *    bit-for-bit). k·dim doubles — driver-bounded by construction.
 *  - `<root>/assignments` — one row per indexed vector (unit-normalized),
 *    PARTITIONED BY identity(cell): a probe reads nprobe/cells of the index
 *    via manifest-level partition pruning, never the corpus.
 *
 * Ingest is incremental and exactly-once: [[appendBatch]] assigns the batch
 * against the FROZEN centroids (broadcast literal, map-only) and lands it as
 * ONE replay-fenced merge — a crashed/redelivered batch is a no-op. Like the
 * dedup index, unbounded ingest without maintenance would fan the per-probe
 * scan over ever more small files; `compactEvery = k` bin-packs the
 * assignment table every k-th batch, keeping file count bounded by the
 * cadence and probe cost flat in batch count.
 */
object AnnIndex {

  val AssignSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType), StructField("cell", LongType),
    StructField("v", ArrayType(DoubleType))))

  val CentroidSchema: StructType = StructType(Seq(
    StructField("cell", LongType), StructField("cv", ArrayType(DoubleType))))

  /** The two engine tables behind one index root. */
  final case class Handle(assignments: TransactionalTable,
      centroids: TransactionalTable) {
    def centroidVectors: Seq[Seq[Double]] = {
      val rows = centroids.scan().orderBy("cell").collect() // cells × dim, bounded
      rows.map(_.getSeq[Double](1).toSeq).toSeq
    }
  }

  private def unit(vecCol: String): Column = {
    val v = SimilarityOps.asDouble(col(vecCol))
    transform(v, x => x / sqrt(SimilarityOps.dot(v, v)))
  }

  private def simsTo(v: Column, cent: Seq[Seq[Double]]): Column =
    array(cent.map(ct => SimilarityOps.dot(v, typedlit(ct))): _*)

  /** argmax cell = first position of the max similarity (deterministic ties),
    * identical to the `ivfTopK` assignment rule. The sims array materializes
    * ONCE inside a lambda binding — embedding `simsTo` in both
    * `array_position` and `array_max` would evaluate the k×dim dot products
    * twice per ingested vector. */
  private def cellOf(v: Column, cent: Seq[Seq[Double]]): Column =
    // transform over a 1-element array = a let-binding in pure Column algebra
    element_at(transform(array(simsTo(v, cent)),
      s => (array_position(s, array_max(s)) - 1).cast("long")), 1)

  /**
   * Create the index tables and train the quantizer from `seedVecs` (the
   * first ingest batch): centroids are the up-to-`cells` lowest-id seed
   * vectors surviving the md5-stride filter (hash(vec_id) % (n/cells) = 0),
   * falling back to the `cells` lowest ids when the stride whiffs — exactly
   * [[SimilarityOps.seedCandidates]], so DuckDB replays the choice. The
   * seed batch itself is NOT indexed here; call [[appendBatch]] for it.
   */
  def create(spark: SparkSession, root: String, seedVecs: DataFrame, cells: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Handle = {
    require(cells > 0, "cells must be positive")
    val e = seedVecs.select(col(idCol).cast("long").as("vec_id"), unit(vecCol).as("v"))
    val n = e.count()
    val stride = math.max(1L, n / cells)
    var seeds = e.filter(pmod(TextOps.md5Hash60(col("vec_id")), lit(stride)) === 0)
      .orderBy("vec_id").limit(cells).select("vec_id", "v").collect()
    if (seeds.isEmpty)
      seeds = e.orderBy("vec_id").limit(cells).select("vec_id", "v").collect()
    val cent = TransactionalTable.create(spark, s"$root/centroids",
      CentroidSchema, pk = "cell", partitionCol = None)
    import spark.implicits._
    cent.append(seeds.zipWithIndex.map { case (r, i) =>
      (i.toLong, r.getSeq[Double](1))
    }.toSeq.toDF("cell", "cv"))
    val asg = TransactionalTable.create(spark, s"$root/assignments",
      AssignSchema, pk = "vec_id", partitionCol = Some("cell"))
    // One file per CELL per batch (not tasks × cells): the probe's partition
    // pruning then opens nprobe files per un-compacted batch, and the
    // compaction cadence has cells× less small-file debt to pay.
    asg.setWriteDistribution("hash")
    Handle(asg, cent)
  }

  def open(spark: SparkSession, root: String): Handle =
    Handle(TransactionalTable.open(spark, s"$root/assignments"),
      TransactionalTable.open(spark, s"$root/centroids"))

  /**
   * Index a batch: assign each vector to its nearest frozen centroid
   * (broadcast literal, map-only — no shuffle before the partitioned write)
   * and land the assignments as ONE replay-fenced merge under `batchId`.
   * Upserted vec_ids supersede their old assignment (re-ingest moves the
   * vector, CoW). `compactEvery > 0` bin-packs the assignment table every
   * k-th batch — same cadence contract as [[DedupIndex.appendBatch]].
   */
  def appendBatch(h: Handle, vecs: DataFrame, batchId: Long,
      compactEvery: Int = 0,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = graft.util.BatchStats.timed("ann_index_batch") {
    val spark = vecs.sparkSession
    val cent = h.centroidVectors
    val rows = vecs
      .select(col(idCol).cast("long").as("vec_id"), unit(vecCol).as("v"))
      .withColumn("cell", cellOf(col("v"), cent))
      .select("vec_id", "cell", "v")
    import spark.implicits._
    h.assignments.merge(rows, spark.emptyDataset[Long].toDF("vec_id"), batchId)
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      h.assignments.compact()
  }

  /**
   * Approximate per-query top-k against the INDEX: each query probes its
   * `nprobe` nearest cells and scores exactly only within them. The scan is
   * partition-pruned at the manifest — only the probed cells' files are
   * planned at all, nprobe/cells of the index regardless of corpus size.
   * Unit vectors throughout: dot = cosine, bit-identical to the oracle.
   */
  def probe(h: Handle, queries: DataFrame, k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cent = h.centroidVectors
    val q = queries.select(col(idCol).cast("long").as("qid"), unit(vecCol).as("qv"))
    // nprobe nearest cells per query (same expression shape as ivfTopK)
    val probes = q.withColumn("_sims", simsTo(col("qv"), cent))
      .withColumn("_cell", explode(slice(
        transform(array_sort(zip_with(col("_sims"),
            typedlit(cent.indices.toList),
            (s, i) => struct((-s).as("negs"), i.as("i")))),
          p => p.getField("i")),
        1, nprobe)))
      .select(col("qid"), col("qv"), col("_cell").cast("long").as("cell"))
    // Manifest-level cell pruning: queries are small (they are broadcast),
    // so the union of probed cells is driver-known and exact.
    val probedCells = probes.select("cell").distinct().collect()
      .map(_.getLong(0).toString).toSet
    val cand = h.assignments.scanPartitions(p => p.exists(probedCells))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("cos", SimilarityOps.dot(col("qv"), col("v")))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), col("vec_id"))
    cand.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("vec_id").as("neighbor_id"), col("rnk"))
  }
}
