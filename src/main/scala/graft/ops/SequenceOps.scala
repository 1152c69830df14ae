package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Order-dependent sequence operators done WITHOUT a single-partition global
 * window. `Window.orderBy(x)` with no partitionBy funnels the whole dataset
 * through one task — the canonical Spark scale-killer. [[prefixSum]] is the
 * two-phase alternative (per-partition partials + broadcast offsets), the same
 * structure as a parallel scan: range-shuffle once, then every partition works
 * independently.
 *
 * Built on it, [[packBins]] assigns documents to fixed-capacity training
 * sequences ("pack ~4096 tokens per sequence", the standard LLM pretraining
 * packing step) in deterministic key order — at 100 TB this is one range
 * shuffle + one tiny driver collect of per-partition sums, not a total sort
 * through one reducer.
 */
object SequenceOps {

  /**
   * Global running sum of `valueCol` in `orderCol` order (inclusive), emitted
   * as column `cumsum`. `orderCol` must be unique (it defines the total
   * order). Three passes over the data, none through a single partition:
   * (0) one quantile pass fixes explicit range cut points, making the bucket
   * id a deterministic monotone function of the data; (1) per-bucket sums are
   * collected (np longs — bytes, not data); (2) each bucket computes a local
   * running sum in parallel and adds its broadcast exclusive-prefix offset.
   */
  def prefixSum(df: DataFrame, orderCol: String, valueCol: String,
      numPartitions: Int = 0): DataFrame = {
    val spark0 = df.sparkSession
    val np = if (numPartitions > 0) numPartitions
      else spark0.conf.get("spark.sql.shuffle.partitions", "200").toInt
    // Phase 0: pick np-1 explicit range cut points ONCE (approxQuantile, one
    // pass). The bucket id is then a deterministic monotone function of the
    // DATA — unlike repartitionByRange, whose sampled boundaries change per
    // job (the sampler is seeded by the RDD id), which would make phase 1's
    // and phase 2's partition assignments disagree.
    val cuts =
      if (np <= 1) Array.empty[Double]
      else df.stat.approxQuantile(orderCol,
        (1 until np).map(_.toDouble / np).toArray, 0.001).distinct.sorted
    // bucket id = #cuts below the value — ONE array HOF, not an np-deep
    // when-chain (which at real-scale partition counts (1000+) would nest
    // past Janino's method-size comfort and fall out of codegen)
    val bucket =
      if (cuts.isEmpty) lit(0)
      else size(filter(typedLit(cuts.toSeq), c => col(orderCol).cast("double") > c))
    val ranged = df.withColumn("_gpid", bucket)
    // Phase 1: per-bucket sums — np longs to the driver, not data.
    val partials = ranged.groupBy(col("_gpid"))
      .agg(sum(col(valueCol)).as("_gsum"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // Bucket ids ascend with orderCol (monotone bucket function), so the
    // exclusive prefix over ascending bucket id is each bucket's offset.
    val pids = partials.keys.toSeq.sorted
    val offsets = pids.zip(pids.scanLeft(0L)((acc, p) => acc + partials(p)).dropRight(1)).toMap
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = offsets.toSeq.toDF("_gpid", "_goff")
    // Phase 2: bucket-LOCAL running sum (window partitioned by _gpid — no
    // single-partition exchange) + broadcast offset add.
    val w = Window.partitionBy(col("_gpid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .withColumn("_glocal", sum(col(valueCol)).over(w))
      .join(broadcast(offsetDf), Seq("_gpid"))
      .withColumn("cumsum", col("_glocal") + col("_goff"))
      .drop("_gpid", "_glocal", "_goff")
  }

  /**
   * Greedy fixed-capacity packing: documents in `orderCol` order are laid end
   * to end and cut into bins of `capacity` tokens; a document's bin is where
   * its FIRST token lands (documents straddle bin boundaries — the standard
   * packed-pretraining layout, where the attention mask handles the seam).
   * Emits `bin` alongside the input columns.
   */
  def packBins(df: DataFrame, orderCol: String, sizeCol: String,
      capacity: Long, numPartitions: Int = 0): DataFrame =
    prefixSum(df, orderCol, sizeCol, numPartitions)
      .withColumn("bin", expr(s"(cumsum - $sizeCol) div $capacity"))

  /**
   * Deterministic GLOBAL SHUFFLE into training shards — the "write shuffled
   * shards" step every pretraining pipeline runs before packing: examples
   * must reach the trainer in a fixed pseudo-random order that is
   * reproducible run-to-run (md5 of the key, not Math.random) and
   * restartable mid-epoch (shard + position addresses any example).
   *
   * Scale shape: `shard = md5(key) mod nShards` is a map-only column; the
   * position is a window PARTITIONED BY shard (each shard sorts locally
   * after one hash exchange) — never a global `ORDER BY` through a single
   * reducer. 100 TB into 10k shards = 10k independent ~10 GB local sorts.
   * Returns the input plus (shard, pos) — pos is 0-based within the shard,
   * ordered by (hash, key); the hash is dropped (recomputable).
   */
  def globalShuffle(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val h = graft.ops.TextOps.md5Hash60(col(keyCol))
    val w = Window.partitionBy(col("shard")).orderBy(col("_h"), col(keyCol))
    df.withColumn("_h", h)
      .withColumn("shard", pmod(col("_h"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w) - 1)
      .drop("_h")
  }
}
