package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * X3: similarity search over an embedding column (`array<float>`).
 *
 * Two paths, per the 100 TB design brief:
 *  - [[cosineTopK]] — exact brute force: broadcast the (small) query set,
 *    one scan of the corpus, per-query top-k. Correctness baseline and the
 *    DuckDB-oracled surface.
 *  - [[annTopK]] — LSH-bucketed approximate path: L independent
 *    random-hyperplane signatures; candidates are corpus vectors sharing any
 *    signature with the query. At 100 TB this joins on (table, signature) —
 *    a hash shuffle that co-locates only plausibly-similar vectors — instead
 *    of scoring queries × corpus.
 *
 * All math is element-wise-exact float→double widening, then sequential-fold
 * dot products (deterministic; bit-identical to DuckDB's list_dot_product).
 * No UDFs — higher-order functions keep everything in codegen.
 */
object SimilarityOps {

  /** Exact float→double widening of an `array<float>` column. */
  def asDouble(vec: Column): Column = transform(vec, x => x.cast("double"))

  /** Dot product as a native codegen'd Catalyst expression
    * (graft.functions.DotProduct): tight primitive loop, no per-element
    * lambda dispatch — same left-to-right accumulation as [[dotHof]], so
    * results are bit-identical. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShims
    GraftShims.column(graft.functions.DotProduct(
      GraftShims.expression(a), GraftShims.expression(b)))
  }

  /** Reference HOF form of the dot product (zip_with + sequential fold) —
    * kept for equivalence testing against the codegen expression. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity, computed as dot/(sqrt(dot)·sqrt(dot)) — the same
    * association order as the oracle SQL so results are bit-equal. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /**
   * Exact per-query cosine top-k. `queries` must be small (it is broadcast);
   * the corpus is scanned once. The final top-k is a single shuffle of the
   * scored pairs on the query id.
   */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("neighbor_id"), col("rnk"))
  }

  /** Deterministic ±1 hyperplanes for one LSH table (fixed seed per table). */
  private def planes(dim: Int, nBits: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nBits)(Seq.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** nBits-bit random-hyperplane signature of a double vector column. */
  def hyperplaneSignature(vec: Column, dim: Int, nBits: Int, seed: Long): Column =
    planes(dim, nBits, seed).zipWithIndex.map { case (p, i) =>
      val proj = dot(vec, typedlit(p))
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** ±1 hyperplanes derived from md5 instead of scala Random: the sign for
    * (table, bit, dim) is +1 iff the first md5 hex digit of "t_b_i" is < 8.
    * md5 is public arithmetic any engine reproduces bit-for-bit, so an
    * EXTERNAL oracle (DuckDB) can rebuild the exact planes → signatures →
    * candidate sets → the approximate result itself. This is what lets
    * [[annTopK]] be hash-verified by the driver as an approximate query,
    * rather than only spot-checked for plausibility. */
  private[graft] def md5Sign(t: Int, b: Int, i: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${t}_${b}_${i}".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if (((d(0) >> 4) & 0xf) < 8) 1.0 else -1.0
  }
  private[graft] def md5Planes(dim: Int, nBits: Int, table: Int): Seq[Seq[Double]] =
    Seq.tabulate(nBits)(b => Seq.tabulate(dim)(i => md5Sign(table, b, i)))

  /** Signature of a double-vector column against explicit ±1 planes. */
  def planesSignature(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedlit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /**
   * Approximate cosine top-k: candidates share at least one of `tables`
   * random-hyperplane signatures with the query (LSH OR-construction), then
   * exact cosine + top-k among candidates only. Recall grows with `tables`,
   * candidate volume with 2^-nBits; both are knobs per corpus density.
   */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      nBits: Int = 6, tables: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {

    def withSignatures(df: DataFrame, id: String, v: String): DataFrame = {
      val sigs = array((0 until tables).map { t =>
        struct(lit(t).as("table"),
          planesSignature(col(v), md5Planes(dim, nBits, t)).as("sig"))
      }: _*)
      df.select(col(id), col(v), explode(sigs).as("ts"))
        .select(col(id), col(v), col("ts.table").as("table"), col("ts.sig").as("sig"))
    }

    val c = withSignatures(
      corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv")),
      "neighbor_id", "cv")
    val q = withSignatures(
      queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv")),
      "qid", "qv")

    val cands = c.join(broadcast(q), Seq("table", "sig"))
      .filter(col("qid") =!= col("neighbor_id"))
      .select("qid", "qv", "neighbor_id", "cv")
      .dropDuplicates("qid", "neighbor_id") // OR over tables
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), col("neighbor_id"))
    cands.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("neighbor_id"), col("rnk"))
  }

  /**
   * IVF (inverted-file) approximate top-k — the second scale path beside
   * [[annTopK]]'s hyperplane LSH. A small k-means-lite coarse quantizer
   * (deterministic: strided seeding + fixed Lloyd iterations, computed with
   * DataFrame aggregations) assigns every corpus vector to a cell; a query
   * probes its `nprobe` nearest cells and scores exactly only within them.
   * At 100 TB the corpus is partitioned by cell id, so a query touches
   * nprobe/cells of the data — the centroid table (cells × dim doubles) is a
   * driver-size literal.
   */
  /**
   * Quantizer seed rows: deterministic hash-stride sampling — keep vectors
   * whose id hashes to residue 0 mod (n/cells), a fully distributed filter.
   * (Previously a `row_number` over an unpartitioned Window, which funnels
   * the whole corpus through ONE task — a guaranteed straggler/OOM at scale.)
   * The final orderBy+limit is TakeOrderedAndProject over the ~`cells`
   * surviving rows, not a global sort of the corpus.
   */
  private[graft] def seedCandidates(c: DataFrame, cells: Int, n: Long): DataFrame = {
    val stride = math.max(1L, n / cells)
    // md5Hash60 (not xxhash64) so the seed-vector choice — and therefore the
    // whole quantizer — is reproducible by the DuckDB oracle.
    c.filter(pmod(TextOps.md5Hash60(col("neighbor_id")), lit(stride)) === 0)
      .orderBy("neighbor_id")
      .limit(cells)
      .select("cv")
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      cells: Int = 16, nprobe: Int = 4, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val unit = {
      val v = asDouble(col(vecCol))
      transform(v, x => x / sqrt(dot(v, v)))
    }
    val c = corpus.select(col(idCol).as("neighbor_id"), unit.as("cv"))
    val q = queries.select(col(idCol).as("qid"), unit.as("qv"))

    // --- train the coarse quantizer (driver loop; k·dim doubles) ---
    val n = c.count()
    var cent: Seq[Seq[Double]] = seedCandidates(c, cells, n)
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    if (cent.isEmpty) // hash-sampling whiff (P ≈ e^-cells): take-ordered fallback
      cent = c.orderBy("neighbor_id").limit(cells)
        .select("cv").collect().map(_.getSeq[Double](0).toSeq).toSeq
    def simsTo(v: Column): Column = array(cent.map(ct => dot(v, typedlit(ct))): _*)
    // argmax = first position of the max similarity (deterministic ties)
    def cellOf(v: Column): Column =
      (array_position(simsTo(v), array_max(simsTo(v))) - 1).cast("int")
    (0 until iters).foreach { _ =>
      val means = c.withColumn("cell", cellOf(col("cv")))
        .select(col("cell"), posexplode(col("cv")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg("x").as("m"))
        .collect().groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
      cent = cent.indices.map(i => means.getOrElse(i, cent(i)))
    }

    // --- assign corpus, probe cells, score exactly within candidates ---
    val assigned = c.withColumn("cell", cellOf(col("cv")))
    // cent.indices, not (0 until cells): hash-stride seeding can yield fewer
    // than `cells` centroids, and zip_with over unequal lengths would pad
    // with null structs (nondeterministic probe order).
    val probes = q.withColumn("_sims", simsTo(col("qv")))
      .withColumn("cell", explode(slice(
        transform(array_sort(zip_with(col("_sims"),
            typedlit(cent.indices.toList),
            (s, i) => struct((-s).as("negs"), i.as("i")))),
          p => p.getField("i")),
        1, nprobe)))
      .select("qid", "qv", "cell")
    val cands = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("qid") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv"))) // unit vectors: dot = cosine
    val w = Window.partitionBy("qid").orderBy(desc("cos"), col("neighbor_id"))
    cands.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("neighbor_id"), col("rnk"))
  }

  /**
   * Recall@k certificate for the Lloyd-refined IVF path ([[ivfTopK]] with
   * `iters > 0` — the configuration the 100 TB plan actually runs, which the
   * DuckDB oracle cannot replay bit-for-bit: a distributed mean is not
   * reproducible across engines). Instead of the approximate answer itself,
   * the driver-checkable surface is its QUALITY BOUND: recall of the refined
   * IVF top-k against the exact cosine top-k, thresholded. One output row
   * `(queries, k, recall_ok)` — `queries` is data-derived (oracled exactly);
   * `recall_ok` is the premise assert: any quality regression of the refined
   * quantizer (seeding, Lloyd step, probe selection) flips it and fails the
   * round's hash compare. Everything runs as one distributed plan — the
   * exact side is a broadcast cross join, the join on (qid, neighbor)
   * a leftsemi over two k·|queries|-row sides.
   */
  /**
   * Deterministic CLUSTERED-REGIME embedding fixture (r17 review #3): the
   * synthetic `embeddings` table is near-uniform — the r17 recall sweeps
   * proved IVF's loss there is cell pruning scattering true neighbors
   * across cells, i.e. exactly the regime IVF is NOT designed for — so the
   * clustered certificates re-derive each vector from its id as
   * `center(id mod clusters) + jitter·noise(id)`: a mixture of `clusters`
   * tight blobs, the regime real embedding models produce and the one the
   * production nprobe claim needs. Every component is md5 arithmetic over
   * the id (the fixture convention — no RNG state, replayable by any
   * engine), so the fixture is identical run-to-run and sf-scaled by
   * whatever id frame it is applied to.
   */
  def clusteredEmbeddings(ids: DataFrame, clusters: Int = 16, dim: Int = 64,
      jitter: Double = 0.08, idCol: String = "vec_id"): DataFrame = {
    require(clusters > 0 && dim > 0 && jitter >= 0, "bad fixture parameters")
    val two60 = math.pow(2.0, 60)
    def u(key: Column): Column = TextOps.md5Hash60(key).cast("double") / lit(two60)
    val id = col(idCol).cast("long")
    val comps = (0 until dim).map { j =>
      val c = u(concat(lit("cl:"), pmod(id, lit(clusters.toLong)).cast("string"),
        lit(s":$j"))) - lit(0.5)
      val w = u(concat(lit("v:"), id.cast("string"), lit(s":$j"))) - lit(0.5)
      c + lit(jitter) * w
    }
    ids.select(id.as("vec_id"), array(comps: _*).as("embedding"))
  }

  def ivfRecall(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      minRecall: Double, cells: Int = 16, nprobe: Int = 4, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val approx = ivfTopK(corpus, queries, k, dim, cells, nprobe, iters, idCol, vecCol)
      .select(col("qid"), col("neighbor_id"))
    val exact = cosineTopK(corpus, queries, k, idCol, vecCol)
      .select(col("qid"), col("neighbor_id"))
    val hits = approx.join(exact, Seq("qid", "neighbor_id"), "leftsemi")
    queries.agg(count(lit(1)).cast("long").as("queries"))
      .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
      .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
      .select(col("queries"), lit(k).as("k"),
        (col("n_hit") >= col("n_exact") * lit(minRecall)).as("recall_ok"))
  }

  /**
   * All corpus pairs with cosine above `threshold` (embedding near-dup
   * detection). Brute force (n² scored pairs) — correct at verification scale;
   * kept as the oracle twin of [[nearDupLshPairs]], which is the plan to run
   * at scale.
   */
  def nearDupPairs(corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = corpus.select(col(idCol).as("id_a"), asDouble(col(vecCol)).as("va"))
    val b = corpus.select(col(idCol).as("id_b"), asDouble(col(vecCol)).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") > threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
      .orderBy("id_a", "id_b")
  }

  /**
   * Embedding near-dup pairs via LSH candidates + exact verification — the
   * scale shape: candidates come from an equi-join on (table, signature)
   * hash buckets (never an n² theta-join); each candidate pair is then
   * scored with the exact cosine, so RESULTS equal the brute force whenever
   * every true pair collides in ≥1 table.
   *
   * Recall/volume tradeoff is explicit: per-pair miss = (1-p^b)^T with
   * p = 1-θ/π. The low default threshold 0.4 (θ ≈ 66°) forces few-bit/
   * many-table settings (b=2, T=24 → miss ≈ 5e-6 at cos = 0.4) whose bucket
   * volume is high; at a production near-dup threshold (0.9, θ ≈ 26°) the
   * same miss needs only b=6/T=24, where buckets shrink 16× per table and
   * candidate volume falls to collisions only. The mechanism is identical —
   * threshold and (bits, tables) are the knobs.
   */
  def nearDupLshPairs(corpus: DataFrame, threshold: Double, dim: Int,
      nBits: Int = 2, tables: Int = 24,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val sigs = array((0 until tables).map { t =>
      struct(lit(t).as("table"),
        hyperplaneSignature(col("v"), dim, nBits, seed = 0x0eedba5eL + t).as("sig"))
    }: _*)
    val signed = c.select(col("id"), col("v"), explode(sigs).as("ts"))
      .select(col("id"), col("v"), col("ts.table").as("table"), col("ts.sig").as("sig"))
    signed.as("a").join(signed.as("b"),
        col("a.table") === col("b.table") && col("a.sig") === col("b.sig") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.v").as("va"), col("b.v").as("vb"))
      .dropDuplicates("id_a", "id_b") // OR-construction over tables
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") > threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
      .orderBy("id_a", "id_b")
  }

  /**
   * INT8 scalar-quantized top-k (the memory-bound ANN path): each vector is
   * quantized to 256 levels over its own [min, max] range (the params
   * `x3_quantization_params` computes — 4 bytes/dim → 1, the difference
   * between an in-memory and a spilling index at 100 TB), and scoring runs
   * on the DEQUANTIZED values (min + q·scale): integer levels × two doubles
   * per vector, so the approximate scores are deterministic and
   * engine-reproducible — the oracle rebuilds the same quantize→dequantize→
   * score pipeline, not a tolerance comparison. Shape = [[cosineTopK]]
   * (broadcast queries, one corpus scan); all-constant vectors (range 0)
   * quantize to level 0 and dequantize to the constant.
   */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def dq(df: DataFrame, id: String, out: String): DataFrame = {
      val v = asDouble(col(vecCol))
      df.select(col(idCol).as(id), v.as("_v"))
        .withColumn("_mn", array_min(col("_v")))
        .withColumn("_sc", (array_max(col("_v")) - array_min(col("_v"))) / lit(255.0))
        .select(col(id), transform(col("_v"), x =>
          col("_mn") + least(greatest(
            when(col("_sc") === 0.0, lit(0.0))
              .otherwise(floor((x - col("_mn")) / col("_sc"))), lit(0.0)), lit(255.0))
            * col("_sc")).as(out))
    }
    val c = dq(corpus, "neighbor_id", "cv")
    val q = dq(queries, "qid", "qv")
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("neighbor_id"), col("rnk"))
  }

  /**
   * SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
   * web-scale through semantic deduplication"): SEMANTIC near-duplicate
   * pruning over an embedding column — the pass that removes
   * differently-worded copies exact/MinHash dedup cannot see.
   *
   * Shape, per the paper re-expressed relationally: (1) assign every vector
   * to a coarse cluster (k fixed centroids — here the `cells` lowest-id
   * vectors, the same deterministic seeding rule the IVF quantizer
   * degenerates to, broadcast as k rows); (2) WITHIN each cluster only,
   * score pairwise cosine (equi-join on the cell id — work is Σ|cell|²,
   * never corpus², and cells shrink as k grows: k is the knob that bounds
   * per-task work at 100 TB); (3) drop every vector that has a SMALLER-id
   * neighbor above `threshold` in its cell (the paper keeps one
   * representative per ε-group; lowest-id is the deterministic,
   * non-recursive tie rule — SQL-expressible and engine-reproducible).
   *
   * Returns (vec_id, cid, kept) for every corpus vector — callers filter
   * `kept` for the surviving corpus; the full triple is the auditable form.
   */
  def semDedup(corpus: DataFrame, threshold: Double, cells: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val e = corpus.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
    val cents = e.orderBy("vec_id").limit(cells)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val w = Window.partitionBy(col("vec_id")).orderBy(desc("cos"), col("cid"))
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("cos", cosine(col("v"), col("cv")))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .select(col("vec_id"), col("cid"), col("v"))
    // within-cell pairs above threshold; a dropped vector is any id_b with
    // a smaller-id similar neighbor (left_semi keeps the plan shuffle-lean:
    // one equi-join on cid, one semi-join back on the id)
    val drops = assigned.alias("a")
      .join(assigned.alias("b"), col("a.cid") === col("b.cid") &&
        col("a.vec_id") < col("b.vec_id"))
      .filter(cosine(col("a.v"), col("b.v")) > threshold)
      .select(col("b.vec_id").as("vec_id")).distinct()
    assigned.join(drops.withColumn("_dropped", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"),
        coalesce(!col("_dropped"), lit(true)).as("kept"))
      .orderBy("vec_id")
  }

  /**
   * Approximate k-NEAREST-NEIGHBOR GRAPH over an embedding column — the
   * substrate for graph-based curation (connected-component semantic dedup,
   * label propagation, diversity-aware selection): for every vector, its
   * top-`k` cosine neighbors WITHIN its coarse cell. Same deterministic
   * cell machinery as [[semDedup]] (the `cells` lowest-id vectors are the
   * centroids, broadcast; assignment = argmax cosine with (cos desc, cid)
   * tie-rank), so the work is Σ|cell|² — never corpus² — and the cell count
   * is the knob bounding per-task work at 100 TB. Edges never cross cells
   * (the approximation; raise `cells` resolution or re-run on a JL
   * projection for recall). Output (vec_id, neighbor_id, rnk) keeps the
   * cosine VALUE out, like [[cosineTopK]]'s oracle convention — ranking is
   * engine-exact, the raw double is 1-ulp-fragile.
   */
  def knnGraph(corpus: DataFrame, k: Int, cells: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val e = corpus.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
    val cents = e.orderBy("vec_id").limit(cells)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val wAsg = Window.partitionBy(col("vec_id")).orderBy(desc("cos"), col("cid"))
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("cos", cosine(col("v"), col("cv")))
      .withColumn("rnk", row_number().over(wAsg)).filter(col("rnk") === 1)
      .select(col("vec_id"), col("cid"), col("v"))
    val wTop = Window.partitionBy(col("a.vec_id"))
      .orderBy(desc("cos"), col("b.vec_id"))
    assigned.alias("a")
      .join(assigned.alias("b"), col("a.cid") === col("b.cid") &&
        col("a.vec_id") =!= col("b.vec_id"))
      .withColumn("cos", cosine(col("a.v"), col("b.v")))
      .withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= k)
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("neighbor_id"),
        col("rnk").cast("long").as("rnk"))
  }

  /**
   * Johnson–Lindenstrauss RANDOM PROJECTION to `k` dimensions — the
   * dimensionality-reduction step ahead of an ANN index or a cheap
   * first-pass similarity filter (±1 sign matrix, Achlioptas 2003: JL
   * guarantees hold with the database-friendly sign projection, no
   * Gaussians needed). The sign matrix is derived per (i, j) cell from
   * md5-60 parity — deterministic, engine-recomputable — materialized ONCE
   * driver-side (k·d doubles) and shipped as an array literal; per row the
   * projection is k ordered folds over zip_with products, fully codegen'd,
   * map-only at any scale. Output: (id, out_dim, value) exploded rows, the
   * layout a downstream index builder consumes. Fold order is the array
   * order on both engines, so values are bit-exact.
   */
  def randomProjection(df: DataFrame, k: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k > 0 && dim > 0, "k and dim must be positive")
    import org.apache.spark.unsafe.types.UTF8String
    val signs: Seq[Seq[Double]] = Seq.tabulate(k, dim) { (i, j) =>
      if (graft.functions.Md5Hash60.hash(UTF8String.fromString(s"$i:$j")) % 2 == 0) 1.0
      else -1.0
    }
    val v = asDouble(col(vecCol))
    val projected = transform(typedlit(signs), row =>
      aggregate(zip_with(v, row, (x, s) => x * s), lit(0.0), (acc, x) => acc + x))
    df.select(col(idCol), posexplode(projected).as(Seq("out_dim", "value")))
      .select(col(idCol), col("out_dim").cast("long").as("out_dim"), col("value"))
      .orderBy(idCol, "out_dim")
  }
}
