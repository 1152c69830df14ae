package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * PRODUCT QUANTIZATION (E185) — the memory-bounded vector compression
 * behind IVF-PQ, the canonical 100 TB ANN layout: each d-dim embedding
 * splits into `m` contiguous subvectors, each subvector quantizes to one
 * of `k` per-subspace codes, and the vector stores as m small ints
 * (m bytes at k ≤ 256) instead of d floats — a 64-dim float vector at
 * m=4/k=256 compresses 64×. Search runs in the COMPRESSED domain via
 * ADC (asymmetric distance computation): per query, one m×k lookup table
 * of subspace dot products, then each candidate scores as m table
 * lookups — O(N·m) instead of O(N·d), with the raw vectors never read.
 *
 * Codebooks are DETERMINISTIC (the subvectors of the k lowest-id
 * vectors — the same seed rule the IVF quantizer and x3_kmeans_assign
 * degenerate to on a fixture), so DuckDB replays training, encoding, and
 * every ADC score bit-for-bit. Encode and score are MAP-ONLY against
 * literal codebooks (broadcast in the plan, `typedlit` — the AnnIndex
 * centroid pattern): no shuffle anywhere but the final per-query top-k
 * window over ADC-scored candidates.
 */
object PqOps {

  /** books(s)(c) = the c-th code vector of subspace s (length d/m each). */
  type Codebooks = Seq[Seq[Seq[Double]]]

  /** Train per-subspace codebooks from the k lowest-`idCol` vectors'
    * subvectors — bounded driver collect (k rows), deterministic. */
  def codebooks(vecs: DataFrame, m: Int, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Codebooks = {
    require(m > 0 && k > 0, "m and k must be positive")
    val seeds = vecs
      .select(SimilarityOps.asDouble(col(vecCol)).as("v"))
      .orderBy(col(idCol)).limit(k)
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    require(seeds.nonEmpty, "need at least one seed vector")
    val d = seeds.head.size
    require(d % m == 0, s"dim $d must split into $m equal subspaces")
    val sd = d / m
    (0 until m).map(s => seeds.map(_.slice(s * sd, (s + 1) * sd)))
  }

  /** The per-subspace code of `v` (argmax of 2·dot(sub, code) − ‖code‖² =
    * the nearest code by L2; ties → lowest code id). The scores array
    * materializes once inside a transform let-binding. */
  private def codeOf(v: Column, codes: Seq[Seq[Double]],
      s: Int, sd: Int): Column = {
    val sub = slice(v, s * sd + 1, sd)
    val scores = array(codes.map { c =>
      lit(2.0) * SimilarityOps.dot(sub, typedlit(c)) -
        lit(c.map(x => x * x).sum)
    }: _*)
    element_at(transform(array(scores),
      sc => (array_position(sc, array_max(sc)) - 1).cast("int")), 1)
  }

  /**
   * LLOYD-REFINED codebooks (E199): `iters` rounds of per-subspace k-means
   * over the corpus's subvectors, seeded from deterministic [[codebooks]] —
   * the quantization quality a production IVF-PQ index actually ships
   * (seed-only books waste code budget wherever the first k vectors are
   * unrepresentative). Each round is ONE distributed plan: every vector's m
   * subvectors assign to their nearest code (the [[codeOf]] rule — map-only
   * against literal books), then per-(subspace, code, position) means
   * aggregate in one hash agg; the driver collects exactly m·k·(d/m) = d·k
   * mean cells per round — the codebook's own size, bounded by
   * construction. Codes that attract no vectors keep their previous
   * vector (the standard empty-cell rule, deterministic).
   *
   * Like the IVF quantizer's Lloyd step ([[AnnIndex.trainFromIndex]]), a
   * distributed mean is not bit-reproducible across engines — refined books
   * are certified by the [[pqRecall]] bound, not a bit-exact oracle.
   */
  def refineCodebooks(vecs: DataFrame, seed: Codebooks, iters: Int,
      vecCol: String = "embedding"): Codebooks = {
    val m = seed.size
    val k = seed.head.size
    val sd = seed.head.head.size
    var cur = seed
    val v = SimilarityOps.asDouble(col(vecCol))
    (0 until iters).foreach { _ =>
      val perSub = array((0 until m).map(s =>
        struct(codeOf(v, cur(s), s, sd).as("code"),
          slice(v, s * sd + 1, sd).as("sub"))): _*)
      val means = vecs
        .select(posexplode(perSub).as(Seq("s", "x")))
        .select(col("s"), col("x.code").as("code"),
          posexplode(col("x.sub")).as(Seq("pos", "xv")))
        .groupBy("s", "code", "pos").agg(avg("xv").as("mu"))
        .collect() // d·k cells — the codebook's own size
        .groupBy(r => (r.getInt(0), r.getInt(1)))
        .map { case (key, rs) =>
          key -> rs.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
        }
      cur = (0 until m).map(s =>
        (0 until k).map(c => means.getOrElse((s, c), cur(s)(c))))
    }
    cur
  }

  /**
   * Recall@k CERTIFICATE for the IVF-PQ path (the quality bound the
   * compressed-domain scorer ships under — mirror of
   * [[SimilarityOps.ivfRecall]] for the refined-quantizer IVF path): the
   * two-stage [[AnnIndex.probePqRefined]] answer (ADC shortlist → exact
   * re-rank) is compared against the exact cosine top-k over the SAME
   * corpus, and one row `(queries, k, recall_ok)` comes back — `queries`
   * data-derived (oracled exactly), `recall_ok` the premise assert: any
   * quality regression in codebook training (seeding or Lloyd step),
   * encoding, ADC scoring, or the shortlist rule flips the boolean and
   * fails the round's hash compare.
   */
  def pqRecall(h: AnnIndex.Handle, codes: graft.table.TransactionalTable,
      books: Codebooks, corpus: DataFrame, queries: DataFrame, k: Int,
      kShort: Int, nprobe: Int, minRecall: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val approx = AnnIndex.probePqRefined(h, codes, books, queries, k, kShort,
      nprobe, idCol, vecCol).select(col("qid"), col("neighbor_id"))
    val exact = SimilarityOps.cosineTopK(corpus, queries, k, idCol, vecCol)
      .select(col("qid"), col("neighbor_id"))
    val hits = approx.join(exact, Seq("qid", "neighbor_id"), "leftsemi")
    queries.agg(count(lit(1)).cast("long").as("queries"))
      .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
      .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
      .select(col("queries"), lit(k).as("k"),
        (col("n_hit") >= col("n_exact") * lit(minRecall)).as("recall_ok"))
  }

  /** Encode: (idCol, codes array<int> of length m) — map-only. */
  def encode(vecs: DataFrame, books: Codebooks,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val m = books.size
    val sd = books.head.head.size
    val v = SimilarityOps.asDouble(col(vecCol))
    vecs.select(col(idCol),
      array((0 until m).map(s => codeOf(v, books(s), s, sd)): _*).as("codes"))
  }

  /** The ADC score expression: approximate dot(q, x) ≈
    * Σ_s dot(q_s, books(s)(codes_s)) — per (query, candidate) row the
    * subspace lookup tables are expressions over `qv` with literal code
    * vectors: m·k dots of length d/m = one full-dim dot per candidate
    * worth of flops, but NO raw candidate vector load (the
    * compressed-domain property). Left-associated subspace sum — the
    * oracle replays the exact association. */
  def adcScore(qv: Column, codes: Column, books: Codebooks): Column = {
    val m = books.size
    val sd = books.head.head.size
    (0 until m).map { s =>
      val tbl = array(books(s).map(c =>
        SimilarityOps.dot(slice(qv, s * sd + 1, sd), typedlit(c))): _*)
      element_at(tbl, element_at(codes, s + 1) + 1)
    }.reduce(_ + _)
  }

  /** ADC top-k over a flat encoded table: per-query top-k by
    * (score desc, id asc). Returns (qid, neighbor_id, adc, rnk). */
  def adcTopK(queries: DataFrame, encoded: DataFrame, books: Codebooks, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val qv = SimilarityOps.asDouble(col(vecCol))
    val q = queries.select(col(idCol).as("qid"), qv.as("qv"))
    val w = Window.partitionBy(col("qid")).orderBy(desc("adc"), col("neighbor_id"))
    encoded.select(col(idCol).as("neighbor_id"), col("codes"))
      .crossJoin(broadcast(q))
      .withColumn("adc", adcScore(col("qv"), col("codes"), books))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("neighbor_id"), col("adc"), col("rnk"))
  }

  /** Exact text round-trip for codebooks (stored in the codes table's
    * metadata so `CALL pq_probe` replays the trained books): Java's
    * shortest-double repr parses back bit-identical. */
  def booksToString(books: Codebooks): String =
    books.map(_.map(_.mkString(",")).mkString("|")).mkString(";")

  def booksFromString(s: String): Codebooks =
    s.split(';').toSeq.map(_.split('|').toSeq.map(
      _.split(',').toSeq.map(_.toDouble)))

  /** The quantizer GENERATION the codes table must match (E206): the
    * CENTROID TABLE's commit version. [[AnnIndex.retrain]] moves centroid
    * vectors AND the cell layout, so every stored code row — its `cell`
    * partition value and its encoding (residual codes doubly so: they
    * quantize v − centroid) — is invalidated by a retrain. The version is
    * bumped by the retrain's own `publishCentroids` COMMIT (nothing else
    * writes the centroid table after creation), so the generation advances
    * atomically with the mutation — a retrain that crashes after the
    * publish but before its observability stamp still reads as a new
    * generation (deriving from the post-hoc `ann.retrain.stats` record
    * would let that crash serve stale codes as fresh); a REPLAYED retrain's
    * fenced no-op publish keeps the version, so replays never false-stale. */
  private[graft] def quantizerGen(h: AnnIndex.Handle): Long =
    h.centroids.currentVersion

  /** The stamped fence, three-way: `Right(Some(gen))` = a valid stamp,
    * `Right(None)` = no stamp or the retired "-1" scheme (legacy rule
    * applies), `Left(raw)` = an unparseable stamp — a corrupted or
    * hand-edited table property, never trustworthy as fresh. */
  private def parsedFence(
      codes: graft.table.TransactionalTable): Either[String, Option[Long]] =
    codes.customMeta("pq.quantizer.fence") match {
      case None => Right(None)
      case Some(raw) => scala.util.Try(raw.toLong).toOption match {
        case Some(v) if v >= 0 => Right(Some(v))
        // "-1" = the retired retrain-fence scheme's pre-retrain value: treat
        // like a missing stamp (legacy rule) — version generations are ≥ 1,
        // so comparing would false-stale every never-retrained old table
        case Some(_) => Right(None)
        case None => Left(raw)
      }
    }

  /** True when `codes` matches the index's live quantizer generation and no
    * rebuild is half-finished — the non-throwing twin of
    * [[requireCodesFresh]] (maintenance callers rebuild instead of fail).
    * Tables from before the stamp existed (no `pq.quantizer.fence`) pass
    * while the index has never persisted a retrain record — the
    * conservative legacy rule; the first [[appendCodes]] upgrades them. An
    * UNPARSEABLE stamp is never fresh: maintenance rebuilds it. */
  def codesFresh(h: AnnIndex.Handle,
      codes: graft.table.TransactionalTable): Boolean =
    !codes.customMeta("pq.rebuild.pending").contains("true") && {
      parsedFence(codes) match {
        case Right(Some(stamped)) => stamped == quantizerGen(h)
        case Right(None) => AnnIndex.lastRetrainFence(h).isEmpty
        case Left(_) => false
      }
    }

  /** Fail fast when `codes` no longer matches the index's quantizer (E206):
    * a probe over stale codes would silently mis-rank (wrong cells pruned,
    * wrong encodings scored) and an append would interleave two cell
    * layouts in one table — both are wrong answers shaped like right ones.
    * A half-finished rebuild ([[rebuildCodes]] crash window) refuses via
    * its pending marker. Returns the parsed stamp (None = legacy/unstamped)
    * so callers never re-parse the raw property — a second raw `.toLong`
    * was safe only by call order (review r17). */
  private[graft] def requireCodesFresh(h: AnnIndex.Handle,
      codes: graft.table.TransactionalTable): Option[Long] = {
    if (codes.customMeta("pq.rebuild.pending").contains("true"))
      throw new IllegalStateException(
        "PQ codes table has an unfinished rebuild (pq.rebuild.pending) — " +
          "re-run PqOps.rebuildCodes / CALL graft.system.pq_rebuild to complete it")
    val cur = quantizerGen(h)
    val (stamped, stale) = parsedFence(codes) match {
      case Right(s @ Some(st)) => (s, st != cur)
      // legacy table (no stamp, or the retired fence scheme's "-1"):
      // refuse once a retrain record exists
      case Right(None) => (None, AnnIndex.lastRetrainFence(h).isDefined)
      case Left(raw) =>
        throw new IllegalStateException(
          s"PQ codes table carries an INVALID pq.quantizer.fence stamp " +
            s"('$raw' is not a version number) — the fence cannot prove the " +
            s"codes match the quantizer (generation $cur); rebuild via " +
            "PqOps.rebuildCodes / CALL graft.system.pq_rebuild")
    }
    if (stale)
      throw new IllegalStateException(
        s"PQ codes table is STALE: built under quantizer generation " +
          s"${stamped.map(_.toString).getOrElse("<unstamped>")} but the index " +
          s"has since retrained (generation $cur) — cell layout and encodings " +
          "no longer match the quantizer; rebuild via PqOps.rebuildCodes / " +
          "CALL graft.system.pq_rebuild")
    stamped
  }

  /**
   * REBUILD the codes table against the index's CURRENT quantizer (E206 —
   * the maintenance step [[AnnIndex.retrain]] mandates: a retrain leaves
   * every stored code row stale, and until this runs the freshness fence
   * refuses probes instead of serving silently wrong rankings). Re-trains
   * the codebooks by the table's own build rule (raw or residual, read
   * from the `pq.residual` stamp; same m/k as the stamped books; optional
   * Lloyd refinement via `refineIters` — pass the depth the original build
   * used), re-encodes EVERY indexed vector, and swaps the contents in ONE
   * atomic overwrite commit.
   *
   * Crash safety: a `pq.rebuild.pending` marker brackets the overwrite and
   * the metadata re-stamp — any crash inside the window leaves the marker
   * set, every probe/append refuses, and re-running the rebuild heals
   * (the overwrite is idempotent against the same index state).
   *
   * `refineIters < 0` (the default) resolves the Lloyd depth from the
   * table's own `pq.refine.iters` stamp (0 when never stamped), so an
   * UNATTENDED rebuild — the E213 drift-retrain path — reproduces the
   * quality tier the table was built at; an explicit value overrides and
   * re-stamps.
   */
  def rebuildCodes(h: AnnIndex.Handle, codes: graft.table.TransactionalTable,
      refineIters: Int = -1): Codebooks = {
    val ri =
      if (refineIters >= 0) refineIters
      else codes.customMeta("pq.refine.iters").map(_.toInt).getOrElse(0)
    val old = booksFromString(codes.customMeta("pq.books").getOrElse(
      throw new IllegalStateException(
        "codes table carries no pq.books metadata — built outside pq_codes_build?")))
    val m = old.size
    val k = old.head.size
    val residual = codes.customMeta("pq.residual").contains("true")
    val cent = h.centroidVectors
    val src =
      if (residual) h.assignments.scan().select(col("vec_id"), col("cell"),
        residualOf(col("v"), col("cell"), cent).as("embedding"))
      else h.assignments.scan().select(col("vec_id"), col("cell"),
        col("v").as("embedding"))
    val seed = codebooks(src, m, k)
    val books = if (ri > 0) refineCodebooks(src, seed, ri) else seed
    val sd = books.head.head.size
    codes.setCustomMeta("pq.rebuild.pending", "true")
    codes.overwrite(src.select(col("vec_id"), col("cell"),
      array((0 until m).map(s =>
        codeOf(col("embedding"), books(s), s, sd)): _*).as("codes")))
    codes.setCustomMeta("pq.books", booksToString(books))
    codes.setCustomMeta("pq.refine.iters", ri.toString)
    codes.setCustomMeta("pq.quantizer.fence", quantizerGen(h).toString)
    codes.setCustomMeta("pq.rebuild.pending", "false")
    books
  }

  /** The residual of a vector against its cell's centroid (elementwise,
    * exact): what RESIDUAL IVF-PQ (E191) quantizes — residual magnitudes
    * are much smaller than raw coordinates, so the same code budget buys
    * finer resolution (the FAISS IVF-ADC layout). */
  def residualOf(v: Column, cell: Column, cent: Seq[Seq[Double]]): Column =
    zip_with(v, element_at(typedlit(cent), (cell + 1).cast("int")),
      (a, b) => a - b)

  /** Residual IVF-PQ storage (E191): codebooks train on the k lowest-id
    * RESIDUALS and every indexed vector's residual encodes against them;
    * returns the cell-partitioned codes table and the trained books
    * (also persisted in the table metadata for later sessions). */
  def buildPqCodesResidual(h: AnnIndex.Handle, root: String, m: Int, k: Int,
      refineIters: Int = 0)
      : (graft.table.TransactionalTable, Codebooks) = {
    val cent = h.centroidVectors
    val res = h.assignments.scan().select(col("vec_id"), col("cell"),
      residualOf(col("v"), col("cell"), cent).as("embedding"))
    val seedBooks = codebooks(res, m, k)
    val books =
      if (refineIters > 0) refineCodebooks(res, seedBooks, refineIters)
      else seedBooks
    val spark = h.assignments.spark
    val t = graft.table.TransactionalTable.create(spark, root,
      org.apache.spark.sql.types.StructType.fromDDL(
        "vec_id LONG, cell LONG, codes ARRAY<INT>"),
      "vec_id", Some("cell"))
    t.setWriteDistribution("hash")
    val sd = books.head.head.size
    t.append(res.select(col("vec_id"), col("cell"),
      array((0 until m).map(s =>
        codeOf(col("embedding"), books(s), s, sd)): _*).as("codes")))
    t.setCustomMeta("pq.books", booksToString(books))
    t.setCustomMeta("pq.residual", "true")
    t.setCustomMeta("pq.refine.iters", refineIters.toString)
    t.setCustomMeta("pq.quantizer.fence", quantizerGen(h).toString)
    (t, books)
  }

  /**
   * STREAMING maintenance of the PQ codes table (E205): through r16 the
   * codes were batch-built only — under streaming ingest
   * ([[graft.stream.VectorPipeline]]) newly indexed vectors were invisible
   * to every compressed-domain probe until a full rebuild. `appendCodes`
   * encodes ONE batch against the table's own STAMPED books (raw or
   * residual, read from `pq.books`/`pq.residual` — a probe and its codes
   * must never disagree about the encoding) under the index's frozen
   * centroids (the [[AnnIndex.assignRows]] rule, so the cell here always
   * equals the cell the raw ingest assigned), and lands it as ONE
   * replay-fenced merge — a re-delivered batch no-ops, a re-ingested
   * vec_id moves its code row. Because books and centroids are both
   * frozen, incrementally maintained codes are BIT-IDENTICAL to a
   * one-shot [[buildPqCodes]] over the same final index.
   */
  def appendCodes(h: AnnIndex.Handle, codes: graft.table.TransactionalTable,
      vecs: DataFrame, batchId: Long,
      idCol: String = "vec_id", vecCol: String = "embedding",
      compactEvery: Int = 0): Unit =
    graft.util.BatchStats.timed("pq_codes_batch") {
      val stamped = requireCodesFresh(h, codes)
      // upgrade a legacy (pre-stamp or retired-scheme) table on its first
      // maintained batch: requireCodesFresh just proved it matches the
      // live quantizer (and already parsed the stamp — None = legacy)
      if (stamped.isEmpty)
        codes.setCustomMeta("pq.quantizer.fence", quantizerGen(h).toString)
      val books = booksFromString(codes.customMeta("pq.books").getOrElse(
        throw new IllegalStateException(
          "codes table carries no pq.books metadata — built outside pq_codes_build?")))
      val residual = codes.customMeta("pq.residual").contains("true")
      val m = books.size
      val sd = books.head.head.size
      val rows = AnnIndex.assignRows(h, vecs, idCol, vecCol)
      val src =
        if (!residual) rows.select(col("vec_id"), col("cell"), col("v").as("ev"))
        else rows.select(col("vec_id"), col("cell"),
          residualOf(col("v"), col("cell"), h.centroidVectors).as("ev"))
      val spark = vecs.sparkSession
      // materialized once (r19): the merge consumes the frame twice (key-
      // pruning collect + write) and each pass re-ran the assignment dot
      // products AND the m×k subcodebook encodings over the whole batch
      val encoded = graft.util.JobLabel.labeled(spark, "pq-codes:encode") {
        src.select(col("vec_id"), col("cell"),
          array((0 until m).map(s => codeOf(col("ev"), books(s), s, sd)): _*).as("codes"))
          .localCheckpoint(true)
      }
      import spark.implicits._
      codes.merge(encoded, spark.emptyDataset[Long].toDF("vec_id"), batchId)
      if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
        codes.compact()
    }

  /** IVF-PQ storage (E186): the PQ codes of every indexed vector in a
    * CELL-PARTITIONED engine table beside the IVF index — codebooks train
    * on the index's own (unit) vectors, and probes then read ONLY the
    * probed cells' code rows (manifest partition pruning) and score in
    * the compressed domain: nprobe/cells of the CODES (m ints per vector)
    * instead of nprobe/cells of the raw floats. */
  def buildPqCodes(h: AnnIndex.Handle, root: String, books: Codebooks,
      /** The Lloyd depth the caller trained `books` at (0 = seed-only):
        * stamped as `pq.refine.iters` so an UNATTENDED [[rebuildCodes]] —
        * the E213 drift-retrain path — reproduces the same quality tier
        * instead of silently downgrading to seed books. */
      refineIters: Int = 0): graft.table.TransactionalTable = {
    val spark = h.assignments.spark
    val t = graft.table.TransactionalTable.create(spark, root,
      org.apache.spark.sql.types.StructType.fromDDL(
        "vec_id LONG, cell LONG, codes ARRAY<INT>"),
      "vec_id", Some("cell"))
    t.setWriteDistribution("hash")
    val m = books.size
    val sd = books.head.head.size
    t.append(h.assignments.scan().select(col("vec_id"), col("cell"),
      array((0 until m).map(s =>
        codeOf(col("v"), books(s), s, sd)): _*).as("codes")))
    // stamp the books here too (the CALL surface re-stamps identically):
    // streaming maintenance (appendCodes) and later-session probes resolve
    // the encoding from the table, never from a caller's copy
    t.setCustomMeta("pq.books", booksToString(books))
    t.setCustomMeta("pq.refine.iters", refineIters.toString)
    t.setCustomMeta("pq.quantizer.fence", quantizerGen(h).toString)
    t
  }
}
