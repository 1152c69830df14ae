package graft.sql

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.table.TransactionalTable

/**
 * Table-maintenance stored procedures (Iceberg `CALL catalog.system.…`
 * parity) over the DSv2 procedure API:
 *
 *   CALL graft.system.rollback_to_snapshot('db.t', 3)
 *   CALL graft.system.expire_snapshots('db.t', 2)
 *   CALL graft.system.remove_orphan_files('db.t', 3600000)
 *   CALL graft.system.compact('db.t', 1048576)
 *   CALL graft.system.fold_deletes('db.t')
 *   CALL graft.system.create_changelog_view('db.t', 1, 3, 'my_changes')
 *   CALL graft.system.compact_clustered('db.t', 8)
 *   CALL graft.system.compact_zordered('db.t', 'a', 'b', 8)
 *   CALL graft.system.create_branch('db.t', 'audit')
 *   CALL graft.system.publish_branch('db.t', 'audit')
 *   CALL graft.system.create_tag('db.t', 'prod', -1)
 *   CALL graft.system.add_files('db.t', '/data/existing_parquet_dir')
 *   CALL graft.system.cherrypick_snapshot('db.t', 5)
 *   CALL graft.system.rewrite_manifests('db.t')
 *   CALL graft.system.evolve_partitioning('db.t', 'days(ts)')
 *
 * Each returns one result row so operators see what happened (versions,
 * counts) without a follow-up query — the runbook surface the reference gets
 * from Iceberg's Spark procedures.
 */
object GraftProcedures {

  private val S = StringType
  private val L = LongType
  private val I = IntegerType
  private val D = DoubleType

  /** 'name:weight,name:weight' spec strings (the CALL-surface encoding of
    * the Scala sampling APIs' Seq[(String, …)] specs). */
  private def specList(spec: String): Seq[(String, String)] =
    spec.split(',').toSeq.filter(_.nonEmpty).map { kv =>
      val i = kv.lastIndexOf(':')
      require(i > 0, s"malformed spec entry '$kv' (want name:weight)")
      kv.substring(0, i).trim -> kv.substring(i + 1).trim
    }

  private final case class Spec(
      params: Seq[(String, DataType)],
      result: StructType,
      body: (GraftCatalog, InternalRow) => Seq[Any])

  /** One engine op exposed as an Unbound+Bound procedure with a single-row
    * LocalScan result. */
  private final class P(procName: String, spec: Spec, cat: GraftCatalog)
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] =
      spec.params.map { case (n, dt) => ProcedureParameter.in(n, dt).build() }.toArray
    override def isDeterministic: Boolean = false // mutates table state
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val out = spec.body(cat, input).map {
        case s: String => UTF8String.fromString(s)
        case other => other
      }
      val scan: Scan = new LocalScan {
        override def rows(): Array[InternalRow] = Array(InternalRow.fromSeq(out))
        override def readSchema(): StructType = spec.result
      }
      java.util.Collections.singletonList(scan).iterator()
    }
  }

  private def open(cat: GraftCatalog, args: InternalRow): TransactionalTable =
    cat.openByName(args.getUTF8String(0).toString)

  private def row(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, dt) => StructField(n, dt) })

  private val specs: Map[String, Spec] = Map(

    "rollback_to_snapshot" -> Spec(
      Seq("table" -> S, "version" -> L),
      row("previous_version" -> L, "current_version" -> L),
      (c, a) => {
        val t = open(c, a); val prev = t.currentVersion
        t.rollbackTo(a.getLong(1)); Seq(prev, t.currentVersion)
      }),

    "expire_snapshots" -> Spec(
      Seq("table" -> S, "keep_last" -> I),
      row("retained_versions" -> L),
      (c, a) => {
        val t = open(c, a); t.expireSnapshots(a.getInt(1))
        Seq((0L to t.currentVersion).count(t.manifestExists).toLong)
      }),

    // Age-based retention (Iceberg expire_snapshots(older_than => ts)):
    //   CALL graft.system.expire_snapshots_older_than('db.t', <epoch_ms>, 1)
    "expire_snapshots_older_than" -> Spec(
      Seq("table" -> S, "older_than_ms" -> L, "keep_last" -> I),
      row("retained_versions" -> L),
      (c, a) => {
        val t = open(c, a); t.expireSnapshotsOlderThan(a.getLong(1), a.getInt(2))
        Seq((0L to t.currentVersion).count(t.manifestExists).toLong)
      }),

    "remove_orphan_files" -> Spec(
      Seq("table" -> S, "older_than_ms" -> L),
      row("deleted_files" -> L),
      (c, a) => Seq(open(c, a).removeOrphanFiles(a.getLong(1)))),

    "compact" -> Spec(
      Seq("table" -> S, "min_file_rows" -> L),
      row("files_before" -> L, "files_after" -> L),
      (c, a) => {
        val t = open(c, a); val before = t.snapshot.files.size.toLong
        t.compact(a.getLong(1)); Seq(before, t.snapshot.files.size.toLong)
      }),

    // Iceberg `create_changelog_view` parity: register the engine's
    // incremental row-level diff (insert/delete images with `_change_type`,
    // carried-over CoW rows cancelled) as a temp view for plain SQL.
    //   CALL graft.system.create_changelog_view('db.t', 1, 3, 'my_changes')
    //   SELECT * FROM my_changes WHERE _change_type = 'insert'
    "create_changelog_view" -> Spec(
      Seq("table" -> S, "from_version" -> L, "to_version" -> L, "view_name" -> S),
      row("view_name" -> S, "changed_rows" -> L),
      (c, a) => {
        val t = open(c, a)
        val view = a.getUTF8String(3).toString
        val df = t.changes(a.getLong(1), a.getLong(2))
        df.createOrReplaceTempView(view)
        Seq(view, df.count())
      }),

    // ANALYZE (Iceberg puffin / ANALYZE TABLE parity): one distributed HLL
    // pass over the current snapshot records per-column NDV; catalog scans
    // then report distinctCount to CBO (equality selectivity, join sizing).
    //   CALL graft.system.analyze('db.t', 'user_id,event_type')
    "analyze" -> Spec(
      Seq("table" -> S, "columns" -> S),
      row("analyzed_version" -> L, "columns" -> S, "ndv" -> S),
      (c, a) => {
        val t = open(c, a)
        val cols = a.getUTF8String(1).toString.split(",").map(_.trim).filter(_.nonEmpty)
        val est = graft.table.NdvStats.analyze(t, cols.toSeq)
        Seq(t.currentVersion, cols.mkString(","),
          cols.map(cl => est(cl.toLowerCase(java.util.Locale.ROOT))).mkString(","))
      }),

    "fold_deletes" -> Spec(
      Seq("table" -> S),
      row("rewritten_files" -> L, "folded_delete_files" -> L),
      (c, a) => {
        val (rw, folded) = open(c, a).foldDeletes()
        Seq(rw, folded)
      }),

    "compact_clustered" -> Spec(
      Seq("table" -> S, "target_files" -> I),
      row("files_after" -> L),
      (c, a) => {
        val t = open(c, a); t.compactClustered(a.getInt(1))
        Seq(t.snapshot.files.size.toLong)
      }),

    "compact_zordered" -> Spec(
      Seq("table" -> S, "col_a" -> S, "col_b" -> S, "target_files" -> I),
      row("files_after" -> L),
      (c, a) => {
        val t = open(c, a)
        t.compactZOrdered(Seq(a.getUTF8String(1).toString, a.getUTF8String(2).toString),
          a.getInt(3))
        Seq(t.snapshot.files.size.toLong)
      }),

    "create_branch" -> Spec(
      Seq("table" -> S, "name" -> S),
      row("fork_version" -> L),
      (c, a) => Seq(open(c, a).createBranch(a.getUTF8String(1).toString).currentVersion)),

    "publish_branch" -> Spec(
      Seq("table" -> S, "name" -> S),
      row("published_version" -> L),
      (c, a) => {
        val t = open(c, a); t.publish(a.getUTF8String(1).toString); Seq(t.currentVersion)
      }),

    "create_tag" -> Spec(
      Seq("table" -> S, "name" -> S, "version" -> L),
      row("tagged_version" -> L),
      (c, a) => {
        val t = open(c, a); t.createTag(a.getUTF8String(1).toString, a.getLong(2))
        Seq(t.tags(a.getUTF8String(1).toString))
      }),

    "cherrypick_snapshot" -> Spec(
      Seq("table" -> S, "version" -> L),
      row("applied_version" -> L, "current_version" -> L),
      (c, a) => {
        val t = open(c, a); t.cherrypick(a.getLong(1))
        Seq(a.getLong(1), t.currentVersion)
      }),

    "add_files" -> Spec(
      Seq("table" -> S, "path" -> S),
      row("added_files" -> L, "added_rows" -> L),
      (c, a) => {
        val t = open(c, a)
        val p = java.nio.file.Paths.get(a.getUTF8String(1).toString)
        val files =
          if (java.nio.file.Files.isDirectory(p)) {
            val s = java.nio.file.Files.walk(p)
            try s.iterator().asScala
              .filter(f => java.nio.file.Files.isRegularFile(f) &&
                f.getFileName.toString.endsWith(".parquet") &&
                !f.getFileName.toString.startsWith("."))
              .map(_.toString).toSeq.sorted
            finally s.close()
          } else Seq(p.toString)
        val (nf, nr) = t.addFiles(files)
        Seq(nf, nr)
      }),

    "rewrite_manifests" -> Spec(
      Seq("table" -> S),
      row("chunks_before" -> L, "chunks_after" -> L),
      (c, a) => {
        val (before, after) = open(c, a).rewriteManifests()
        Seq(before, after)
      }),

    "evolve_partitioning" -> Spec(
      Seq("table" -> S, "spec" -> S),
      row("current_spec_id" -> L),
      (c, a) => {
        val t = open(c, a)
        Seq(t.evolvePartitioning(
          GraftCatalog.parseTransformSpec(a.getUTF8String(1).toString)).currentSpecId.toLong)
      }),

    // Partition-scoped bin-pack: pay exactly the compaction debt of the
    // named partitions, every other file carried by reference.
    "compact_partitions" -> Spec(
      Seq("table" -> S, "partitions" -> S, "min_file_rows" -> L),
      row("files_rewritten" -> L, "files_written" -> L),
      (c, a) => {
        val values = a.getUTF8String(1).toString.split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
        val (rewritten, written) =
          open(c, a).compactPartitions(values, a.getLong(2))
        Seq(rewritten.toLong, written.toLong)
      }),

    // Materialized-view maintenance (GraftViews.scala): staleness-checked
    // atomic recompute of the MV's storage table.
    "refresh_mv" -> Spec(
      Seq("view" -> S),
      row("view" -> S, "refreshed" -> BooleanType, "reason" -> S,
        "storage_version" -> L),
      (c, a) => {
        val name = a.getUTF8String(0).toString
        val spark = org.apache.spark.sql.SparkSession.active
        val root = c.viewRootByName(name)
        val meta = GraftViewStore.load(root, c.linksIo)
        require(meta.materialized, s"$name is a plain view, not materialized")
        val staleSources = meta.sourceVersions.filter { case (r, v) =>
          !TransactionalTable.exists(r) ||
            TransactionalTable.open(spark, r).currentVersion != v
        }
        val storageRoot = GraftViewStore.storageRoot(root)
        if (!meta.externalSources && staleSources.isEmpty) {
          Seq(name, false, "fresh",
            TransactionalTable.open(spark, storageRoot).currentVersion)
        } else {
          val cur = meta.current
          val parsed = spark.sessionState.sqlParser.parsePlan(cur.sql)
          val qualified = GraftViewResolution.qualifyNames(
            spark, parsed, cur.currentCatalog, cur.currentNamespace)
          val storage = TransactionalTable.open(spark, storageRoot)
          // pre-r19 MV storage gains the history bound on first refresh
          // (no-op once the key exists)
          storage.defaultSnapshotExpiry(keepLast = 8)
          GraftMvRefresh.tryIncremental(spark, meta, qualified, storage) match {
            case Some((label, _, updatedVersions)) =>
              // append-only interval: row-preserving definitions appended
              // the transformed inserts (O(new data)); aggregate
              // definitions merged per-group deltas (O(delta groups));
              // join definitions appended the IVM delta terms (O(Δ ⋈ other))
              GraftViewStore.mutate(root, c.linksIo) {
                case Some(m) =>
                  m.copy(sourceVersions = m.sourceVersions ++ updatedVersions)
                case None => throw new IllegalStateException(
                  s"materialized view $name dropped during refresh")
              }
              Seq(name, true, label,
                TransactionalTable.open(spark, storageRoot).currentVersion)
            case None =>
              val df0 = org.apache.spark.sql.graftshim.GraftShims.ofRows(spark, qualified)
              val df = if (df0.columns.toSeq != cur.columnAliases)
                df0.toDF(cur.columnAliases: _*) else df0
              val replaced = storage.replaceWith(df, df.schema, storage.pk,
                storage.partitionSpec)
              // a storage replace invalidates any count_distinct aux counts
              // (E180) — drop them; the next incremental refresh
              // re-bootstraps from its new baseline
              GraftMvRefresh.dropDistinctAux(root)
              val (sources, external) =
                GraftViewResolution.engineSources(df.queryExecution.analyzed)
              GraftViewStore.mutate(root, c.linksIo) {
                case Some(m) =>
                  m.copy(sourceVersions = sources, externalSources = external)
                case None => throw new IllegalStateException(
                  s"materialized view $name dropped during refresh")
              }
              val reason =
                if (meta.externalSources) "external sources"
                else s"stale: ${staleSources.keys.toSeq.sorted.mkString(",")}"
              Seq(name, true, reason, replaced.currentVersion)
          }
        }
      }),

    // LLM-pipeline index procedures — the SQL/CALL surface over the
    // persistent dedup/ANN indexes, so every pipeline feature is reachable
    // from SQL (the reference's everything-through-SQL posture,
    // README.md:436,511). Sources/queries are named tables or temp views;
    // row-set results register as temp views (the create_changelog_view
    // idiom) so plain SQL consumes them.
    //
    //   CALL graft.system.dedup_index_create('db.idx')
    //   CALL graft.system.dedup_index_append('db.idx', 'batch_view', 0, 'kept0')
    //   CALL graft.system.ann_index_create('db.ann', 'seed_view', 16)
    //   CALL graft.system.ann_index_append('db.ann', 'batch_view', 0, 2)
    //   CALL graft.system.ann_probe('db.ann', 'query_view', 5, 4, 'hits')
    //   CALL graft.system.ann_status('db.ann')
    "dedup_index_create" -> Spec(
      Seq("table" -> S),
      row("index" -> S, "version" -> L),
      (c, a) => {
        val name = a.getUTF8String(0).toString
        val t = graft.ops.DedupIndex.create(
          org.apache.spark.sql.SparkSession.active, c.createRootByName(name))
        Seq(name, t.currentVersion)
      }),

    // Appends one batch (replay-fenced on batch_id) and registers the kept
    // doc ids as `kept_view` — the read-back contract makes a re-CALL of a
    // committed batch return the original kept set.
    "dedup_index_append" -> Spec(
      Seq("table" -> S, "source" -> S, "batch_id" -> L, "kept_view" -> S),
      row("kept_view" -> S, "kept_docs" -> L, "index_version" -> L),
      (c, a) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val index = open(c, a)
        val kept = graft.ops.DedupIndex.appendBatch(index,
          spark.table(a.getUTF8String(1).toString), a.getLong(2))
        val view = a.getUTF8String(3).toString
        kept.createOrReplaceTempView(view)
        Seq(view, kept.count(), index.currentVersion)
      }),

    "ann_index_create" -> Spec(
      Seq("index" -> S, "seed_source" -> S, "cells" -> I),
      row("index" -> S, "cells" -> L),
      (c, a) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val name = a.getUTF8String(0).toString
        val h = graft.ops.AnnIndex.create(spark, c.createRootByName(name),
          spark.table(a.getUTF8String(1).toString), a.getInt(2))
        Seq(name, h.centroids.scan().count())
      }),

    "ann_index_append" -> Spec(
      Seq("index" -> S, "source" -> S, "batch_id" -> L, "compact_every" -> I),
      row("indexed_vectors" -> L, "assignments_version" -> L),
      (c, a) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val h = graft.ops.AnnIndex.open(spark, c.rootByName(a.getUTF8String(0).toString))
        val src = spark.table(a.getUTF8String(1).toString)
        graft.ops.AnnIndex.appendBatch(h, src, a.getLong(2),
          compactEvery = a.getInt(3))
        Seq(src.count(), h.assignments.currentVersion)
      }),

    // Partition-pruned approximate top-k over the persistent index,
    // registered as `result_view` (qid, neighbor_id, rnk).
    "ann_probe" -> Spec(
      Seq("index" -> S, "queries" -> S, "k" -> I, "nprobe" -> I,
        "result_view" -> S),
      row("result_view" -> S, "n_results" -> L),
      (c, a) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val h = graft.ops.AnnIndex.open(spark, c.rootByName(a.getUTF8String(0).toString))
        val hits = graft.ops.AnnIndex.probe(h,
          spark.table(a.getUTF8String(1).toString), a.getInt(2), a.getInt(3))
        val view = a.getUTF8String(4).toString
        hits.createOrReplaceTempView(view)
        Seq(view, hits.count())
      }),

    // DELETE maintenance (r18): remove a view's vec_ids from the index —
    // and the PQ codes table when one rides beside it (pass '' for none) —
    // so corpus removals (SQL DELETE, evictions, decontamination drops)
    // stop surfacing as ghost neighbors. Fenced per batch_id: replays no-op.
    //   CALL graft.system.ann_delete('db.ann', 'deleted_ids', 3, 'db.codes')
    "ann_delete" -> Spec(
      Seq("index" -> S, "ids" -> S, "batch_id" -> L, "codes" -> S),
      row("deleted" -> L, "n_vectors" -> L, "assignments_version" -> L),
      (c, a) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val h = graft.ops.AnnIndex.open(spark, c.rootByName(a.getUTF8String(0).toString))
        val ids = spark.table(a.getUTF8String(1).toString)
        val codesName = a.getUTF8String(3).toString
        val codes =
          if (codesName.isEmpty) None
          else Some(graft.table.TransactionalTable.open(spark,
            c.rootByName(codesName)))
        // `deleted` = rows that actually LEFT the index (before − after),
        // not the requested id-set size — absent ids and fenced-replay
        // no-ops must read 0, or a runbook keying on it confirms a
        // removal that never happened (review r18)
        val before = graft.ops.AnnIndex.status(h).nVectors
        graft.ops.AnnIndex.deleteBatch(h, ids, a.getLong(2), codes = codes)
        val after = graft.ops.AnnIndex.status(h).nVectors
        Seq(before - after, after, h.assignments.currentVersion)
      }),

    // Drift observability for the frozen quantizer: cell-occupancy skew
    // (max cell fraction vs the 1/cells ideal) is the signal that the
    // corpus has drifted from the seed distribution and probe pruning is
    // degenerating — the operator's retrain trigger.
    "ann_status" -> Spec(
      Seq("index" -> S),
      row("n_vectors" -> L, "n_cells" -> L, "max_cell_fraction" -> DoubleType,
        "last_retrain" -> S, "assignments_version" -> L,
        "centroids_version" -> L),
      (c, a) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val h = graft.ops.AnnIndex.open(spark, c.rootByName(a.getUTF8String(0).toString))
        val s = graft.ops.AnnIndex.status(h)
        Seq(s.nVectors, s.nCells, s.maxCellFraction, s.lastRetrain.getOrElse(""),
          h.assignments.currentVersion, h.centroids.currentVersion)
      }),

    // IVF-PQ from SQL (E186/E187): codebooks train on the index's own unit
    // vectors, the codes land cell-partitioned beside the index, and the
    // trained books persist in the codes table's metadata (exact double
    // round-trip) so a probe in a LATER session replays them — the books
    // must NOT re-derive from a since-grown index.
    "pq_codes_build" -> Spec(
      Seq("index" -> S, "codes" -> S, "m" -> I, "k" -> I),
      row("codes" -> S, "n_vectors" -> L),
      (c, a) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val h = graft.ops.AnnIndex.open(spark,
          c.rootByName(a.getUTF8String(0).toString))
        import org.apache.spark.sql.functions.col
        val books = graft.ops.PqOps.codebooks(
          h.assignments.scan().select(col("vec_id"), col("v").as("embedding")),
          a.getInt(2), a.getInt(3))
        val name = a.getUTF8String(1).toString
        val t = graft.ops.PqOps.buildPqCodes(h, c.createRootByName(name), books)
        t.setCustomMeta("pq.books", graft.ops.PqOps.booksToString(books))
        Seq(name, t.scan().count())
      }),

    // Dedup-family index observability (the ann_status sibling for the
    // banded indexes — DedupIndex / KeepBestIndex / Hamming media / video):
    // one scan pass over the index table reporting size, live
    // representatives, eviction-log debt (keep-best only; 0 elsewhere),
    // batch coverage and file count — the numbers an operator checks
    // before trusting a compaction cadence or sizing a corpus filter.
    //   CALL graft.system.index_status('db.idx')
    "index_status" -> Spec(
      Seq("index" -> S),
      row("n_rows" -> L, "n_live" -> L, "n_evict_log" -> L, "n_batches" -> L,
        "last_batch" -> L, "version" -> L, "files" -> L),
      (c, a) => {
        import org.apache.spark.sql.functions._
        val t = open(c, a)
        val idCol = t.schema.fieldNames.find(n =>
          n.equalsIgnoreCase("doc_id") || n.equalsIgnoreCase("media_id"))
          .getOrElse(throw new IllegalArgumentException(
            "not a dedup-family index table (no doc_id/media_id column)"))
        val r = t.scan().agg(
          count(lit(1)).as("n"),
          countDistinct(when(col("band") >= 0, col(idCol))).as("live"),
          sum(when(col("band") < 0, 1L).otherwise(0L)).as("evl"),
          countDistinct(col("batch")).as("nb"),
          max(col("batch")).as("lb")).collect()(0)
        def z(i: Int) = if (r.isNullAt(i)) 0L else r.getLong(i)
        Seq(z(0), z(1), z(2), z(3),
          if (r.isNullAt(4)) -1L else r.getLong(4),
          t.currentVersion, t.snapshot.files.size.toLong)
      }),

    // KEEP-BEST dedup index from SQL (E203/E204): quality-aware incremental
    // dedup — each append registers BOTH result views (kept ids + the
    // indexed docs the batch evicted), each read back from committed rows
    // so a re-CALL of a committed batch returns the original sets.
    //   CALL graft.system.keep_best_index_create('db.kb')
    //   CALL graft.system.keep_best_index_append('db.kb', 'batch_view', 0, 'kept0', 'evicted0')
    "keep_best_index_create" -> Spec(
      Seq("index" -> S),
      row("index" -> S, "version" -> L),
      (c, a) => {
        val name = a.getUTF8String(0).toString
        val t = graft.ops.KeepBestIndex.create(
          org.apache.spark.sql.SparkSession.active, c.createRootByName(name))
        Seq(name, t.currentVersion)
      }),

    "keep_best_index_append" -> Spec(
      Seq("index" -> S, "source" -> S, "batch_id" -> L, "kept_view" -> S,
        "evicted_view" -> S),
      row("kept_view" -> S, "kept_docs" -> L, "evicted_view" -> S,
        "evicted_docs" -> L, "index_version" -> L),
      (c, a) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val index = open(c, a)
        val r = graft.ops.KeepBestIndex.appendBatch(index,
          spark.table(a.getUTF8String(1).toString), a.getLong(2))
        val keptView = a.getUTF8String(3).toString
        val evictedView = a.getUTF8String(4).toString
        r.kept.createOrReplaceTempView(keptView)
        r.evicted.createOrReplaceTempView(evictedView)
        Seq(keptView, r.kept.count(), evictedView, r.evicted.count(),
          index.currentVersion)
      }),

    // Eviction-log retention for the keep-best index (E209): log rows exist
    // only for their own batch's replay read-back (most-recent-batch
    // contract), so rows from batches before `before_batch` are dead weight
    // on every index scan — one commit drops them; nothing stale is a no-op.
    //   CALL graft.system.keep_best_index_prune('db.kb', 5)
    "keep_best_index_prune" -> Spec(
      Seq("index" -> S, "before_batch" -> L),
      row("pruned" -> L, "version" -> L),
      (c, a) => {
        val index = open(c, a)
        val n = graft.ops.KeepBestIndex.pruneEvictLog(index, a.getLong(1))
        Seq(n, index.currentVersion)
      }),

    // DECONTAMINATION from SQL (E220 — the E215/E217 pair reachable
    // without Scala, the same everything-through-SQL argument as the
    // sampling family): span-level scrub returns every corpus doc with its
    // cleaned text + removed-token count; near-dup flags the docs inside
    // the benchmark's Hamming ball (paraphrase leaks the exact windows
    // miss). Sources are named tables/temp views with (doc_id, text).
    //   CALL graft.system.decontaminate_spans('corpus_v', 'bench_v', 8, 'clean_docs')
    //   CALL graft.system.decontaminate_near('corpus_v', 'bench_v', 3, 'flagged')
    "decontaminate_spans" -> Spec(
      Seq("corpus" -> S, "benchmark" -> S, "window" -> I, "result_view" -> S),
      row("result_view" -> S, "rows" -> L, "contaminated_docs" -> L),
      (c, a) => {
        val spark = org.apache.spark.sql.SparkSession.active
        import org.apache.spark.sql.functions.{coalesce, col, count, lit, sum, when}
        val out = graft.ops.DedupOps.removeContaminatedSpans(
          spark.table(a.getUTF8String(0).toString),
          spark.table(a.getUTF8String(1).toString), a.getInt(2))
        val view = a.getUTF8String(3).toString
        out.createOrReplaceTempView(view)
        // both counts from ONE pass — the scrub pipeline is the expensive
        // leg and must not run twice for a pair of scalars
        val stats = out.agg(count(lit(1)).as("n"),
          coalesce(sum(when(col("n_removed") > 0, 1L).otherwise(0L)), lit(0L))
            .as("dirty")).collect()(0)
        Seq(view, stats.getLong(0), stats.getLong(1))
      }),

    "decontaminate_near" -> Spec(
      Seq("corpus" -> S, "benchmark" -> S, "max_dist" -> I, "result_view" -> S),
      row("result_view" -> S, "flagged_docs" -> L),
      (c, a) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val out = graft.ops.DedupOps.nearContaminated(
          spark.table(a.getUTF8String(0).toString),
          spark.table(a.getUTF8String(1).toString), a.getInt(2))
        val view = a.getUTF8String(3).toString
        out.createOrReplaceTempView(view)
        Seq(view, out.count())
      }),

    // Snapshot-then-tail start-up from SQL (the E218 consumer birth): one
    // CALL registers the consumer at the head, registers the full reader
    // corpus as `snapshot_view`, and returns the manifest version to tail
    // streamIntervals from.
    //   CALL graft.system.export_snapshot('db.exp', 'trainer-a', 'snap')
    "export_snapshot" -> Spec(
      Seq("export_root" -> S, "consumer" -> S, "snapshot_view" -> S),
      row("snapshot_view" -> S, "n_docs" -> L, "tail_from_version" -> L),
      (c, a) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val (df, v) = graft.ops.ExportOps.snapshotForConsumer(spark,
          c.rootByName(a.getUTF8String(0).toString),
          a.getUTF8String(1).toString)
        val view = a.getUTF8String(2).toString
        df.createOrReplaceTempView(view)
        Seq(view, df.count(), v)
      }),

    // QUALITY-DRIFT monitor from SQL (E221's runbook surface): append one
    // micro-batch's token-length histogram; score the tail against a
    // reference window off the stored rows.
    //   CALL graft.system.quality_monitor_append('db.stats', 'docs_view', 0)
    //   CALL graft.system.quality_drift('db.stats', 1, 0.25)
    "quality_monitor_append" -> Spec(
      Seq("stats" -> S, "source" -> S, "batch_id" -> L),
      row("batch_id" -> L, "committed" -> BooleanType, "n_docs" -> L,
        "version" -> L),
      (c, a) => {
        val spark = org.apache.spark.sql.SparkSession.active
        import org.apache.spark.sql.functions.col
        val stats = open(c, a)
        val docs = spark.table(a.getUTF8String(1).toString)
        // `committed` = false when the writer fence dropped the append (an
        // out-of-order backfill) — the operator must SEE the no-op
        val committed = graft.ops.QualityMonitor.appendBatch(stats, docs,
          a.getLong(2))
        // doc count from the token-length block only: a signal-keyed
        // table (r19) stores one histogram block per dimension, and
        // summing across blocks would count each doc once per signal
        val batchRows = stats.scan().where(col("batch") === a.getLong(2))
        val n = (if (stats.schema.fieldNames.contains("signal"))
            batchRows.where(col("signal") ===
              graft.ops.QualityMonitor.TokenLength.name)
          else batchRows)
          .agg(org.apache.spark.sql.functions.sum("n_docs")).collect()(0)
        Seq(a.getLong(2), committed, if (n.isNullAt(0)) 0L else n.getLong(0),
          stats.currentVersion)
      }),

    "quality_drift" -> Spec(
      Seq("stats" -> S, "ref_up_to_batch" -> L, "threshold" -> D),
      row("psi" -> DoubleType, "n_ref" -> L, "n_cur" -> L,
        "drifted" -> BooleanType),
      (c, a) => {
        val r = graft.ops.QualityMonitor.drift(open(c, a), a.getLong(1),
          a.getDouble(2))
        Seq(r.psi, r.nRef, r.nCur, r.drifted)
      }),

    // Per-source drift verdict (r18): the WORST source row — the single
    // row an alerting runbook keys on where the corpus-level score would
    // dilute one collapsing source under the rest of the traffic.
    //   CALL graft.system.quality_drift_by_source('db.stats', 1, 0.25)
    "quality_drift_by_source" -> Spec(
      Seq("stats" -> S, "ref_up_to_batch" -> L, "threshold" -> D),
      row("source" -> S, "psi" -> DoubleType, "n_ref" -> L, "n_cur" -> L,
        "drifted" -> BooleanType, "n_sources" -> L),
      (c, a) => {
        val all = graft.ops.QualityMonitor.driftBySource(open(c, a),
          a.getLong(1), a.getDouble(2))
        val w = graft.ops.QualityMonitor.worstOf(all)
          .getOrElse(graft.ops.QualityMonitor.SourceDrift("", 0.0, 0L, 0L,
            drifted = false))
        Seq(w.source, w.psi, w.nRef, w.nCur, w.drifted, all.size.toLong)
      }),

    // Per-(signal, source) drift verdict (r19): the WORST dimension row —
    // catches a source whose token-length histogram stays flat while its
    // symbol mix collapses (markup regression, encoding corruption).
    //   CALL graft.system.quality_drift_signals('db.stats', 1, 0.25)
    "quality_drift_signals" -> Spec(
      Seq("stats" -> S, "ref_up_to_batch" -> L, "threshold" -> D),
      row("signal" -> S, "source" -> S, "psi" -> DoubleType, "n_ref" -> L,
        "n_cur" -> L, "drifted" -> BooleanType, "n_rows" -> L),
      (c, a) => {
        val all = graft.ops.QualityMonitor.driftBySignals(open(c, a),
          a.getLong(1), a.getDouble(2))
        val w = graft.ops.QualityMonitor.worstOfSignals(all)
          .getOrElse(graft.ops.QualityMonitor.SignalDrift("", "", 0.0, 0L,
            0L, drifted = false))
        Seq(w.signal, w.source, w.psi, w.nRef, w.nCur, w.drifted,
          all.size.toLong)
      }),

    // BATCH SAMPLING family from SQL (r16 verdict #6 — the last pipeline
    // family that was Scala-API only; the reference's posture is SQL-first,
    // README.md:436): each procedure runs the corresponding DedupOps
    // sampling op over a named table/temp view and registers the result as
    // `result_view` (the create_changelog_view idiom), so the full
    // train/val/test + mixing recipe is expressible without Scala. Spec
    // strings are 'name:weight' lists — the same shapes the Scala API
    // takes as Seq.
    //   CALL graft.system.hash_split('docs_view', 'train:8,val:1,test:1', '', 'doc_id', 'splits')
    //   CALL graft.system.temperature_sample('docs_view', 'source', 0.5, 0.5, 'doc_id', 'sample')
    //   CALL graft.system.cap_per_group('docs_view', 'source', 5, 'doc_id', 'capped')
    //   CALL graft.system.upsample_epochs('docs_view', 'src0:2.5,src1:0.25,src2:0.0', 'source', 'doc_id', 'epochs')
    "hash_split" -> Spec(
      Seq("source" -> S, "splits" -> S, "salt" -> S, "id_col" -> S,
        "result_view" -> S),
      row("result_view" -> S, "rows" -> L),
      (c, a) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val splits = specList(a.getUTF8String(1).toString)
          .map { case (k, v) => k -> v.toInt }
        val out = graft.ops.DedupOps.hashSplit(
          spark.table(a.getUTF8String(0).toString), splits,
          salt = a.getUTF8String(2).toString,
          idCol = a.getUTF8String(3).toString)
        val view = a.getUTF8String(4).toString
        out.createOrReplaceTempView(view)
        Seq(view, out.count())
      }),

    "temperature_sample" -> Spec(
      Seq("source" -> S, "group_col" -> S, "alpha" -> D, "frac" -> D,
        "id_col" -> S, "result_view" -> S),
      row("result_view" -> S, "rows" -> L),
      (c, a) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val out = graft.ops.DedupOps.temperatureSample(
          spark.table(a.getUTF8String(0).toString),
          groupCol = a.getUTF8String(1).toString,
          alpha = a.getDouble(2), frac = a.getDouble(3),
          idCol = a.getUTF8String(4).toString)
        val view = a.getUTF8String(5).toString
        out.createOrReplaceTempView(view)
        Seq(view, out.count())
      }),

    "cap_per_group" -> Spec(
      Seq("source" -> S, "group_col" -> S, "k" -> I, "id_col" -> S,
        "result_view" -> S),
      row("result_view" -> S, "rows" -> L),
      (c, a) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val out = graft.ops.DedupOps.capPerGroup(
          spark.table(a.getUTF8String(0).toString),
          groupCol = a.getUTF8String(1).toString, k = a.getInt(2),
          idCol = a.getUTF8String(3).toString)
        val view = a.getUTF8String(4).toString
        out.createOrReplaceTempView(view)
        Seq(view, out.count())
      }),

    "upsample_epochs" -> Spec(
      Seq("source" -> S, "epochs" -> S, "group_col" -> S, "id_col" -> S,
        "result_view" -> S),
      row("result_view" -> S, "rows" -> L),
      (c, a) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val epochs = specList(a.getUTF8String(1).toString)
          .map { case (k, v) => k -> v.toDouble }
        val out = graft.ops.DedupOps.upsampleEpochs(
          spark.table(a.getUTF8String(0).toString), epochs,
          groupCol = a.getUTF8String(2).toString,
          idCol = a.getUTF8String(3).toString)
        val view = a.getUTF8String(4).toString
        out.createOrReplaceTempView(view)
        Seq(view, out.count())
      }),

    // MEDIA dedup indexes from SQL (the last index family that was
    // Scala-API only — the reference's SQL-first posture): one generic
    // create/append pair over the HammingIndex core, dispatched on `kind`
    // (image = perceptual dHash 4×14, audio = energy-delta 4×8, video =
    // per-frame kernel). Sources are named tables/temp views with
    // (media_id, content BINARY); the kept ids register as `kept_view`
    // with the same replay read-back contract as dedup_index_append.
    //   CALL graft.system.media_index_create('db.idx', 'image')
    //   CALL graft.system.media_index_append('db.idx', 'image', 'batch_view', 0, 'kept0')
    "media_index_create" -> Spec(
      Seq("index" -> S, "kind" -> S),
      row("index" -> S, "kind" -> S, "version" -> L),
      (c, a) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val name = a.getUTF8String(0).toString
        val kind = a.getUTF8String(1).toString.toLowerCase(java.util.Locale.ROOT)
        val t = kind match {
          case "image" => graft.ops.ImageDedupIndex.create(spark, c.createRootByName(name))
          case "audio" => graft.ops.AudioDedupIndex.create(spark, c.createRootByName(name))
          case "video" => graft.ops.VideoDedupIndex.create(spark, c.createRootByName(name))
          case other => throw new IllegalArgumentException(
            s"unknown media index kind '$other' (image|audio|video)")
        }
        Seq(name, kind, t.currentVersion)
      }),

    "media_index_append" -> Spec(
      Seq("index" -> S, "kind" -> S, "source" -> S, "batch_id" -> L,
        "kept_view" -> S),
      row("kept_view" -> S, "kept_media" -> L, "index_version" -> L),
      (c, a) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val index = open(c, a)
        val kind = a.getUTF8String(1).toString.toLowerCase(java.util.Locale.ROOT)
        val media = spark.table(a.getUTF8String(2).toString)
        val batchId = a.getLong(3)
        val kept = kind match {
          case "image" => graft.ops.ImageDedupIndex.appendBatch(index, media, batchId)
          case "audio" => graft.ops.AudioDedupIndex.appendBatch(index, media, batchId)
          case "video" => graft.ops.VideoDedupIndex.appendBatch(index, media, batchId)
          case other => throw new IllegalArgumentException(
            s"unknown media index kind '$other' (image|audio|video)")
        }
        val view = a.getUTF8String(4).toString
        kept.createOrReplaceTempView(view)
        Seq(view, kept.count(), index.currentVersion)
      }),

    // RESIDUAL IVF-PQ from SQL (E191 twin of pq_codes_build): codebooks
    // train on the k lowest-id RESIDUALS and codes quantize v − centroid;
    // the `pq.residual` metadata stamp routes pq_probe to the residual
    // scorer (centroid dot term + residual ADC).
    "pq_codes_build_residual" -> Spec(
      Seq("index" -> S, "codes" -> S, "m" -> I, "k" -> I),
      row("codes" -> S, "n_vectors" -> L),
      (c, a) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val h = graft.ops.AnnIndex.open(spark,
          c.rootByName(a.getUTF8String(0).toString))
        val name = a.getUTF8String(1).toString
        val (t, _) = graft.ops.PqOps.buildPqCodesResidual(h,
          c.rootByName(name), a.getInt(2), a.getInt(3))
        Seq(name, t.scan().count())
      }),

    // REBUILD the codes table against the index's CURRENT quantizer (E206):
    // AnnIndex.retrain invalidates every stored code row (cells + encodings),
    // and the freshness fence makes pq_probe/appendCodes refuse until this
    // runs — retrain books by the table's own rule (raw/residual from the
    // pq.residual stamp; refine_iters Lloyd rounds), re-encode the whole
    // index, swap in ONE atomic overwrite.
    //   CALL graft.system.pq_rebuild('db.ann', 'db.codes', 0)
    "pq_rebuild" -> Spec(
      Seq("index" -> S, "codes" -> S, "refine_iters" -> I),
      row("codes" -> S, "n_vectors" -> L, "version" -> L),
      (c, a) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val h = graft.ops.AnnIndex.open(spark,
          c.rootByName(a.getUTF8String(0).toString))
        val name = a.getUTF8String(1).toString
        val codes = TransactionalTable.open(spark, c.rootByName(name))
        graft.ops.PqOps.rebuildCodes(h, codes, a.getInt(2))
        Seq(name, codes.scan().count(), codes.currentVersion)
      }),

    "pq_probe" -> Spec(
      Seq("index" -> S, "codes" -> S, "queries" -> S, "k" -> I, "nprobe" -> I,
        "result_view" -> S),
      row("result_view" -> S, "n_results" -> L),
      (c, a) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val h = graft.ops.AnnIndex.open(spark,
          c.rootByName(a.getUTF8String(0).toString))
        val codes = TransactionalTable.open(spark,
          c.rootByName(a.getUTF8String(1).toString))
        val books = graft.ops.PqOps.booksFromString(
          codes.customMeta("pq.books").getOrElse(throw new IllegalStateException(
            "codes table carries no pq.books metadata — built outside pq_codes_build?")))
        val queries = spark.table(a.getUTF8String(2).toString)
        // dispatch on the codes table's own encoding stamp: residual books
        // scored by the raw-vector ADC would silently mis-rank (the books
        // quantize v − centroid, and the centroid dot term would be
        // missing) — ADVICE r15
        val residual = codes.customMeta("pq.residual").contains("true")
        val hits =
          if (residual) graft.ops.AnnIndex.probePqResidual(h, codes, books,
            queries, a.getInt(3), a.getInt(4))
          else graft.ops.AnnIndex.probePq(h, codes, books,
            queries, a.getInt(3), a.getInt(4))
        val view = a.getUTF8String(5).toString
        hits.createOrReplaceTempView(view)
        Seq(view, hits.count())
      }),

    // Incremental training-data export from SQL (E184/E187): publish the
    // corpus delta (from_version → to_version) as sharded packed parquet +
    // tombstones under the named export root; fenced — a re-CALL of a
    // published interval reports exported=false and changes nothing.
    "export_delta" -> Spec(
      Seq("table" -> S, "export_root" -> S, "from_version" -> L,
        "to_version" -> L, "n_shards" -> I, "capacity" -> L),
      row("exported" -> BooleanType, "n_docs" -> L, "n_tombstones" -> L,
        "dir" -> S),
      (c, a) => {
        val corpus = open(c, a)
        val r = graft.ops.ExportOps.exportDelta(corpus,
          c.rootByName(a.getUTF8String(1).toString),
          a.getLong(2), a.getLong(3), a.getInt(4), a.getLong(5))
        // count from the deterministic assignment, not the dir — a fenced
        // re-CALL of an interval older than the fence has no dir to read
        Seq(r.exported, r.assignment.count(), r.tombstones.count(), r.dir)
      }),

    // Export-lifecycle observability + maintenance (E202):
    //   CALL graft.system.export_status('db.exp', 'exp_detail')
    //     → one summary row (interval count, doc/token totals, tombstone
    //       debt, head version) + the per-interval manifest rows registered
    //       as `detail_view` for plain SQL.
    //   CALL graft.system.export_pack('db.exp')
    //     → folds every published interval into one consolidated export
    //       (latest copy per doc, tombstones applied, zero remaining debt)
    //       behind one atomic manifest flip; re-CALL at the same head
    //       no-ops.
    "export_status" -> Spec(
      Seq("export_root" -> S, "detail_view" -> S),
      row("intervals" -> L, "n_docs" -> L, "n_tokens" -> L,
        "tombstone_debt" -> L, "head_version" -> L),
      (c, a) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val root = c.rootByName(a.getUTF8String(0).toString)
        val ivs = graft.ops.ExportOps.intervals(spark, root)
        graft.ops.ExportOps.manifest(spark, root).scan()
          .createOrReplaceTempView(a.getUTF8String(1).toString)
        Seq(ivs.size.toLong, ivs.map(_.nDocs).sum, ivs.map(_.nTokens).sum,
          ivs.map(_.nTombstones).sum, ivs.map(_.toV).maxOption.getOrElse(0L))
      }),

    "export_pack" -> Spec(
      Seq("export_root" -> S),
      row("packed" -> BooleanType, "intervals_before" -> L, "n_docs" -> L,
        "dir" -> S),
      (c, a) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val r = graft.ops.ExportOps.pack(spark,
          c.rootByName(a.getUTF8String(0).toString))
        Seq(r.packed, r.intervalsBefore, r.nDocs, r.dir)
      }),

    // Consumer low-watermark runbook ops (E218, the operator surface of
    // the pack contract): ack progress / list acks / drop a decommissioned
    // consumer — the calls an external trainer's orchestrator issues.
    //   CALL graft.system.export_ack('db.exp', 'trainer-a', 7)
    //   CALL graft.system.export_consumers('db.exp', 'acks_view')
    //   CALL graft.system.export_drop_consumer('db.exp', 'trainer-a')
    "export_ack" -> Spec(
      Seq("export_root" -> S, "consumer" -> S, "to_version" -> L),
      row("consumer" -> S, "acked_to" -> L, "pack_watermark" -> L),
      (c, a) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val root = c.rootByName(a.getUTF8String(0).toString)
        val consumer = a.getUTF8String(1).toString
        graft.ops.ExportOps.ackConsumed(spark, root, consumer, a.getLong(2))
        val acks = graft.ops.ExportOps.consumerAcks(spark, root)
        Seq(consumer, acks(consumer), acks.values.min)
      }),

    "export_consumers" -> Spec(
      Seq("export_root" -> S, "acks_view" -> S),
      row("n_consumers" -> L, "pack_watermark" -> L),
      (c, a) => {
        val spark = org.apache.spark.sql.SparkSession.active
        import spark.implicits._
        val acks = graft.ops.ExportOps.consumerAcks(spark,
          c.rootByName(a.getUTF8String(0).toString))
        acks.toSeq.sorted.toDF("consumer", "acked_to")
          .createOrReplaceTempView(a.getUTF8String(1).toString)
        Seq(acks.size.toLong,
          if (acks.isEmpty) Long.MaxValue else acks.values.min)
      }),

    "export_drop_consumer" -> Spec(
      Seq("export_root" -> S, "consumer" -> S),
      row("remaining_consumers" -> L),
      (c, a) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val root = c.rootByName(a.getUTF8String(0).toString)
        graft.ops.ExportOps.dropConsumer(spark, root,
          a.getUTF8String(1).toString)
        Seq(graft.ops.ExportOps.consumerAcks(spark, root).size.toLong)
      }),

    "mv_status" -> Spec(
      Seq("view" -> S),
      row("view" -> S, "fresh" -> BooleanType, "stale_sources" -> S,
        "n_sources" -> L),
      (c, a) => {
        val name = a.getUTF8String(0).toString
        val spark = org.apache.spark.sql.SparkSession.active
        val meta = GraftViewStore.load(c.viewRootByName(name), c.linksIo)
        require(meta.materialized, s"$name is a plain view, not materialized")
        val stale = meta.sourceVersions.filter { case (r, v) =>
          !TransactionalTable.exists(r) ||
            TransactionalTable.open(spark, r).currentVersion != v
        }.keys.toSeq.sorted
        val fresh = !meta.externalSources && stale.isEmpty
        val staleDesc =
          (if (meta.externalSources) Seq("(external)") else Nil) ++ stale
        Seq(name, fresh, staleDesc.mkString(","),
          meta.sourceVersions.size.toLong)
      }))

  def names: Seq[String] = specs.keys.toSeq.sorted

  def load(cat: GraftCatalog, name: String): Option[UnboundProcedure] =
    specs.get(name.toLowerCase(java.util.Locale.ROOT)).map(new P(name, _, cat))
}
