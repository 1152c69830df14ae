package graft.sql

import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.table.TransactionalTable

/**
 * DSv2 catalog over TransactionalTable warehouses: the SQL front door the
 * reference gets from Glue+Iceberg (`spark_sql_merge_into_iceberg.py:53-58`
 * registers `SparkCatalog`; Athena queries `catalog.db.table`,
 * `README.md:507-513`). Register with:
 *
 *   spark.sql.catalog.graft            = graft.sql.GraftCatalog
 *   spark.sql.catalog.graft.warehouse  = /path/to/warehouse
 *
 * then `SELECT * FROM graft.db.tbl` and `... VERSION AS OF n` (time travel)
 * resolve through Catalyst. Reads delegate to Spark's internal ParquetTable
 * over the snapshot's file list — vectorized scans, filter pushdown and
 * column pruning come for free, and the file list is pinned at resolution
 * time so queries are snapshot-consistent. SQL writes route through the
 * engine's transactional commits when `graft.sql.GraftExtensions` is
 * registered: `MERGE INTO` (GraftMergeRule) and `INSERT INTO` (append);
 * other write forms are rejected — there is no path that bypasses the
 * manifest.
 */
class GraftCatalog extends TableCatalog with SupportsNamespaces with ProcedureCatalog
    with FunctionCatalog with ViewCatalog {

  private var catalogName: String = _
  private var warehouse: String = _
  /** `renameMode` catalog option: "move" (default — the POSIX fast path,
    * one atomic directory move) or "metadata" (the object-store posture —
    * `ALTER TABLE RENAME TO` rebinds the name in the namespace's
    * [[CatalogLinks]] map and never touches the data directory). */
  private var renameMode: String = "move"
  /** Commit I/O for the links map — specs inject a simulated object store
    * here (the ObjectStoreCommitSpec pattern; `private[graft]` so the
    * table-package spec can reach it like `TransactionalTable.commitIo`). */
  private[graft] var linksIo: graft.table.CommitIO = graft.table.PosixCommitIO

  private def spark = SparkSession.active

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      sys.props("java.io.tmpdir") + "/graft-warehouse")
    renameMode = Option(options.get("renameMode")).getOrElse("move")
    require(renameMode == "move" || renameMode == "metadata",
      s"renameMode must be 'move' or 'metadata', got '$renameMode'")
  }

  override def name(): String = catalogName

  /** Opt in to column DEFAULT values (Iceberg v3 default-value parity):
    * Spark then ships `CREATE TABLE (c INT DEFAULT 5)` / `ALTER TABLE ADD
    * COLUMN ... DEFAULT` to this catalog (CURRENT_DEFAULT/EXISTS_DEFAULT
    * column metadata + TableChange.AddColumn.defaultValue) and resolves
    * INSERTs that omit the column from the table's reported metadata. */
  override def capabilities(): java.util.Set[
      org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(org.apache.spark.sql.connector.catalog
      .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  private def nsDirOf(ident: Identifier): String =
    (warehouse +: ident.namespace().toSeq).mkString("/")

  /** Name resolution consults the namespace's [[CatalogLinks]] map first
    * (metadata renames — r17 review #6): a LINKED name resolves to its
    * physical directory, a TOMBSTONED one to its own (hidden at the
    * exists level), everything else to the path convention. Namespaces
    * that never metadata-renamed pay one file-exists check. */
  private def rootOf(ident: Identifier): String = {
    val ns = nsDirOf(ident)
    CatalogLinks.resolve(ns, ident.name(), linksIo) match {
      case CatalogLinks.Linked(phys) => s"$ns/$phys"
      case _ => s"$ns/${ident.name()}"
    }
  }

  /** Table root on disk for an identifier (used by the CTAS command to open
    * the freshly created table through the engine API). */
  private[sql] def tableRoot(ident: Identifier): String = rootOf(ident)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val nsDir = (warehouse +: namespace.toSeq).mkString("/")
    val dir = Paths.get(nsDir)
    if (!Files.isDirectory(dir)) Array.empty
    else {
      val links = CatalogLinks.read(nsDir, linksIo).entries
      // physical dirs under their own name, minus renamed-away ones ...
      val plain = graft.util.Fs.listSeq(dir).iterator
        .filter(p => TransactionalTable.exists(p.toString))
        .map(_.getFileName.toString)
        .filterNot(n => links.get(n).contains(None))
      // ... plus metadata-renamed names whose physical dir still exists
      val linked = links.iterator.collect {
        case (n, Some(phys)) if TransactionalTable.exists(s"$nsDir/$phys") => n
      }
      (plain ++ linked).toSeq.distinct.sorted
        .map(n => Identifier.of(namespace, n)).toArray
    }
  }

  override def tableExists(ident: Identifier): Boolean = resolvedTable(ident)._2

  // FunctionCatalog (storage-partitioned joins): Spark resolves the table's
  // bucket(n, col) transform here to decide scan co-partitioning.
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, "bucket"), Identifier.of(namespace, "md5_60"))
  override def loadFunction(ident: Identifier): org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.name().equalsIgnoreCase("bucket")) GraftBucketFunction
    else if (ident.name().equalsIgnoreCase("md5_60")) GraftMd560Function
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)

  // ---------------------------------------------------------------------
  // ViewCatalog (persisted SQL views, Iceberg-view parity): versioned view
  // metadata JSON in the warehouse, resolved through GraftViewRule on read.
  // ---------------------------------------------------------------------

  override def listViews(namespace: String*): Array[Identifier] = {
    val nsDir = (warehouse +: namespace).mkString("/")
    val dir = Paths.get(nsDir)
    if (!Files.isDirectory(dir)) Array.empty
    else {
      val links = CatalogLinks.read(nsDir, linksIo).entries
      // physical dirs under their own name, minus renamed-away ones ...
      val plain = graft.util.Fs.listSeq(dir).iterator
        .filter(p => GraftViewStore.exists(p.toString, linksIo))
        .map(_.getFileName.toString)
        .filterNot(n => links.get(n).contains(None))
      // ... plus metadata-renamed names whose physical dir still holds a view
      val linked = links.iterator.collect {
        case (n, Some(phys)) if GraftViewStore.exists(s"$nsDir/$phys", linksIo) => n
      }
      (plain ++ linked).toSeq.distinct.sorted
        .map(n => Identifier.of(namespace.toArray, n)).toArray
    }
  }

  /** ONE links resolution for view reads: the storage root when the name
    * is not tombstoned (r19 review pass 1 — the read path previously
    * re-resolved the links chain for the visible check, the root, and the
    * bytes separately). Existence of an actual stored view is the
    * caller's probe ([[GraftViewStore.currentBytes]]/exists). */
  private[sql] def visibleViewRoot(ident: Identifier): Option[String] = {
    val ns = nsDirOf(ident)
    CatalogLinks.resolve(ns, ident.name(), linksIo) match {
      case CatalogLinks.Tombstoned => None
      case CatalogLinks.Linked(phys) => Some(s"$ns/$phys")
      case CatalogLinks.Unlinked => Some(s"$ns/${ident.name()}")
    }
  }

  override def viewExists(ident: Identifier): Boolean =
    visibleViewRoot(ident).exists(GraftViewStore.exists(_, linksIo))

  override def loadView(ident: Identifier): View =
    if (!viewExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    else GraftViewStore.connectorView(ident, rootOf(ident), linksIo)

  /** Create-path root resolution for views — the same tombstone guard and
    * dangling-link reclaim [[createTable]] applies (r18 advice #2: the
    * view-create paths previously wrote at a DANGLING link's stale physical
    * directory, storing the view under one name while resolving it under
    * another). A LIVE link survives: REPLACE of a metadata-renamed view
    * must keep mutating its linked root. */
  private[sql] def viewCreateRoot(ident: Identifier): String = {
    val ns = nsDirOf(ident)
    CatalogLinks.resolve(ns, ident.name(), linksIo) match {
      case CatalogLinks.Tombstoned =>
        // renamed-away name: reusable once its directory is free; while the
        // directory still holds the renamed object, refuse LOUDLY rather
        // than co-locate a new view's metadata with its data
        if (Files.exists(Paths.get(s"$ns/${ident.name()}")))
          throw new IllegalStateException(
            s"cannot create '$ident': the name was renamed away by a " +
              "metadata rename and its directory still holds the renamed " +
              "object's data — drop the renamed object (or pick another name)")
        CatalogLinks.clearTombstone(ns, ident.name(), linksIo)
      case CatalogLinks.Linked(phys)
          if !TransactionalTable.exists(s"$ns/$phys") &&
            !GraftViewStore.exists(s"$ns/$phys", linksIo) =>
        CatalogLinks.unlink(ns, ident.name(), linksIo)
      case _ => ()
    }
    rootOf(ident)
  }

  override def createView(info: ViewInfo): View = {
    val root = viewCreateRoot(info.ident())
    // the raw dir probe backs up tableExists: a TOMBSTONED (renamed-away)
    // name's directory still holds the renamed table — a view created
    // there would co-locate view metadata with live table data
    if (tableExists(info.ident()) || TransactionalTable.exists(root))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(info.ident())
    GraftViewStore.mutate(root, linksIo) {
      case Some(_) =>
        throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(info.ident())
      case None => GraftViewStore.metaForDefinition(
        None, GraftViewStore.versionFromInfo(info), info.properties().asScala.toMap)
    }
    loadView(info.ident())
  }

  override def replaceView(info: ViewInfo, orCreate: Boolean): View = {
    val root = viewCreateRoot(info.ident())
    if (tableExists(info.ident()) || TransactionalTable.exists(root))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(info.ident())
    GraftViewStore.mutate(root, linksIo) { prior =>
      if (prior.isEmpty && !orCreate)
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(info.ident())
      GraftViewStore.metaForDefinition(
        prior, GraftViewStore.versionFromInfo(info), info.properties().asScala.toMap)
    }
    loadView(info.ident())
  }

  override def alterView(ident: Identifier, changes: ViewChange*): View = {
    // tombstone-aware existence FIRST (r19 review pass 1): rootOf maps a
    // renamed-away name to its still-occupied directory, so an unguarded
    // mutate would silently rewrite the RENAMED view through its dead name
    if (!viewExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    val root = rootOf(ident)
    GraftViewStore.mutate(root, linksIo) {
      case None =>
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
      case Some(meta) =>
        val props = changes.foldLeft(meta.properties) {
          case (p, s: ViewChange.SetProperty) => p + (s.property() -> s.value())
          case (p, r: ViewChange.RemoveProperty) => p - r.property()
          case (p, _) => p
        }
        meta.copy(properties = props)
    }
    loadView(ident)
  }

  override def dropView(ident: Identifier): Boolean = {
    val ns = nsDirOf(ident)
    val resolution = CatalogLinks.resolve(ns, ident.name(), linksIo)
    // a TOMBSTONED name must never delete the directory it used to point
    // at — the renamed view owns that data now (mirrors dropTable)
    if (resolution == CatalogLinks.Tombstoned) return false
    val root = rootOf(ident)
    val toUnlink = resolution match {
      case CatalogLinks.Linked(phys) => Seq(ident.name(), phys)
      case _ => Seq(ident.name())
    }
    if (!GraftViewStore.exists(root, linksIo)) {
      // a DANGLING link still occupies the name: retire it so the name is
      // re-creatable instead of wedged
      if (resolution != CatalogLinks.Unlinked)
        CatalogLinks.unlinkAll(ns, toUnlink, linksIo)
      false
    } else {
      // UNLINK FIRST, then delete (same crash reasoning as dropTable): a
      // crash between the two leaves an orphaned view dir under its
      // original, fully unbound name — visible, re-droppable, never wedged
      if (resolution != CatalogLinks.Unlinked)
        CatalogLinks.unlinkAll(ns, toUnlink, linksIo)
      GraftViewStore.drop(root, linksIo)
    }
  }

  /** `ALTER VIEW ... RENAME TO` — the same two postures as [[renameTable]]:
    * `move` does one atomic directory move; `metadata` rebinds the name in
    * the namespace's [[CatalogLinks]] map (views and tables share the map —
    * a name binds ONE object) and never touches the view directory. */
  override def renameView(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!viewExists(oldIdent))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(oldIdent)
    if (viewExists(newIdent) || tableExists(newIdent))
      throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(newIdent)
    if (renameMode == "metadata") {
      require(oldIdent.namespace().toSeq == newIdent.namespace().toSeq,
        "metadata rename rebinds a name within its namespace — a " +
          "cross-namespace rename needs renameMode=move")
      val ns = nsDirOf(newIdent)
      val oldRoot = rootOf(oldIdent)
      // an occupied target directory (ANOTHER renamed-away object's data)
      // refuses; the source's own physical dir is exempt (rename-back)
      val targetDir = s"$ns/${newIdent.name()}"
      if (targetDir != oldRoot && Files.exists(Paths.get(targetDir)))
        throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(newIdent)
      // a DANGLING link on the target name frees it for renames too
      CatalogLinks.resolve(ns, newIdent.name(), linksIo) match {
        case CatalogLinks.Linked(phys)
            if !TransactionalTable.exists(s"$ns/$phys") &&
              !GraftViewStore.exists(s"$ns/$phys", linksIo) =>
          CatalogLinks.unlink(ns, newIdent.name(), linksIo)
        case _ => ()
      }
      CatalogLinks.rename(nsDirOf(oldIdent), oldIdent.name(), newIdent.name(),
        linksIo)
    } else {
      GraftViewStore.rename(rootOf(oldIdent), rootOf(newIdent))
      // retire any stale binding on the moved-from name; lift any stale
      // tombstone on the target (mirrors renameTable's move branch)
      CatalogLinks.unlink(nsDirOf(oldIdent), oldIdent.name(), linksIo)
      CatalogLinks.clearTombstone(nsDirOf(newIdent), newIdent.name(), linksIo)
    }
  }

  /** The snapshot's file list as SQL-layer manifest entries — LAZY when the
    * manifest is chunked: the returned [[org.apache.spark.sql.graftshim.LazyManifest]]
    * carries chunk-level stats so planning (ManifestFileIndex) prunes whole
    * chunks before loading an entry; resolving the table materializes
    * NOTHING. Partition evolution rides along per chunk: partition values
    * decode under the chunk's own (uniform) spec, per-file specs after load. */
  private def lazyEntries(t: TransactionalTable, snap: graft.table.Snapshot)
      : Seq[org.apache.spark.sql.graftshim.ManifestEntry] = {
    import org.apache.spark.sql.graftshim.{EntryChunk, LazyManifest, ManifestEntry}
    def toEntry(f: graft.table.DataFile): ManifestEntry =
      ManifestEntry(f.path, f.partition, f.pkMin, f.pkMax, f.bytes, f.stats, f.bloom,
        t.specOf(f.specId).map(_.desc), rows = f.rows)
    snap.files match {
      case mf: graft.table.ManifestFiles =>
        new LazyManifest(mf.chunks.map { c =>
          EntryChunk(c.count, c.pkMin, c.pkMax, c.bytes,
            c.partitions, c.specId.flatMap(t.specOf).map(_.desc), c.stats,
            () => mf.load(c).map(toEntry), rows = c.rows)
        })
      case s => s.map(toEntry)
    }
  }

  override def loadTable(ident: Identifier): Table =
    loadAt(ident, None)

  /** `VERSION AS OF n` time travel — also accepts a TAG name
    * (`VERSION AS OF 'prod'`) or a BRANCH name (`VERSION AS OF 'audit'`
    * reads the branch head, read-only — Iceberg ref semantics). */
  override def loadTable(ident: Identifier, version: String): Table =
    version.toLongOption match {
      case Some(v) => loadAt(ident, Some(v))
      case None =>
        val (root, present) = resolvedTable(ident)
        if (!present) {
          // metadata-table suffix with a TAG ref: `t.files VERSION AS OF
          // 'prod'` resolves the tag against the parent table and scopes
          // the metadata answer to it
          val ns = ident.namespace().toSeq
          val meta = ident.name().toLowerCase(java.util.Locale.ROOT)
          if (ns.length >= 2 && MetadataTables.Names(meta)) {
            val parentRoot = (warehouse +: ns).mkString("/")
            if (TransactionalTable.exists(parentRoot)) {
              val parent = TransactionalTable.open(spark, parentRoot)
              parent.tags.get(version) match {
                case Some(v) =>
                  return MetadataTables.load(parent,
                    s"$catalogName.${ns.mkString(".")}", meta, Some(v))
                case None => throw new IllegalArgumentException(
                  s"no tag '$version' on ${ns.mkString(".")} " +
                    s"(tags: ${parent.tags.keys.mkString(", ")})")
              }
            }
          }
          throw new NoSuchTableException(ident)
        }
        val t = TransactionalTable.open(spark, root)
        t.tags.get(version) match {
          case Some(v) => loadAt(ident, Some(v))
          case None if t.listBranches.contains(version) =>
            val snap = t.branch(version).snapshot
            if (snap.deletes.nonEmpty || t.renames.nonEmpty)
              throw new UnsupportedOperationException(
                s"branch '$version' has pending merge-on-read deletes or renamed " +
                  "columns; read it via TransactionalTable.branch or compact the branch")
            val entries = lazyEntries(t, snap)
            new GraftSqlTable(
              s"$catalogName.${ident.namespace().mkString(".")}.${ident.name()}@$version",
              t.schema, entries, spark, root, Some(snap.version), t.pk,
              loadedVersion = snap.version, morPending = false,
              rowCount = snap.rowCount, renamesPending = false,
              pkHashed = t.pkIsString, partSpec = t.partitionSpec)
          case None => throw new IllegalArgumentException(
            s"no tag or branch '$version' on ${ident.name()} " +
              s"(tags: ${t.tags.keys.mkString(", ")}; branches: ${t.listBranches.mkString(", ")})")
        }
    }

  /** `TIMESTAMP AS OF ts` time travel — Catalyst passes MICROseconds since
    * epoch; resolve to the greatest snapshot committed at or before it. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val (root, present) = resolvedTable(ident)
    if (!present) throw new NoSuchTableException(ident)
    val t = TransactionalTable.open(spark, root)
    loadAt(ident, Some(t.versionAt(timestamp / 1000L)))
  }

  /** ONE links resolution per operation (r18 advice #4): `rootOf` +
    * `tableExists` each re-read the namespace's whole links version chain
    * (O(#renames) exists probes — several HEAD requests per table load on a
    * real object store). Resolve once and derive both the root and the
    * tombstone-aware existence from it. */
  private def resolvedTable(ident: Identifier): (String, Boolean) = {
    val ns = nsDirOf(ident)
    CatalogLinks.resolve(ns, ident.name(), linksIo) match {
      case CatalogLinks.Tombstoned => (s"$ns/${ident.name()}", false)
      case CatalogLinks.Linked(phys) =>
        val r = s"$ns/$phys"; (r, TransactionalTable.exists(r))
      case CatalogLinks.Unlinked =>
        val r = s"$ns/${ident.name()}"; (r, TransactionalTable.exists(r))
    }
  }

  private def loadAt(ident: Identifier, version: Option[Long]): Table = {
    val (root, present) = resolvedTable(ident)
    // tombstone-aware existence, not a raw dir probe: a TOMBSTONED name
    // (metadata-renamed away) still has a directory but must not load
    // under the old name
    if (!present) {
      // Iceberg-style metadata tables: `graft.db.t.history` parses as
      // namespace [db, t] + name "history" — serve the parent table's
      // metadata when the suffix names one (see MetadataTables).
      val ns = ident.namespace().toSeq
      val meta = ident.name().toLowerCase(java.util.Locale.ROOT)
      if (ns.length >= 2 && MetadataTables.Names(meta)) {
        val parentRoot = (warehouse +: ns).mkString("/")
        if (TransactionalTable.exists(parentRoot))
          // `version` rides along: `t.files VERSION AS OF n` answers with
          // snapshot n's inventory, not the live one
          return MetadataTables.load(TransactionalTable.open(spark, parentRoot),
            s"$catalogName.${ns.mkString(".")}", meta, version)
      }
      throw new NoSuchTableException(ident)
    }
    val t = TransactionalTable.open(spark, root)
    // Shred specs are read BEFORE the snapshot pointer: if an ALTER declaring
    // shredding lands in between, we pair an old spec with the new (already-
    // rewritten) snapshot — the rule simply doesn't rewrite and the query
    // reads the variant binary, correct but unaccelerated. The other order
    // pairs a NEW spec with a pre-rewrite snapshot whose files lack the
    // side-columns, and the rewrite would read absent columns as NULL.
    val shredSpecsAtLoad = t.variantShred
    val snap = version.map(t.snapshotAt).getOrElse(t.snapshot)
    // Partition evolution: each file prunes under the transform of the spec
    // it was WRITTEN with (its manifest specId), never the table's current one.
    val entries = lazyEntries(t, snap)
    // Pending merge-on-read deletes: the relation is flagged and rewritten by
    // GraftMorScanRule into the delete-aware anti-join plan — SQL reads work
    // whatever the table's write mode (the reference's product promise:
    // Athena reads the live Iceberg v2 table, `README.md:507-513`).
    // Time travel reads under the schema that version was committed with
    // (pre-DROP snapshots keep their column); live reads use the live schema.
    val sch = version.map(t.schemaAt).getOrElse(t.schema)
    // RENAME COLUMN bridge: when the resolved schema contains renamed columns,
    // files written before the rename carry the old name — route the read
    // through the engine's coalescing scan (GraftMorScanRule substitution),
    // same machinery as pending MOR deletes. A pre-rename time-travel schema
    // has no renamed columns and reads plainly.
    val renPending = t.renames.nonEmpty && sch.fieldNames
      .exists(f => t.renames.contains(f.toLowerCase(java.util.Locale.ROOT)))
    new GraftSqlTable(s"$catalogName.${ident.namespace().mkString(".")}.${ident.name()}",
      sch, entries, spark, root, version, t.pk,
      loadedVersion = snap.version, morPending = snap.deletes.nonEmpty,
      rowCount = snap.rowCount, renamesPending = renPending,
      pkHashed = t.pkIsString, partSpec = t.partitionSpec,
      shredSpecs = shredSpecsAtLoad)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    if (viewExists(ident))
      // a table created at a view's path would co-locate _table.json with
      // _view.json — one name, two objects, both surfaces broken
      throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(ident)
    CatalogLinks.resolve(nsDirOf(ident), ident.name(), linksIo) match {
      case CatalogLinks.Tombstoned =>
        // a renamed-away name is reusable once its physical directory is
        // free (the renamed table was dropped); while the directory still
        // holds the renamed table's data, refuse LOUDLY rather than create
        // into it
        if (Files.exists(Paths.get(s"${nsDirOf(ident)}/${ident.name()}")))
          throw new IllegalStateException(
            s"cannot create '${ident}': the name was renamed away by a " +
              "metadata rename and its directory still holds the renamed " +
              "table's data — drop the renamed table (or pick another name)")
        CatalogLinks.clearTombstone(nsDirOf(ident), ident.name(), linksIo)
      case CatalogLinks.Linked(phys) =>
        // a DANGLING link (physical dir gone — e.g. a drop that crashed
        // after deleting the data) frees the name; a live one refuses
        if (TransactionalTable.exists(s"${nsDirOf(ident)}/$phys"))
          throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(ident)
        CatalogLinks.unlink(nsDirOf(ident), ident.name(), linksIo)
      case CatalogLinks.Unlinked => ()
    }
    val pk = Option(properties.get("pk")).getOrElse(schema.fieldNames.head)
    Files.createDirectories(Paths.get(rootOf(ident)).getParent)
    // Column DEFAULTs (Iceberg v3): freeze each CURRENT_DEFAULT into a
    // constant-folded EXISTS_DEFAULT so the read path can serve it for files
    // that predate the column (no-op when no defaults are declared).
    val schemaWithDefaults = org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
      .constantFoldCurrentDefaultsToExistDefaults(schema, "CREATE TABLE")
    val t = TransactionalTable.createPartitioned(spark, rootOf(ident),
      schemaWithDefaults, pk, GraftCatalog.toPartitionSpec(partitions))
    // Write-strategy TBLPROPERTIES honored at CREATE, not just ALTER.
    GraftCatalog.RowLevelModeProps.foreach { case (prop, op) =>
      Option(properties.get(prop)).foreach(t.setRowLevelMode(op, _))
    }
    Option(properties.get("write.distribution")).foreach(t.setWriteDistribution)
    Option(properties.get("write.sort-order")).foreach(t.setSortOrder)
    Option(properties.get("write.max-records-per-file"))
      .foreach(v => t.setMaxRecordsPerFile(java.lang.Long.parseLong(v)))
    Option(properties.get("write.auto-compact.target-rows"))
      .foreach(v => t.setAutoCompactTargetRows(java.lang.Long.parseLong(v)))
    Option(properties.get("write.auto-compact.min-files"))
      .foreach(v => t.setAutoCompactMinFiles(Integer.parseInt(v)))
    Option(properties.get("write.parquet.compression-codec"))
      .foreach(t.setCompressionCodec)
    Option(properties.get("row.lineage"))
      .foreach(v => t.setRowLineage(java.lang.Boolean.parseBoolean(v)))
    properties.asScala.foreach { case (k, v) =>
      if (k.startsWith(GraftCatalog.ParquetBloomPrefix))
        t.setParquetBloom(k.stripPrefix(GraftCatalog.ParquetBloomPrefix),
          java.lang.Boolean.parseBoolean(v))
      if (k.startsWith(GraftCatalog.VariantShredPrefix))
        t.setVariantShred(k.stripPrefix(GraftCatalog.VariantShredPrefix),
          GraftCatalog.parseShredSpec(v))
    }
    loadTable(ident)
  }

  /** Schema evolution: `ALTER TABLE graft.db.t ADD COLUMN c TYPE` (top-level,
    * nullable — Iceberg's optional-column semantics). Other changes are
    * rejected loudly rather than silently ignored. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    var t = TransactionalTable.open(spark, rootOf(ident))
    changes.foreach {
      case add: TableChange.AddColumn if add.fieldNames().length == 1 =>
        // DEFAULT clause (Iceberg v3 default values): freeze the constant-
        // folded literal as the initial-default (EXISTS_DEFAULT — what files
        // written before the column existed read back) and keep the original
        // SQL as the write-default (CURRENT_DEFAULT — what INSERTs omitting
        // the column get). Both ride as column metadata in the schema JSON.
        val md = Option(add.defaultValue()) match {
          case Some(dv) =>
            val litSql = Option(dv.getValue)
              .map(l => org.apache.spark.sql.catalyst.expressions
                .Literal(l.value(), l.dataType()).sql)
              .getOrElse(throw new UnsupportedOperationException(
                s"ADD COLUMN DEFAULT must be a constant-foldable expression: ${dv.getSql}"))
            new org.apache.spark.sql.types.MetadataBuilder()
              .putString("CURRENT_DEFAULT", Option(dv.getSql).getOrElse(litSql))
              .putString("EXISTS_DEFAULT", litSql)
              .build()
          case None => org.apache.spark.sql.types.Metadata.empty
        }
        t = t.addColumn(add.fieldNames().head, add.dataType(), md)
      case add: TableChange.AddColumn =>
        throw new UnsupportedOperationException(
          s"nested ADD COLUMN not supported: ${add.fieldNames().mkString(".")}")
      case del: TableChange.DeleteColumn if del.fieldNames().length == 1 =>
        t = t.dropColumn(del.fieldNames().head)
      case del: TableChange.DeleteColumn =>
        throw new UnsupportedOperationException(
          s"nested DROP COLUMN not supported: ${del.fieldNames().mkString(".")}")
      case rn: TableChange.RenameColumn if rn.fieldNames().length == 1 =>
        t = t.renameColumn(rn.fieldNames().head, rn.newName())
      case rn: TableChange.RenameColumn =>
        throw new UnsupportedOperationException(
          s"nested RENAME COLUMN not supported: ${rn.fieldNames().mkString(".")}")
      case up: TableChange.UpdateColumnType if up.fieldNames().length == 1 =>
        t = t.widenColumn(up.fieldNames().head, up.newDataType())
      // ALTER COLUMN c SET DEFAULT expr / DROP DEFAULT: write-default only —
      // the initial-default stays frozen (see setColumnDefault).
      case ud: TableChange.UpdateColumnDefaultValue if ud.fieldNames().length == 1 =>
        t = t.setColumnDefault(ud.fieldNames().head,
          Option(ud.newDefaultValue()).filter(_.nonEmpty))
      case up: TableChange.UpdateColumnType =>
        throw new UnsupportedOperationException(
          s"nested ALTER COLUMN TYPE not supported: ${up.fieldNames().mkString(".")}")
      // Partition evolution through SQL (Spark's parser has no ADD PARTITION
      // FIELD form for third-party catalogs, so the property route plays
      // Iceberg's role): ALTER TABLE t SET TBLPROPERTIES
      // ('partition'='days(ts)' | 'bucket(8, col)' | 'identity(col)' | 'none')
      case sp: TableChange.SetProperty if sp.property() == "partition" =>
        t = t.evolvePartitioning(parseTransform(sp.value()))
      // Write-distribution mode (Iceberg write.distribution-mode parity):
      // ALTER TABLE t SET TBLPROPERTIES('write.distribution'='none|hash|range')
      case sp: TableChange.SetProperty if sp.property() == "write.distribution" =>
        t.setWriteDistribution(sp.value())
      // Rolling-writer file cap (Iceberg write.target-file-size-bytes role,
      // in rows): ALTER TABLE t SET TBLPROPERTIES('write.max-records-per-file'='N')
      case sp: TableChange.SetProperty if sp.property() == "write.max-records-per-file" =>
        t.setMaxRecordsPerFile(java.lang.Long.parseLong(sp.value()))
      // Write sort-order (Iceberg `ALTER TABLE ... WRITE ORDERED BY` role):
      // ALTER TABLE t SET TBLPROPERTIES('write.sort-order'='ts desc, amount')
      case sp: TableChange.SetProperty if sp.property() == "write.sort-order" =>
        t.setSortOrder(sp.value())
      // Auto-compaction (Delta optimize-on-write posture): ALTER TABLE t SET
      // TBLPROPERTIES('write.auto-compact.min-files'='N') — '0' disables;
      // 'write.auto-compact.target-rows' tunes the small-file threshold.
      // Each property stands alone (any statement order; a lone target-rows
      // is stored inert until min-files activates the trigger).
      case sp: TableChange.SetProperty
          if sp.property() == "write.auto-compact.min-files" =>
        t.setAutoCompactMinFiles(Integer.parseInt(sp.value()))
      case sp: TableChange.SetProperty
          if sp.property() == "write.auto-compact.target-rows" =>
        t.setAutoCompactTargetRows(java.lang.Long.parseLong(sp.value()))
      // Parquet codec for future writes (Iceberg property name; compaction
      // migrates old files): ALTER TABLE t SET
      // TBLPROPERTIES('write.parquet.compression-codec'='zstd' | ... | '')
      case sp: TableChange.SetProperty
          if sp.property() == "write.parquet.compression-codec" =>
        t.setCompressionCodec(sp.value())
      // Per-operation row-level write strategy (Iceberg write.merge.mode /
      // write.delete.mode / write.update.mode parity): ALTER TABLE t SET
      // TBLPROPERTIES('write.delete.mode'='merge-on-read' | ... )
      case sp: TableChange.SetProperty
          if GraftCatalog.RowLevelModeProps.contains(sp.property()) =>
        t.setRowLevelMode(GraftCatalog.RowLevelModeProps(sp.property()), sp.value())
      // Row lineage (Iceberg v3 upgrade): ALTER TABLE t SET
      // TBLPROPERTIES('row.lineage'='true') — one-way, see setRowLineage.
      case sp: TableChange.SetProperty if sp.property() == "row.lineage" =>
        t.setRowLineage(java.lang.Boolean.parseBoolean(sp.value()))
      // Per-column parquet bloom filters (Iceberg property name):
      // ALTER TABLE t SET TBLPROPERTIES(
      //   'write.parquet.bloom-filter-enabled.column.<col>'='true|false')
      case sp: TableChange.SetProperty
          if sp.property().startsWith(GraftCatalog.ParquetBloomPrefix) =>
        t.setParquetBloom(sp.property().stripPrefix(GraftCatalog.ParquetBloomPrefix),
          java.lang.Boolean.parseBoolean(sp.value()))
      // Variant shredding (Iceberg v3 variant + shredded sub-columns):
      // ALTER TABLE t SET TBLPROPERTIES(
      //   'variant.shred.<col>'='name:$.path:bigint, other:$.x.y:string')
      // — declares typed side-columns for hot paths; '' clears. Declaring on
      // a non-empty table rewrites live data files (see setVariantShred).
      case sp: TableChange.SetProperty
          if sp.property().startsWith(GraftCatalog.VariantShredPrefix) =>
        t.setVariantShred(sp.property().stripPrefix(GraftCatalog.VariantShredPrefix),
          GraftCatalog.parseShredSpec(sp.value()))
      case other =>
        throw new UnsupportedOperationException(
          s"unsupported ALTER TABLE change: $other " +
            "(ADD/DROP/RENAME COLUMN or SET TBLPROPERTIES('partition'=...|" +
            "'write.distribution'=...|'write.max-records-per-file'=...|" +
            "'write.sort-order'=...|'write.merge.mode'=...|" +
            "'write.delete.mode'=...|'write.update.mode'=...) only)")
    }
    loadTable(ident)
  }

  private def parseTransform(value: String): Option[graft.table.PartitionTransform] =
    GraftCatalog.parseTransformSpec(value)

  // --- Stored procedures (Iceberg `CALL catalog.system.…` parity): the
  // table-maintenance surface — rollback, expiry, orphan sweep, the three
  // compaction strategies, branches/tags, partition evolution. ---

  /** Open `db.tbl` through this catalog's warehouse (procedure arguments). */
  /** View directory for a 'db.view' procedure argument (refresh_mv/mv_status). */
  private[sql] def viewRootByName(view: String): String = {
    val parts = view.split("\\.")
    require(parts.length >= 1 && parts.forall(_.nonEmpty),
      s"procedure view argument must be 'db.view', got '$view'")
    val ident = Identifier.of(parts.init, parts.last)
    if (!viewExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    rootOf(ident)
  }

  /** Disk root for a dotted table name, for the OPEN/read procedures
    * (ann_probe/ann_status/index appends/...): links-aware, and a
    * TOMBSTONED (metadata-renamed-away) name refuses LOUDLY — with no
    * side effect, this is a read path (r19 review pass 1: the create
    * guard's clearTombstone briefly lived here and made ann_status
    * commit a links version). */
  private[sql] def rootByName(table: String): String = {
    val ident = identOf(table)
    val ns = nsDirOf(ident)
    CatalogLinks.resolve(ns, ident.name(), linksIo) match {
      case CatalogLinks.Tombstoned =>
        throw new IllegalStateException(
          s"'$ident' does not resolve: the name was renamed away by a " +
            "metadata rename — use the table's current name")
      case CatalogLinks.Linked(phys) => s"$ns/$phys"
      case CatalogLinks.Unlinked => s"$ns/${ident.name()}"
    }
  }

  /** Root resolution for the index CREATE procedures (they build engine
    * tables at the name; the directory then shows up through the normal
    * catalog listing) — createTable's tombstone guard + dangling-link
    * reclaim (r18 advice #1): without the guard, `CALL ann_index_create`
    * on a metadata-renamed-away name resolved to the renamed table's
    * still-live data directory and silently built index subtables inside
    * it — and a later DROP of the renamed table deleted the index with
    * it. */
  private[sql] def createRootByName(table: String): String = {
    val ident = identOf(table)
    val ns = nsDirOf(ident)
    CatalogLinks.resolve(ns, ident.name(), linksIo) match {
      case CatalogLinks.Tombstoned =>
        if (Files.exists(Paths.get(s"$ns/${ident.name()}")))
          throw new IllegalStateException(
            s"cannot create '$ident': the name was renamed away by a " +
              "metadata rename and its directory still holds the renamed " +
              "object's data — drop the renamed object (or pick another name)")
        CatalogLinks.clearTombstone(ns, ident.name(), linksIo)
        s"$ns/${ident.name()}"
      case CatalogLinks.Linked(phys)
          if !TransactionalTable.exists(s"$ns/$phys") &&
            !GraftViewStore.exists(s"$ns/$phys", linksIo) =>
        // dangling link: the physical object is gone — free the name
        // (mirrors createTable / viewCreateRoot)
        CatalogLinks.unlink(ns, ident.name(), linksIo)
        s"$ns/${ident.name()}"
      case CatalogLinks.Linked(phys) => s"$ns/$phys"
      case CatalogLinks.Unlinked => s"$ns/${ident.name()}"
    }
  }

  private def identOf(table: String): Identifier = {
    val parts = table.split("\\.")
    require(parts.length >= 1 && parts.forall(_.nonEmpty),
      s"procedure table argument must be 'db.tbl', got '$table'")
    Identifier.of(parts.init, parts.last)
  }

  private[sql] def openByName(table: String): TransactionalTable = {
    val parts = table.split("\\.")
    require(parts.length >= 1 && parts.forall(_.nonEmpty),
      s"procedure table argument must be 'db.tbl', got '$table'")
    val ident = Identifier.of(parts.init, parts.last)
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    TransactionalTable.open(spark, rootOf(ident))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.toSeq == Seq("system"))
      GraftProcedures.names.map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty

  override def loadProcedure(ident: Identifier): org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace().toSeq == Seq("system"),
      s"procedures live in the 'system' namespace: CALL $catalogName.system.<name>(...)")
    GraftProcedures.load(this, ident.name()).getOrElse(
      throw new IllegalArgumentException(
        s"unknown procedure '${ident.name()}' (have: ${GraftProcedures.names.mkString(", ")})"))
  }

  override def dropTable(ident: Identifier): Boolean = {
    val resolution = CatalogLinks.resolve(nsDirOf(ident), ident.name(), linksIo)
    // a TOMBSTONED name must never delete the physical directory it used
    // to point at — the renamed table owns that data now
    if (resolution == CatalogLinks.Tombstoned) return false
    val root = Paths.get(rootOf(ident))
    if (GraftViewStore.exists(root.toString, linksIo))
      // DROP TABLE on a view must not silently destroy it (or an MV's
      // owned storage) — the wrong-statement error Spark itself gives
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_COMMAND_FOR_OBJECT_TYPE",
        messageParameters = Map(
          "alternative" -> "DROP VIEW", "operation" -> "DROP TABLE",
          "foundType" -> "VIEW", "requiredType" -> "EXTERNAL or MANAGED",
          "objectName" -> ident.toString))
    // the drop retires EVERY binding touching this table in one commit:
    // the dropped name's own entry AND, for a linked name, the tombstone
    // over its physical directory (r18 review pass 2 — retiring only the
    // link left a crash window where the orphaned dir sat behind the
    // original name's tombstone: un-droppable, un-creatable, wedged)
    val toUnlink = resolution match {
      case CatalogLinks.Linked(phys) => Seq(ident.name(), phys)
      case _ => Seq(ident.name())
    }
    if (!Files.exists(root)) {
      // a DANGLING link (physical dir already gone) still occupies the
      // name: retire it so the name is re-creatable instead of wedged
      CatalogLinks.unlinkAll(nsDirOf(ident), toUnlink, linksIo)
      false
    } else {
      // UNLINK FIRST, then delete (r18 review): a crash between the two
      // leaves an orphaned data directory under its ORIGINAL, now fully
      // unbound name — visible, re-droppable, never wedged behind a
      // stale entry. The reverse order left a live link to a
      // half-deleted table.
      CatalogLinks.unlinkAll(nsDirOf(ident), toUnlink, linksIo)
      // Strict: a half-deleted table dir must surface as an error, not a
      // successful DROP (the lenient variant is for scratch cleanup only).
      graft.util.Fs.deleteRecursivelyStrict(root)
      true
    }
  }

  /** `ALTER TABLE ... RENAME TO` — two postures (r17 review #6):
    *
    *  - `renameMode=move` (default, the POSIX fast path, E214): one atomic
    *    directory move + the one-pass absolute-path rewrite
    *    ([[TransactionalTable.renameRoot]]).
    *  - `renameMode=metadata` (the object-store posture): the data
    *    directory NEVER moves — the name rebinds in the namespace's
    *    [[CatalogLinks]] map, committed claim/publish through [[CommitIO]]
    *    primitives only; a crash between claim and publish leaves the OLD
    *    binding intact (no dual-root, no dual-name window). Same-namespace
    *    only: a cross-namespace metadata rename would need an atomic flip
    *    of two maps.
    *
    * Views have their own RENAME VIEW path — renaming one through the
    * TABLE statement is the wrong-command error, never a silent move. */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val oldRoot = rootOf(oldIdent)
    if (GraftViewStore.exists(oldRoot, linksIo))
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_COMMAND_FOR_OBJECT_TYPE",
        messageParameters = Map(
          "alternative" -> "ALTER VIEW ... RENAME TO", "operation" -> "ALTER TABLE ... RENAME TO",
          "foundType" -> "VIEW", "requiredType" -> "EXTERNAL or MANAGED",
          "objectName" -> oldIdent.toString))
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    val newRoot = rootOf(newIdent)
    if (tableExists(newIdent) || GraftViewStore.exists(newRoot, linksIo))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(newIdent)
    require(namespaceExists(newIdent.namespace()),
      s"target namespace ${newIdent.namespace().mkString(".")} does not exist")
    if (renameMode == "metadata") {
      require(oldIdent.namespace().toSeq == newIdent.namespace().toSeq,
        "metadata rename rebinds a name within its namespace — a " +
          "cross-namespace rename needs renameMode=move")
      val ns = nsDirOf(newIdent)
      // the target name's directory may be physically occupied by ANOTHER
      // renamed-away table (tombstoned): binding over it would leave two
      // names one directory apart — refuse like any occupied target.
      // EXEMPT the source's own physical directory (r18 review pass 2):
      // renaming a table BACK to its original name finds its own data dir
      // there, and the rebinding (orig -> Some(orig), current -> tombstone)
      // is perfectly consistent.
      val targetDir = s"$ns/${newIdent.name()}"
      if (targetDir != oldRoot && Files.exists(Paths.get(targetDir)))
        throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(newIdent)
      // a DANGLING link on the target name (physical dir gone — the same
      // state CREATE reclaims) frees it for renames too, instead of a
      // misleading 'renamed concurrently' refusal from the map layer
      CatalogLinks.resolve(ns, newIdent.name(), linksIo) match {
        case CatalogLinks.Linked(phys)
            if !TransactionalTable.exists(s"$ns/$phys") =>
          CatalogLinks.unlink(ns, newIdent.name(), linksIo)
        case _ => ()
      }
      CatalogLinks.rename(nsDirOf(oldIdent), oldIdent.name(), newIdent.name(),
        linksIo)
    } else {
      TransactionalTable.renameRoot(oldRoot, newRoot)
      // a MOVE of a previously metadata-renamed table: its link now points
      // at the moved-away directory — retire the stale binding; and a
      // stale TOMBSTONE on the target name (its dir was free, or
      // renameRoot would have refused) must lift, or the resolution layer
      // hides the just-moved live data behind it (r18 review pass 2)
      CatalogLinks.unlink(nsDirOf(oldIdent), oldIdent.name(), linksIo)
      CatalogLinks.clearTombstone(nsDirOf(newIdent), newIdent.name(), linksIo)
    }
  }

  // SupportsNamespaces (flat, directory-backed)
  override def listNamespaces(): Array[Array[String]] = {
    val dir = Paths.get(warehouse)
    if (!Files.isDirectory(dir)) Array.empty
    else graft.util.Fs.listSeq(dir).iterator.filter(Files.isDirectory(_))
      .map(p => Array(p.getFileName.toString)).toArray
  }
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = Array.empty
  override def namespaceExists(namespace: Array[String]): Boolean =
    Files.isDirectory(Paths.get((warehouse +: namespace.toSeq).mkString("/")))
  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException((name() +: namespace).toSeq)
    Map.empty[String, String].asJava
  }
  override def createNamespace(namespace: Array[String], metadata: JMap[String, String]): Unit =
    Files.createDirectories(Paths.get((warehouse +: namespace.toSeq).mkString("/")))
  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException
}

object GraftCatalog {
  /** Iceberg per-column parquet bloom-filter property prefix. */
  private[sql] val ParquetBloomPrefix = "write.parquet.bloom-filter-enabled.column."

  /** Variant shredding property prefix: `variant.shred.<col>`. */
  private[sql] val VariantShredPrefix = "variant.shred."

  /** Parse `'name:$.path:type, ...'` into (name, path, type) triples —
    * first and last colon split, so a path may itself contain colons. Terms
    * split on commas at bracket depth 0 only, so comma-bearing target types
    * — `decimal(10,2)`, `struct<a:int,b:string>`, `map<string,int>` — parse
    * (and round-trip through SHOW TBLPROPERTIES' `, `-joined form). */
  private[graft] def parseShredSpec(v: String): Seq[(String, String, String)] = {
    val terms = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    v.foreach {
      case c @ ('(' | '<') => depth += 1; cur += c
      case c @ (')' | '>') => depth -= 1; cur += c
      case ',' if depth == 0 => terms += cur.result(); cur.clear()
      case c => cur += c
    }
    terms += cur.result()
    terms.iterator.map(_.trim).filter(_.nonEmpty).toSeq.map { term =>
      val i = term.indexOf(':')
      require(i > 0, s"cannot parse shred term '$term' (want name:$$.path:type)")
      // The type may carry internal colons (struct<a:int>): re-find the last
      // colon at depth 0 so struct fields don't truncate the type.
      var k = -1; var d = 0
      term.zipWithIndex.foreach {
        case ('(' | '<', _) => d += 1
        case (')' | '>', _) => d -= 1
        case (':', idx) => if (d == 0) k = idx
        case _ =>
      }
      require(k > i, s"cannot parse shred term '$term' (want name:$$.path:type)")
      (term.substring(0, i).trim, term.substring(i + 1, k).trim,
        term.substring(k + 1).trim)
    }
  }

  /** TBLPROPERTY name → engine row-level op, for the per-operation write
    * strategy properties (Iceberg write.<op>.mode parity). */
  private[sql] val RowLevelModeProps: Map[String, String] = Map(
    "write.merge.mode" -> "merge",
    "write.delete.mode" -> "delete",
    "write.update.mode" -> "update")

  /** DSv2 `Transform`s → the engine's partition spec (CREATE/REPLACE TABLE).
    * Hidden partitioning (Iceberg partition-spec parity): identity, days(ts),
    * hours(ts), bucket(n, col). Silently dropping a transform would produce
    * an unpartitioned table the user believes is partitioned — reject
    * anything we don't implement. */
  private[sql] def toPartitionSpec(
      partitions: Array[Transform]): Option[graft.table.PartitionTransform] = {
    def refOf(t: Transform): String = t.references().head.fieldNames().mkString(".")
    val specs: Seq[graft.table.PartitionTransform] = partitions.toSeq.map { t =>
      t.name match {
        case "identity" => graft.table.PartitionTransform.Identity(refOf(t))
        case "days" => graft.table.PartitionTransform.Days(refOf(t))
        case "hours" => graft.table.PartitionTransform.Hours(refOf(t))
        case "months" => graft.table.PartitionTransform.Months(refOf(t))
        case "years" => graft.table.PartitionTransform.Years(refOf(t))
        case "bucket" =>
          val n = org.apache.spark.sql.graftshim.GraftShims.transformLiteralInt(t)
            .getOrElse(throw new UnsupportedOperationException(
              s"bucket transform needs a literal bucket count: ${t.describe()}"))
          graft.table.PartitionTransform.Bucket(n, refOf(t))
        case "truncate" =>
          val w = org.apache.spark.sql.graftshim.GraftShims.transformLiteralInt(t)
            .getOrElse(throw new UnsupportedOperationException(
              s"truncate transform needs a literal width: ${t.describe()}"))
          graft.table.PartitionTransform.Truncate(w, refOf(t))
        case _ => throw new UnsupportedOperationException(
          s"unsupported partition transform ${t.describe()}: " +
            "identity/days/hours/months/years/bucket/truncate only")
      }
    }
    if (specs.length > 1)
      throw new UnsupportedOperationException(
        s"at most one partition transform supported, got: ${specs.mkString(", ")}")
    specs.headOption
  }

  /** Parse a partition-transform spec: `days(ts)`, `hours(ts)`,
    * `bucket(8, col)`, `identity(col)` (or a bare column name), `none`. */
  def parseTransformSpec(value: String): Option[graft.table.PartitionTransform] = {
    val v = value.trim
    if (v.equalsIgnoreCase("none")) None
    else {
      val fn = """(\w+)\s*\(\s*([^)]*)\s*\)""".r
      Some(v match {
        case fn("days", c) => graft.table.PartitionTransform.Days(c.trim)
        case fn("hours", c) => graft.table.PartitionTransform.Hours(c.trim)
        case fn("months", c) => graft.table.PartitionTransform.Months(c.trim)
        case fn("years", c) => graft.table.PartitionTransform.Years(c.trim)
        case fn("identity", c) => graft.table.PartitionTransform.Identity(c.trim)
        case fn("bucket", args) => args.split(",").map(_.trim) match {
          case Array(n, c) if n.forall(_.isDigit) =>
            graft.table.PartitionTransform.Bucket(n.toInt, c)
          case _ => throw new IllegalArgumentException(
            s"bucket transform needs (count, column): '$v'")
        }
        case fn("truncate", args) => args.split(",").map(_.trim) match {
          case Array(n, c) if n.forall(_.isDigit) =>
            graft.table.PartitionTransform.Truncate(n.toInt, c)
          case _ => throw new IllegalArgumentException(
            s"truncate transform needs (width, column): '$v'")
        }
        case fn(other, _) => throw new UnsupportedOperationException(
          s"unsupported partition transform '$other': " +
            "identity/days/hours/months/years/bucket/truncate/none only")
        case bare if bare.nonEmpty && !bare.contains("(") =>
          graft.table.PartitionTransform.Identity(bare)
        case _ => throw new IllegalArgumentException(s"cannot parse partition spec '$v'")
      })
    }
  }
}

/**
 * Read-only DSv2 table over a pinned snapshot file list. Scans go through a
 * manifest-fed file index (graftshim.ManifestFileIndex): pushed filters prune
 * whole files by partition value and PK min/max stats BEFORE any footer is
 * opened, then Spark's vectorized parquet reader handles the rest (row-group
 * skipping, column pruning). The explicit schema avoids footer inference and
 * keeps empty tables queryable.
 */
private[sql] class GraftSqlTable(tableName: String, tableSchema: StructType,
    val entries: Seq[org.apache.spark.sql.graftshim.ManifestEntry],
    spark: SparkSession,
    /** table root on disk — lets GraftMergeRule route SQL MERGE INTO back to
      * the engine's transactional merge */
    val root: String,
    /** Some(v) when resolved via VERSION AS OF — such relations are read-only
      * even for MERGE */
    val pinnedVersion: Option[Long],
    val pk: String,
    /** snapshot version this relation was resolved at (= pinnedVersion when
      * time-traveling, else the current version) — pins the MOR rewrite to
      * the same snapshot the file list came from */
    val loadedVersion: Long = 0L,
    /** true when the snapshot carries uncompacted equality-delete files; such
      * relations are rewritten by GraftMorScanRule before any scan is built */
    val morPending: Boolean = false,
    /** exact row count from manifest stats (valid only when !morPending) —
      * lets GraftCountStarRule answer SELECT COUNT(*) without touching data */
    val rowCount: Long = 0L,
    /** true when the resolved schema contains RENAMEd columns whose old-name
      * files may still be live; such relations are rewritten by
      * GraftMorScanRule into the engine's coalescing scan */
    val renamesPending: Boolean = false,
    /** true when the table's PK is a string: manifest pkMin/pkMax/bloom live
      * in the xxhash64 key domain (see TransactionalTable.pkIsString) */
    val pkHashed: Boolean = false,
    /** the table's CURRENT partition transform — reported as DSv2
      * partitioning so `INSERT OVERWRITE ... PARTITION (...)` and dynamic
      * partition overwrite resolve against it */
    val partSpec: Option[graft.table.PartitionTransform] = None,
    /** declared variant shred specs (variant col → (name, path, type)) —
      * lets GraftShredScanRule serve `variant_get` from the typed
      * side-columns without re-opening the table per resolution pass */
    val shredSpecs: Map[String, Seq[(String, String, String)]] = Map.empty)
  extends Table with org.apache.spark.sql.connector.catalog.SupportsRead {

  override def name(): String = tableName
  override def schema(): StructType = tableSchema

  /** VALUE equality on (root, snapshot version, schema, rewrite-pending
    * flags): two loads of the same table at the same snapshot read the same
    * data — the contract `LogicalPlan.sameResult` (and with it Spark's
    * CacheManager plan matching and the MV-rewrite rule) needs across
    * independently analyzed queries. Entries/stats derive from the pinned
    * snapshot, so they are not part of the identity. */
  override def equals(other: Any): Boolean = other match {
    case t: GraftSqlTable =>
      t.root == root && t.loadedVersion == loadedVersion &&
        t.schema() == schema() && t.pinnedVersion == pinnedVersion &&
        t.morPending == morPending && t.renamesPending == renamesPending
    case _ => false
  }
  override def hashCode(): Int = (root, loadedVersion).hashCode()

  /** Surfaced by `DESCRIBE TABLE EXTENDED` / `SHOW TBLPROPERTIES`: the
    * engine's table metadata and the resolved snapshot's vitals — the quick
    * operational look Iceberg users get from table properties. */
  override def properties(): java.util.Map[String, String] = {
    val t = TransactionalTable.open(spark, root)
    val m = new java.util.HashMap[String, String]()
    m.put("pk", pk)
    partSpec.foreach {
      case graft.table.PartitionTransform.Bucket(n, c) => m.put("partition", s"bucket($n, $c)")
      case graft.table.PartitionTransform.Truncate(w, c) =>
        m.put("partition", s"truncate($w, $c)")
      case p => m.put("partition", s"${p.kind}(${p.col})")
    }
    m.put("format", "parquet")
    m.put("snapshot-version", loadedVersion.toString)
    m.put("row-count", rowCount.toString)
    m.put("file-count", entries.length.toString)
    if (t.writeDistribution != "none") m.put("write.distribution", t.writeDistribution)
    if (t.maxRecordsPerFile > 0)
      m.put("write.max-records-per-file", t.maxRecordsPerFile.toString)
    if (t.sortOrder.nonEmpty) m.put("write.sort-order", t.sortOrder)
    t.autoCompact.foreach { case (n, _) =>
      m.put("write.auto-compact.min-files", n.toString)
    }
    if (t.autoCompactTargetRows != (1L << 20))
      m.put("write.auto-compact.target-rows", t.autoCompactTargetRows.toString)
    else t.autoCompact.foreach { case (_, rows) =>
      m.put("write.auto-compact.target-rows", rows.toString)
    }
    GraftCatalog.RowLevelModeProps.foreach { case (prop, op) =>
      val mode = t.rowLevelModeName(op)
      if (mode != "copy-on-write") m.put(prop, mode)
    }
    if (t.rowLineageEnabled) m.put("row.lineage", "true")
    t.compressionCodec.foreach(c => m.put("write.parquet.compression-codec", c))
    t.parquetBloomCols.foreach(c =>
      m.put(s"${GraftCatalog.ParquetBloomPrefix}$c", "true"))
    t.variantShred.foreach { case (c, fields) =>
      m.put(s"${GraftCatalog.VariantShredPrefix}$c",
        fields.map { case (n, p, tp) => s"$n:$p:$tp" }.mkString(", "))
    }
    m
  }

  override def partitioning(): Array[Transform] = {
    import org.apache.spark.sql.connector.expressions.Expressions
    partSpec.toArray.map {
      case graft.table.PartitionTransform.Identity(c) => Expressions.identity(c)
      case graft.table.PartitionTransform.Days(c) => Expressions.days(c)
      case graft.table.PartitionTransform.Hours(c) => Expressions.hours(c)
      case graft.table.PartitionTransform.Months(c) => Expressions.months(c)
      case graft.table.PartitionTransform.Years(c) => Expressions.years(c)
      case graft.table.PartitionTransform.Bucket(n, c) => Expressions.bucket(n, c)
      case graft.table.PartitionTransform.Truncate(w, c) =>
        Expressions.apply("truncate", Expressions.literal(w), Expressions.column(c))
    }
  }
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    if (morPending || renamesPending)
      // Only reachable when graft.sql.GraftExtensions is NOT registered (the
      // rewrite rule removes flagged relations during analysis). Fail loudly:
      // a plain file scan would silently resurrect deleted rows (MOR) or
      // null out renamed columns for pre-rename files.
      throw new UnsupportedOperationException(
        s"$tableName has pending merge-on-read delete files or renamed " +
          "columns; register spark.sql.extensions=graft.sql.GraftExtensions " +
          "(engine-aware SQL reads) or run compact()")
    // Stats-reporting + runtime-filtering scan: exact numRows/sizeInBytes
    // from the manifest, column [min,max] + analyzed NDV for CBO, and
    // join-time whole-file pruning (GraftScan).
    org.apache.spark.sql.graftshim.GraftScanBuilder(
      spark, tableSchema, entries, pk, options, pkHashed, rowCount, bucketSpecForSpj,
      graft.table.NdvStats.read(root).map(_._2).getOrElse(Map.empty))
  }

  /** Storage-partitioned-join eligibility, decided from chunk METADATA alone:
    * the table's current spec is `bucket(n, col)` AND every manifest chunk
    * proves its files were written under that same spec (uniform spec id,
    * partition values present). Any pre-evolution or unpartitioned file
    * disables SPJ — a scan must never claim a partitioning its files don't
    * have (wrong join results); it degrades to a normal shuffle join. */
  private def bucketSpecForSpj: Option[(Int, String)] = partSpec match {
    case Some(graft.table.PartitionTransform.Bucket(n, c)) => entries match {
      // Uniform-spec proof only — the per-chunk partition VALUE list (capped
      // for chunk pruning) is irrelevant here; bucket ids come from the file
      // paths at batch planning.
      case lm: org.apache.spark.sql.graftshim.LazyManifest
          if lm.chunkList.forall(ch =>
            ch.part.exists(d => d.kind == "bucket" && d.n == n &&
              d.col.equalsIgnoreCase(c))) && lm.nonEmpty =>
        Some((n, c))
      case _ => None
    }
    case _ => None
  }
}
