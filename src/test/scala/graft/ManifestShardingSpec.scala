package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import graft.table.{ChunkRef, DataFile, ManifestFiles, TransactionalTable}

/**
 * Sharded-manifest planning: a large table's manifest is chunked with
 * chunk-level stats, and PLANNING must touch only the chunks a query's
 * predicates can match — never the whole file list. The fixture below is a
 * hand-written 100 000-file manifest (200 chunks × 500 files) whose data
 * files do not exist on disk: any code path that materializes entries
 * loads chunk JSON (observable via TransactionalTable.chunkLoads), and any
 * path that touches DATA fails loudly.
 */
class ManifestShardingSpec extends SparkSpec {

  private val NChunks = 200
  private val FilesPerChunk = 500
  private val RowsPerFile = 100L

  /** Write a synthetic chunked manifest: file k (global) covers pk range
    * [k*100, k*100+99] and stats v in [k*10, k*10+9]. */
  private def writeSyntheticTable(root: String): Unit = {
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "bigint").add("v", "bigint").add("event", "string")
    Files.createDirectories(Paths.get(root, "manifest", "chunks"))
    val tableMeta =
      s"""{"schemaJson":${com.fasterxml.jackson.databind.node.JsonNodeFactory.instance
        .textNode(schema.json).toString},"pk":"id","partitionCol":null}"""
    Files.writeString(Paths.get(root, "_table.json"), tableMeta)
    val chunkRefs = new StringBuilder
    for (c <- 0 until NChunks) {
      val sb = new StringBuilder("""{"files":[""")
      for (i <- 0 until FilesPerChunk) {
        val k = c.toLong * FilesPerChunk + i
        if (i > 0) sb.append(',')
        sb.append(s"""{"path":"/nonexistent/f$k.parquet","partition":null,""")
        sb.append(s""""pkMin":${k * 100},"pkMax":${k * 100 + 99},"rows":$RowsPerFile,""")
        sb.append(s""""bytes":1000,"stats":{"v":[${k * 10},${k * 10 + 9}]}}""")
      }
      sb.append("]}")
      val p = Paths.get(root, "manifest", "chunks", s"c-$c.json")
      Files.writeString(p, sb.toString)
      val lo = c.toLong * FilesPerChunk * 100
      val hi = (c.toLong * FilesPerChunk + FilesPerChunk - 1) * 100 + 99
      val vLo = c.toLong * FilesPerChunk * 10
      val vHi = (c.toLong * FilesPerChunk + FilesPerChunk - 1) * 10 + 9
      if (c > 0) chunkRefs.append(',')
      chunkRefs.append(s"""{"path":"$p","n":$FilesPerChunk,"pkMin":$lo,"pkMax":$hi,""")
      chunkRefs.append(s""""rows":${FilesPerChunk * RowsPerFile},"bytes":${FilesPerChunk * 1000L},""")
      chunkRefs.append(s""""stats":{"v":[$vLo,$vHi]}}""")
    }
    val manifest =
      s"""{"version":1,"batchId":-1,"committedAtMs":1,"chunks":[$chunkRefs]}"""
    Files.writeString(Paths.get(root, "manifest", "v1.json"), manifest)
    Files.writeString(Paths.get(root, "_current"), "1")
  }

  private def loadsDuring[A](body: => A): (A, Long) = {
    val before = TransactionalTable.chunkLoads.get()
    val r = body
    (r, TransactionalTable.chunkLoads.get() - before)
  }

  test("metadata answers (rowCount, length, isEmpty) load zero chunks") {
    val root = tmpDir("graft-shard") + "/t"
    writeSyntheticTable(root)
    val t = TransactionalTable.open(spark, root)
    val (snap, loads) = loadsDuring(t.snapshot)
    assert(loads === 0L, "opening a snapshot materialized manifest chunks")
    val (rc, loads2) = loadsDuring(snap.rowCount)
    assert(rc === NChunks.toLong * FilesPerChunk * RowsPerFile)
    assert(loads2 === 0L, "rowCount materialized manifest chunks")
    val (n, loads3) = loadsDuring(snap.files.length)
    assert(n === NChunks * FilesPerChunk)
    assert(loads3 === 0L, "length materialized manifest chunks")
  }

  test("SQL point-lookup planning over 100k files loads only the matching chunk") {
    val root0 = tmpDir("graft-shardsql")
    val root = s"$root0/db/shard"
    writeSyntheticTable(root)
    val cat = s"graft_shard${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", root0)
    // key 5_000_042 lives in global file 50_000 → chunk 100, and only there
    val adaptiveWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = spark.sql(s"SELECT id, v FROM $cat.db.shard WHERE id = 5000042")
      val scan = df.queryExecution.executedPlan.collect {
        case b: BatchScanExec => b
      }.head
      val (parts, loads) = loadsDuring(scan.inputPartitions)
      assert(loads <= 2L,
        s"point-lookup planning loaded $loads chunks (expected ≤ 2 of $NChunks)")
      // ... and the surviving file set is the single file that can hold the key
      val files = parts.flatMap {
        case f: org.apache.spark.sql.execution.datasources.FilePartition =>
          f.files.map(_.urlEncodedPath)
      }
      assert(files.length === 1, s"expected 1 candidate file, got ${files.length}")
      assert(files.head.contains("f50000"), files.head)
    } finally spark.conf.set("spark.sql.adaptive.enabled", adaptiveWas)
  }

  test("range predicate on a stats column prunes chunks before entries load") {
    val root0 = tmpDir("graft-shardrange")
    val root = s"$root0/db/shard"
    writeSyntheticTable(root)
    val cat = s"graft_shardr${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", root0)
    val adaptiveWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // v in [999_000, 1_001_000) spans the chunk-99/chunk-100 boundary
      val df = spark.sql(
        s"SELECT id FROM $cat.db.shard WHERE v >= 999000 AND v < 1001000")
      val scan = df.queryExecution.executedPlan.collect {
        case b: BatchScanExec => b
      }.head
      val (parts, loads) = loadsDuring(scan.inputPartitions)
      assert(loads <= 3L,
        s"range planning loaded $loads chunks (expected ≤ 3 of $NChunks)")
      val nFiles = parts.map {
        case f: org.apache.spark.sql.execution.datasources.FilePartition => f.files.length
        case _ => 0
      }.sum
      // 2 000 v-units / 10 per file = ~200 files (+1 boundary)
      assert(nFiles > 0 && nFiles <= 202, s"kept $nFiles files")
    } finally spark.conf.set("spark.sql.adaptive.enabled", adaptiveWas)
  }

  /** Partitioned twin of [[writeSyntheticTable]]: identity(event), chunk c
    * holds only partition value `e{c % 10}` (20 chunks per value). */
  private def writeSyntheticPartitioned(root: String): Unit = {
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "bigint").add("v", "bigint").add("event", "string")
    Files.createDirectories(Paths.get(root, "manifest", "chunks"))
    val tableMeta =
      s"""{"schemaJson":${com.fasterxml.jackson.databind.node.JsonNodeFactory.instance
        .textNode(schema.json).toString},"pk":"id","partitionCol":"event",""" +
        """"partitionTransform":{"kind":"identity","col":"event"}}"""
    Files.writeString(Paths.get(root, "_table.json"), tableMeta)
    val chunkRefs = new StringBuilder
    for (c <- 0 until NChunks) {
      val ev = s"e${c % 10}"
      val sb = new StringBuilder("""{"files":[""")
      for (i <- 0 until FilesPerChunk) {
        val k = c.toLong * FilesPerChunk + i
        if (i > 0) sb.append(',')
        sb.append(s"""{"path":"/nonexistent/f$k.parquet","partition":"$ev",""")
        sb.append(s""""pkMin":${k * 100},"pkMax":${k * 100 + 99},"rows":$RowsPerFile,""")
        sb.append(s""""bytes":1000}""")
      }
      sb.append("]}")
      val p = Paths.get(root, "manifest", "chunks", s"c-$c.json")
      Files.writeString(p, sb.toString)
      val lo = c.toLong * FilesPerChunk * 100
      val hi = (c.toLong * FilesPerChunk + FilesPerChunk - 1) * 100 + 99
      if (c > 0) chunkRefs.append(',')
      chunkRefs.append(s"""{"path":"$p","n":$FilesPerChunk,"pkMin":$lo,"pkMax":$hi,""")
      chunkRefs.append(s""""rows":${FilesPerChunk * RowsPerFile},"bytes":${FilesPerChunk * 1000L},""")
      chunkRefs.append(s""""parts":["$ev"],"spec":0}""")
    }
    val manifest =
      s"""{"version":1,"batchId":-1,"committedAtMs":1,"chunks":[$chunkRefs]}"""
    Files.writeString(Paths.get(root, "manifest", "v1.json"), manifest)
    Files.writeString(Paths.get(root, "_current"), "1")
  }

  test("partition-filtered COUNT(*) over 100k files: manifest fold, zero chunk loads") {
    val root0 = tmpDir("graft-shardcnt")
    val root = s"$root0/db/shard"
    writeSyntheticPartitioned(root)
    val cat = s"graft_shardc${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", root0)
    // every chunk is single-valued → wholly inside or outside the wanted set;
    // the fold must answer from chunk stats without loading ONE entry (and
    // the data files don't exist, so any scan attempt fails loudly)
    val df = spark.sql(s"SELECT COUNT(*) AS c FROM $cat.db.shard WHERE event = 'e3'")
    val (n, loads) = loadsDuring(df.collect().head.getLong(0))
    assert(n === 20L * FilesPerChunk * RowsPerFile, s"got $n")
    assert(loads === 0L, s"filtered count fold loaded $loads chunks")
    assert(df.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    // IN list spanning two values
    val df2 = spark.sql(
      s"SELECT COUNT(*) AS c FROM $cat.db.shard WHERE event IN ('e1', 'e7')")
    assert(df2.collect().head.getLong(0) === 40L * FilesPerChunk * RowsPerFile)
  }

  test("GROUP BY partition COUNT/MIN/MAX over 100k files: per-group fold, zero chunk loads") {
    val root0 = tmpDir("graft-shardgrp")
    val root = s"$root0/db/shard"
    writeSyntheticPartitioned(root)
    val cat = s"graft_shardg${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", root0)
    // every chunk is single-valued → the grouped fold must answer from
    // chunk stats without loading ONE entry (data files don't exist, so a
    // scan attempt fails loudly)
    val df = spark.sql(s"SELECT event, COUNT(*) AS c, MIN(id) AS lo, MAX(id) AS hi " +
      s"FROM $cat.db.shard GROUP BY event")
    val (rows, loads) = loadsDuring(df.collect())
    assert(loads === 0L, s"grouped fold loaded $loads chunks")
    assert(df.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(rows.length === 10)
    val m = rows.map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // value e3: chunks 3, 13, ..., 193 (20 chunks × 500 files × 100 rows)
    assert(m("e3")._1 === 20L * FilesPerChunk * RowsPerFile)
    assert(m("e3")._2 === 3L * FilesPerChunk * 100) // first file of chunk 3
    assert(m("e0")._2 === 0L)
    assert(m("e9")._3 === (199L * FilesPerChunk + FilesPerChunk - 1) * 100 + 99)
  }

  test("entry-level metadata tables over 100k files: driver plans chunk refs, entries stream") {
    val root0 = tmpDir("graft-shardmeta")
    val root = s"$root0/db/shard"
    writeSyntheticTable(root)
    val cat = s"graft_shardm${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", root0)
    val df = spark.sql(
      s"""SELECT COUNT(*) AS c, SUM(n_rows) AS r
         |FROM $cat.db.shard.entries WHERE kind = 'data'""".stripMargin)
    // Resolution + planning must materialize ZERO entries driver-side: no
    // engine chunk loads, no raw chunk parses — the driver ships chunk refs.
    val p0 = graft.table.ChunkJson.parses.get()
    val l0 = TransactionalTable.chunkLoads.get()
    val optimized = df.queryExecution.optimizedPlan
    assert(graft.table.ChunkJson.parses.get() - p0 === 0L, "planning parsed chunk JSON")
    assert(TransactionalTable.chunkLoads.get() - l0 === 0L, "planning loaded chunks")
    // plan shape: the substituted aggregate reads the chunk-partitioned raw
    // scan — one input partition per chunk, not a LocalRows driver dump
    val scanRel = optimized.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }
    assert(scanRel.nonEmpty && scanRel.forall(
      _.relation.table.isInstanceOf[graft.sql.ChunkEntriesTable]),
      s"expected ChunkEntriesTable scan, got ${scanRel.map(_.relation.table.getClass)}")
    // execution streams the 100k entries through executor tasks
    val row = df.collect().head
    assert(row.getLong(0) === NChunks.toLong * FilesPerChunk)
    assert(row.getLong(1) === NChunks.toLong * FilesPerChunk * RowsPerFile)
    assert(graft.table.ChunkJson.parses.get() - p0 >= NChunks.toLong,
      "execution should parse every chunk (task-side)")
    // all_files agrees (same raw scan, per-path version range)
    val af = spark.sql(
      s"""SELECT COUNT(*) AS c, MIN(first_version) AS f, MAX(last_version) AS l
         |FROM $cat.db.shard.all_files""".stripMargin).collect().head
    assert(af.getLong(0) === NChunks.toLong * FilesPerChunk)
    assert(af.getLong(1) === 1L && af.getLong(2) === 1L)
    // `files` is served directly from chunk partitions (no substitution)
    val filesDf = spark.sql(s"SELECT SUM(n_rows) AS r FROM $cat.db.shard.files")
    val filesRel = filesDf.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }
    assert(filesRel.nonEmpty && filesRel.forall(
      _.relation.table.isInstanceOf[graft.sql.ChunkEntriesTable]))
    assert(filesDf.collect().head.getLong(0) === NChunks.toLong * FilesPerChunk * RowsPerFile)
    // `history` answers from chunk STATS + chunk-path diffing: zero loads,
    // zero parses over the 100k files (added counts = chunk-ref totals)
    val p1 = graft.table.ChunkJson.parses.get()
    val l1 = TransactionalTable.chunkLoads.get()
    val hist = spark.sql(
      s"SELECT version, n_files, n_rows, added_files, added_rows FROM $cat.db.shard.history")
      .collect()
    assert(hist.length === 1)
    assert(hist.head.getLong(1) === NChunks.toLong * FilesPerChunk)
    assert(hist.head.getLong(3) === NChunks.toLong * FilesPerChunk)
    assert(hist.head.getLong(4) === NChunks.toLong * FilesPerChunk * RowsPerFile)
    assert(graft.table.ChunkJson.parses.get() - p1 === 0L, "history parsed chunk JSON")
    assert(TransactionalTable.chunkLoads.get() - l1 === 0L, "history loaded chunks")
  }

  test("partitions metadata table is a distributed aggregation over chunk scans") {
    val root0 = tmpDir("graft-shardpart")
    val root = s"$root0/db/shard"
    writeSyntheticPartitioned(root)
    val cat = s"graft_shardp${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", root0)
    val df = spark.sql(
      s"SELECT partition, n_files, n_rows FROM $cat.db.shard.partitions ORDER BY partition")
    val p0 = graft.table.ChunkJson.parses.get()
    val optimized = df.queryExecution.optimizedPlan
    assert(graft.table.ChunkJson.parses.get() - p0 === 0L, "planning parsed chunk JSON")
    assert(optimized.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }.forall(_.relation.table.isInstanceOf[graft.sql.ChunkEntriesTable]))
    val rows = df.collect()
    assert(rows.length === 10) // e0..e9
    assert(rows.forall(r => r.getLong(1) === 20L * FilesPerChunk &&
      r.getLong(2) === 20L * FilesPerChunk * RowsPerFile))
  }

  test("metadata-scan filter pushdown prunes chunks at planning") {
    val root0 = tmpDir("graft-shardpush")
    val root = s"$root0/db/shard"
    writeSyntheticPartitioned(root) // 200 chunks, chunk c holds only e{c%10}
    val cat = s"graft_shardf${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", root0)
    def parsesOf(sql: String): (Long, Long) = {
      val p0 = graft.table.ChunkJson.parses.get()
      val n = spark.sql(sql).collect().head.getLong(0)
      (n, graft.table.ChunkJson.parses.get() - p0)
    }
    // partition equality: 20 of 200 chunks hold e3
    val (n1, c1) = parsesOf(
      s"SELECT COUNT(*) AS c FROM $cat.db.shard.files WHERE partition = 'e3'")
    assert(n1 === 20L * FilesPerChunk)
    assert(c1 <= 20L, s"partition filter parsed $c1 chunks (expected <= 20)")
    // delete-inventory query: every chunk row is kind='data' -> 0 parses
    val (n2, c2) = parsesOf(
      s"SELECT COUNT(*) AS c FROM $cat.db.shard.files WHERE kind LIKE '%-deletes'")
    assert(n2 === 0L && c2 === 0L, s"deletes filter parsed $c2 chunks")
    // pk-range predicate on the entry bounds
    val (n3, c3) = parsesOf(
      s"SELECT COUNT(*) AS c FROM $cat.db.shard.files WHERE pk_min >= 9900000")
    assert(n3 > 0L)
    assert(c3 <= 3L, s"pk-range filter parsed $c3 chunks")
  }

  test("ManifestFiles.loadWhere loads only chunks passing the predicate") {
    var loaded = List.empty[String]
    val chunks = (0 until 10).map { c =>
      ChunkRef(s"chunk$c", 2, pkMin = c * 100L, pkMax = c * 100L + 99,
        rows = 20L, bytes = 200L)
    }
    val mf = new ManifestFiles(chunks, p => {
      loaded ::= p
      Seq(DataFile(s"$p/a", None, 0L, 1L, 10L, 100L),
        DataFile(s"$p/b", None, 2L, 3L, 10L, 100L))
    })
    assert(mf.length === 20 && mf.totalRows.contains(200L) && loaded.isEmpty)
    val hit = mf.loadWhere(c => c.pkMax >= 350 && c.pkMin <= 450)
    assert(loaded.toSet === Set("chunk3", "chunk4"), loaded)
    assert(hit.length === 4)
  }
}
