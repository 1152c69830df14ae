package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.cdc.Cdc
import graft.fixtures.CdcFixtures
import graft.stream.CdcPipeline
import graft.table.TransactionalTable

class TableRobustnessSpec extends SparkSpec {
  import spark.implicits._

  /** Chunk paths referenced by a version's manifest (parsed textually — the
    * manifest format is the unit under test here). */
  private def chunkRefs(root: String, version: Long): Seq[String] = {
    val txt = new String(Files.readAllBytes(Paths.get(root, "manifest", s"v$version.json")))
    """manifest/chunks/c-[0-9a-f-]+\.json""".r.findAllIn(txt).toSeq
  }

  test("chunked manifests: commits reuse untouched parent chunks (O(delta) writes)") {
    val root = tmpDir("ttable-chunks")
    val t = TransactionalTable.create(spark, root, Cdc.tableSchema, Cdc.PrimaryKey, None)
    def rows(lo: Long): org.apache.spark.sql.DataFrame =
      (lo until lo + 10).map(i =>
        (i, s"c$i", "cart", "S", 1, "pc", new java.sql.Timestamp(0L)))
        .toDF(Cdc.tableSchema.fieldNames.toIndexedSeq: _*).coalesce(1)
    t.append(rows(0));   val v1Chunks = chunkRefs(root, 1)
    t.append(rows(100)); val v2Chunks = chunkRefs(root, 2)
    t.append(rows(200)); val v3Chunks = chunkRefs(root, 3)
    // appends reference the parent's chunks verbatim and add new ones
    assert(v1Chunks.toSet.subsetOf(v2Chunks.toSet),
      s"v2 must reuse v1 chunks: $v1Chunks vs $v2Chunks")
    assert(v2Chunks.toSet.subsetOf(v3Chunks.toSet))
    assert(v3Chunks.size === 3)

    // a merge touching ONLY pk range 0-9 must not rewrite the other chunks
    val up = Seq((5L, "x", "cart", "S", 99, "pc", new java.sql.Timestamp(0L)))
      .toDF(Cdc.tableSchema.fieldNames.toIndexedSeq: _*)
    t.merge(up, spark.emptyDataset[Long].toDF("trans_id"), batchId = 1)
    val v4Chunks = chunkRefs(root, 4)
    val untouched = v3Chunks.toSet -- v1Chunks.toSet // chunks for ranges 100+, 200+
    assert(untouched.subsetOf(v4Chunks.toSet),
      s"merge must carry untouched chunks by reference: $untouched vs $v4Chunks")
    assert(!v1Chunks.toSet.subsetOf(v4Chunks.toSet),
      "the PK-affected chunk must have been rewritten")

    // data correctness across the chunked manifests
    val amounts = t.scan().select($"trans_id", $"amount").as[(Long, Int)].collect().toMap
    assert(amounts.size === 30 && amounts(5L) === 99)
    assert(t.scanAt(3).count() === 30 && t.scanAt(1).count() === 10)

    // small-chunk fold: many tiny commits must not grow chunk count forever
    (0 until 10).foreach(i => t.append(rows(1000 + i * 10)))
    val lastChunks = chunkRefs(root, t.currentVersion)
    assert(lastChunks.size < 12,
      s"chunk count must fold, got ${lastChunks.size}: $lastChunks")
    assert(t.scan().count() === 130)

    // expiry GC drops chunk files no kept manifest references
    val allOnDisk = { val s = Files.list(Paths.get(root, "manifest", "chunks"))
      try s.iterator().asScala.size finally s.close() }
    t.expireSnapshots(keepLast = 2)
    val afterGc = { val s = Files.list(Paths.get(root, "manifest", "chunks"))
      try s.iterator().asScala.size finally s.close() }
    assert(afterGc < allOnDisk, s"expiry must GC unreferenced chunks ($allOnDisk -> $afterGc)")
    assert(t.scan().count() === 130)
  }

  test("compaction: merges small files, preserves data and time travel") {
    val root = tmpDir("ttable-compact")
    val t = TransactionalTable.create(spark, root, Cdc.tableSchema, Cdc.PrimaryKey,
      Some(Cdc.PartitionColumn))
    // 5 single-row commits → ≥5 small files
    (0 until 5).foreach { i =>
      val line =
        s"""{"data": {"trans_id": ${100 + i}, "customer_id": "c$i", "event": "cart", "sku": "S", "amount": $i, "device": "pc", "trans_datetime": "2023-01-16T06:00:00Z"}, "metadata": {"timestamp": "2023-01-16T06:00:0$i.000001Z", "record-type": "data", "operation": "insert", "partition-key-type": "primary-key", "schema-name": "testdb", "table-name": "t", "transaction-id": $i}}"""
      CdcPipeline.replayLines(spark, t, Seq(line), batchId = i)
    }
    val before = t.snapshot
    val dataBefore = t.scan().orderBy("trans_id").collect().toSeq
    assert(before.files.size >= 5)

    t.compact()
    val after = t.snapshot
    assert(after.files.size < before.files.size)
    assert(after.files.size === 1) // single partition value 'cart'
    assert(after.batchId === before.batchId, "fencing must survive compaction")
    assert(t.scan().orderBy("trans_id").collect().toSeq === dataBefore)
    // old version still scannable
    assert(t.scanAt(before.version).count() === 5)
    // compacting an already-compact table is a no-op
    val v = t.currentVersion
    t.compact()
    assert(t.currentVersion === v)
  }

  test("compact: MOR fold-in range-slices a hot partition across >1 file") {
    val root = tmpDir("ttable-compact-skew")
    val t = TransactionalTable.create(spark, root, Cdc.tableSchema, Cdc.PrimaryKey,
      Some(Cdc.PartitionColumn))
    // 1000 rows, ALL in one partition value — the skew case where the old
    // repartition(col(partition)) fold-in funneled everything through one
    // task and emitted one giant file.
    val rows = (0L until 1000L).map(i =>
      (i, s"c$i", "cart", "S", 1, "pc", new java.sql.Timestamp(0L)))
      .toDF(Cdc.tableSchema.fieldNames.toIndexedSeq: _*)
    t.append(rows)
    // a MOR merge leaves pending equality deletes → compact takes the fold-in path
    val up = Seq((5L, "x", "cart", "S", 99, "pc", new java.sql.Timestamp(0L)))
      .toDF(Cdc.tableSchema.fieldNames.toIndexedSeq: _*)
    t.merge(up, spark.emptyDataset[Long].toDF("trans_id"), batchId = 1,
      mode = graft.table.MergeMode.MergeOnRead)
    assert(t.snapshot.deletes.nonEmpty)

    t.compact(minFileRows = 100L)
    val after = t.snapshot
    assert(after.deletes.isEmpty, "fold-in must clear the delete files")
    assert(after.files.size > 1,
      s"hot partition must be range-sliced into several files, got ${after.files.size}")
    // disjoint pk ranges per slice (range repartition on (partition, pk))
    val ranges = after.files.map(f => (f.pkMin, f.pkMax)).sortBy(_._1)
    assert(ranges.sliding(2).forall { case Seq(a, b) => a._2 < b._1; case _ => true },
      s"slices must cover disjoint pk ranges: $ranges")
    val amounts = t.scan().select($"trans_id", $"amount").as[(Long, Int)].collect().toMap
    assert(amounts.size === 1000 && amounts(5L) === 99)
  }

  test("malformed rows (bad JSON / null pk) are dropped, batch still applies") {
    val root = tmpDir("ttable-nullpk")
    val t = TransactionalTable.create(spark, root, Cdc.tableSchema, Cdc.PrimaryKey,
      Some(Cdc.PartitionColumn))
    val lines = Seq(
      "this is not json at all",
      """{"data": {"customer_id": "nopk", "event": "cart", "sku": "S", "amount": 1, "device": "pc", "trans_datetime": "2023-01-16T06:00:00Z"}, "metadata": {"timestamp": "2023-01-16T06:00:00.000001Z", "record-type": "data", "operation": "insert", "partition-key-type": "primary-key", "schema-name": "testdb", "table-name": "t", "transaction-id": 1}}""",
      """{"data": {"trans_id": 7, "customer_id": "ok", "event": "cart", "sku": "S", "amount": 2, "device": "pc", "trans_datetime": "2023-01-16T06:00:00Z"}, "metadata": {"timestamp": "2023-01-16T06:00:00.000002Z", "record-type": "data", "operation": "insert", "partition-key-type": "primary-key", "schema-name": "testdb", "table-name": "t", "transaction-id": 2}}""")
    CdcPipeline.replayLines(spark, t, lines, batchId = 0)
    assert(t.scan().select($"trans_id").as[Long].collect().toSeq === Seq(7L))
  }

  test("table root with spaces round-trips (URI-decoded manifest paths)") {
    val root = tmpDir("ttable sp aces")
    val t = TransactionalTable.create(spark, root, Cdc.tableSchema, Cdc.PrimaryKey,
      Some(Cdc.PartitionColumn))
    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario1Lines, batchId = 0)
    assert(t.scan().count() === 10)
    assert(t.snapshot.files.forall(f => Files.exists(Paths.get(f.path))),
      "manifest paths must be real filesystem paths")
  }

  test("removeOrphanFiles: sweeps aged unreferenced files, spares live + fresh") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", LongType)))
    val root = tmpDir("ttable-orphanfiles")
    val t = TransactionalTable.create(spark, root, schema, "id")
    import spark.implicits._
    t.append(Seq((1L, 1L), (2L, 2L)).toDF("id", "v"))
    // simulate a beaten/crashed commit attempt: an unreferenced data dir
    val orphanDir = Paths.get(root, "data", "v9-deadbeef")
    Files.createDirectories(orphanDir)
    val aged = orphanDir.resolve("part-orphan.parquet")
    Files.write(aged, Array[Byte](1, 2, 3))
    Files.setLastModifiedTime(aged,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 7200000))
    val fresh = orphanDir.resolve("part-inflight.parquet")
    Files.write(fresh, Array[Byte](4, 5, 6))
    assert(t.removeOrphanFiles(olderThanMs = 3600000) === 1L)
    assert(!Files.exists(aged), "aged orphan must be swept")
    assert(Files.exists(fresh), "fresh (possibly in-flight) file must survive")
    // live data untouched — scans still answer
    assert(t.scan().count() === 2L)
    // second pass with zero grace sweeps the rest (incl. unreferenced
    // committer artifacts like _SUCCESS/.crc) and the now-empty dir
    assert(t.removeOrphanFiles(olderThanMs = -1) >= 1L)
    assert(!Files.exists(fresh) && !Files.exists(orphanDir))
    assert(t.scan().count() === 2L)
  }

  test("removeOrphanFiles resolves references executor-side: zero driver chunk loads") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", LongType)))
    val root = tmpDir("ttable-orphandist")
    val t = TransactionalTable.create(spark, root, schema, "id")
    import spark.implicits._
    t.append((1L to 50L).map(i => (i, i)).toDF("id", "v"))
    t.append((51L to 100L).map(i => (i, i)).toDF("id", "v"))
    val stray = Paths.get(root, "data", "v7-beefcafe")
    Files.createDirectories(stray)
    val aged = stray.resolve("part-orphan.parquet")
    Files.write(aged, Array[Byte](9))
    Files.setLastModifiedTime(aged,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 7200000))
    // open a FRESH handle (no warm chunk cache) so the reference resolution
    // is observable: the driver must touch chunk REFS only, entries parse in
    // executor tasks (ChunkJson) — the distributed-sweep contract
    val t2 = TransactionalTable.open(spark, root)
    val l0 = TransactionalTable.chunkLoads.get()
    val p0 = graft.table.ChunkJson.parses.get()
    assert(t2.removeOrphanFiles(olderThanMs = 3600000) === 1L)
    assert(TransactionalTable.chunkLoads.get() - l0 === 0L,
      "orphan sweep loaded chunk entries on the driver")
    assert(graft.table.ChunkJson.parses.get() - p0 >= 1L,
      "expected executor-side chunk parses for the reference set")
    assert(!Files.exists(aged) && t2.scan().count() === 100L)
  }

  test("snapshot tags: VERSION AS OF 'name' resolves; tagged versions survive expiry") {
    val w = tmpDir("graft-tag-warehouse")
    spark.conf.set("spark.sql.catalog.graft_tag", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_tag.warehouse", w)
    Files.createDirectories(Paths.get(s"$w/db"))
    val t = TransactionalTable.create(spark, s"$w/db/retail", Cdc.tableSchema,
      Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario1Lines, batchId = 0)
    t.createTag("after-batch0") // tags the current version (1)
    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario2Lines, batchId = 1)
    t.compact(minFileRows = 1L << 20) // extra versions so expiry has work
    assert(t.tags === Map("after-batch0" -> 1L))
    import spark.implicits._
    val n = spark.sql(
      "SELECT COUNT(*) AS c FROM graft_tag.db.retail VERSION AS OF 'after-batch0'")
      .as[Long].head()
    assert(n === 10L)
    // expiry keeps the tagged snapshot even outside the keepLast window
    t.expireSnapshots(keepLast = 1)
    assert(Files.exists(Paths.get(s"$w/db/retail", "manifest", "v1.json")))
    assert(t.scanAt(1).count() === 10) // still fully scannable
    assert(!Files.exists(Paths.get(s"$w/db/retail", "manifest", "v0.json")))
    // dropping the tag makes it expirable; unknown tag errors loudly
    t.dropTag("after-batch0")
    t.expireSnapshots(keepLast = 1)
    assert(!Files.exists(Paths.get(s"$w/db/retail", "manifest", "v1.json")))
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_tag.db.retail VERSION AS OF 'nope'").collect()
    }
  }

  test("bloom pruning: overlapping-range files without the key are not rewritten") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", LongType)))
    val root = tmpDir("ttable-bloom")
    val t = TransactionalTable.create(spark, root, schema, "id")
    import spark.implicits._
    // two files with fully-overlapping [min,max] but disjoint key sets
    t.append((0L until 100L by 2).map((_, 0L)).toDF("id", "v").coalesce(1)) // evens
    t.append((1L until 100L by 2).map((_, 1L)).toDF("id", "v").coalesce(1)) // odds
    val Seq(fEven, fOdd) = t.snapshot.files.sortBy(_.pkMin).toSeq
    assert(fEven.bloom.isDefined && fOdd.bloom.isDefined)
    assert(fEven.pkMin <= fOdd.pkMax && fOdd.pkMin <= fEven.pkMax,
      "test premise: ranges overlap, min/max alone cannot separate the files")
    // merge an EVEN key: the odd file must be carried untouched (bloom miss),
    // the even file rewritten
    t.merge(Seq((2L, 99L)).toDF("id", "v"), spark.emptyDataset[Long].toDF("id"), batchId = 0)
    val after = t.snapshot.files.map(_.path).toSet
    assert(after.contains(fOdd.path), "odd file was rewritten despite bloom miss")
    assert(!after.contains(fEven.path), "even file must have been rewritten")
    val got = t.scan().as[(Long, Long)].collect().toMap
    assert(got.size === 100 && got(2L) === 99L && got(3L) === 1L)
    // bloom round-trips the manifest: a fresh handle prunes identically
    val t2 = TransactionalTable.open(spark, root)
    assert(t2.snapshot.files.forall(_.bloom.isDefined))
  }

  test("compactClustered: disjoint pk ranges per file; data and travel intact") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", LongType)))
    val root = tmpDir("ttable-cluster")
    val t = TransactionalTable.create(spark, root, schema, "id")
    import spark.implicits._
    // 3 interleaved appends: every file spans nearly the whole key domain,
    // so min/max pruning would touch all of them
    (0 until 3).foreach { b =>
      t.append((0L until 300L).filter(_ % 3 == b).map(k => (k, b.toLong)).toDF("id", "v"))
    }
    val before = t.scan().orderBy("id").as[(Long, Long)].collect().toSeq
    val pre = t.snapshot.files
    assert(pre.combinations(2).exists { case Seq(a, b) =>
      a.pkMin <= b.pkMax && b.pkMin <= a.pkMax
    }, "test premise: pre-rewrite files must overlap in pk range")
    t.compactClustered(targetFiles = 4)
    val files = t.snapshot.files.sortBy(_.pkMin)
    assert(files.size === 4)
    files.sliding(2).foreach { case Seq(a, b) =>
      assert(a.pkMax < b.pkMin, s"overlap: [${a.pkMin},${a.pkMax}] vs [${b.pkMin},${b.pkMax}]")
    }
    assert(t.scan().orderBy("id").as[(Long, Long)].collect().toSeq === before)
    assert(t.scanAt(1).count() === 100) // time travel intact
  }

  test("orphaned manifest from a crashed commit is replaced on retry") {
    val root = tmpDir("ttable-orphan")
    val t = TransactionalTable.create(spark, root, Cdc.tableSchema, Cdc.PrimaryKey,
      Some(Cdc.PartitionColumn))
    // simulate: a previous attempt wrote manifest v1 then died before the swap
    Files.write(Paths.get(root, "manifest", "v1.json"), "{garbage".getBytes)
    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario1Lines, batchId = 0)
    assert(t.currentVersion === 1L)
    assert(t.scan().count() === 10)
  }

  test("expireSnapshots: old manifests and orphaned files removed, kept window intact") {
    val root = tmpDir("ttable-expire")
    val t = TransactionalTable.create(spark, root, Cdc.tableSchema, Cdc.PrimaryKey,
      Some(Cdc.PartitionColumn))
    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario1Lines, batchId = 0)
    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario2Lines, batchId = 1)
    t.compact() // v3
    val dataBefore = t.scan().orderBy("trans_id").collect().toSeq
    val filesBefore = Files.walk(Paths.get(root, "data")).iterator().asScala
      .count(p => p.toString.endsWith(".parquet"))

    t.expireSnapshots(keepLast = 1)
    // current snapshot untouched
    assert(t.scan().orderBy("trans_id").collect().toSeq === dataBefore)
    assert(t.countRows === 12)
    // old manifests gone; time travel beyond the window now fails
    assert(!Files.exists(Paths.get(root, "manifest", "v0.json")))
    assert(!Files.exists(Paths.get(root, "manifest", "v1.json")))
    intercept[Exception] { t.scanAt(1).count() }
    // orphaned data files physically removed
    val filesAfter = Files.walk(Paths.get(root, "data")).iterator().asScala
      .count(p => p.toString.endsWith(".parquet"))
    assert(filesAfter < filesBefore, s"$filesAfter !< $filesBefore")
    // history only reports the kept window
    assert(t.history().count() === 1)
  }

  test("oversized batch path: merge beyond the collect cap stays correct") {
    val root = tmpDir("ttable-big")
    val t = TransactionalTable.create(spark, root, Cdc.tableSchema, Cdc.PrimaryKey, None)
    t.append(spark.range(0, 1000).select(
      $"id".as("trans_id"), lit("c").as("customer_id"), lit("cart").as("event"),
      lit("S").as("sku"), lit(1).as("amount"), lit("pc").as("device"),
      lit(null).cast("timestamp").as("trans_datetime")))
    // shrink the cap via a large synthetic batch? MaxCollectedKeys is 2^20 —
    // instead exercise the range-pruned degrade by merging a wide batch whose
    // keys overlap every file; correctness must hold either way.
    val ups = spark.range(500, 1500).select(
      $"id".as("trans_id"), lit("c2").as("customer_id"), lit("cart").as("event"),
      lit("S").as("sku"), lit(2).as("amount"), lit("pc").as("device"),
      lit(null).cast("timestamp").as("trans_datetime"))
    t.merge(ups, spark.emptyDataset[Long].toDF("trans_id"), batchId = 1)
    assert(t.scan().count() === 1500)
    assert(t.scan().filter($"amount" === 2).count() === 1000)
  }
}
