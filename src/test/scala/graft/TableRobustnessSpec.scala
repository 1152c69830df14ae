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
