package graft

import org.apache.spark.sql.functions._

import graft.cdc.Cdc
import graft.fixtures.CdcFixtures
import graft.stream.CdcPipeline
import graft.table.{Merge, TransactionalTable}

class CdcCoreSpec extends SparkSpec {
  import spark.implicits._

  private def parsed(lines: Seq[String]) = Cdc.parse(lines.toDS())

  test("envelope parse: all golden records parse, schema is the pinned struct") {
    val df = parsed(CdcFixtures.scenario1Lines ++ CdcFixtures.scenario2Lines)
    assert(df.count() === 23)
    assert(df.schema === Cdc.envelopeSchema)
    assert(df.filter(col("data").isNull || col("metadata").isNull).count() === 0)
  }

  test("flatten: hour-29 timestamp parses to NULL, valid ones to UTC instants") {
    val flat = Cdc.flatten(parsed(CdcFixtures.scenario2Lines))
    val r47 = flat.filter($"trans_id" === 47).select($"_op_timestamp").collect()
    assert(r47.length === 1 && r47.head.isNullAt(0))
    val r19 = flat.filter($"trans_id" === 19)
      .select(date_format($"_op_timestamp", "yyyy-MM-dd HH:mm:ss.SSSSSS")).head().getString(0)
    assert(r19 === "2023-01-16 08:05:36.061467")
  }

  test("W1 dedup: latest per key wins; NULL timestamps lose ties; txn-id tiebreak") {
    // Two events for key 1: later ts must win.
    val lines = Seq(
      """{"data": {"trans_id": 1, "customer_id": "c", "event": "cart", "sku": "A", "amount": 1, "device": "pc", "trans_datetime": "2023-01-16T06:00:00Z"}, "metadata": {"timestamp": "2023-01-16T06:00:00.000001Z", "record-type": "data", "operation": "insert", "partition-key-type": "primary-key", "schema-name": "testdb", "table-name": "t", "transaction-id": 1}}""",
      """{"data": {"trans_id": 1, "customer_id": "c", "event": "cart", "sku": "A", "amount": 9, "device": "pc", "trans_datetime": "2023-01-16T06:00:00Z"}, "metadata": {"timestamp": "2023-01-16T07:00:00.000001Z", "record-type": "data", "operation": "update", "partition-key-type": "primary-key", "schema-name": "testdb", "table-name": "t", "transaction-id": 2}}""",
      // key 2: equal timestamps, txn 5 vs 6 → 6 wins (deterministic tiebreak)
      """{"data": {"trans_id": 2, "customer_id": "c", "event": "cart", "sku": "A", "amount": 1, "device": "pc", "trans_datetime": "2023-01-16T06:00:00Z"}, "metadata": {"timestamp": "2023-01-16T06:00:00.000001Z", "record-type": "data", "operation": "insert", "partition-key-type": "primary-key", "schema-name": "testdb", "table-name": "t", "transaction-id": 5}}""",
      """{"data": {"trans_id": 2, "customer_id": "c", "event": "cart", "sku": "A", "amount": 7, "device": "pc", "trans_datetime": "2023-01-16T06:00:00.000001Z"}, "metadata": {"timestamp": "2023-01-16T06:00:00.000001Z", "record-type": "data", "operation": "update", "partition-key-type": "primary-key", "schema-name": "testdb", "table-name": "t", "transaction-id": 6}}""",
      // key 3: one NULL-ts record vs one valid older → valid wins
      """{"data": {"trans_id": 3, "customer_id": "c", "event": "cart", "sku": "A", "amount": 1, "device": "pc", "trans_datetime": "2023-01-16T06:00:00Z"}, "metadata": {"timestamp": "2023-01-16T29:00:00.000001Z", "record-type": "data", "operation": "update", "partition-key-type": "primary-key", "schema-name": "testdb", "table-name": "t", "transaction-id": 9}}""",
      """{"data": {"trans_id": 3, "customer_id": "c", "event": "cart", "sku": "A", "amount": 4, "device": "pc", "trans_datetime": "2023-01-16T06:00:00Z"}, "metadata": {"timestamp": "2023-01-16T05:00:00.000001Z", "record-type": "data", "operation": "insert", "partition-key-type": "primary-key", "schema-name": "testdb", "table-name": "t", "transaction-id": 8}}""")
    val got = Cdc.latestPerKey(Cdc.flatten(parsed(lines)))
      .select($"trans_id", $"amount").as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 9, 2L -> 7, 3L -> 4))
  }

  test("latestPerKeyAgg (skew-aware) matches the window-based W1 kernel") {
    val flat = Cdc.flatten(parsed(CdcFixtures.scenario1Lines ++ CdcFixtures.scenario2Lines))
    val viaWindow = Cdc.latestPerKey(flat)
      .select($"trans_id", $"amount", $"_op").as[(Long, Int, String)].collect().toSet
    val viaAgg = Cdc.latestPerKeyAgg(flat)
      .select($"trans_id", $"amount", $"_op").as[(Long, Int, String)].collect().toSet
    assert(viaAgg === viaWindow)
  }

  test("latestPerKeyAgg under heavy key skew: one hot key, 20k events") {
    // hot key 1 gets 20k updates; keys 2..50 one each — the agg form must
    // pick the max-(ts,txn) row exactly like the window form
    val hot = (0 until 20000).map { i =>
      s"""{"data": {"trans_id": 1, "customer_id": "c", "event": "cart", "sku": "S", "amount": $i, "device": "pc", "trans_datetime": "2023-01-16T06:00:00Z"}, "metadata": {"timestamp": "2023-01-16T06:00:00.${f"$i%06d"}Z", "record-type": "data", "operation": "update", "partition-key-type": "primary-key", "schema-name": "testdb", "table-name": "t", "transaction-id": $i}}"""
    }
    val cold = (2 to 50).map { k =>
      s"""{"data": {"trans_id": $k, "customer_id": "c", "event": "cart", "sku": "S", "amount": $k, "device": "pc", "trans_datetime": "2023-01-16T06:00:00Z"}, "metadata": {"timestamp": "2023-01-16T07:00:00.000001Z", "record-type": "data", "operation": "insert", "partition-key-type": "primary-key", "schema-name": "testdb", "table-name": "t", "transaction-id": ${100000 + k}}}"""
    }
    val flat = Cdc.flatten(parsed(scala.util.Random.shuffle(hot ++ cold)))
    val got = Cdc.latestPerKeyAgg(flat).select($"trans_id", $"amount")
      .as[(Long, Int)].collect().toMap
    assert(got(1L) === 19999)
    assert(got.size === 50 && got(50L) === 50)
  }

  test("Merge kernel: upsert = anti ∪ source; delete = anti") {
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val source = Seq((2L, "B"), (4L, "D")).toDF("k", "v")
    val up = Merge.upsert(target, source, "k").as[(Long, String)].collect().toMap
    assert(up === Map(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "D"))
    val del = Merge.delete(target, Seq(2L, 9L).toDF("k"), "k").as[(Long, String)].collect().toMap
    assert(del === Map(1L -> "a", 3L -> "c"))
  }

  test("golden replay: scenario1 then scenario2 produce the reference end state") {
    val root = tmpDir("ttable")
    val t = TransactionalTable.create(spark, root, Cdc.tableSchema, Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario1Lines, batchId = 0)
    assert(t.countRows === 10)
    assert(t.scan().count() === 10)

    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario2Lines, batchId = 1)
    val got = t.scan()
      .select($"trans_id", $"customer_id", $"event", $"sku", $"amount", $"device",
        date_format($"trans_datetime", "yyyy-MM-dd HH:mm:ss"))
      .as[(Long, String, String, String, Int, String, String)]
      .collect().sortBy(_._1).toSeq
    assert(got === CdcFixtures.expectedEndState)

    // metadata-only count agrees with the scan
    assert(t.countRows === 12)

    // time travel: version after batch 0 still shows the 10 original rows
    val v1 = t.scanAt(1).select($"trans_id").as[Long].collect().sorted.toSeq
    assert(v1 === Seq(6L, 19L, 21L, 23L, 24L, 27L, 28L, 30L, 33L, 35L))
  }

  test("idempotent replay (T4): re-merging the same batchId is a no-op") {
    val root = tmpDir("ttable-idem")
    val t = TransactionalTable.create(spark, root, Cdc.tableSchema, Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario1Lines, batchId = 0)
    val v = t.currentVersion
    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario1Lines, batchId = 0) // replay
    assert(t.currentVersion === v, "replayed batch must not create a new snapshot")
    assert(t.countRows === 10)
    // replaying scenario2 twice with distinct ids: second is fenced too
    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario2Lines, batchId = 1)
    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario2Lines, batchId = 1)
    assert(t.countRows === 12)
  }

  test("copy-on-write prunes untouched files: scenario2 merge carries unaffected files") {
    val root = tmpDir("ttable-cow")
    val t = TransactionalTable.create(spark, root, Cdc.tableSchema, Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    // Seed two far-apart key ranges as separate commits → separate files.
    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario1Lines, batchId = 0)
    val far = Seq(
      """{"data": {"trans_id": 1000000, "customer_id": "z", "event": "visit", "sku": "Z", "amount": 1, "device": "pc", "trans_datetime": "2023-01-16T06:00:00Z"}, "metadata": {"timestamp": "2023-01-16T06:00:00.000001Z", "record-type": "data", "operation": "insert", "partition-key-type": "primary-key", "schema-name": "testdb", "table-name": "t", "transaction-id": 99}}""")
    CdcPipeline.replayLines(spark, t, far, batchId = 1)
    val before = t.snapshot.files.map(_.path).toSet
    // scenario2 touches keys ≤ 47 only → the key-1000000 file must be carried as-is
    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario2Lines, batchId = 2)
    val after = t.snapshot.files.map(_.path).toSet
    val farFiles = t.snapshot.files.filter(_.pkMin >= 1000000L)
    assert(farFiles.nonEmpty && farFiles.forall(f => before.contains(f.path)),
      "file outside the batch key range was rewritten")
    assert(t.scan().filter($"trans_id" === 1000000L).count() === 1)
    assert(after !== before)
  }

  test("partition pruning: manifest-level file skipping by partition value") {
    val root = tmpDir("ttable-part")
    val t = TransactionalTable.create(spark, root, Cdc.tableSchema, Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario1Lines, batchId = 0)
    val pruned = t.scanPartitions(_.contains("cart"))
    assert(pruned.select($"event").distinct().as[String].collect().toSeq === Seq("cart"))
    val cartFiles = t.snapshot.files.filter(_.partition.contains("cart"))
    assert(pruned.count() === cartFiles.map(_.rows).sum)
  }
}
