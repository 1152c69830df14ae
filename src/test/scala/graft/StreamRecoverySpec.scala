package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger

import graft.cdc.Cdc
import graft.fixtures.CdcFixtures
import graft.stream.CdcPipeline
import graft.table.TransactionalTable

/** T4/T6 under the at-least-once contract: the stream is stopped cold between
  * batches and must resume from the checkpoint without losing or re-applying
  * work (SURVEY §2.9). */
class StreamRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("stop between batches → resume from checkpoint: no loss, no duplicate commits") {
    val work = tmpDir("stream-recovery")
    val input = s"$work/input"
    val checkpoint = s"$work/checkpoint"
    Files.createDirectories(Paths.get(input))
    val t = TransactionalTable.create(spark, s"$work/table", Cdc.tableSchema,
      Cdc.PrimaryKey, Some(Cdc.PartitionColumn))

    def runOnce(): Unit = {
      val q = CdcPipeline.start(spark, input, t, checkpoint,
        trigger = Trigger.ProcessingTime("1 second"))
      q.processAllAvailable()
      q.stop() // cold stop — no graceful drain beyond the processed batch
      q.awaitTermination()
    }

    CdcFixtures.write(input, "batch1.jsonl", CdcFixtures.scenario1Lines)
    runOnce()
    assert(t.countRows === 10)
    val versionAfter1 = t.currentVersion

    // second file lands while the stream is DOWN; restart must pick it up
    CdcFixtures.write(input, "batch2.jsonl", CdcFixtures.scenario2Lines)
    runOnce()
    assert(t.countRows === 12)
    val versionAfter2 = t.currentVersion
    assert(versionAfter2 === versionAfter1 + 1, "exactly one new commit for the new file")

    // third restart with nothing new: checkpoint replay must not re-commit
    runOnce()
    assert(t.currentVersion === versionAfter2, "idle restart created a commit")
    assert(t.countRows === 12)

    val ids = t.scan().select($"trans_id").as[Long].collect().sorted.toSeq
    assert(ids === CdcFixtures.expectedEndState.map(_._1))
  }

  test("maintainViews: summary MV stays fresh per batch via the incremental tiers, across restart") {
    val work = tmpDir("stream-mv")
    val input = s"$work/input"
    Files.createDirectories(Paths.get(input))
    val cat = s"graft_smv${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", s"$work/wh")
    Files.createDirectories(Paths.get(s"$work/wh/db"))
    val t = TransactionalTable.create(spark, s"$work/wh/db/retail", Cdc.tableSchema,
      Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.db.ev_tot " +
      s"TBLPROPERTIES('pk'='event') AS " +
      s"SELECT event, SUM(amount) AS total, COUNT(amount) AS na, COUNT(*) AS n " +
      s"FROM $cat.db.retail GROUP BY event")
    def runOnce(): Unit = {
      val q = CdcPipeline.start(spark, input, t, s"$work/ckpt",
        trigger = Trigger.ProcessingTime("1 second"),
        maintainViews = Seq(s"$cat.db.ev_tot"))
      q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
    def mvRows(): Seq[(String, Long, Long, Long)] =
      spark.sql(s"SELECT event, total, na, n FROM $cat.db.ev_tot ORDER BY event")
        .as[(String, Long, Long, Long)].collect().toSeq
    def expect(rows: Seq[(String, Int)]): Seq[(String, Long, Long, Long)] =
      rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (ev, rs) =>
        (ev, rs.map(_._2.toLong).sum, rs.size.toLong, rs.size.toLong) }
    CdcFixtures.write(input, "b1.jsonl", CdcFixtures.scenario1Lines)
    runOnce()
    assert(mvRows() === expect(CdcFixtures.expectedStateV1
      .map { case (_, _, ev, _, amt, _, _) => (ev, amt) }),
      "MV must reflect batch 1 without an out-of-band refresh")
    // restart; batch 2 carries updates + deletes → per-batch RETRACTION
    CdcFixtures.write(input, "b2.jsonl", CdcFixtures.scenario2Lines)
    runOnce()
    assert(mvRows() === expect(CdcFixtures.expectedEndState
      .map { case (_, _, ev, _, amt, _, _) => (ev, amt) }))
    // incremental-path proof: only the incremental tiers land writer fences
    val st = TransactionalTable.open(spark, s"$work/wh/db/ev_tot/_storage")
    assert(st.snapshot.writerFences.keys.exists(_.startsWith("mv-incr")),
      "refreshes must have taken the incremental tiers")
    // idle restart: no batch → no refresh → no MV commit
    val v = st.currentVersion
    runOnce()
    assert(TransactionalTable.open(spark, s"$work/wh/db/ev_tot/_storage")
      .currentVersion === v, "idle restart committed to the MV")
  }

  test("streaming JOIN MV: crash between the aux and storage commits heals on restart (E201)") {
    val work = tmpDir("stream-mv-join-crash")
    val input = s"$work/input"
    Files.createDirectories(Paths.get(input))
    val cat = s"graft_smjc${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", s"$work/wh")
    Files.createDirectories(Paths.get(s"$work/wh/db"))
    val t = TransactionalTable.create(spark, s"$work/wh/db/retail", Cdc.tableSchema,
      Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    TransactionalTable.create(spark, s"$work/wh/db/evcat",
      org.apache.spark.sql.types.StructType.fromDDL("event STRING, cat STRING"),
      "event", None)
    spark.sql(s"INSERT INTO $cat.db.evcat VALUES " +
      "('visit', 'browse'), ('cart', 'intent'), ('like', 'social'), " +
      "('purchase', 'buy'), ('list', 'browse')")
    // a JOIN MV with COUNT(DISTINCT): the refresh commits the value-count
    // aux FIRST, then storage — the widest crash window in the fence algebra
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.db.cat_devs " +
      s"TBLPROPERTIES('pk'='cat') AS " +
      s"SELECT c.cat, COUNT(DISTINCT r.device) AS devs, COUNT(*) AS n " +
      s"FROM $cat.db.retail r JOIN $cat.db.evcat c ON r.event = c.event " +
      s"GROUP BY c.cat")
    def runOnce(): Unit = {
      val q = CdcPipeline.start(spark, input, t, s"$work/ckpt",
        trigger = Trigger.ProcessingTime("1 second"),
        maintainViews = Seq(s"$cat.db.cat_devs"))
      q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
    CdcFixtures.write(input, "b1.jsonl", CdcFixtures.scenario1Lines)
    runOnce()
    // batch 2 (updates + deletes) arrives; the refresh CRASHES after the
    // aux commit, before the storage merge — mid-micro-batch, with the
    // table merge already committed but the checkpoint not yet advanced
    CdcFixtures.write(input, "b2.jsonl", CdcFixtures.scenario2Lines)
    graft.sql.GraftViewTestHooks.failAfterAuxCommit =
      Some(_ => throw new scala.util.control.ControlThrowable("injected crash") {})
    try {
      intercept[Throwable] { runOnce() }
    } finally graft.sql.GraftViewTestHooks.failAfterAuxCommit = None
    // the DIM advances too before the healing restart: the per-source aux
    // fences must net ONLY the unseen remainder per source (a full-interval
    // re-net would double-apply the crashed batch's aux delta)
    spark.sql(s"UPDATE $cat.db.evcat SET cat = 'social' WHERE event = 'list'")
    runOnce() // checkpoint re-delivers batch 2; merge re-fences; refresh heals
    val cats = Map("visit" -> "browse", "cart" -> "intent", "like" -> "social",
      "purchase" -> "buy", "list" -> "social")
    val want = CdcFixtures.expectedEndState
      .map { case (_, _, ev, _, _, dev, _) => (cats(ev), dev) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (c, rs) => (c, rs.map(_._2).distinct.size.toLong, rs.size.toLong) }
    val got = spark.sql(s"SELECT cat, devs, n FROM $cat.db.cat_devs ORDER BY cat")
      .as[(String, Long, Long)].collect().toSeq
    assert(got === want, "healed join MV diverged after the crash window")
    val st = TransactionalTable.open(spark, s"$work/wh/db/cat_devs/_storage")
    assert(st.snapshot.writerFences.keys.exists(_.startsWith("mv-incr-join")),
      "the heal must ride the incremental join tier")
  }

  test("startingPosition=LATEST skips files present before the stream started") {
    val work = tmpDir("stream-latest")
    val input = s"$work/input"
    Files.createDirectories(Paths.get(input))
    val t = TransactionalTable.create(spark, s"$work/table", Cdc.tableSchema,
      Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    // scenario1 lands BEFORE the stream exists — a LATEST start must not replay it
    CdcFixtures.write(input, "preexisting.jsonl", CdcFixtures.scenario1Lines)
    val q = CdcPipeline.start(spark, input, t, s"$work/ckpt",
      trigger = Trigger.ProcessingTime("1 second"),
      startingPosition = graft.stream.StartingPosition.Latest)
    try {
      q.processAllAvailable()
      assert(t.countRows === 0, "LATEST start replayed pre-existing data")
      // new data after start IS picked up
      val line =
        """{"data": {"trans_id": 900, "customer_id": "c", "event": "cart", "sku": "S", "amount": 1, "device": "pc", "trans_datetime": "2023-01-16T06:00:00Z"}, "metadata": {"timestamp": "2023-01-16T06:00:01.000001Z", "record-type": "data", "operation": "insert", "partition-key-type": "primary-key", "schema-name": "testdb", "table-name": "t", "transaction-id": 1}}"""
      CdcFixtures.write(input, "fresh.jsonl", Seq(line))
      q.processAllAvailable()
      assert(t.scan().select($"trans_id").as[Long].collect().toSeq === Seq(900L))
    } finally { q.stop(); q.awaitTermination() }
  }

  test("Trigger.AvailableNow: bounded catch-up run self-terminates at the golden state") {
    val work = tmpDir("stream-avnow")
    val input = s"$work/input"
    Files.createDirectories(Paths.get(input))
    val t = TransactionalTable.create(spark, s"$work/table", Cdc.tableSchema,
      Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    CdcFixtures.write(input, "batch1.jsonl", CdcFixtures.scenario1Lines)
    CdcFixtures.write(input, "batch2.jsonl", CdcFixtures.scenario2Lines)
    // AvailableNow processes everything present, then stops on its own — the
    // bounded-backfill mode (no processAllAvailable/stop choreography needed).
    val q = CdcPipeline.start(spark, input, t, s"$work/ckpt",
      trigger = Trigger.AvailableNow())
    assert(q.awaitTermination(120000), "AvailableNow query did not self-terminate")
    assert(t.scan().select($"trans_id").as[Long].collect().sorted.toSeq ===
      CdcFixtures.expectedEndState.map(_._1))
  }

  test("maxFilesPerTrigger=1 splits a backlog into multiple bounded batches") {
    val work = tmpDir("stream-maxfiles")
    val input = s"$work/input"
    Files.createDirectories(Paths.get(input))
    val t = TransactionalTable.create(spark, s"$work/table", Cdc.tableSchema,
      Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    CdcFixtures.write(input, "batch1.jsonl", CdcFixtures.scenario1Lines)
    CdcFixtures.write(input, "batch2.jsonl", CdcFixtures.scenario2Lines)
    val q = CdcPipeline.start(spark, input, t, s"$work/ckpt",
      trigger = Trigger.AvailableNow(), maxFilesPerTrigger = 1)
    assert(q.awaitTermination(120000), "AvailableNow query did not self-terminate")
    // same golden end state, but the backlog was consumed one file per batch
    assert(t.scan().select($"trans_id").as[Long].collect().sorted.toSeq ===
      CdcFixtures.expectedEndState.map(_._1))
    assert(t.snapshot.batchId >= 1L, "expected at least two micro-batches")
  }

  test("streaming in merge-on-read mode reaches the golden end state") {
    val work = tmpDir("stream-mor")
    val input = s"$work/input"
    Files.createDirectories(Paths.get(input))
    val t = TransactionalTable.create(spark, s"$work/table", Cdc.tableSchema,
      Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    CdcFixtures.write(input, "batch1.jsonl", CdcFixtures.scenario1Lines)
    val q1 = CdcPipeline.start(spark, input, t, s"$work/ckpt",
      trigger = Trigger.ProcessingTime("1 second"),
      mode = graft.table.MergeMode.MergeOnRead)
    q1.processAllAvailable(); q1.stop(); q1.awaitTermination()
    CdcFixtures.write(input, "batch2.jsonl", CdcFixtures.scenario2Lines)
    val q2 = CdcPipeline.start(spark, input, t, s"$work/ckpt",
      trigger = Trigger.ProcessingTime("1 second"),
      mode = graft.table.MergeMode.MergeOnRead)
    q2.processAllAvailable(); q2.stop(); q2.awaitTermination()
    assert(t.snapshot.deletes.nonEmpty, "MOR merges must defer deletes")
    assert(t.scan().select($"trans_id").as[Long].collect().sorted.toSeq ===
      CdcFixtures.expectedEndState.map(_._1))
    t.compact()
    assert(t.snapshot.deletes.isEmpty)
    assert(t.countRows === 12)
  }

  test("compaction cadence inside the streaming loop bounds file count") {
    val work = tmpDir("stream-compact")
    val input = s"$work/input"
    Files.createDirectories(Paths.get(input))
    val t = TransactionalTable.create(spark, s"$work/table", Cdc.tableSchema,
      Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    // 4 single-envelope files, one per micro-batch (maxFilesPerTrigger=1
    // unavailable through the helper — emulate by running once per file)
    (0 until 4).foreach { i =>
      val line =
        s"""{"data": {"trans_id": ${200 + i}, "customer_id": "c", "event": "cart", "sku": "S", "amount": $i, "device": "pc", "trans_datetime": "2023-01-16T06:00:00Z"}, "metadata": {"timestamp": "2023-01-16T06:00:0$i.000001Z", "record-type": "data", "operation": "insert", "partition-key-type": "primary-key", "schema-name": "testdb", "table-name": "t", "transaction-id": $i}}"""
      CdcFixtures.write(input, s"b$i.jsonl", Seq(line))
      val q = CdcPipeline.start(spark, input, t, s"$work/ckpt",
        trigger = Trigger.ProcessingTime("1 second"), compactEvery = 2)
      q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
    assert(t.countRows === 4)
    // without compaction there would be 4 single-row files in 'cart'
    assert(t.snapshot.files.size < 4, s"files=${t.snapshot.files.map(_.rows)}")
  }

  test("malformed envelopes quarantine to the dead-letter queue; the stream continues") {
    val work = tmpDir("stream-dlq")
    val input = s"$work/input"
    val dlq = s"$work/dlq"
    Files.createDirectories(Paths.get(input))
    val t = TransactionalTable.create(spark, s"$work/table", Cdc.tableSchema,
      Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    CdcFixtures.write(input, "b1.jsonl",
      CdcFixtures.scenario1Lines :+ """this is not json at all""")
    val q = CdcPipeline.start(spark, input, t, s"$work/ckpt",
      trigger = Trigger.ProcessingTime("1 second"), dlqDir = Some(dlq))
    q.processAllAvailable(); q.stop(); q.awaitTermination()
    assert(t.countRows === 10, "the good rows must land despite the poison line")
    // mixed-era safety: a flat pre-layout file in dlqDir must not break
    // reading the partitioned data/ tree
    Files.writeString(Paths.get(dlq, "legacy-flat.json"), """{"old":1}""")
    val quarantined = spark.read.json(s"$dlq/data")
    assert(quarantined.count() === 1L)
    assert(quarantined.columns.contains("_dlq_batch_id"))
    // Redelivery of an already-committed batch (restart replay): the table
    // merge is fenced to a no-op AND the quarantine records must not
    // duplicate — the DLQ write overwrites the batch's own partition.
    import spark.implicits._
    CdcPipeline.applyCdcBatch(t,
      graft.cdc.Cdc.parse(
        (CdcFixtures.scenario1Lines :+ """this is not json at all""").toDS()),
      batchId = 0, dlqDir = Some(dlq))
    assert(t.countRows === 10, "fenced replay must not change the table")
    assert(spark.read.json(s"$dlq/data").count() === 1L,
      "replayed batch must not duplicate DLQ records")
  }

  test("inferSchema=true samples the source like the reference; extra fields ride along") {
    val work = tmpDir("stream-infer")
    val input = s"$work/input"
    Files.createDirectories(Paths.get(input))
    val t = TransactionalTable.create(spark, s"$work/table", Cdc.tableSchema,
      Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    // producer-evolved envelopes: every line gains a field the pinned schema
    // does not know; inference must surface it and the kernel must still land
    // the golden end state
    def evolved(lines: Seq[String]): Seq[String] =
      lines.map(_.replaceFirst("\\{\"data\": \\{",
        "{\"data\": {\"new_producer_field\": \"x\", "))
    CdcFixtures.write(input, "b1.jsonl", evolved(CdcFixtures.scenario1Lines))
    CdcFixtures.write(input, "b2.jsonl", evolved(CdcFixtures.scenario2Lines))
    val q = CdcPipeline.start(spark, input, t, s"$work/ckpt",
      trigger = Trigger.ProcessingTime("1 second"), inferSchema = true)
    q.processAllAvailable(); q.stop(); q.awaitTermination()
    assert(t.scan().select($"trans_id").as[Long].collect().sorted.toSeq ===
      CdcFixtures.expectedEndState.map(_._1))
    // empty source: inference falls back to the pinned schema, stream starts
    val input2 = s"$work/input2"
    Files.createDirectories(Paths.get(input2))
    val t2 = TransactionalTable.create(spark, s"$work/table2", Cdc.tableSchema,
      Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    val q2 = CdcPipeline.start(spark, input2, t2, s"$work/ckpt2",
      trigger = Trigger.ProcessingTime("1 second"), inferSchema = true)
    q2.processAllAvailable(); q2.stop(); q2.awaitTermination()
    assert(t2.countRows === 0)
  }
}
