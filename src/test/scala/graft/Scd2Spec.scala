package graft

import org.apache.spark.sql.functions._

import graft.cdc.Cdc
import graft.fixtures.CdcFixtures
import graft.table.{Scd2, TransactionalTable}

/** SCD2 type-2 history maintenance: every key keeps interval rows
  * (_valid_from_seq/_valid_to_seq/_is_current) instead of being destructively
  * merged; updates close + reopen, deletes close (tombstone), point-in-time
  * reads come from interval algebra. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def golden(): TransactionalTable = {
    val root = tmpDir("scd2")
    val hist = Scd2.create(spark, root, Cdc.tableSchema, Cdc.PrimaryKey)
    def applyB(lines: Seq[String], seq: Long, b: Long): Unit = {
      val deduped = Cdc.latestPerKey(Cdc.flatten(Cdc.parse(lines.toDS())))
      Scd2.applyBatch(hist, Cdc.projectToTable(Cdc.upserts(deduped)),
        Cdc.deletes(deduped).select(col(Cdc.PrimaryKey)), Cdc.PrimaryKey,
        seq = seq, batchId = b)
    }
    applyB(CdcFixtures.scenario1Lines, 1, 0)
    applyB(CdcFixtures.scenario2Lines, 2, 1)
    hist
  }

  test("golden replay: 20 interval rows; current slice equals the MERGE end state") {
    val hist = golden()
    assert(hist.scan().count() === 20) // 10 originals + 5 reopened + 5 new
    val cur = Scd2.current(hist)
      .select($"trans_id", $"amount").as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(cur === CdcFixtures.expectedEndState.map(e => (e._1, e._5)))
    // closed rows: 5 updated + 3 deleted originals
    val closed = hist.scan().filter(!col(Scd2.IsCurrent))
    assert(closed.count() === 8)
    assert(closed.select("trans_id").as[Long].collect().toSet ===
      Set(6L, 19L, 21L, 23L, 24L, 30L, 33L, 35L))
  }

  test("asOf interval algebra: seq 1 equals the v1 state; deletes tombstone") {
    val hist = golden()
    val v1 = Scd2.asOf(hist, 1L).select($"trans_id", $"amount")
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(v1 === CdcFixtures.expectedStateV1.map(e => (e._1, e._5)))
    // deleted key 6 has a closed tombstone and no current row
    val k6 = hist.scan().filter($"trans_id" === 6L)
      .select(col(Scd2.ValidFrom), col(Scd2.ValidTo), col(Scd2.IsCurrent))
      .as[(Long, Option[Long], Boolean)].collect().toSeq
    assert(k6 === Seq((1L, Some(2L), false)))
    assert(Scd2.asOf(hist, 2L).filter($"trans_id" === 6L).count() === 0)
  }

  test("replayed batch is an exactly-once no-op (fence)") {
    val hist = golden()
    val before = hist.scan().orderBy("trans_id", Scd2.ValidFrom).collect().toSeq
    val deduped = Cdc.latestPerKey(Cdc.flatten(Cdc.parse(
      CdcFixtures.scenario2Lines.toDS())))
    Scd2.applyBatch(hist, Cdc.projectToTable(Cdc.upserts(deduped)),
      Cdc.deletes(deduped).select(col(Cdc.PrimaryKey)), Cdc.PrimaryKey,
      seq = 2, batchId = 1)
    assert(hist.scan().orderBy("trans_id", Scd2.ValidFrom).collect().toSeq === before)
  }

  test("streaming foreachBatch sink: checkpointed restart resumes; history exact") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.streaming.Trigger
    val work = tmpDir("scd2-stream")
    val input = s"$work/input"
    val checkpoint = s"$work/checkpoint"
    Files.createDirectories(Paths.get(input))
    val hist = Scd2.create(spark, s"$work/hist", Cdc.tableSchema, Cdc.PrimaryKey)
    def runOnce(): Unit = {
      val q = spark.readStream.schema(Cdc.envelopeSchema).json(input)
        .writeStream
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.ProcessingTime("1 second"))
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
          val deduped = Cdc.latestPerKey(Cdc.flatten(df))
          Scd2.applyBatch(hist, Cdc.projectToTable(Cdc.upserts(deduped)),
            Cdc.deletes(deduped).select(col(Cdc.PrimaryKey)), Cdc.PrimaryKey,
            seq = batchId + 1, batchId = batchId)
        }
        .start()
      q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
    CdcFixtures.write(input, "batch1.jsonl", CdcFixtures.scenario1Lines)
    runOnce()
    assert(hist.scan().count() === 10)
    // batch 2 lands while the stream is DOWN; restart picks it up exactly once
    CdcFixtures.write(input, "batch2.jsonl", CdcFixtures.scenario2Lines)
    runOnce()
    runOnce() // idle restart: checkpoint replay must not re-apply
    assert(hist.scan().count() === 20)
    val cur = Scd2.current(hist)
      .select($"trans_id", $"amount").as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(cur === CdcFixtures.expectedEndState.map(e => (e._1, e._5)))
  }

  test("re-insert after delete opens a fresh interval; history keeps the tombstone") {
    val hist = golden()
    val row = Seq((6L, "387378799012", "list", "AI6161BEFX", 99, "pc",
      new java.sql.Timestamp(0L))).toDF(Cdc.tableSchema.fieldNames.toIndexedSeq: _*)
    Scd2.applyBatch(hist, row, spark.emptyDataset[Long].toDF("trans_id"),
      Cdc.PrimaryKey, seq = 3, batchId = 2)
    val k6 = hist.scan().filter($"trans_id" === 6L)
      .select(col(Scd2.ValidFrom), col(Scd2.ValidTo), col(Scd2.IsCurrent))
      .as[(Long, Option[Long], Boolean)].collect().toSet
    assert(k6 === Set((1L, Some(2L), false), (3L, None, true)))
  }
}
