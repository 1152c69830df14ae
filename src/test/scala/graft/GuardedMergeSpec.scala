package graft

import org.apache.spark.sql.functions._

import graft.cdc.Cdc
import graft.stream.CdcPipeline
import graft.table.TransactionalTable

/** T3 late-data semantics, both modes (SURVEY §7.5.3): the faithful pipeline
  * reproduces the reference's last-batch-wins anomaly; the guarded pipeline
  * keeps the newest row by op timestamp regardless of arrival order. */
class GuardedMergeSpec extends SparkSpec {
  import spark.implicits._

  private def line(id: Long, amount: Int, ts: String, op: String, txn: Long): String =
    s"""{"data": {"trans_id": $id, "customer_id": "c", "event": "cart", "sku": "S", "amount": $amount, "device": "pc", "trans_datetime": "2023-01-16T06:00:00Z"}, "metadata": {"timestamp": "$ts", "record-type": "data", "operation": "$op", "partition-key-type": "primary-key", "schema-name": "testdb", "table-name": "t", "transaction-id": $txn}}"""

  private val fresh = line(1, 100, "2023-01-16T10:00:00.000001Z", "insert", 1)
  private val late = line(1, 9, "2023-01-16T09:00:00.000001Z", "update", 2) // OLDER ts, later batch
  private val lateDelete = line(1, 0, "2023-01-16T08:00:00.000001Z", "delete", 3)
  private val freshDelete = line(1, 0, "2023-01-16T11:00:00.000001Z", "delete", 4)

  test("faithful mode: late batch clobbers (reference behavior)") {
    val t = TransactionalTable.create(spark, tmpDir("faithful"), Cdc.tableSchema,
      Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    CdcPipeline.replayLines(spark, t, Seq(fresh), 0)
    CdcPipeline.replayLines(spark, t, Seq(late), 1)
    assert(t.scan().select($"amount").as[Int].head() === 9) // last batch won
  }

  test("guarded mode: older-ts updates and deletes lose; newer ones win") {
    val t = TransactionalTable.create(spark, tmpDir("guarded"), Cdc.guardedTableSchema,
      Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    def replay(l: String, b: Long): Unit = {
      import spark.implicits._
      CdcPipeline.applyCdcBatchGuarded(t, Cdc.parse(Seq(l).toDS()), b)
    }
    replay(fresh, 0)
    replay(late, 1) // older ts → must NOT clobber
    assert(t.scan().select($"amount").as[Int].head() === 100)
    replay(lateDelete, 2) // older-ts delete → must NOT delete
    assert(t.scan().count() === 1)
    replay(freshDelete, 3) // newer-ts delete → deletes
    assert(t.scan().count() === 0)
    // insert after guarded delete works (no target row → source wins)
    replay(line(1, 55, "2023-01-16T12:00:00.000001Z", "insert", 5), 4)
    assert(t.scan().select($"amount").as[Int].head() === 55)
  }

  test("guarded merge under MERGE-ON-READ: write-time guard resolution") {
    for ((mode, tag) <- Seq(graft.table.MergeMode.MergeOnRead -> "gmor",
        graft.table.MergeMode.MergeOnReadPositional -> "gmorpos")) {
      val t = TransactionalTable.create(spark, tmpDir(tag), Cdc.guardedTableSchema,
        Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
      def replay(l: String, b: Long): Unit =
        CdcPipeline.applyCdcBatchGuarded(t, Cdc.parse(Seq(l).toDS()), b, mode)
      replay(fresh, 0)
      replay(late, 1) // older ts → must NOT clobber (loser writes no delete/data)
      assert(t.scan().select($"amount").as[Int].head() === 100, s"$tag: late update clobbered")
      replay(lateDelete, 2) // older-ts delete → must NOT delete
      assert(t.scan().count() === 1, s"$tag: late delete removed the row")
      replay(freshDelete, 3) // newer-ts delete → deletes
      assert(t.scan().count() === 0, s"$tag: fresh delete did not remove")
      // insert after guarded delete works (no live target row → source wins)
      replay(line(1, 55, "2023-01-16T12:00:00.000001Z", "insert", 5), 4)
      assert(t.scan().select($"amount").as[Int].head() === 55, s"$tag: reinsert lost")
      // premise: this really exercised the MOR path (delete files pending)
      assert(t.snapshot.deletes.nonEmpty, s"$tag: expected pending delete files")
      // compaction folds the guard history away without changing the answer
      t.compact()
      assert(t.snapshot.deletes.isEmpty)
      assert(t.scan().select($"amount").as[Int].head() === 55, s"$tag: compaction changed state")
    }
  }

  test("guarded equals faithful when events arrive in ts order") {
    val ordered = Seq(
      line(1, 10, "2023-01-16T06:00:00.000001Z", "insert", 1),
      line(2, 20, "2023-01-16T06:00:00.000002Z", "insert", 2))
    val upd = Seq(line(1, 11, "2023-01-16T07:00:00.000001Z", "update", 3),
      line(2, 0, "2023-01-16T07:00:00.000002Z", "delete", 4))
    val tf = TransactionalTable.create(spark, tmpDir("f2"), Cdc.tableSchema,
      Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    CdcPipeline.replayLines(spark, tf, ordered, 0)
    CdcPipeline.replayLines(spark, tf, upd, 1)
    val tg = TransactionalTable.create(spark, tmpDir("g2"), Cdc.guardedTableSchema,
      Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    def rep(l: Seq[String], b: Long): Unit =
      CdcPipeline.applyCdcBatchGuarded(tg, Cdc.parse(l.toDS()), b)
    rep(ordered, 0); rep(upd, 1)
    val f = tf.scan().select($"trans_id", $"amount").as[(Long, Int)].collect().toSet
    val g = tg.scan().select($"trans_id", $"amount").as[(Long, Int)].collect().toSet
    assert(f === g && f === Set((1L, 11)))
  }
}
