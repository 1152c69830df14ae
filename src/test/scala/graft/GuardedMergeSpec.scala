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

  test("guarded merge reads only key-affected files: destroyed-file proof, all modes") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    for ((mode, tag) <- Seq(
        graft.table.MergeMode.CopyOnWrite -> "gdf-cow",
        graft.table.MergeMode.MergeOnRead -> "gdf-mor",
        graft.table.MergeMode.MergeOnReadPositional -> "gdf-pos")) {
      val t = TransactionalTable.create(spark, tmpDir(tag), Cdc.guardedTableSchema,
        Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
      def replay(ls: Seq[String], b: Long): Unit =
        CdcPipeline.applyCdcBatchGuarded(t, Cdc.parse(ls.toDS()), b, mode)
      // two files with disjoint key ranges: ids 1-5, then ids 1001-1005
      replay((1L to 5L).map(i => line(i, 10, "2023-01-16T06:00:00.000001Z", "insert", i)), 0)
      val v1Paths = t.snapshot.files.map(_.path).toSet
      replay((1001L to 1005L).map(i =>
        line(i, 20, "2023-01-16T06:00:00.000001Z", "insert", i)), 1)
      val bFiles = t.snapshot.files.filterNot(f => v1Paths.contains(f.path))
      assert(bFiles.nonEmpty, s"$tag: expected a second data file")
      // Destroy the 1001-1005 file(s): ANY read of them now throws. The
      // guarded merges below touch only ids 1-2, so both the merge slice and
      // the guard-resolution read (guardWinners for MOR) must prune them —
      // the batch-bounded join claim as an executable proof.
      val backups = bFiles.map { f =>
        val bak = Paths.get(f.path + ".bak")
        Files.copy(Paths.get(f.path), bak, StandardCopyOption.REPLACE_EXISTING)
        Files.delete(Paths.get(f.path)); f.path -> bak
      }
      replay(Seq(line(1, 77, "2023-01-16T10:00:00.000001Z", "update", 100)), 2)
      replay(Seq(line(1, 5, "2023-01-16T05:00:00.000001Z", "update", 101)), 3) // late: loses
      replay(Seq(line(2, 0, "2023-01-16T11:00:00.000001Z", "delete", 102)), 4)
      // restore the destroyed file(s) and verify the full end state
      backups.foreach { case (orig, bak) =>
        Files.move(bak, Paths.get(orig), StandardCopyOption.REPLACE_EXISTING)
      }
      val got = t.scan().select($"trans_id", $"amount").as[(Long, Int)].collect().toMap
      assert(got(1L) === 77, s"$tag: fresh guarded update lost")
      assert(!got.contains(2L), s"$tag: guarded delete did not apply")
      assert((1001L to 1005L).forall(i => got(i) === 20), s"$tag: unaffected file changed")
      assert(got.size === 4 + 5, s"$tag: unexpected row count")
    }
  }

  test("guarded full-outer join is batch-bounded: plan assert (no table-wide SMJ)") {
    import scala.collection.mutable.ArrayBuffer
    import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    // two files with disjoint pk ranges; the guarded merge touches low keys
    // only — the FO join's target side must scan 1 of the 2 files
    val t = TransactionalTable.create(spark, tmpDir("gplan"), Cdc.guardedTableSchema,
      Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    def replay(ls: Seq[String], b: Long): Unit =
      CdcPipeline.applyCdcBatchGuarded(t, Cdc.parse(ls.toDS()), b,
        graft.table.MergeMode.CopyOnWrite)
    replay((1L to 5L).map(i => line(i, 10, "2023-01-16T06:00:00.000001Z", "insert", i)), 0)
    replay((1001L to 1005L).map(i =>
      line(i, 20, "2023-01-16T06:00:00.000001Z", "insert", i)), 1)
    assert(t.snapshot.files.size >= 2, "need at least two disjoint-range files")
    val captured = ArrayBuffer.empty[QueryExecution]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        captured.synchronized { captured += qe }
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    val adaptiveWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.listenerManager.register(listener)
    try {
      replay(Seq(line(1, 77, "2023-01-16T10:00:00.000001Z", "update", 100)), 2)
      // listener events are delivered asynchronously — wait for the FO join
      def foJoins: Seq[SortMergeJoinExec] = captured.synchronized {
        captured.toSeq.flatMap(_.executedPlan.collect {
          case j: SortMergeJoinExec
              if j.joinType == org.apache.spark.sql.catalyst.plans.FullOuter => j
        })
      }
      val deadline = System.nanoTime() + 10e9.toLong
      while (foJoins.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      val joins = foJoins
      assert(joins.nonEmpty, "expected a full-outer SortMergeJoin in the guarded merge")
      // every parquet scan under the join read at most ONE of the two files:
      // a regression to a table-wide join would pull both ranges in
      val scans = joins.flatMap(_.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      })
      assert(scans.nonEmpty, "expected a parquet scan under the full-outer join")
      scans.foreach { f =>
        val nFiles = f.metrics.get("numFiles").map(_.value).getOrElse(-1L)
        assert(nFiles >= 0L && nFiles <= 1L,
          s"guarded join scanned $nFiles files — table-wide join regression")
      }
    } finally {
      spark.listenerManager.unregister(listener)
      spark.conf.set("spark.sql.adaptive.enabled", adaptiveWas)
    }
    // end state unchanged by the instrumentation
    val got = t.scan().select($"trans_id", $"amount").as[(Long, Int)].collect().toMap
    assert(got(1L) === 77 && (1001L to 1005L).forall(i => got(i) === 20))
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
