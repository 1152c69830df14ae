package graft

import org.apache.spark.sql.functions._

import graft.cdc.Cdc
import graft.fixtures.CdcFixtures
import graft.table.{DeleteFile, DeletionVector, MergeMode, TransactionalTable}

/** Deletion vectors (Iceberg v3 shape): one roaring-style bitmap per data
  * file replacing v2's positional delete files — superseding commits
  * union-replace so a file never carries more than one delete artifact, and
  * scans pay a codegen'd O(1)-per-row probe instead of an anti-join. */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  // --- bitmap unit behavior ---

  test("bitmap: add/contains across containers; iterator ascending") {
    val dv = DeletionVector.empty
    val positions = Seq(0L, 1L, 65535L, 65536L, 65537L, 1L << 33, (1L << 33) + 7)
    positions.foreach(dv.add)
    positions.foreach(p => assert(dv.contains(p), s"missing $p"))
    assert(!dv.contains(2L) && !dv.contains(65538L) && !dv.contains(-1L))
    assert(dv.cardinality === positions.size)
    assert(dv.iterator.toSeq === positions.sorted)
  }

  test("bitmap: serialize round-trips sparse and dense containers") {
    // container 0: sparse (3 entries); container 1: dense (>= 4096 entries)
    val sparse = Seq(5L, 17L, 60000L)
    val dv = DeletionVector.fromPositions(sparse ++ (0 until 5000).map(i => 65536L + i))
    val bytes = dv.serialize
    val back = DeletionVector.deserialize(bytes)
    assert(back.cardinality === dv.cardinality)
    assert(back.iterator.toSeq === dv.iterator.toSeq)
    // determinism: same set, different insertion order → identical bytes
    val shuffled = DeletionVector.fromPositions(
      scala.util.Random.shuffle(dv.iterator.toSeq))
    assert(java.util.Arrays.equals(shuffled.serialize, bytes))
  }

  test("bitmap: orInPlace unions without aliasing the other side") {
    val a = DeletionVector.fromPositions(Seq(1L, 2L, 100000L))
    val b = DeletionVector.fromPositions(Seq(2L, 3L, 200000L))
    a.orInPlace(b)
    assert(a.iterator.toSeq === Seq(1L, 2L, 3L, 100000L, 200000L))
    // b untouched, and a's later growth must not leak into b
    a.add(4L)
    assert(b.iterator.toSeq === Seq(2L, 3L, 200000L))
  }

  // --- table behavior ---

  private def freshGolden(): TransactionalTable = {
    val t = TransactionalTable.create(spark, tmpDir("ttable-dv"), Cdc.tableSchema,
      Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    def apply(lines: Seq[String], b: Long): Unit = {
      val deduped = Cdc.latestPerKey(Cdc.flatten(Cdc.parse(lines.toDS())))
      t.merge(Cdc.projectToTable(Cdc.upserts(deduped)),
        Cdc.deletes(deduped).select(col(Cdc.PrimaryKey)), b,
        MergeMode.MergeOnReadVector)
    }
    apply(CdcFixtures.scenario1Lines, 0)
    apply(CdcFixtures.scenario2Lines, 1)
    t
  }

  test("vector MOR golden replay equals the CoW end state; no rewrite") {
    val t = freshGolden()
    val got = t.scan()
      .select($"trans_id", $"amount").as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(got === CdcFixtures.expectedEndState.map(e => (e._1, e._5)))
    // batch-0 files survive untouched; pending deletes are all vectors
    val v1Files = t.snapshotAt(1).files.map(_.path).toSet
    assert(v1Files.subsetOf(t.snapshot.files.map(_.path).toSet))
    assert(t.snapshot.deletes.nonEmpty)
    assert(t.snapshot.deletes.forall(_.kind === DeleteFile.Vector))
    // time travel applies only version-1's delete set (none exists there)
    assert(t.scanAt(1).count() === 10)
  }

  test("one DV per target: a superseding delete union-replaces, not accretes") {
    val t = freshGolden()
    val before = t.snapshot.deletes
    def targetsOf(ds: Seq[DeleteFile]) = ds.flatMap(_.target)
    assert(targetsOf(before).distinct.size === targetsOf(before).size,
      "invariant broken at setup: duplicate DV target")
    val maskedBefore = before.map(_.rows).sum
    // delete key 21 — lives in a batch-0 file that already carries a DV
    t.merge(spark.emptyDataset[(Long, String, String, String, Int, String,
        java.sql.Timestamp)].toDF(Cdc.tableSchema.fieldNames.toIndexedSeq: _*),
      Seq(21L).toDF("trans_id"), 2, MergeMode.MergeOnReadVector)
    val after = t.snapshot.deletes
    assert(after.forall(_.kind === DeleteFile.Vector))
    assert(targetsOf(after).distinct.size === targetsOf(after).size,
      s"duplicate DV target after supersede: ${targetsOf(after)}")
    assert(after.map(_.rows).sum === maskedBefore + 1, "union lost positions")
    val got = t.scan().select($"trans_id").as[Long].collect().sorted.toSeq
    assert(got === CdcFixtures.expectedEndState.map(_._1).filterNot(_ == 21L))
    // the superseded version still time-travels with its own delete set
    assert(t.scanAt(2).count() === 12)
  }

  test("oversized DV set falls back to the anti-join expansion path") {
    val t = freshGolden()
    spark.conf.set("spark.graft.dv.broadcastMaxBytes", "0")
    try {
      val got = t.scan()
        .select($"trans_id", $"amount").as[(Long, Int)].collect().sortBy(_._1).toSeq
      assert(got === CdcFixtures.expectedEndState.map(e => (e._1, e._5)))
    } finally spark.conf.unset("spark.graft.dv.broadcastMaxBytes")
  }

  test("foldDeletes rewrites only DV targets and clears the vector set") {
    val t = freshGolden()
    val before = t.scan().orderBy("trans_id").collect().toSeq
    val targets = t.snapshot.deletes.flatMap(_.target).size
    val (rewritten, folded) = t.foldDeletes()
    assert(folded === t.snapshotAt(2).deletes.size.toLong)
    assert(rewritten === targets.toLong, "fold touched more files than DV targets")
    assert(t.snapshot.deletes.isEmpty)
    assert(t.scan().orderBy("trans_id").collect().toSeq === before)
    assert(t.countRows === 12) // metadata-only count restored
  }

  test("compaction folds vectors in; result identical") {
    val t = freshGolden()
    val before = t.scan().orderBy("trans_id").collect().toSeq
    t.compact()
    assert(t.snapshot.deletes.isEmpty)
    assert(t.scan().orderBy("trans_id").collect().toSeq === before)
  }

  test("changes() over a DV interval emits the exact row-level diff") {
    val t = freshGolden()
    val delta = t.changes(1, 2)
      .select($"trans_id", $"amount", $"_change_type")
      .as[(Long, Int, String)].collect().toSet
    // golden diff derived from the fixture states: v1 rows gone from the end
    // state surface as deletes, end-state rows absent at v1 as inserts
    val v1 = CdcFixtures.expectedStateV1.map(e => (e._1, e._5)).toSet
    val end = CdcFixtures.expectedEndState.map(e => (e._1, e._5)).toSet
    val want = (v1 -- end).map { case (k, a) => (k, a, "delete") } ++
      (end -- v1).map { case (k, a) => (k, a, "insert") }
    assert(delta === want)
  }

  test("replay fence: re-delivering a committed batch is a no-op") {
    val t = freshGolden()
    val version = t.snapshot.version
    val deduped = Cdc.latestPerKey(Cdc.flatten(Cdc.parse(
      CdcFixtures.scenario2Lines.toDS())))
    t.merge(Cdc.projectToTable(Cdc.upserts(deduped)),
      Cdc.deletes(deduped).select(col(Cdc.PrimaryKey)), 1,
      MergeMode.MergeOnReadVector)
    assert(t.snapshot.version === version, "fenced replay advanced the table")
    assert(t.scan().count() === 12)
  }
}
