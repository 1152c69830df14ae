package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.table.{MergeMode, TransactionalTable}

/** Optimistic multi-writer concurrency: independent table handles (as separate
  * jobs/sessions would hold) racing merges on one table root must all land —
  * losers recompute against the winner's snapshot and retry. */
class ConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType)))

  private def fresh(): String = {
    val root = tmpDir("ttable-conc")
    TransactionalTable.create(spark, root, schema, "id")
    root
  }

  private def runAll(n: Int)(job: Int => Unit): Unit = {
    val pool = Executors.newFixedThreadPool(n)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try Await.result(Future.sequence((0 until n).map(i => Future(job(i)))), 120.seconds)
    finally pool.shutdown()
  }

  test("disjoint-key writers race on separate handles; every merge lands") {
    val root = fresh()
    val writers = 4
    runAll(writers) { i =>
      val t = TransactionalTable.open(spark, root) // own handle: no shared lock
      val rows = (0 until 10).map(j => (i * 100L + j, i.toLong)).toDF("id", "v")
      t.mergeAdhoc(rows, spark.emptyDataset[Long].toDF("id"))
    }
    val t = TransactionalTable.open(spark, root)
    assert(t.currentVersion === writers.toLong, "each writer must have committed once")
    val got = t.scan().as[(Long, Long)].collect().toMap
    assert(got.size === writers * 10)
    (0 until writers).foreach(i => assert(got(i * 100L) === i.toLong))
  }

  test("racing writer-fenced streams: every writer's fence survives the race") {
    val root = fresh()
    val writers = 4
    // each "stream" commits epochs 0 and 1 under its OWN fence domain,
    // racing the others — optimistic retries must re-inherit the freshest
    // fence map, never wipe another writer's progress
    runAll(writers) { i =>
      val t = TransactionalTable.open(spark, root)
      (0L to 1L).foreach { epoch =>
        t.merge(Seq((i * 100L + epoch, i.toLong)).toDF("id", "v"),
          spark.emptyDataset[Long].toDF("id"), batchId = epoch,
          writerId = Some(s"w$i"))
      }
    }
    val t = TransactionalTable.open(spark, root)
    val fences = t.snapshot.writerFences
    (0 until writers).foreach(i => assert(fences.get(s"w$i").contains(1L),
      s"writer w$i's fence lost in the race: $fences"))
    assert(t.scan().count() === writers * 2L)
    // replay of a committed epoch is a no-op in its own domain only
    val replayer = TransactionalTable.open(spark, root)
    replayer.merge(Seq((999L, 9L)).toDF("id", "v"),
      spark.emptyDataset[Long].toDF("id"), batchId = 1L, writerId = Some("w0"))
    assert(replayer.scan().count() === writers * 2L, "replayed epoch must be fenced")
    replayer.merge(Seq((999L, 9L)).toDF("id", "v"),
      spark.emptyDataset[Long].toDF("id"), batchId = 1L, writerId = Some("fresh"))
    assert(TransactionalTable.open(spark, root).scan().count() === writers * 2L + 1,
      "a new writer's same-numbered epoch must land")
  }

  test("same-key writers serialize: one value survives, none lost mid-air") {
    val root = fresh()
    runAll(3) { i =>
      val t = TransactionalTable.open(spark, root)
      t.mergeAdhoc(Seq((7L, i.toLong)).toDF("id", "v"),
        spark.emptyDataset[Long].toDF("id"))
    }
    val t = TransactionalTable.open(spark, root)
    assert(t.currentVersion === 3L)
    val got = t.scan().as[(Long, Long)].collect()
    assert(got.length === 1 && got.head._1 === 7L && Set(0L, 1L, 2L)(got.head._2))
  }

  test("concurrent MOR merges: all rows land, delete masks stay consistent") {
    val root = fresh()
    // seed rows 0..19, then 3 writers concurrently MOR-update disjoint slices
    val t0 = TransactionalTable.open(spark, root)
    t0.append((0L until 20L).map((_, -1L)).toDF("id", "v"))
    runAll(3) { i =>
      val t = TransactionalTable.open(spark, root)
      val mode = if (i % 2 == 0) MergeMode.MergeOnRead else MergeMode.MergeOnReadPositional
      t.mergeAdhoc((0 until 5).map(j => (i * 5L + j, 100L + i)).toDF("id", "v"),
        spark.emptyDataset[Long].toDF("id"), mode)
    }
    val t = TransactionalTable.open(spark, root)
    val got = t.scan().as[(Long, Long)].collect().toMap
    assert(got.size === 20, s"got ${got.size} rows: ${got.keys.toSeq.sorted}")
    (0 until 15).foreach(k => assert(got(k.toLong) === 100L + k / 5, s"key $k"))
    (15 until 20).foreach(k => assert(got(k.toLong) === -1L))
  }

  test("concurrent writers under hair-trigger auto-compaction: all rows land, no write fails") {
    val root = fresh()
    TransactionalTable.open(spark, root).setAutoCompact(minFiles = 1, targetRows = 1000L)
    val writers = 4
    // every merge fires an implicit compaction attempt that races the other
    // writers' merges AND their compactions — containment means a losing
    // maintenance pass is skipped, never surfaced as a failed write
    runAll(writers) { i =>
      val t = TransactionalTable.open(spark, root)
      (0 until 3).foreach { j =>
        t.mergeAdhoc((0 until 5).map(k => (i * 1000L + j * 10L + k, i.toLong))
          .toDF("id", "v"), spark.emptyDataset[Long].toDF("id"))
      }
    }
    val t = TransactionalTable.open(spark, root)
    val got = t.scan().as[(Long, Long)].collect()
    assert(got.length === writers * 15, s"rows lost under auto-compact races: ${got.length}")
    (0 until writers).foreach(i => assert(got.toMap.apply(i * 1000L) === i.toLong))
    // racing compactions may individually lose and be skipped (contained);
    // one quiesced write then pays the whole accumulated debt deterministically
    t.mergeAdhoc(Seq((999999L, 0L)).toDF("id", "v"), spark.emptyDataset[Long].toDF("id"))
    assert(t.snapshot.files.size <= 2,
      s"post-quiesce auto-compaction must pack the debt, got ${t.snapshot.files.size}")
    assert(t.scan().count() === writers * 15 + 1L)
  }

  test("merge racing full-table compaction: both land, no row lost or resurrected") {
    val root = fresh()
    val seed = TransactionalTable.open(spark, root)
    // several commits → several small files for the compactor to bin-pack
    (0 until 4).foreach { b =>
      val rows = (b * 200 until (b + 1) * 200).map(i => (i.toLong, 0L)).toDF("id", "v")
      seed.mergeAdhoc(rows, spark.emptyDataset[Long].toDF("id"))
    }
    runAll(2) { i =>
      val t = TransactionalTable.open(spark, root) // own handle per racer
      if (i == 0) t.compact()
      else {
        val ups = (0L until 50L).map(k => (k, 9L)).toDF("id", "v")
        val dels = (750L until 760L).toDF("id")
        t.mergeAdhoc(ups, dels)
      }
    }
    val t = TransactionalTable.open(spark, root)
    assert(t.currentVersion === 6L, "compaction and merge must each commit once")
    val got = t.scan().as[(Long, Long)].collect().toMap
    assert(got.size === 800 - 10, "deletes lost in the race")
    (0L until 50L).foreach(k => assert(got(k) === 9L, s"update to $k lost"))
    (750L until 760L).foreach(k => assert(!got.contains(k), s"deleted $k resurrected"))
    assert(got.count(_._2 == 0L) === 800 - 50 - 10)
  }

  test("a losing attempt never clobbers a winner's committed data files") {
    val root = fresh()
    runAll(4) { i =>
      val t = TransactionalTable.open(spark, root)
      t.mergeAdhoc(Seq((i.toLong, i.toLong)).toDF("id", "v"),
        spark.emptyDataset[Long].toDF("id"))
    }
    val t = TransactionalTable.open(spark, root)
    // every manifest-referenced file must physically exist (unique commit dirs)
    t.snapshot.files.foreach(f => assert(Files.exists(Paths.get(f.path)), f.path))
    assert(t.scan().count() === 4)
  }

  test("stale un-pointed manifest claim self-heals after the grace window") {
    val root = fresh()
    val t = TransactionalTable.open(spark, root)
    // simulate a crashed claim: manifest v1 exists, pointer still 0, aged out
    val orphan = Paths.get(root, "manifest", "v1.json")
    Files.write(orphan, "{garbage".getBytes)
    Files.setLastModifiedTime(orphan, java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - TransactionalTable.OrphanManifestGraceMs - 1000))
    t.append(Seq((1L, 1L)).toDF("id", "v"))
    assert(t.currentVersion === 1L)
    assert(t.scan().count() === 1)
  }

  test("a FRESH un-pointed claim is respected, not deleted (in-flight writer)") {
    val root = fresh()
    val t = TransactionalTable.open(spark, root)
    val claim = Paths.get(root, "manifest", "v1.json")
    Files.write(claim, "{in-flight".getBytes)
    // keep the claim perpetually fresh so every retry still sees an in-flight
    // writer; append must give up with ConcurrentCommitException, never
    // delete the claim.
    val keeper = new Thread(() => {
      while (!Thread.interrupted())
        try {
          Files.setLastModifiedTime(claim,
            java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
          Thread.sleep(200)
        } catch { case _: InterruptedException => Thread.currentThread().interrupt() }
    })
    keeper.start()
    try {
      intercept[graft.table.ConcurrentCommitException] {
        t.append(Seq((1L, 1L)).toDF("id", "v"))
      }
      assert(new String(Files.readAllBytes(claim)) === "{in-flight",
        "in-flight claim was clobbered")
    } finally { keeper.interrupt(); keeper.join() }
  }
}
