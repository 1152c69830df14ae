package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.table.{MergeMode, TransactionalTable}

/** Branch refs + write-audit-publish (Iceberg branch parity): a branch is a
  * full fork of the lineage sharing data files with main; every table API
  * works on the branch handle; publish fast-forwards main atomically; main
  * maintenance (expiry, orphan sweep) must never destroy branch state.
  */
class BranchSpec extends SparkSpec {
  import spark.implicits._

  private val sch = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def noDel = spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
    StructType(Seq(StructField("id", LongType))))

  private def mk(prefix: String): TransactionalTable = {
    val t = TransactionalTable.create(spark, tmpDir(prefix) + "/t", sch, "id")
    t.merge(Seq(1L -> "a", 2L -> "b").toDF("id", "v"), noDel, batchId = 0)
    t
  }

  private def state(t: TransactionalTable): Set[(String, Long)] =
    t.scan().select("v", "id").as[(String, Long)].collect().toSet

  test("write-audit-publish: branch writes invisible on main until publish") {
    val t = mk("br-wap")
    val b = t.createBranch("audit")
    assert(state(b) === Set(("a", 1L), ("b", 2L)), "fork sees the source state")
    b.merge(Seq(2L -> "B", 3L -> "c").toDF("id", "v"), Seq(1L).toDF("id"), batchId = 1)
    assert(state(b) === Set(("B", 2L), ("c", 3L)), "branch advanced")
    assert(state(t) === Set(("a", 1L), ("b", 2L)), "main unchanged before publish")
    t.publish("audit")
    assert(state(t) === Set(("B", 2L), ("c", 3L)), "publish fast-forwards main")
    assert(t.snapshot.batchId === 1L, "publish carries the branch's replay fence")
    // audited history: publish is ONE new main commit, old state time-travels
    assert(t.scanAt(1L).count() === 2L)
  }

  test("branch creation is O(1) metadata: fork reuses the source chunk refs") {
    val t = mk("br-o1")
    val before = java.nio.file.Files.list(
      java.nio.file.Paths.get(t.root, "manifest", "chunks")).count()
    t.createBranch("fork")
    val after = java.nio.file.Files.list(
      java.nio.file.Paths.get(t.root, "manifest", "chunks")).count()
    assert(after === before, "no chunk files written at branch creation")
  }

  test("main expiry never destroys branch-referenced files or chunks") {
    val t = mk("br-expire")
    val b = t.createBranch("keep")
    // churn main: rewrite both keys repeatedly so old files become expirable
    for (i <- 1 to 3)
      t.merge(Seq(1L -> s"a$i", 2L -> s"b$i").toDF("id", "v"), noDel, batchId = i)
    t.expireSnapshots(keepLast = 1)
    assert(state(b) === Set(("a", 1L), ("b", 2L)),
      "branch still reads the pre-churn files expiry would otherwise sweep")
    assert(state(t) === Set(("a3", 1L), ("b3", 2L)))
  }

  test("orphan sweep spares files only a branch references") {
    val t = mk("br-orphan")
    val b = t.createBranch("wip")
    b.merge(Seq(9L -> "z").toDF("id", "v"), noDel, batchId = 1)
    val swept = t.removeOrphanFiles(olderThanMs = 0L)
    assert(state(b) === Set(("a", 1L), ("b", 2L), ("z", 9L)),
      s"branch-only files must survive the sweep (swept $swept)")
  }

  test("branches work across merge modes, changes(), and compaction") {
    val t = mk("br-modes")
    val fork = t.currentVersion
    val b = t.createBranch("mor")
    b.merge(Seq(2L -> "B").toDF("id", "v"), Seq(1L).toDF("id"), batchId = 1,
      MergeMode.MergeOnRead)
    assert(b.snapshot.deletes.nonEmpty)
    assert(state(b) === Set(("B", 2L)))
    val diff = b.changes(fork, b.currentVersion).select("v", "id", "_change_type")
      .as[(String, Long, String)].collect().toSet
    assert(diff === Set(("a", 1L, "delete"), ("b", 2L, "delete"), ("B", 2L, "insert")))
    b.compact()
    assert(b.snapshot.deletes.isEmpty)
    assert(state(b) === Set(("B", 2L)))
    t.publish("mor")
    assert(state(t) === Set(("B", 2L)))
  }

  test("SQL: VERSION AS OF '<branch>' reads the branch head, read-only") {
    val w = tmpDir("br-wh")
    spark.conf.set("spark.sql.catalog.graft_br", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_br.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    val t = TransactionalTable.create(spark, s"$w/db/b", sch, "id")
    t.merge(Seq(1L -> "a").toDF("id", "v"), noDel, batchId = 0)
    val b = t.createBranch("audit")
    b.merge(Seq(2L -> "staged").toDF("id", "v"), noDel, batchId = 1)
    val main = spark.sql("SELECT v FROM graft_br.db.b").as[String].collect().toSeq
    assert(main === Seq("a"))
    val branch = spark.sql("SELECT v FROM graft_br.db.b VERSION AS OF 'audit' ORDER BY v")
      .as[String].collect().toSeq
    assert(branch === Seq("a", "staged"))
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_br.db.b VERSION AS OF 'nope'").collect()
    }
  }

  test("concurrent main writer: publish refuses on divergence, force replaces") {
    val t = mk("br-race")
    val b = t.createBranch("late")
    b.merge(Seq(3L -> "c").toDF("id", "v"), noDel, batchId = 1)
    // main advances AFTER the branch forked — the branch head no longer
    // contains main's history, so fast-forward must refuse (Iceberg
    // fast_forward parity) instead of silently discarding a2.
    t.merge(Seq(1L -> "a2").toDF("id", "v"), noDel, batchId = 2)
    val e = intercept[IllegalStateException] { t.publish("late") }
    assert(e.getMessage.contains("diverge") || e.getMessage.contains("discard"))
    assert(state(t) === Set(("a2", 1L), ("b", 2L)), "refused publish left main intact")
    // explicit override: WAP replaces state; the fence keeps the larger batchId
    t.publish("late", force = true)
    assert(state(t) === Set(("a", 1L), ("b", 2L), ("c", 3L)))
    assert(t.snapshot.batchId === 2L, "fence keeps the max of both lineages")
  }

  test("publish merges per-writer fences from both lineages (per-key max)") {
    val t = mk("br-fences")
    val b = t.createBranch("wap")
    // a streaming writer applies epochs 0..2 on the BRANCH, a different
    // writer applies epoch 5 on MAIN before the branch publishes
    b.merge(Seq(3L -> "c").toDF("id", "v"), noDel, batchId = 2L,
      writerId = Some("writer-branch"))
    t.merge(Seq(4L -> "d").toDF("id", "v"), noDel, batchId = 5L,
      writerId = Some("writer-main"))
    val e = intercept[IllegalStateException] { t.publish("wap") }
    assert(e.getMessage.nonEmpty)
    t.publish("wap", force = true)
    val f = t.snapshot.writerFences
    assert(f === Map("writer-branch" -> 2L, "writer-main" -> 5L),
      s"published fences must be the per-key max of both lineages, got $f")
    // replay of the branch writer's epoch 2 against published main is a no-op
    t.merge(Seq(3L -> "STALE").toDF("id", "v"), noDel, batchId = 2L,
      writerId = Some("writer-branch"))
    assert(state(t).contains(("c", 3L)), "replayed epoch must stay fenced after publish")
  }

  test("publish then keep committing on the branch then publish again is legal") {
    val t = mk("br-repub")
    val b = t.createBranch("iter")
    b.merge(Seq(3L -> "c").toDF("id", "v"), noDel, batchId = 1)
    t.publish("iter")
    assert(state(t) === Set(("a", 1L), ("b", 2L), ("c", 3L)))
    // branch keeps evolving; main's head is exactly the last publish → legal
    b.merge(Seq(4L -> "d").toDF("id", "v"), noDel, batchId = 2)
    t.publish("iter")
    assert(state(t) === Set(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L)))
  }

  test("publish recovers from a crash between the commit and the marker write") {
    val t = mk("br-crash")
    val b = t.createBranch("wap")
    b.merge(Seq(3L -> "c").toDF("id", "v"), noDel, batchId = 1)
    t.publish("wap")
    // Simulate the crash window: the publish commit landed on main but the
    // branch's `_published` marker was lost before reaching disk.
    val marker = java.nio.file.Paths.get(t.root, "manifest", "branches", "wap", "_published")
    assert(java.nio.file.Files.exists(marker), "test premise: marker exists after publish")
    java.nio.file.Files.delete(marker)
    // A later legitimate publish must recognize main's head as this branch's
    // own published state (identical file set) — no force needed.
    b.merge(Seq(4L -> "d").toDF("id", "v"), noDel, batchId = 2)
    t.publish("wap")
    assert(state(t) === Set(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L)))
    // ... while a genuinely diverged main still refuses
    val b2 = t.createBranch("wap2")
    b2.merge(Seq(5L -> "e").toDF("id", "v"), noDel, batchId = 3)
    t.merge(Seq(9L -> "x").toDF("id", "v"), noDel, batchId = 9) // main diverges
    val e = intercept[IllegalStateException] { t.publish("wap2") }
    assert(e.getMessage.contains("fast-forwarding would discard"), e.getMessage)
  }
}
