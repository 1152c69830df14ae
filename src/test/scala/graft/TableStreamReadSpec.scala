package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.table.TransactionalTable

/** Streaming reads FROM the table (graft-table source): offsets are table
  * versions, each micro-batch is the appended files of the committed
  * interval, restarts resume from the checkpointed version, and non-append
  * commits fail loudly or skip per option.
  */
class TableStreamReadSpec extends SparkSpec {
  import spark.implicits._

  private val sch = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def noDel = spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
    StructType(Seq(StructField("id", LongType))))

  /** Run the stream until drained, collecting (id, v) rows via foreachBatch
    * (the memory sink refuses checkpoint recovery; foreachBatch supports it). */
  private def drain(root: String, ckpt: String,
      extra: Map[String, String] = Map.empty): Seq[(Long, String)] = {
    val acc = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    var reader = spark.readStream.format("graft-table").option("path", root)
    extra.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.load().writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
        df.select("id", "v").collect().foreach(r => acc.add((r.getLong(0), r.getString(1))))
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try { q.processAllAvailable() } finally { q.stop(); q.awaitTermination() }
    acc.iterator().asScala.toSeq
  }

  test("appends stream as micro-batches; checkpointed restart delivers only new commits") {
    val root = tmpDir("tsr") + "/t"
    val ckpt = tmpDir("tsr-ckpt")
    val t = TransactionalTable.create(spark, root, sch, "id")
    t.append(Seq(1L -> "a", 2L -> "b").toDF("id", "v"))
    val got1 = drain(root, ckpt, Map("startingVersion" -> "0")).map(_._1).toSet
    assert(got1 === Set(1L, 2L), "startingVersion=0 streams the existing state")

    // two more commits while the stream is down; restart from the SAME
    // checkpoint must deliver exactly them
    t.append(Seq(3L -> "c").toDF("id", "v"))
    t.append(Seq(4L -> "d").toDF("id", "v"))
    val got2 = drain(root, ckpt).map(_._1).toSet
    assert(got2 === Set(3L, 4L), s"restart must deliver only the new commits, got $got2")
  }

  test("startingTimestamp resolves to the last commit at-or-before; predating clamps to v0") {
    val root = tmpDir("tsr-ts") + "/t"
    val t = TransactionalTable.create(spark, root, sch, "id")
    t.append(Seq(1L -> "a").toDF("id", "v")) // v1
    val tsAfterV1 = t.snapshot.committedAtMs
    Thread.sleep(15) // commit-time resolution is ms
    t.append(Seq(2L -> "b").toDF("id", "v")) // v2
    // ts exactly at v1's commit time → INCLUSIVE (Delta parity): v1 and v2
    val inc = drain(root, tmpDir("tsr-ts-ck0"),
      Map("startingTimestamp" -> tsAfterV1.toString)).map(_._1).toSet
    assert(inc === Set(1L, 2L), s"a commit stamped exactly ts must be delivered, got $inc")
    // ts strictly after v1's commit → just v2
    val got = drain(root, tmpDir("tsr-ts-ck1"),
      Map("startingTimestamp" -> (tsAfterV1 + 1).toString)).map(_._1).toSet
    assert(got === Set(2L), s"changes since v1's commit time, got $got")
    // a timestamp predating the table streams the full history (clamp to v0)
    val all = drain(root, tmpDir("tsr-ts-ck2"),
      Map("startingTimestamp" -> "0")).map(_._1).toSet
    assert(all === Set(1L, 2L))
    // ISO-8601 form parses (far future → nothing until a new commit)
    val none = drain(root, tmpDir("tsr-ts-ck3"),
      Map("startingTimestamp" -> "2099-01-01T00:00:00Z"))
    assert(none.isEmpty)
    // explicit startingVersion wins over a timestamp
    val winner = drain(root, tmpDir("tsr-ts-ck4"),
      Map("startingVersion" -> "0", "startingTimestamp" -> tsAfterV1.toString))
      .map(_._1).toSet
    assert(winner === Set(1L, 2L))
  }

  test("Trigger.AvailableNow drains to the start-time tip and stops") {
    val root = tmpDir("tsr-an") + "/t"
    val ckpt = tmpDir("tsr-an-ckpt")
    val t = TransactionalTable.create(spark, root, sch, "id")
    t.append(Seq(1L -> "a").toDF("id", "v"))
    t.append(Seq(2L -> "b").toDF("id", "v"))

    def drainAvailableNow(): Seq[Long] = {
      val acc = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val q = spark.readStream.format("graft-table").option("path", root)
        .option("startingVersion", "0")
        // one commit per micro-batch: the drain takes several batches, all
        // bounded by the pinned start-time tip
        .option("maxVersionsPerTrigger", "1")
        .load().writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
          df.select("id").collect().foreach(r => acc.add(r.getLong(0))); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      assert(q.awaitTermination(60000), "AvailableNow query must stop by itself")
      acc.iterator().asScala.toSeq
    }
    assert(drainAvailableNow().sorted === Seq(1L, 2L),
      "first drain delivers everything committed at start")
    // nothing new: an AvailableNow restart terminates with zero rows
    assert(drainAvailableNow() === Seq.empty)
    t.append(Seq(3L -> "c").toDF("id", "v"))
    assert(drainAvailableNow() === Seq(3L), "next run resumes from the checkpoint")
  }

  test("default start position is the table tip: only future commits stream") {
    val root = tmpDir("tsr-tip") + "/t"
    val t = TransactionalTable.create(spark, root, sch, "id")
    t.append(Seq(1L -> "pre").toDF("id", "v"))
    val ckpt = tmpDir("tsr-tip-ckpt")
    val first = drain(root, ckpt) // no startingVersion
    assert(first.isEmpty, "tip start sees nothing yet")
    t.append(Seq(2L -> "post").toDF("id", "v"))
    val second = drain(root, ckpt)
    assert(second.map(_._2) === Seq("post"))
  }

  test("maxVersionsPerTrigger bounds catch-up batches to N commits each") {
    val root = tmpDir("tsr-cap") + "/t"
    val t = TransactionalTable.create(spark, root, sch, "id")
    (1 to 4).foreach(i => t.append(Seq(i.toLong -> s"v$i").toDF("id", "v"), batchId = i))
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("graft-table").option("path", root)
      .option("startingVersion", "0").option("maxVersionsPerTrigger", "1")
      .load().writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
        batches.add(df.count()); ()
      }
      .option("checkpointLocation", tmpDir("tsr-cap-ckpt"))
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try { q.processAllAvailable() } finally { q.stop(); q.awaitTermination() }
    val sizes = batches.iterator().asScala.toSeq.filter(_ > 0)
    assert(sizes.sum === 4L, s"all four appended rows must arrive, got $sizes")
    assert(sizes.forall(_ === 1L),
      s"each micro-batch must carry exactly one commit's rows, got $sizes")
  }

  test("maxVersionsPerTrigger never checkpoints a publish numbering hole") {
    val root = tmpDir("tsr-hole") + "/t"
    val ckpt = tmpDir("tsr-hole-ckpt")
    val t = TransactionalTable.create(spark, root, sch, "id")
    t.append(Seq(1L -> "a").toDF("id", "v")) // main v1
    val got1 = drain(root, ckpt,
      Map("startingVersion" -> "0", "maxVersionsPerTrigger" -> "1")).map(_._1).toSet
    assert(got1 === Set(1L))
    // publish skips main version numbers: branch forks at v1, commits v2,
    // publish lands main at v3 — v2 is a hole in MAIN's numbering
    val b = t.createBranch("wap")
    b.append(Seq(2L -> "b").toDF("id", "v"))
    t.publish("wap")
    assert(!t.manifestExists(2L) && t.manifestExists(3L),
      "premise: publish must have skipped main v2")
    t.append(Seq(3L -> "c").toDF("id", "v")) // main v4
    // resume with cap=1: start=1, start+cap=2 is the hole — the capped end
    // must clamp/jump to a retained version, never wedge the checkpoint
    val got2 = drain(root, ckpt, Map("maxVersionsPerTrigger" -> "1")).map(_._1).toSet
    assert(got2 === Set(2L, 3L), s"stream must cross the hole and deliver both commits, got $got2")
    // and a further restart keeps working (the checkpointed offset is retained)
    t.append(Seq(4L -> "d").toDF("id", "v"))
    val got3 = drain(root, ckpt, Map("maxVersionsPerTrigger" -> "1")).map(_._1).toSet
    assert(got3 === Set(4L))
  }

  test("resume below the expiry floor fails with the expiry message") {
    val root = tmpDir("tsr-exp") + "/t"
    val ckpt = tmpDir("tsr-exp-ckpt")
    val t = TransactionalTable.create(spark, root, sch, "id")
    t.append(Seq(1L -> "a").toDF("id", "v"))
    drain(root, ckpt, Map("startingVersion" -> "0")) // checkpoint at v1
    (2 to 6).foreach(i => t.append(Seq(i.toLong -> s"v$i").toDF("id", "v"), batchId = i))
    t.expireSnapshots(keepLast = 2)
    assert(t.expiryFloor === 5L, s"floor records the cutoff, got ${t.expiryFloor}")
    val e = intercept[Exception] { drain(root, ckpt) }
    def causes(x: Throwable): Seq[Throwable] =
      if (x == null) Seq.empty else x +: causes(x.getCause)
    assert(causes(e).exists(c => c.getMessage != null && c.getMessage.contains("expired")),
      s"must fail with the expiry message, got $e")
  }

  test("non-append commits fail loudly by default and are skipped with skipNonAppends") {
    val root = tmpDir("tsr-rw") + "/t"
    val t = TransactionalTable.create(spark, root, sch, "id")
    t.append(Seq(1L -> "a", 2L -> "b").toDF("id", "v"))
    // CoW merge rewrites a file — not representable as appended rows
    t.merge(Seq(1L -> "A").toDF("id", "v"), noDel, batchId = 5)
    intercept[Exception] {
      drain(root, tmpDir("tsr-rw-ckpt1"), Map("startingVersion" -> "0"))
    }
    // with skipNonAppends: the rewrite commit is skipped whole, later pure
    // appends still stream
    t.append(Seq(9L -> "z").toDF("id", "v"))
    val got = drain(root, tmpDir("tsr-rw-ckpt2"),
      Map("startingVersion" -> "0", "skipNonAppends" -> "true")).map(_._1).toSet
    assert(got === Set(1L, 2L, 9L),
      s"initial appends + later append stream; the rewrite commit is skipped, got $got")
  }

  /** Drain a cdc-mode stream, collecting (id, v, _change_type). */
  private def drainCdc(root: String, ckpt: String,
      extra: Map[String, String] = Map.empty): Seq[(Long, String, String)] = {
    val acc = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, String)]()
    var reader = spark.readStream.format("graft-table").option("path", root)
      .option("mode", "cdc")
    extra.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.load().writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
        df.select("id", "v", "_change_type").collect()
          .foreach(r => acc.add((r.getLong(0), r.getString(1), r.getString(2))))
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try { q.processAllAvailable() } finally { q.stop(); q.awaitTermination() }
    acc.iterator().asScala.toSeq
  }

  test("cdc mode: updates stream as delete+insert pairs; checkpointed resume") {
    val root = tmpDir("tsr-cdc") + "/t"
    val ckpt = tmpDir("tsr-cdc-ckpt")
    val t = TransactionalTable.create(spark, root, sch, "id")
    t.append(Seq(1L -> "a", 2L -> "b", 3L -> "c").toDF("id", "v"))
    val got1 = drainCdc(root, ckpt, Map("startingVersion" -> "0")).toSet
    assert(got1 === Set((1L, "a", "insert"), (2L, "b", "insert"), (3L, "c", "insert")),
      s"initial state streams as inserts, got $got1")

    // while the stream is down: a CoW merge updating key 2 and deleting key 3
    // — exactly what append mode fails/skips on — streams as the net diff
    t.merge(Seq(2L -> "B").toDF("id", "v"), Seq(3L).toDF("id"), batchId = 1)
    val got2 = drainCdc(root, ckpt).toSet
    assert(got2 === Set((2L, "b", "delete"), (2L, "B", "insert"), (3L, "c", "delete")),
      s"resume must deliver the update pair + the delete image, got $got2")

    // a compaction-only interval diffs to zero changelog rows
    t.compact(minFileRows = 1000L)
    assert(drainCdc(root, ckpt).isEmpty, "compaction must not produce changes")

    // and a later plain insert streams as its insert image
    t.merge(Seq(9L -> "z").toDF("id", "v"), noDel.select($"id"), batchId = 2)
    assert(drainCdc(root, ckpt).toSet === Set((9L, "z", "insert")))
  }

  test("cdc mode silver chain: downstream merges converge across restarts, no double-apply") {
    val root = tmpDir("tsr-chain") + "/bronze"
    val silverRoot = tmpDir("tsr-chain") + "/silver"
    val ckpt = tmpDir("tsr-chain-ckpt")
    val bronze = TransactionalTable.create(spark, root, sch, "id")
    val silver = TransactionalTable.create(spark, silverRoot, sch, "id")
    def applyBatches(): Unit = {
      val q = spark.readStream.format("graft-table").option("path", root)
        .option("mode", "cdc").option("startingVersion", "0")
        .load().writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], bid: Long) =>
          val ins = df.filter($"_change_type" === "insert").drop("_change_type")
          val delOnly = df.filter($"_change_type" === "delete").select($"id")
            .join(ins.select($"id"), Seq("id"), "left_anti")
          silver.merge(ins, delOnly, bid)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime("1 second")).start()
      try { q.processAllAvailable() } finally { q.stop(); q.awaitTermination() }
    }
    bronze.append(Seq(1L -> "a", 2L -> "b", 3L -> "c").toDF("id", "v"))
    applyBatches() // run 1: initial state
    assert(silver.scan().as[(Long, String)].collect().toSet ===
      Set(1L -> "a", 2L -> "b", 3L -> "c"))
    val silverV1 = silver.currentVersion
    // stream down: update, delete, insert land on bronze
    bronze.merge(Seq(2L -> "B", 4L -> "d").toDF("id", "v"), Seq(3L).toDF("id"),
      batchId = 1)
    applyBatches() // run 2: restart from the checkpoint, one interval batch
    assert(silver.scan().as[(Long, String)].collect().toSet ===
      Set(1L -> "a", 2L -> "B", 4L -> "d"))
    // restart with NOTHING new: the replay fence + offsets mean no new commit
    val vAfter = silver.currentVersion
    applyBatches() // run 3: no-op
    assert(silver.currentVersion === vAfter,
      "an already-applied interval must not re-commit on restart")
    assert(vAfter > silverV1)
    assert(silver.scan().as[(Long, String)].collect().toSet ===
      Set(1L -> "a", 2L -> "B", 4L -> "d"))
  }

  test("cdc mode with row lineage: the update pair shares one _row_id") {
    val root = tmpDir("tsr-cdcrl") + "/t"
    val ckpt = tmpDir("tsr-cdcrl-ckpt")
    val t = TransactionalTable.create(spark, root, sch, "id")
    t.setRowLineage(true)
    t.append(Seq(1L -> "a", 2L -> "b").toDF("id", "v"))
    drainCdc(root, ckpt, Map("startingVersion" -> "0")) // consume the inserts
    t.merge(Seq(2L -> "B").toDF("id", "v"), noDel.select($"id"), batchId = 1)

    val acc = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
    val q = spark.readStream.format("graft-table").option("path", root)
      .option("mode", "cdc").load().writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
        df.select("id", "_change_type", "_row_id").collect()
          .foreach(r => acc.add((r.getLong(0), r.getString(1), r.getLong(2))))
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try { q.processAllAvailable() } finally { q.stop(); q.awaitTermination() }
    val rows = acc.iterator().asScala.toSeq
    assert(rows.map(r => (r._1, r._2)).toSet === Set((2L, "delete"), (2L, "insert")),
      s"update must stream as a pair, got $rows")
    assert(rows.map(_._3).distinct.size === 1,
      s"the pair must share ONE stable _row_id, got $rows")
  }
}
