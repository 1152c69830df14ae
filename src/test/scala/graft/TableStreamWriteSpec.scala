package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types._

import graft.table.TransactionalTable

/** Streaming writes INTO the table (graft-table sink): one transactional
  * commit per micro-batch, epoch id as the batchId replay fence
  * (exactly-once across restarts), append and PK-merge modes. */
class TableStreamWriteSpec extends SparkSpec {
  import spark.implicits._

  private val sch = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def startSink(src: MemoryStream[(Long, String)], root: String, ckpt: String,
      outputMode: String, extra: Map[String, String] = Map.empty) = {
    var w = src.toDF().toDF("id", "v").writeStream
      .format("graft-table").option("path", root)
      .option("checkpointLocation", ckpt)
      .outputMode(outputMode)
    extra.foreach { case (k, v) => w = w.option(k, v) }
    w.start()
  }

  test("append mode: micro-batches land as transactional appends; restart is exactly-once") {
    val root = tmpDir("tsw") + "/t"
    val ckpt = tmpDir("tsw-ckpt")
    TransactionalTable.create(spark, root, sch, "id")

    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    src.addData(1L -> "a", 2L -> "b")
    val q = startSink(src, root, ckpt, "append")
    try { q.processAllAvailable() } finally { q.stop(); q.awaitTermination() }

    val t = TransactionalTable.open(spark, root)
    assert(t.scan().select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))

    // restart from the same checkpoint: the committed epoch must not re-land,
    // new data must
    src.addData(3L -> "c")
    val q2 = startSink(src, root, ckpt, "append")
    try { q2.processAllAvailable() } finally { q2.stop(); q2.awaitTermination() }
    assert(TransactionalTable.open(spark, root).scan().select("id")
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L),
      "restart must deliver new epochs exactly once, no replays")
  }

  test("update mode: PK merge — later epochs upsert; deleteCol routes deletes") {
    val root = tmpDir("tsw-mg") + "/t"
    val ckpt = tmpDir("tsw-mg-ckpt")
    TransactionalTable.create(spark, root, sch, "id")

    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String, Boolean)]
    src.addData((1L, "a", false), (2L, "b", false))
    def start() = {
      src.toDF().toDF("id", "v", "_deleted").writeStream
        .format("graft-table").option("path", root)
        .option("checkpointLocation", ckpt)
        .option("deleteCol", "_deleted")
        .outputMode("update")
        .start()
    }
    val q = start()
    try { q.processAllAvailable() } finally { q.stop(); q.awaitTermination() }
    // next epoch: update 1, delete 2, insert 3
    src.addData((1L, "a2", false), (2L, "", true), (3L, "c", false))
    val q2 = start()
    try { q2.processAllAvailable() } finally { q2.stop(); q2.awaitTermination() }

    val got = TransactionalTable.open(spark, root).scan()
      .select("id", "v").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq(1L -> "a2", 3L -> "c"))
  }

  test("merge-on-read sink mode accrues delete files instead of rewriting") {
    val root = tmpDir("tsw-mor") + "/t"
    val ckpt = tmpDir("tsw-mor-ckpt")
    TransactionalTable.create(spark, root, sch, "id")
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    src.addData(1L -> "a", 2L -> "b")
    val q = startSink(src, root, ckpt, "update", Map("mergeMode" -> "mor"))
    try { q.processAllAvailable() } finally { q.stop(); q.awaitTermination() }
    src.addData(1L -> "a2")
    val q2 = startSink(src, root, ckpt, "update", Map("mergeMode" -> "mor"))
    try { q2.processAllAvailable() } finally { q2.stop(); q2.awaitTermination() }

    val t = TransactionalTable.open(spark, root)
    assert(t.snapshot.deletes.nonEmpty, "MOR merge must land equality-delete files")
    assert(t.scan().select("id", "v").as[(Long, String)].collect().sortBy(_._1).toSeq
      === Seq(1L -> "a2", 2L -> "b"))
  }

  test("independent streams fence independently: a second query's epoch 0 still lands") {
    val root = tmpDir("tsw-mw") + "/t"
    TransactionalTable.create(spark, root, sch, "id")
    implicit val sqlCtx = spark.sqlContext

    // stream A commits epochs 0 and 1
    val a = MemoryStream[(Long, String)]
    a.addData(1L -> "a")
    val qa = startSink(a, root, tmpDir("tsw-mw-ca"), "append")
    try {
      qa.processAllAvailable()
      a.addData(2L -> "b")
      qa.processAllAvailable()
    } finally { qa.stop(); qa.awaitTermination() }

    // stream B: FRESH checkpoint, epochs restart at 0 — with a single global
    // fence this batch would be silently dropped; per-writer fences land it
    val b = MemoryStream[(Long, String)]
    b.addData(3L -> "c")
    val qb = startSink(b, root, tmpDir("tsw-mw-cb"), "append")
    try { qb.processAllAvailable() } finally { qb.stop(); qb.awaitTermination() }

    assert(TransactionalTable.open(spark, root).scan().select("id")
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L),
      "each stream must keep its own exactly-once fence")
  }

  test("sink contract: missing table, Complete mode, partitionBy are rejected") {
    val root = tmpDir("tsw-rej") + "/t"
    // missing table fails at sink creation, not first batch
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    intercept[Exception] {
      val q = src.toDF().toDF("id", "v").writeStream.format("graft-table")
        .option("path", root).option("checkpointLocation", tmpDir("tsw-rej-c1"))
        .start()
      try { q.processAllAvailable() } finally { q.stop() }
    }
    TransactionalTable.create(spark, root, sch, "id")
    intercept[Exception] {
      val q = src.toDF().toDF("id", "v").writeStream.format("graft-table")
        .option("path", root).option("checkpointLocation", tmpDir("tsw-rej-c2"))
        .partitionBy("v")
        .start()
      try { q.processAllAvailable() } finally { q.stop() }
    }
  }
}
