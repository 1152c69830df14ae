package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.stream.StreamingOps

class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  test("windowed counts with watermark over an unbounded source") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF().toDF("ts", "event_type")
    val q = StreamingOps.windowedCounts(df, window = "1 hour", lateness = "10 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Complete).start()
    try {
      def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      mem.addData((t(10, 5), "click"), (t(10, 40), "click"), (t(11, 5), "view"))
      q.processAllAvailable()
      val got = spark.table("win_counts")
        .select($"window_start", $"event_type", $"n")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(got === Set(
        (t(10, 0), "click", 2L),
        (t(11, 0), "view", 1L)))
    } finally q.stop()
  }

  test("streaming exact dedup: duplicate events across batches collapse to one") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val df = mem.toDF().toDF("ts", "event_id", "payload")
    val q = StreamingOps.dedupStream(df, Seq("event_id"), lateness = "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      mem.addData((t(0), 1L, "a"), (t(1), 2L, "b"), (t(1), 1L, "a-dup"))
      q.processAllAvailable()
      mem.addData((t(2), 1L, "a-dup-later-batch"), (t(3), 3L, "c"))
      q.processAllAvailable()
      val got = spark.table("dedup_out").select($"event_id", $"payload")
        .as[(Long, String)].collect().toSet
      assert(got === Set((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q.stop()
  }

  test("watermarked stream-stream interval join pairs within the window only") {
    implicit val sqlCtx = spark.sqlContext
    val lmem = MemoryStream[(Long, Long, Timestamp)]
    val rmem = MemoryStream[(Long, Long, Timestamp)]
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val q = StreamingOps.intervalJoinStreams(
        lmem.toDF().toDF("l_id", "key", "ts"),
        rmem.toDF().toDF("r_id", "key", "ts"),
        joinWindow = "10 minutes", lateness = "5 minutes")
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode(OutputMode.Append).start()
    try {
      lmem.addData((1L, 7L, t(0)), (2L, 7L, t(30)), (3L, 9L, t(0)))
      rmem.addData(
        (100L, 7L, t(5)),   // joins 1 (within 10 min)
        (101L, 7L, t(20)),  // joins nothing (after 1's window, before 2)
        (102L, 7L, t(35)),  // joins 2
        (103L, 8L, t(0)))   // wrong key
      q.processAllAvailable()
      val got = spark.table("ssj_out").select($"l_id", $"r_id")
        .as[(Long, Long)].collect().toSet
      assert(got === Set((1L, 100L), (2L, 102L)))
    } finally q.stop()
  }

  test("streaming as-of enrichment: events pick the newest dim version <= ts") {
    implicit val sqlCtx = spark.sqlContext
    val evs = MemoryStream[(Long, Long, Double)]   // (key, tsUs, value)
    val dims = MemoryStream[(Long, Long, String)]  // (key, tsUs, dimVal)
    val q = StreamingOps.asofEnrichStream(evs.toDS(), dims.toDS())
      .writeStream.format("memory").queryName("asof_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: two dim versions + events around them, deliberately
      // interleaved out of order WITHIN the batch (intra-batch repair)
      dims.addData((1L, 50L, "v2"), (1L, 10L, "v1"), (2L, 5L, "w1"))
      evs.addData((1L, 60L, 6.0), (1L, 20L, 2.0), (1L, 5L, 0.5), (2L, 5L, 1.0))
      q.processAllAvailable()
      // batch 2: event after a later version arrives in a later batch; the
      // state carried v2 forward
      dims.addData((1L, 100L, "v3"))
      evs.addData((1L, 99L, 9.9), (1L, 100L, 10.0))
      q.processAllAvailable()
      val got = spark.table("asof_out")
        .as[(Long, Long, Double, Option[Long], Option[String])].collect()
        .map(r => (r._1, r._2) -> ((r._4, r._5))).toMap
      assert(got((1L, 5L)) === ((None, None)))            // before any version
      assert(got((1L, 20L)) === ((Some(10L), Some("v1"))))
      assert(got((1L, 60L)) === ((Some(50L), Some("v2"))))
      assert(got((2L, 5L)) === ((Some(5L), Some("w1"))))  // inclusive at ties
      assert(got((1L, 99L)) === ((Some(50L), Some("v2")))) // v3 is in the future
      assert(got((1L, 100L)) === ((Some(100L), Some("v3")))) // cross-batch state
    } finally q.stop()
  }

  test("stateful sessionization across micro-batches (flatMapGroupsWithState)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val hour = 3600L * 1000000L
    // idleTimeout = None: a pending processing-time timeout keeps the engine
    // scheduling no-data batches, so processAllAvailable would never settle.
    val q = StreamingOps.sessionizeStream(mem.toDS(), gapUs = hour, idleTimeout = None)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: user 1 has two close events (open session), user 2 one event
      mem.addData((1L, 0L), (1L, 60L * 1000000L), (2L, 0L))
      q.processAllAvailable()
      assert(spark.table("sessions").count() === 0, "no session closed yet")

      // batch 2: user 1 jumps 5 hours → first session closes (2 events, 60 s)
      mem.addData((1L, 5L * hour))
      q.processAllAvailable()
      val closed = spark.table("sessions")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(closed === Set((1L, 0L, 2L, 60L * 1000000L)))

      // batch 3: another 5-hour jump closes the singleton second session
      mem.addData((1L, 10L * hour))
      q.processAllAvailable()
      val closed2 = spark.table("sessions").as[(Long, Long, Long, Long)].collect().toSet
      assert(closed2 === Set(
        (1L, 0L, 2L, 60L * 1000000L),
        (1L, 1L, 1L, 0L)))
    } finally q.stop()
  }
}
