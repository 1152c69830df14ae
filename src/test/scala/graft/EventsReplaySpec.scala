package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.stream.CdcEventsReplay
import graft.queries.Tables

/** The sf-scalable CDC replay must equal last-event-per-user computed
  * directly, and each micro-batch must stay far under the reference's 100 s
  * trigger (BASELINE.md operational target). */
class EventsReplaySpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("events replay end state == direct last-event-per-user; batches fast") {
    val root = tmpDir("events-replay")
    val (t, times) = CdcEventsReplay.replay(spark, sfDir, root, nBatches = 3)

    val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
    val want = Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .filter($"event_type" =!= "error")
      .select($"user_id", $"event_type", floor($"value").cast("int").as("amount"))
      .as[(Long, String, Int)].collect().sortBy(_._1).toSeq

    val got = t.scan().select($"trans_id", $"event", $"amount")
      .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
    assert(got === want)
    assert(times.forall(_ < 100.0), s"batch turnaround exceeded trigger: $times")
    assert(t.currentVersion === 3L)
  }
}
