package graft

import org.apache.spark.sql.functions._

import graft.ops.SequenceOps

class SequenceOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val sizes =
    (0L until 1000L).map(i => (i, (i * 7919) % 97 + 1)).toDF("id", "n")

  test("prefixSum equals the sequential scan, any partition count") {
    val want = {
      var acc = 0L
      (0L until 1000L).map { i => acc += (i * 7919) % 97 + 1; (i, acc) }.toMap
    }
    Seq(1, 3, 8).foreach { np =>
      val got = SequenceOps.prefixSum(sizes, "id", "n", numPartitions = np)
        .select($"id", $"cumsum").as[(Long, Long)].collect().toMap
      assert(got === want, s"numPartitions=$np")
    }
  }

  test("prefixSum plan has no single-partition exchange") {
    val df = SequenceOps.prefixSum(sizes, "id", "n", numPartitions = 8)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("packBins: contiguous bins, capacity respected at bin starts") {
    val docs = (0L until 200L).map(i => (i, 100L)).toDF("id", "n")
    val got = SequenceOps.packBins(docs, "id", "n", capacity = 1000L, numPartitions = 4)
      .select($"id", $"bin").as[(Long, Long)].collect().sorted
    // 100 tokens each, 1000 capacity → exactly 10 docs per bin, in id order
    got.foreach { case (id, bin) => assert(bin === id / 10, s"doc $id") }
  }
}
