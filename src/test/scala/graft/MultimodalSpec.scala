package graft

import org.apache.spark.sql.functions._

import graft.ops.MultimodalOps

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello world"),
    (2L, ""),
    (3L, "x" * 10000)).toDF("doc_id", "text")

  test("fromDocuments: binary payload + typed metadata schema") {
    val m = MultimodalOps.fromDocuments(docs)
    assert(m.schema("content").dataType === org.apache.spark.sql.types.BinaryType)
    val r = m.filter($"media_id" === 1).select($"width", length($"content"))
      .as[(Int, Int)].head()
    assert(r === ((11, 11)))
  }

  test("decodeFeatures: deterministic, fixed shape, empty payload safe") {
    val f = MultimodalOps.documentFeatures(docs, partitions = 3)
    val rows = f.select($"media_id", $"n_bytes", $"byte_mean", $"n_frames", size($"feature"))
      .as[(Long, Long, Double, Int, Int)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 3L))
    val Seq(r1, r2, r3) = rows.toSeq
    assert(r1._2 === 11L && r1._5 === 16)
    assert(r2 === ((2L, 0L, 0.0, 0, 16)))                  // empty payload
    assert(r3._2 === 10000L && r3._4 === 3 && r3._3 === 'x'.toInt.toDouble)
    // determinism
    val again = MultimodalOps.documentFeatures(docs, partitions = 3)
      .select($"media_id", $"byte_mean").as[(Long, Double)].collect().toMap
    assert(again === rows.map(r => r._1 -> r._3).toMap)
  }

  test("histogram feature is L1-normalized over 16 bins") {
    val f = MultimodalOps.documentFeatures(docs.filter($"doc_id" === 3))
      .select($"feature").as[Seq[Float]].head()
    assert(math.abs(f.sum - 1.0f) < 1e-5)
    assert(f('x'.toInt >> 4) === 1.0f) // all bytes land in one bin
  }
}
