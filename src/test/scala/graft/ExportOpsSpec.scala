package graft

import org.apache.spark.sql.functions._

import graft.ops.ExportOps
import graft.table.TransactionalTable

/** Incremental training-data export (E184): consecutive intervals publish
  * disjoint deltas, tombstones track cross-export retractions, manifests
  * fence re-runs. */
class ExportOpsSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, words: Int): (Long, String) =
    id -> (1 to words).map(k => s"w${id}x$k").mkString(" ")

  test("consecutive exports publish disjoint deltas; cross-export tombstones; fenced re-run") {
    val root = tmpDir("export-ops")
    val corpus = TransactionalTable.create(spark, s"$root/corpus",
      org.apache.spark.sql.types.StructType.fromDDL("doc_id LONG, text STRING"),
      "doc_id", None)
    corpus.append(Seq(doc(1, 10), doc(2, 20)).toDF("doc_id", "text"), batchId = 0)
    val v0 = corpus.currentVersion
    corpus.append(Seq(doc(3, 30), doc(4, 5)).toDF("doc_id", "text"), batchId = 1)
    val v1 = corpus.currentVersion
    val e1 = ExportOps.exportDelta(corpus, s"$root/exp", v0, v1,
      nShards = 2, capacity = 16L)
    assert(e1.exported)
    val pub1 = spark.read.parquet(e1.dir).select("doc_id").as[Long].collect().toSet
    assert(pub1 === Set(3L, 4L), s"export 1 must carry only its interval: $pub1")
    assert(e1.tombstones.isEmpty)
    // interval 2: a fresh doc, an UPDATE of a published doc (re-publishes),
    // and a DELETE of a doc published in export 1 (tombstones)
    corpus.merge(Seq(doc(5, 7), (4L, "rewritten text")).toDF("doc_id", "text"),
      Seq(3L).toDF("doc_id"), batchId = 2)
    val v2 = corpus.currentVersion
    val e2 = ExportOps.exportDelta(corpus, s"$root/exp", v1, v2,
      nShards = 2, capacity = 16L)
    assert(e2.exported)
    val pub2 = spark.read.parquet(e2.dir).select("doc_id").as[Long].collect().toSet
    assert(pub2 === Set(4L, 5L), s"export 2 must carry the update + the birth: $pub2")
    assert(e2.tombstones.as[Long].collect().toSet === Set(3L),
      "the cross-export retraction must tombstone")
    // manifest: one fenced row per interval; re-running interval 2 no-ops
    val m = ExportOps.manifest(spark, s"$root/exp")
    assert(m.scan().select("to_v").as[Long].collect().toSet === Set(v1, v2))
    val mv = m.currentVersion
    val replay = ExportOps.exportDelta(corpus, s"$root/exp", v1, v2,
      nShards = 2, capacity = 16L)
    assert(!replay.exported && m.currentVersion === mv,
      "replayed interval must not re-publish")
    // the replay still returns the identical deterministic assignment
    val a1 = e2.assignment.select("shard", "bin", "pos", "doc_id")
      .as[(Int, Long, Int, Long)].collect().toSet
    val a2 = replay.assignment.select("shard", "bin", "pos", "doc_id")
      .as[(Int, Long, Int, Long)].collect().toSet
    assert(a1 === a2)
    // bin arithmetic: capacity 16 with doc sizes (20-token doc straddles)
    val bins = spark.read.parquet(e1.dir)
      .groupBy("shard").agg(max(col("bin")).as("mx"))
      .select("mx").as[Long].collect()
    assert(bins.forall(_ >= 0L))
  }

  test("deletes-only interval publishes tombstones + a zero-doc manifest row (ADVICE r15)") {
    val root = tmpDir("export-ops-delonly")
    val corpus = TransactionalTable.create(spark, s"$root/corpus",
      org.apache.spark.sql.types.StructType.fromDDL("doc_id LONG, text STRING"),
      "doc_id", None)
    corpus.append(Seq(doc(1, 10), doc(2, 20)).toDF("doc_id", "text"), batchId = 0)
    val v0 = corpus.currentVersion
    val e1 = ExportOps.exportDelta(corpus, s"$root/exp", 0, v0,
      nShards = 2, capacity = 16L)
    assert(e1.exported)
    // interval 2 carries ONLY deletions: zero insert images, one tombstone
    import spark.implicits._
    corpus.merge(spark.emptyDataset[(Long, String)].toDF("doc_id", "text"),
      Seq(1L).toDF("doc_id"), batchId = 1)
    val v1 = corpus.currentVersion
    val e2 = ExportOps.exportDelta(corpus, s"$root/exp", v0, v1,
      nShards = 2, capacity = 16L)
    assert(e2.exported, "a deletes-only interval must still publish")
    assert(e2.tombstones.as[Long].collect().toSet === Set(1L))
    assert(spark.read.parquet(s"${e2.dir}/_tombstones").as[Long].collect()
      .toSet === Set(1L), "tombstone list must be on disk")
    val m = ExportOps.manifest(spark, s"$root/exp")
    val row = m.scan().where(col("to_v") === v1)
      .select("n_docs", "n_tokens", "n_tombstones")
      .as[(Long, Long, Long)].collect()
    assert(row.toSeq === Seq((0L, 0L, 1L)),
      s"manifest must record the empty publication exactly: ${row.toSeq}")
  }
}
