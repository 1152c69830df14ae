package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Literal}
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.graftshim.{EntryChunk, ManifestEntry, ManifestFileIndex, PartitionTransformDesc}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Direct unit coverage of the two chunk-level prune paths the integration
 * specs don't isolate: the runtime-filter chunk keep (a broadcast join's IN
 * key set must rule out whole chunks before their entries load) and the
 * partition-value chunk prune (a chunk whose partition set provably misses
 * an equality literal never loads).
 */
class ChunkPruneSpec extends SparkSpec {

  /** One chunk of `n` files covering pk range [lo, hi], counting loads. */
  private def chunk(lo: Long, hi: Long, loads: AtomicInteger,
      parts: Option[Seq[String]] = None,
      part: Option[PartitionTransformDesc] = None): EntryChunk =
    EntryChunk(2, lo, hi, 2000L, parts, part, Map.empty, () => {
      loads.incrementAndGet()
      Seq(
        ManifestEntry(s"/nope/$lo-a.parquet", parts.flatMap(_.headOption),
          lo, (lo + hi) / 2, 1000L, Map.empty, None, part),
        ManifestEntry(s"/nope/$lo-b.parquet", parts.flatMap(_.lastOption),
          (lo + hi) / 2 + 1, hi, 1000L, Map.empty, None, part))
    })

  test("runtime IN filter on the pk prunes whole chunks before entries load") {
    val loads = new AtomicInteger()
    val chunks = (0 until 10).map(c => chunk(c * 100L, c * 100L + 99, loads))
    val idx = new ManifestFileIndex(spark, chunks, "id")
    // broadcast-side key set {250, 260} → only chunk 2 can match
    val applied = idx.applyRuntimeFilter(Array(new Predicate("IN",
      Array(Expressions.column("id"),
        Expressions.literal(250L), Expressions.literal(260L)))))
    assert(applied, "IN predicate on the pk must be usable")
    val kept = idx.listFiles(Nil, Nil).head.files
    assert(loads.get() === 1, s"runtime filter loaded ${loads.get()} chunks (expected 1)")
    // entry-level pruning then drops the loaded chunk's first file too
    // (pk 200-249 holds neither key) — only the 250-299 file survives
    assert(kept.map(_.getPath.getName) === Seq("200-b.parquet"), kept.toSeq)
  }

  test("partition equality prunes chunks by their partition-value set, load-free") {
    val loads = new AtomicInteger()
    val ident = Some(PartitionTransformDesc("identity", "event"))
    val chunks = Seq(
      chunk(0, 99, loads, parts = Some(Seq("cart", "visit")), part = ident),
      chunk(100, 199, loads, parts = Some(Seq("like")), part = ident),
      chunk(200, 299, loads, parts = Some(Seq("cart")), part = ident))
    val idx = new ManifestFileIndex(spark, chunks, "id")
    val ev = AttributeReference("event", StringType)()
    val kept = idx.listFiles(Nil,
      Seq(EqualTo(ev, Literal(UTF8String.fromString("like"), StringType))))
      .head.files
    // only the middle chunk can hold 'like' rows — the others never load
    assert(loads.get() === 1, s"partition prune loaded ${loads.get()} chunks (expected 1)")
    assert(kept.length === 2)
  }

  test("a chunk with an unknown partition set is conservatively loaded") {
    val loads = new AtomicInteger()
    val ident = Some(PartitionTransformDesc("identity", "event"))
    val chunks = Seq(
      chunk(0, 99, loads, parts = None, part = None), // unknown: must load
      chunk(100, 199, loads, parts = Some(Seq("cart")), part = ident))
    val idx = new ManifestFileIndex(spark, chunks, "id")
    val ev = AttributeReference("event", StringType)()
    idx.listFiles(Nil,
      Seq(EqualTo(ev, Literal(UTF8String.fromString("like"), StringType))))
    assert(loads.get() === 1,
      "the unknown-partition chunk must load; the provably-mismatched one must not")
  }
}
