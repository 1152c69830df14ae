package graft.table

import java.nio.ByteBuffer
import java.util.{BitSet => JBitSet, TreeMap => JTreeMap}

import scala.jdk.CollectionConverters._

/**
 * Roaring-style bitmap of deleted row ordinals — the Iceberg v3
 * DELETION-VECTOR shape (one bitmap per data file superseding v2's
 * positional delete *files*; the reference's Iceberg tables at
 * `spark_sql_merge_into_iceberg.py:51-63` get this from the format runtime
 * on upgrade). Hand-rolled because the engine is dependency-free: positions
 * partition into 65536-value containers keyed by `pos >>> 16`; each
 * container serializes SPARSE (sorted 16-bit values) below 4096 entries and
 * DENSE (8 KiB bitset) at or above — the classic roaring trade, bounding the
 * encoding at ~2 bytes/position worst-case and 8 KiB/container best-case.
 *
 * In memory every container is a [[java.util.BitSet]] (delete positions
 * cluster by construction — a merge masks consecutive ordinals of few
 * files — so the bitset is compact where it matters and O(1) to probe).
 * Serialization is DETERMINISTIC (containers ascending, values ascending):
 * byte-equal vectors mean equal delete sets, which the replay fence and
 * oracle comparisons rely on.
 *
 * Not thread-safe while mutating; safe for concurrent reads after freeze
 * (the scan path only ever probes deserialized instances).
 */
final class DeletionVector private (
    private val containers: JTreeMap[java.lang.Long, JBitSet]) {

  /** Mark row ordinal `pos` deleted. */
  def add(pos: Long): Unit = {
    require(pos >= 0, s"row ordinal must be >= 0, got $pos")
    val key = java.lang.Long.valueOf(pos >>> 16)
    var bs = containers.get(key)
    if (bs == null) { bs = new JBitSet(); containers.put(key, bs) }
    bs.set((pos & 0xFFFFL).toInt)
  }

  /** Is row ordinal `pos` deleted? O(1). */
  def contains(pos: Long): Boolean = {
    if (pos < 0) return false
    val bs = containers.get(java.lang.Long.valueOf(pos >>> 16))
    bs != null && bs.get((pos & 0xFFFFL).toInt)
  }

  /** Number of deleted positions. */
  def cardinality: Long =
    containers.values().iterator().asScala.map(_.cardinality().toLong).sum

  def isEmpty: Boolean = containers.isEmpty

  /** In-place union — the DV replacement rule: a new commit deleting more
    * rows of a file writes old ∪ new and drops the superseded entry, keeping
    * the one-DV-per-file invariant. */
  def orInPlace(other: DeletionVector): DeletionVector = {
    other.containers.entrySet().iterator().asScala.foreach { e =>
      val bs = containers.get(e.getKey)
      if (bs == null) {
        val copy = new JBitSet(); copy.or(e.getValue)
        containers.put(e.getKey, copy)
      } else bs.or(e.getValue)
    }
    this
  }

  /** Ascending iterator over deleted ordinals — the expansion path when a
    * delete set outgrows the broadcast filter and falls back to an
    * anti-join. */
  def iterator: Iterator[Long] =
    containers.entrySet().iterator().asScala.flatMap { e =>
      val base = e.getKey.longValue() << 16
      val bs = e.getValue
      Iterator.unfold(bs.nextSetBit(0)) { i =>
        if (i < 0) None else Some((base | i.toLong, bs.nextSetBit(i + 1)))
      }
    }

  /** Deterministic byte encoding (see class doc for the layout). */
  def serialize: Array[Byte] = {
    val entries = containers.entrySet().iterator().asScala.toSeq
    var size = 8 // magic + count
    val encoded = entries.map { e =>
      val card = e.getValue.cardinality()
      val dense = card >= DeletionVector.DenseThreshold
      size += 13 + (if (dense) DeletionVector.DenseBytes else card * 2)
      (e.getKey.longValue(), e.getValue, card, dense)
    }
    val buf = ByteBuffer.allocate(size)
    buf.putInt(DeletionVector.Magic)
    buf.putInt(encoded.size)
    encoded.foreach { case (high, bs, card, dense) =>
      buf.putLong(high)
      buf.putInt(card)
      buf.put(if (dense) 1.toByte else 0.toByte)
      if (dense) {
        val raw = bs.toByteArray // little-endian longwords, ascending
        buf.put(raw)
        var pad = DeletionVector.DenseBytes - raw.length
        while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      } else {
        var i = bs.nextSetBit(0)
        while (i >= 0) { buf.putShort(i.toShort); i = bs.nextSetBit(i + 1) }
      }
    }
    buf.array()
  }
}

object DeletionVector {
  private val Magic = 0x47445631 // "GDV1"
  private val DenseThreshold = 4096
  private val DenseBytes = 8192 // 65536 bits

  def empty: DeletionVector = new DeletionVector(new JTreeMap())

  def fromPositions(positions: IterableOnce[Long]): DeletionVector = {
    val dv = empty
    positions.iterator.foreach(dv.add)
    dv
  }

  def deserialize(bytes: Array[Byte]): DeletionVector = {
    val buf = ByteBuffer.wrap(bytes)
    require(buf.remaining() >= 8 && buf.getInt() == Magic,
      "not a graft deletion vector (bad magic)")
    val n = buf.getInt()
    val map = new JTreeMap[java.lang.Long, JBitSet]()
    var c = 0
    while (c < n) {
      val high = buf.getLong()
      val card = buf.getInt()
      val dense = buf.get() == 1.toByte
      val bs =
        if (dense) {
          val raw = new Array[Byte](DenseBytes)
          buf.get(raw)
          JBitSet.valueOf(raw)
        } else {
          val b = new JBitSet()
          var i = 0
          while (i < card) { b.set(buf.getShort() & 0xFFFF); i += 1 }
          b
        }
      map.put(java.lang.Long.valueOf(high), bs)
      c += 1
    }
    new DeletionVector(map)
  }
}
