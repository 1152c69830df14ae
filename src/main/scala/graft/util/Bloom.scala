package graft.util

/**
 * The engine's PK Bloom filter bit-math, shared by the write path
 * (graft.table builds bitsets at commit) and the SQL planner
 * (graftshim.ManifestFileIndex consults them during file pruning).
 * Deterministic splitmix64 double-hashing — writer and reader can never
 * disagree. Kept dependency-free (both packages import it; it imports
 * nothing).
 */
object Bloom {
  val Bits = 1 << 16
  val Hashes = 5

  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def set(words: Array[Long], key: Long): Unit = {
    val h1 = splitmix64(key); val h2 = splitmix64(h1) | 1L
    var i = 0
    while (i < Hashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, Bits).toInt
      words(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
  }

  def contains(words: Array[Long], key: Long): Boolean = {
    val h1 = splitmix64(key); val h2 = splitmix64(h1) | 1L
    var i = 0
    while (i < Hashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, Bits).toInt
      if ((words(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def decode(b64: String): Array[Long] = {
    val bytes = java.util.Base64.getDecoder.decode(b64)
    val buf = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(buf.getLong)
  }

  def encode(words: Array[Long]): String = {
    val bytes = java.nio.ByteBuffer.allocate(words.length * 8)
    words.foreach(bytes.putLong)
    java.util.Base64.getEncoder.encodeToString(bytes.array())
  }
}
