package graft.table

import org.apache.spark.sql.types.StructType

/**
 * O(churn) commit metadata: with the removed/added hint from the mutation
 * entry points, planChunks reuses clean parent chunks BY REFERENCE — an
 * append loads ZERO chunks even with a cold cache, and a merge loads only
 * the chunks whose pk range overlaps its keys. (In package graft.table for
 * access to the chunk cache; the load counter is public.)
 */
class CommitDeltaSpec extends graft.SparkSpec {
  import spark.implicits._

  private val sch = new StructType().add("id", "bigint").add("v", "bigint")

  private def loadsDuring[A](body: => A): (A, Long) = {
    val before = TransactionalTable.chunkLoads.get()
    val r = body
    (r, TransactionalTable.chunkLoads.get() - before)
  }

  test("append commits load zero chunks; merges load only pk-dirty chunks") {
    val t = TransactionalTable.create(spark, tmpDir("odelta") + "/t", sch, "id", None)
    def rows(lo: Long, hi: Long) =
      (lo to hi).map(i => (i, i * 10)).toDF("id", "v").coalesce(1)
    t.append(rows(0, 99)); t.append(rows(100, 199)); t.append(rows(200, 299))
    assert(t.snapshot.files.size === 3, "premise: one file per append")

    // Cold cache: the by-reference reuse claim must hold without any warm
    // entries, or the test would measure the cache, not the planner.
    TransactionalTable.chunkCache.clear()
    val (_, appendLoads) = loadsDuring(t.append(rows(300, 399)))
    assert(appendLoads === 0L,
      s"append commit loaded $appendLoads chunks (expected 0: all parent " +
        "chunks are clean and reused by reference)")

    TransactionalTable.chunkCache.clear()
    val (_, mergeLoads) = loadsDuring {
      t.merge((0L to 5L).map(i => (i, i + 1000)).toDF("id", "v"),
        Seq(6L, 7L).toDF("id"), batchId = 0)
    }
    // one dirty chunk (ids 0-99): affectedFiles loads it (miss), planChunks
    // re-reads it through the cache (hit)
    assert(mergeLoads <= 2L,
      s"merge commit loaded $mergeLoads chunks (expected <=2: only the " +
        "key-overlapping chunk is dirty)")

    // and the table state is exactly right after both hinted commits
    val got = t.scan().as[(Long, Long)].collect().toMap
    assert(got.size === 398) // 400 appended - 2 deleted
    assert(got(3L) === 1003 && !got.contains(6L) && got(150L) === 1500)
    assert(t.snapshot.rowCount === 398)
  }
}
