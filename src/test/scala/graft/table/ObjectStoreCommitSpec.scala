package graft.table

import java.nio.file.{Files, Path, StandardOpenOption}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.types.StructType

/**
 * Object-store commit portability (r16 verdict missing #4): the commit
 * protocol must hold on an S3-class store where RENAME DOES NOT EXIST —
 * only conditional PUT (claim) and full-object PUT (publish). The
 * simulated store below implements [[CommitIO]] with exactly those two
 * primitives (no tmp files, no moves) plus crash injection, proving:
 *
 *  1. the protocol runs end to end with zero rename calls;
 *  2. a crash BETWEEN claim and pointer publish loses no table state —
 *     readers stay on the old version, and the claim heals through the
 *     grace-window path exactly as on POSIX;
 *  3. a torn publish is impossible BY CONTRACT (putAtomic is one PUT),
 *     which is the portability argument: S3's copy+delete rename never
 *     enters the commit path.
 */
class ObjectStoreCommitSpec extends graft.SparkSpec {
  import spark.implicits._

  private val sch = StructType.fromDDL("id LONG, v STRING")

  /** A no-rename store: claim = conditional PUT (If-None-Match: *),
    * publish = ONE whole-object PUT. `crashBeforePointerPut` simulates the
    * writer dying after the claim landed but before the pointer PUT. */
  private final class SimObjectStoreIO extends CommitIO {
    val puts = new AtomicInteger(0)
    val conditionalPuts = new AtomicInteger(0)
    @volatile var crashBeforePointerPut = false
    override def putIfAbsent(path: Path, bytes: Array[Byte]): Unit = {
      conditionalPuts.incrementAndGet()
      // an object store has no directories — any key is writable; on the
      // local simulation that means preparing the parent (CommitIO contract)
      java.nio.file.Files.createDirectories(path.getParent)
      // the store-side atomicity of If-None-Match is modeled by CREATE_NEW
      Files.write(path, bytes, StandardOpenOption.CREATE_NEW); ()
    }
    override def putAtomic(path: Path, bytes: Array[Byte]): Unit = {
      if (crashBeforePointerPut && path.getFileName.toString == "_current") {
        crashBeforePointerPut = false
        throw new RuntimeException("simulated crash: claim landed, pointer PUT lost")
      }
      puts.incrementAndGet()
      // ONE full-object PUT — all-or-nothing by the object-store contract;
      // deliberately NO tmp file and NO move
      Files.write(path, bytes, StandardOpenOption.CREATE,
        StandardOpenOption.TRUNCATE_EXISTING)
      ()
    }
    override def read(path: Path): Array[Byte] = Files.readAllBytes(path)
    override def exists(path: Path): Boolean = Files.exists(path)
    override def modifiedAtMs(path: Path): Long =
      Files.getLastModifiedTime(path).toMillis
    override def delete(path: Path): Unit = { Files.deleteIfExists(path); () }
    override def list(dir: Path): Seq[Path] =
      if (!Files.isDirectory(dir)) Seq.empty
      else {
        val s = Files.list(dir)
        try { import scala.jdk.CollectionConverters._; s.iterator().asScala.toSeq }
        finally s.close()
      }
  }

  test("commit protocol completes on a store with NO rename (conditional PUT + object PUT only)") {
    val root = tmpDir("objstore-basic") + "/t"
    val t = TransactionalTable.create(spark, root, sch, "id", None)
    val io = new SimObjectStoreIO
    t.commitIo = io
    t.append(Seq(1L -> "a", 2L -> "b").toDF("id", "v"), batchId = 0)
    t.merge(Seq(2L -> "b2", 3L -> "c").toDF("id", "v"),
      Seq(1L).toDF("id"), batchId = 1)
    assert(io.conditionalPuts.get() >= 2 && io.puts.get() >= 2,
      "both commits must run through the simulated store")
    val rows = t.scan().as[(Long, String)].collect().toSet
    assert(rows === Set(2L -> "b2", 3L -> "c"))
    // a FRESH handle (plain POSIX reads) sees the same state: the objects
    // the sim store wrote are bit-identical to what readers expect
    assert(TransactionalTable.open(spark, root).scan()
      .as[(Long, String)].collect().toSet === rows)
  }

  test("crash between claim and pointer PUT: no lost table; grace-window heal re-claims") {
    val root = tmpDir("objstore-crash") + "/t"
    val t = TransactionalTable.create(spark, root, sch, "id", None)
    t.append(Seq(1L -> "a").toDF("id", "v"), batchId = 0)
    val v1 = t.currentVersion
    val io = new SimObjectStoreIO
    t.commitIo = io
    io.crashBeforePointerPut = true
    intercept[RuntimeException] {
      t.append(Seq(2L -> "b").toDF("id", "v"), batchId = 1)
    }
    // the table is NOT lost: a fresh reader sees exactly the pre-crash state
    val reopened = TransactionalTable.open(spark, root)
    assert(reopened.currentVersion === v1, "pointer must still be at the old version")
    assert(reopened.scan().as[(Long, String)].collect().toSet === Set(1L -> "a"))
    // the orphaned claim heals exactly as on POSIX: retries lose while the
    // claim is younger than the grace window (an in-flight writer could
    // still publish it), and the retry loop's own backoff carries the
    // writer past the window, where the claim is replaced and the commit
    // completes — no operator intervention
    val t2 = TransactionalTable.open(spark, root)
    t2.commitIo = new SimObjectStoreIO
    t2.append(Seq(2L -> "b").toDF("id", "v"), batchId = 1)
    assert(t2.scan().as[(Long, String)].collect().toSet ===
      Set(1L -> "a", 2L -> "b"), "post-heal commit must land the lost batch")
    assert(TransactionalTable.open(spark, root).currentVersion === v1 + 1)
  }
}
