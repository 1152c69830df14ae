package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.table.{MergeMode, TransactionalTable}

/**
 * String primary keys: the DMS envelope's `partition-key-type: primary-key`
 * (reference `gen_fake_cdc_data.py:33`) does not promise integral keys, so
 * the manifest's 64-bit pruning machinery (pkMin/pkMax, blooms, key-set
 * overlap) runs in the xxhash64 key domain while every row-correct join
 * (merge, equality-delete masking, guard resolution) uses the raw column.
 */
class StringPkSpec extends SparkSpec {
  import spark.implicits._

  private val sch = StructType(Seq(
    StructField("id", StringType),
    StructField("event", StringType),
    StructField("amount", IntegerType)))

  private def rows(prefix: String, n: Int, amount: Int = 1) =
    (0 until n).map(i => (s"$prefix$i", "cart", amount)).toDF("id", "event", "amount")

  private def noDeletes = spark.emptyDataset[String].toDF("id")

  test("CoW replay: upserts, updates, deletes by string key") {
    val t = TransactionalTable.create(spark, tmpDir("spk-cow"), sch, "id", None)
    t.merge(rows("k", 10), noDeletes, batchId = 0)
    // batch 1: update k3, delete k7
    t.merge(Seq(("k3", "cart", 99)).toDF("id", "event", "amount"),
      Seq("k7").toDF("id"), batchId = 1)
    val got = t.scan().select($"id", $"amount").as[(String, Int)].collect().toMap
    assert(got.size === 9 && got("k3") === 99 && !got.contains("k7"))
    assert(t.scanAt(1).count() === 10) // time travel unaffected
  }

  test("merge + SQL point lookup prune by hash-domain stats: destroyed-file proof") {
    val cat = s"graft_spk${System.nanoTime()}"
    val warehouse = tmpDir("spk-wh")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)
    Files.createDirectories(Paths.get(s"$warehouse/db"))
    val root = s"$warehouse/db/t"
    val t = TransactionalTable.create(spark, root, sch, "id", None)
    t.append(rows("a", 10).coalesce(1)) // one file holding a0..a9
    t.append(rows("b", 10).coalesce(1)) // one file holding b0..b9
    val v1Paths = t.snapshotAt(1).files.map(_.path).toSet
    val bFile = t.snapshot.files.filterNot(f => v1Paths.contains(f.path)).head
    assert(bFile.bloom.isDefined, "small string-PK files must carry a hash bloom")
    Files.delete(Paths.get(bFile.path)) // destroy the b-file: any read of it throws

    // merge touching only a-keys must hash-prune the destroyed b-file
    t.merge(Seq(("a5", "cart", 42)).toDF("id", "event", "amount"),
      Seq("a6").toDF("id"), batchId = 0)
    // SQL point lookup on an a-key must hash-prune the b-file too
    val got = spark.sql(s"SELECT amount FROM $cat.db.t WHERE id = 'a5'")
      .as[Int].collect().toSeq
    assert(got === Seq(42))
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t WHERE id = 'a6'").head().getLong(0) === 0)
  }

  test("MOR equality and positional deletes mask by raw string key; compact folds") {
    for (mode <- Seq(MergeMode.MergeOnRead, MergeMode.MergeOnReadPositional)) {
      val t = TransactionalTable.create(spark, tmpDir(s"spk-$mode"), sch, "id", None)
      t.merge(rows("k", 8), noDeletes, batchId = 0, mode)
      val v1Files = t.snapshot.files.map(_.path).toSet
      t.merge(Seq(("k2", "cart", 77)).toDF("id", "event", "amount"),
        Seq("k5").toDF("id"), batchId = 1, mode)
      // MOR never rewrites: batch-0 files survive in the manifest
      assert(v1Files.subsetOf(t.snapshot.files.map(_.path).toSet), s"$mode rewrote files")
      assert(t.snapshot.deletes.nonEmpty)
      val got = t.scan().select($"id", $"amount").as[(String, Int)].collect().toMap
      assert(got.size === 7 && got("k2") === 77 && !got.contains("k5"), s"$mode end state")
      t.compact()
      assert(t.snapshot.deletes.isEmpty)
      val after = t.scan().select($"id", $"amount").as[(String, Int)].collect().toMap
      assert(after === got, s"$mode compaction changed data")
    }
  }

  test("equality delete files carry hash-domain key ranges (selective changes pruning)") {
    val t = TransactionalTable.create(spark, tmpDir("spk-drange"), sch, "id", None)
    t.merge(rows("k", 8), noDeletes, batchId = 0, MergeMode.MergeOnRead)
    t.merge(rows("z", 0), Seq("k5").toDF("id"), batchId = 1, MergeMode.MergeOnRead)
    // deletes accrete in commit order — .last is batch 1's file ({k5} only;
    // batch 0's masks all eight upserted keys)
    val d = t.snapshot.deletes.last
    assert(d.kind === "equality")
    // the range must be the xxhash64 of exactly {k5}, not the full-span
    // sentinel raw string stats degrade to — otherwise changes() treats
    // EVERY carried file as affected (O(table), the documented O(changed))
    val h = spark.range(1).select(xxhash64(lit("k5"))).head().getLong(0)
    assert(d.pkMin === h && d.pkMax === h,
      s"delete range must be hash-domain [$h,$h], got [${d.pkMin},${d.pkMax}]")
    // and the delete masks correctly end-to-end
    assert(!t.scan().select($"id").as[String].collect().contains("k5"))
    val diff = t.changes(1, 2).select($"id", $"_change_type").as[(String, String)]
      .collect().toSet
    assert(diff === Set(("k5", "delete")), s"changelog stays exact, got $diff")
  }

  test("guarded merge resolves winners by raw string key") {
    val gsch = sch.add("ts", TimestampType)
    val t = TransactionalTable.create(spark, tmpDir("spk-guard"), gsch, "id", None)
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val noGuardedDeletes =
      spark.emptyDataset[(String, java.sql.Timestamp)].toDF("id", "ts")
    t.merge(Seq(("k1", "cart", 10, ts(100)), ("k2", "cart", 20, ts(100)))
      .toDF("id", "event", "amount", "ts"), noGuardedDeletes, batchId = 0)
    // late update of k1 (older ts) must lose; fresh update of k2 must win
    t.merge(Seq(("k1", "cart", 11, ts(50)), ("k2", "cart", 22, ts(200)))
      .toDF("id", "event", "amount", "ts"), noGuardedDeletes, batchId = 1,
      guardTs = Some("ts"))
    val got = t.scan().select($"id", $"amount").as[(String, Int)].collect().toMap
    assert(got === Map("k1" -> 10, "k2" -> 22))
  }

  test("non-string, non-integral PK types are still rejected") {
    val bad = StructType(Seq(StructField("id", DoubleType), StructField("v", IntegerType)))
    val e = intercept[IllegalArgumentException] {
      TransactionalTable.create(spark, tmpDir("spk-bad"), bad, "id", None)
    }
    assert(e.getMessage.contains("integral"))
  }
}
