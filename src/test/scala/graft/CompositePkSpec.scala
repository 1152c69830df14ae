package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.table.{MergeMode, TransactionalTable}

/** Composite primary keys (pk = "region,id"): every row-correct operation
  * joins on all member columns; the manifest machinery runs in the
  * xxhash64(region, id) key domain. The two keys sharing one member value
  * are the trap: masking/merging on a single column would corrupt them.
  */
class CompositePkSpec extends SparkSpec {
  import spark.implicits._

  private val sch = StructType(Seq(
    StructField("region", StringType), StructField("id", LongType),
    StructField("v", DoubleType)))

  private def noDel = spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
    StructType(Seq(StructField("region", StringType), StructField("id", LongType))))

  private def mk(prefix: String): TransactionalTable =
    TransactionalTable.create(spark, tmpDir(prefix) + "/t", sch, "region,id")

  private def state(t: TransactionalTable): Set[(String, Long, Double)] =
    t.scan().select("region", "id", "v").as[(String, Long, Double)].collect().toSet

  // batch 0: four rows — ("eu",1) and ("us",1) share id; ("eu",2) shares region
  // batch 1: update ("eu",1), delete ("us",1) — the shared-member twins of
  // each must survive untouched.
  private def applyScenario(t: TransactionalTable, mode: MergeMode): Unit = {
    t.merge(Seq(("eu", 1L, 1.0), ("us", 1L, 2.0), ("eu", 2L, 3.0), ("us", 2L, 4.0))
      .toDF("region", "id", "v"), noDel, batchId = 0, mode)
    t.merge(Seq(("eu", 1L, 10.0)).toDF("region", "id", "v"),
      Seq(("us", 1L)).toDF("region", "id"), batchId = 1, mode)
  }

  private val expected = Set(("eu", 1L, 10.0), ("eu", 2L, 3.0), ("us", 2L, 4.0))

  test("composite merge end state identical across CoW, MOR-equality and MOR-positional") {
    for (mode <- Seq(MergeMode.CopyOnWrite, MergeMode.MergeOnRead,
        MergeMode.MergeOnReadPositional)) {
      val t = mk(s"cpk-$mode")
      applyScenario(t, mode)
      if (mode != MergeMode.CopyOnWrite)
        assert(t.snapshot.deletes.nonEmpty, s"test premise: pending deletes under $mode")
      assert(state(t) === expected, s"mode=$mode")
    }
  }

  test("changes() diffs composite tables correctly") {
    val t = mk("cpk-chg")
    t.merge(Seq(("eu", 1L, 1.0), ("us", 1L, 2.0)).toDF("region", "id", "v"),
      noDel, batchId = 0, MergeMode.MergeOnRead)
    val v1 = t.currentVersion
    t.merge(Seq(("eu", 1L, 10.0)).toDF("region", "id", "v"),
      Seq(("us", 1L)).toDF("region", "id"), batchId = 1, MergeMode.MergeOnRead)
    val diff = t.changes(v1, t.currentVersion)
      .select("region", "id", "v", "_change_type")
      .as[(String, Long, Double, String)].collect().toSet
    assert(diff === Set(("eu", 1L, 1.0, "delete"), ("eu", 1L, 10.0, "insert"),
      ("us", 1L, 2.0, "delete")))
  }

  test("hash-domain pruning: a merge far from a file's keys never plans it") {
    val t = mk("cpk-prune")
    t.merge((1L to 50L).map(i => ("aa", i, i.toDouble)).toDF("region", "id", "v"),
      noDel, batchId = 0)
    t.merge((1L to 50L).map(i => ("zz", i, i.toDouble)).toDF("region", "id", "v"),
      noDel, batchId = 1)
    val before = t.snapshot.files.map(_.path).toSet
    // merge touching ONLY ("aa", 7): bloom/range pruning in the hashed key
    // domain must rewrite at most the files that can contain that key
    t.merge(Seq(("aa", 7L, 700.0)).toDF("region", "id", "v"), noDel, batchId = 2)
    val carried = t.snapshot.files.map(_.path).toSet.intersect(before)
    assert(carried.nonEmpty, "far-key files must be carried, not rewritten")
    assert(state(t).contains(("aa", 7L, 700.0)))
    assert(state(t).contains(("zz", 7L, 7.0)), "shared-id twin untouched")
  }

  test("SQL over a composite-PK table: read, DELETE WHERE, UPDATE WHERE") {
    val w = tmpDir("cpk-wh")
    spark.conf.set("spark.sql.catalog.graft_cpk", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_cpk.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    val t = TransactionalTable.create(spark, s"$w/db/c", sch, "region,id")
    applyScenario(t, MergeMode.CopyOnWrite)
    val got = spark.sql("SELECT region, id, v FROM graft_cpk.db.c ORDER BY region, id")
      .as[(String, Long, Double)].collect().toSet
    assert(got === expected)
    spark.sql("DELETE FROM graft_cpk.db.c WHERE region = 'us'")
    assert(spark.sql("SELECT COUNT(*) FROM graft_cpk.db.c").as[Long].head() === 2L)
    spark.sql("UPDATE graft_cpk.db.c SET v = v + 100 WHERE id = 2")
    val after = spark.sql("SELECT region, id, v FROM graft_cpk.db.c")
      .as[(String, Long, Double)].collect().toSet
    assert(after === Set(("eu", 1L, 10.0), ("eu", 2L, 103.0)))
    // PK reassignment must be rejected
    intercept[UnsupportedOperationException] {
      spark.sql("UPDATE graft_cpk.db.c SET id = id + 1")
    }
  }

  test("SQL MERGE INTO over a composite key: full-key ON works, partial-key ON rejected") {
    val w = tmpDir("cpk-merge-wh")
    spark.conf.set("spark.sql.catalog.graft_cpm", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_cpm.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    val t = TransactionalTable.create(spark, s"$w/db/m", sch, "region,id")
    t.merge(Seq(("eu", 1L, 1.0), ("us", 1L, 2.0)).toDF("region", "id", "v"),
      noDel, batchId = 0)
    Seq(("eu", 1L, 10.0), ("ap", 3L, 30.0)).toDF("region", "id", "v")
      .createOrReplaceTempView("cpk_src")
    spark.sql("""MERGE INTO graft_cpm.db.m t USING cpk_src s
                 ON t.region = s.region AND t.id = s.id
                 WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")
    assert(state(TransactionalTable.open(spark, s"$w/db/m")) ===
      Set(("eu", 1L, 10.0), ("us", 1L, 2.0), ("ap", 3L, 30.0)),
      "the shared-id twin (us,1) must be untouched by the (eu,1) update")
    Seq(("us", 1L)).toDF("region", "id").createOrReplaceTempView("cpk_del")
    spark.sql("""MERGE INTO graft_cpm.db.m t USING cpk_del s
                 ON t.region = s.region AND t.id = s.id
                 WHEN MATCHED THEN DELETE""")
    assert(state(TransactionalTable.open(spark, s"$w/db/m")) ===
      Set(("eu", 1L, 10.0), ("ap", 3L, 30.0)))
    // a partial-key ON would silently mis-match — must be rejected loudly
    val ex = intercept[UnsupportedOperationException] {
      spark.sql("""MERGE INTO graft_cpm.db.m t USING cpk_src s ON t.id = s.id
                   WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")
    }
    assert(ex.getMessage.contains("full primary key"))
  }

  test("general N-clause MERGE over a composite key: clause precedence per full key") {
    val w = tmpDir("cpk-gen-wh")
    val cat = s"graft_cpg${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    val t = TransactionalTable.create(spark, s"$w/db/g", sch, "region,id")
    t.merge(Seq(("eu", 1L, 1.0), ("us", 1L, 2.0), ("eu", 2L, 5.0))
      .toDF("region", "id", "v"), noDel, batchId = 0)
    Seq(("eu", 1L, 100.0), ("us", 1L, 0.5), ("ap", 3L, 30.0), ("ap", 4L, -1.0))
      .toDF("region", "id", "v").createOrReplaceTempView("cpk_gen_src")
    spark.sql(
      s"""MERGE INTO $cat.db.g t USING cpk_gen_src s
         |ON t.region = s.region AND t.id = s.id
         |WHEN MATCHED AND s.v >= 50 THEN UPDATE SET t.v = s.v + 1
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED AND s.v > 0 THEN
         |  INSERT (region, id, v) VALUES (s.region, s.id, s.v)""".stripMargin)
    assert(state(TransactionalTable.open(spark, s"$w/db/g")) ===
      Set(("eu", 1L, 101.0), // first clause wins on (eu,1)
        ("eu", 2L, 5.0),     // untouched (not in source)
        ("ap", 3L, 30.0)),   // conditional insert; (us,1) deleted, (ap,4) no-op
      "composite-key general merge end state")
  }

  test("guarded merge on a composite key is rejected loudly") {
    val s2 = StructType(sch.fields :+ StructField("ts", TimestampType))
    val t = TransactionalTable.create(spark, tmpDir("cpk-guard") + "/t", s2, "region,id")
    val up = Seq(("eu", 1L, 1.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("region", "id", "v", "ts")
    val ex = intercept[IllegalArgumentException] {
      t.merge(up, up.select("region", "id", "ts"), batchId = 0, guardTs = Some("ts"))
    }
    assert(ex.getMessage.contains("single-column"))
  }

  test("compaction folds composite MOR deletes and keeps the end state") {
    val t = mk("cpk-compact")
    applyScenario(t, MergeMode.MergeOnRead)
    t.compact()
    assert(t.snapshot.deletes.isEmpty, "compaction must fold deletes in")
    assert(state(t) === expected)
  }
}
