package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.table.TransactionalTable

/** Write-distribution modes (Iceberg `write.distribution-mode` parity):
  * pre-write clustering so a partitioned bulk commit does not fan out to
  * tasks×partitions small files. See TransactionalTable.setWriteDistribution.
  */
class WriteDistributionSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("cat", StringType),
    StructField("v", IntegerType)))

  /** 8-task input spanning 4 category values — under `none` the writer may
    * produce up to 8×4 files; under `hash` exactly one per value. */
  private def input = (0L until 400L).map(i => (i, s"c${i % 4}", i.toInt))
    .toDF("id", "cat", "v").repartition(8)

  test("hash mode: one file per partition value per commit") {
    val root = tmpDir("wd-hash")
    val t = TransactionalTable.create(spark, root, schema, "id", Some("cat"))
    t.setWriteDistribution("hash")
    assert(t.writeDistribution === "hash")
    t.append(input)
    val files = t.snapshot.files
    assert(files.length === 4,
      s"hash distribution must write one file per partition value, got ${files.length}")
    assert(files.flatMap(_.partition).distinct.sorted === Seq("c0", "c1", "c2", "c3"))
    // clustering must not change WHAT is written
    assert(t.scan().select("id", "cat", "v").orderBy("id").as[(Long, String, Int)].collect().toSeq ===
      (0L until 400L).map(i => (i, s"c${i % 4}", i.toInt)))
  }

  test("none mode fans out, hash mode does not (the small-files contrast)") {
    val root = tmpDir("wd-none")
    val t = TransactionalTable.create(spark, root, schema, "id", Some("cat"))
    t.append(input) // default `none`
    assert(t.snapshot.files.length > 4,
      "control: an 8-task 4-value batch under `none` must produce >4 files " +
        s"(got ${t.snapshot.files.length}) — otherwise the hash test proves nothing")
  }

  test("range mode on an unpartitioned table: disjoint per-file pk ranges") {
    val root = tmpDir("wd-range")
    val t = TransactionalTable.create(spark, root, schema, "id", None)
    t.setWriteDistribution("range")
    // shuffled input: without the range exchange, per-file pk ranges overlap
    t.append(input.orderBy(rand(seed = 7)).repartition(8))
    val ranges = t.snapshot.files.map(f => (f.pkMin, f.pkMax)).sortBy(_._1)
    assert(ranges.nonEmpty)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) =>
        assert(hi < lo, s"file pk ranges must be disjoint under range mode: $ranges")
      case _ => ()
    }
    assert(t.scan().select("id", "cat", "v").orderBy("id").as[(Long, String, Int)].collect().toSeq ===
      (0L until 400L).map(i => (i, s"c${i % 4}", i.toInt)))
  }

  test("SQL surface: ALTER TABLE SET TBLPROPERTIES('write.distribution')") {
    val w = tmpDir("wd-warehouse")
    spark.conf.set("spark.sql.catalog.graft_wdist", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_wdist.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    spark.sql(
      """CREATE TABLE graft_wdist.db.ev (event_id BIGINT, cat STRING, val INT)
        |PARTITIONED BY (cat) TBLPROPERTIES ('pk'='event_id')""".stripMargin)
    spark.sql(
      "ALTER TABLE graft_wdist.db.ev SET TBLPROPERTIES('write.distribution'='hash')")
    val t = TransactionalTable.open(spark, s"$w/db/ev")
    assert(t.writeDistribution === "hash")
    (0 until 64).map(i => (i.toLong, s"k${i % 3}", i))
      .toDF("event_id", "cat", "val").repartition(8)
      .createOrReplaceTempView("wd_src")
    spark.sql("INSERT INTO graft_wdist.db.ev SELECT * FROM wd_src")
    val t2 = TransactionalTable.open(spark, s"$w/db/ev")
    assert(t2.snapshot.files.length === 3, "one file per `cat` value under hash mode")
    assert(spark.sql("SELECT COUNT(*) FROM graft_wdist.db.ev").as[Long].head() === 64L)
    // bad mode rejected loudly
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE graft_wdist.db.ev SET TBLPROPERTIES('write.distribution'='zorder')"))
    assert(e.getMessage.contains("none|hash|range"))
  }

  test("max-records-per-file: hash mode's hot value rolls into bounded files") {
    val root = tmpDir("wd-cap")
    val t = TransactionalTable.create(spark, root, schema, "id", Some("cat"))
    t.setWriteDistribution("hash")
    t.setMaxRecordsPerFile(30)
    assert(t.maxRecordsPerFile === 30L)
    t.append(input) // 400 rows over 4 values = 100 rows/value, cap 30 → 4 files each
    val files = t.snapshot.files
    assert(files.forall(_.rows <= 30L),
      s"every file must respect the cap, got ${files.map(_.rows)}")
    val byValue = files.groupBy(_.partition)
    assert(byValue.size === 4 && byValue.values.forall(_.size === 4),
      s"100 rows/value at cap 30 rolls to 4 files per value, got ${byValue.view.mapValues(_.size).toMap}")
    assert(t.scan().count() === 400L)
    // clearing the cap restores one file per value
    t.setMaxRecordsPerFile(0)
    t.append(input)
    val second = t.snapshot.files.filterNot(files.toSet)
    assert(second.length === 4, s"uncapped hash append writes 4 files, got ${second.length}")
  }

  test("SQL surface: TBLPROPERTIES('write.max-records-per-file')") {
    val w = tmpDir("wd-cap-wh")
    spark.conf.set("spark.sql.catalog.graft_wcap", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_wcap.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    spark.sql(
      """CREATE TABLE graft_wcap.db.t (id BIGINT, v INT)
        |TBLPROPERTIES ('pk'='id')""".stripMargin)
    spark.sql(
      "ALTER TABLE graft_wcap.db.t SET TBLPROPERTIES('write.max-records-per-file'='25')")
    val t = TransactionalTable.open(spark, s"$w/db/t")
    assert(t.maxRecordsPerFile === 25L)
    t.append((0L until 100L).map(i => (i, i.toInt)).toDF("id", "v").coalesce(1))
    assert(t.snapshot.files.length === 4 && t.snapshot.files.forall(_.rows <= 25L),
      s"one 100-row task at cap 25 rolls to 4 files, got ${t.snapshot.files.map(_.rows)}")
  }

  test("write.sort-order: rows within each file follow the declared order") {
    val root = tmpDir("wd-sort")
    val t = TransactionalTable.create(spark, root, schema, "id", None)
    t.setSortOrder("v desc")
    assert(t.sortOrder === "v desc")
    // deliberately scrambled input: without the order, file row order is
    // insertion order (ids ascending → v ascending)
    t.append((0L until 300L).map(i => (i, s"c${i % 4}", i.toInt)).toDF("id", "cat", "v")
      .coalesce(2))
    t.snapshot.files.foreach { f =>
      val vs = spark.read.parquet(f.path).select($"v").as[Int].collect().toSeq
      assert(vs === vs.sorted(Ordering[Int].reverse),
        s"file ${f.path} not sorted v desc: ${vs.take(8)}...")
    }
    // content unchanged
    assert(t.scan().count() === 300)

    // invalid specs rejected at set time
    intercept[IllegalArgumentException](t.setSortOrder("nope desc"))
    intercept[IllegalArgumentException](t.setSortOrder("v sideways"))
    // clearing restores default pk clustering
    t.setSortOrder("")
    assert(t.sortOrder === "")
  }

  test("write.sort-order survives a dropped column (lenient write, no wedge)") {
    val root = tmpDir("wd-sort-drop")
    val t = TransactionalTable.create(spark, root, schema, "id", None)
    t.setSortOrder("v desc, cat")
    val t2 = t.dropColumn("v") // the leading sort column vanishes
    t2.append((0L until 50L).map(i => (i, s"c${i % 4}")).toDF("id", "cat"))
    assert(t2.scan().count() === 50, "write must degrade, not fail")
    // surviving term still applies within files
    t2.snapshot.files.foreach { f =>
      val cs = spark.read.parquet(f.path).select($"cat").as[String].collect().toSeq
      assert(cs === cs.sorted, s"surviving sort term 'cat' not applied")
    }
  }

  test("SQL surface: TBLPROPERTIES('write.sort-order')") {
    val w = tmpDir("wd-sort-wh")
    spark.conf.set("spark.sql.catalog.graft_wso", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_wso.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    spark.sql(
      """CREATE TABLE graft_wso.db.t (id BIGINT, ts BIGINT, v INT)
        |TBLPROPERTIES ('pk'='id')""".stripMargin)
    spark.sql("ALTER TABLE graft_wso.db.t SET TBLPROPERTIES('write.sort-order'='ts desc')")
    val t = TransactionalTable.open(spark, s"$w/db/t")
    assert(t.sortOrder === "ts desc")
    t.append((0L until 100L).map(i => (i, (i * 37) % 100, i.toInt))
      .toDF("id", "ts", "v").coalesce(1))
    val f = t.snapshot.files.head
    val ts = spark.read.parquet(f.path).select($"ts").as[Long].collect().toSeq
    assert(ts === ts.sorted(Ordering[Long].reverse))
  }

  test("schema evolution carries the mode forward (metadata rewrite keeps it)") {
    val root = tmpDir("wd-evolve")
    val t = TransactionalTable.create(spark, root, schema, "id", Some("cat"))
    t.setWriteDistribution("range")
    t.setMaxRecordsPerFile(1000)
    val t2 = t.addColumn("extra", IntegerType)
    assert(t2.writeDistribution === "range",
      "addColumn rewrites _table.json and must preserve write.distribution")
    assert(TransactionalTable.open(spark, root).writeDistribution === "range")
    assert(TransactionalTable.open(spark, root).maxRecordsPerFile === 1000L,
      "addColumn must also preserve write.max-records-per-file")
  }
}
