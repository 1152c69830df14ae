package graft

import graft.cdc.Cdc
import graft.fixtures.CdcFixtures
import graft.stream.CdcPipeline
import graft.table.TransactionalTable

/** DSv2 catalog: SQL front door over TransactionalTable (SELECT, COUNT,
  * VERSION AS OF time travel, SHOW TABLES), snapshot-consistent reads. */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse = {
    val w = tmpDir("graft-warehouse")
    spark.conf.set("spark.sql.catalog.graft_cs", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_cs.warehouse", w)
    val root = s"$w/db/retail"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    val t = TransactionalTable.create(spark, root, Cdc.tableSchema, Cdc.PrimaryKey,
      Some(Cdc.PartitionColumn))
    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario1Lines, batchId = 0)
    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario2Lines, batchId = 1)
    w
  }

  test("SELECT through the catalog matches the golden end state") {
    warehouse
    val ids = spark.sql("SELECT trans_id FROM graft_cs.db.retail ORDER BY trans_id")
      .as[Long].collect().toSeq
    assert(ids === CdcFixtures.expectedEndState.map(_._1))
    val cnt = spark.sql("SELECT COUNT(*) AS c FROM graft_cs.db.retail").as[Long].head()
    assert(cnt === 12L)
  }

  test("CacheManager matches independent reads of one snapshot; a commit breaks the match") {
    // GraftSqlTable's VALUE equality (root, snapshot version): caching one
    // read must accelerate a separately analyzed identical read, and a new
    // commit must MISS the cache (version-in-identity), never serve stale.
    val cat = s"graft_cs_cc${System.nanoTime()}"
    val w = tmpDir("graft-warehouse-cc")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    TransactionalTable.create(spark, s"$w/db/t",
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v BIGINT"), "id", None)
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 10), (2, 20)")
    val a = spark.sql(s"SELECT id, v FROM $cat.db.t")
    a.cache(); a.collect()
    try {
      val b = spark.sql(s"SELECT id, v FROM $cat.db.t")
      assert(b.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"),
        "independent read of the same snapshot must hit the cache")
      spark.sql(s"INSERT INTO $cat.db.t VALUES (3, 30)")
      val c = spark.sql(s"SELECT id, v FROM $cat.db.t")
      assert(!c.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"),
        "a new commit must MISS the cache, not serve the old snapshot")
      assert(c.count() === 3L)
    } finally a.unpersist()
  }

  test("VERSION AS OF time travel through SQL") {
    warehouse
    val v1 = spark.sql("SELECT trans_id FROM graft_cs.db.retail VERSION AS OF 1 ORDER BY trans_id")
      .as[Long].collect().toSeq
    assert(v1 === Seq(6L, 19L, 21L, 23L, 24L, 27L, 28L, 30L, 33L, 35L))
  }

  test("filter pushdown reaches the parquet scan via the catalog") {
    warehouse
    val df = spark.sql("SELECT trans_id FROM graft_cs.db.retail WHERE event = 'cart'")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("cart"),
      s"expected pushed filter in:\n$plan")
    assert(df.as[Long].collect().sorted.toSeq === Seq(21L, 30L))
  }

  test("manifest-level file pruning: filtered SQL never touches out-of-range files") {
    val w = tmpDir("graft-prune-warehouse")
    spark.conf.set("spark.sql.catalog.graft_pr", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_pr.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    val t = TransactionalTable.create(spark, s"$w/db/retail", Cdc.tableSchema,
      Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario1Lines, batchId = 0)
    val far =
      """{"data": {"trans_id": 1000000, "customer_id": "z", "event": "visit", "sku": "Z", "amount": 1, "device": "pc", "trans_datetime": "2023-01-16T06:00:00Z"}, "metadata": {"timestamp": "2023-01-16T06:00:00.000001Z", "record-type": "data", "operation": "insert", "partition-key-type": "primary-key", "schema-name": "testdb", "table-name": "t", "transaction-id": 99}}"""
    CdcPipeline.replayLines(spark, t, Seq(far), batchId = 1)

    // destroy the far-key file on disk: only manifest pruning can save a
    // filtered query from touching it
    val farFile = t.snapshot.files.find(_.pkMin >= 1000000L).get
    java.nio.file.Files.delete(java.nio.file.Paths.get(farFile.path))

    val amount = spark.sql(
      "SELECT amount FROM graft_pr.db.retail WHERE trans_id = 21").as[Int].collect().toSeq
    assert(amount === Seq(77), "PK-range pruning must skip the destroyed file")
    val cartCount = spark.sql(
      "SELECT COUNT(*) FROM graft_pr.db.retail WHERE event = 'cart'").as[Long].head()
    assert(cartCount === 4L, "partition pruning must skip the destroyed 'visit' file")
    // sanity: an unfiltered DATA scan does need the destroyed file (COUNT(*)
    // won't do here — it is answered from the manifest without file I/O)
    intercept[Exception] {
      spark.sql("SELECT SUM(amount) FROM graft_pr.db.retail").as[Long].head()
    }
  }

  test("column-stats pruning: non-PK predicates skip out-of-range files") {
    import org.apache.spark.sql.types._
    val w = tmpDir("graft-colstats-warehouse")
    spark.conf.set("spark.sql.catalog.graft_cst", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_cst.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("amount", IntegerType), StructField("ts", TimestampType)))
    val t = TransactionalTable.create(spark, s"$w/db/m", schema, "id")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // two files with overlapping PK ranges but disjoint amount/ts ranges
    t.append(Seq((1L, 10, ts("2024-01-01 00:00:00")), (3L, 20, ts("2024-01-02 00:00:00")))
      .toDF("id", "amount", "ts").coalesce(1))
    t.append(Seq((2L, 500, ts("2024-06-01 00:00:00")), (4L, 600, ts("2024-06-02 00:00:00")))
      .toDF("id", "amount", "ts").coalesce(1))
    val lowFile = t.snapshot.files.find(_.stats.get("amount").exists(_._2 <= 20)).get
    assert(lowFile.stats.contains("amount") && lowFile.stats.contains("ts"),
      "manifest must carry non-PK column stats")
    // destroy the low-amount file: only column-stats pruning saves these
    java.nio.file.Files.delete(java.nio.file.Paths.get(lowFile.path))
    val hi = spark.sql("SELECT id FROM graft_cst.db.m WHERE amount > 100 ORDER BY id")
      .as[Long].collect().toSeq
    assert(hi === Seq(2L, 4L), "amount-range pruning must skip the destroyed file")
    val recent = spark.sql(
      "SELECT id FROM graft_cst.db.m WHERE ts >= TIMESTAMP '2024-05-01 00:00:00' ORDER BY id")
      .as[Long].collect().toSeq
    assert(recent === Seq(2L, 4L), "timestamp-range pruning must skip the destroyed file")
    // a predicate the destroyed file COULD match still needs it → loud error
    intercept[Exception] {
      spark.sql("SELECT id FROM graft_cst.db.m WHERE amount < 100").collect()
    }
  }

  test("bloom pruning on the SQL path: point lookups skip range-overlapping files") {
    import org.apache.spark.sql.types._
    val w = tmpDir("graft-bloomsql-warehouse")
    spark.conf.set("spark.sql.catalog.graft_bs", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_bs.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", LongType)))
    val t = TransactionalTable.create(spark, s"$w/db/m", schema, "id")
    // two files with FULLY overlapping [min,max] but disjoint key sets —
    // range stats alone cannot separate them, only the bloom can
    t.append((0L until 100L by 2).map((_, 0L)).toDF("id", "v").coalesce(1)) // evens
    t.append((1L until 100L by 2).map((_, 1L)).toDF("id", "v").coalesce(1)) // odds
    val Seq(fEven, fOdd) = t.snapshot.files.sortBy(_.pkMin).toSeq
    assert(fEven.bloom.isDefined && fOdd.bloom.isDefined)
    java.nio.file.Files.delete(java.nio.file.Paths.get(fOdd.path))
    // even-key point lookup: must answer without touching the destroyed odd file
    val got = spark.sql("SELECT v FROM graft_bs.db.m WHERE id = 42").as[Long].collect().toSeq
    assert(got === Seq(0L), "bloom-pruned point lookup must skip the destroyed file")
    // an odd key genuinely needs the destroyed file → loud error, not empty
    intercept[Exception] {
      spark.sql("SELECT v FROM graft_bs.db.m WHERE id = 43").collect()
    }
  }

  test("COUNT(*) is answered from the manifest, not a data scan") {
    warehouse
    val df = spark.sql("SELECT COUNT(*) AS c FROM graft_cs.db.retail")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"), s"expected manifest-folded count in:\n$plan")
    assert(!plan.contains("Parquet"), s"count(*) must not scan files:\n$plan")
    assert(df.as[Long].head() === 12L)
    // snapshot-exact under time travel
    assert(spark.sql("SELECT COUNT(*) AS c FROM graft_cs.db.retail VERSION AS OF 1")
      .as[Long].head() === 10L)
    // a filter on the IDENTITY partition column selects whole files, so the
    // count is still a manifest fold (per-file row sums — Iceberg
    // metadata-aggregate parity), including IN lists
    val filtered = spark.sql(
      "SELECT COUNT(*) AS c FROM graft_cs.db.retail WHERE event = 'cart'")
    assert(filtered.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      s"partition-filtered count must fold:\n${filtered.queryExecution.executedPlan}")
    assert(filtered.as[Long].head() === 2L)
    val inList = spark.sql(
      "SELECT COUNT(*) AS c FROM graft_cs.db.retail WHERE event IN ('cart', 'like')")
    assert(inList.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(inList.as[Long].head() === 6L)
    // a NON-partition filter depends on data — no fold
    val byAmount = spark.sql(
      "SELECT COUNT(*) AS c FROM graft_cs.db.retail WHERE amount > 50")
    assert(!byAmount.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    // a mixed filter (partition AND data column) — no fold either
    val mixed = spark.sql(
      "SELECT COUNT(*) AS c FROM graft_cs.db.retail WHERE event = 'cart' AND amount > 0")
    assert(!mixed.queryExecution.executedPlan.toString.contains("LocalTableScan"))
  }

  test("MIN/MAX are answered from manifest column stats, not a data scan") {
    warehouse
    val df = spark.sql(
      "SELECT COUNT(*) AS c, MIN(trans_id) AS mn, MAX(trans_id) AS mx, " +
        "MAX(amount) AS ma FROM graft_cs.db.retail")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"), s"expected manifest-folded agg in:\n$plan")
    assert(!plan.contains("Parquet"), s"min/max must not scan files:\n$plan")
    val r = df.head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)) === ((12L, 19L, 47L, 85)))
    // snapshot-exact under time travel
    assert(spark.sql("SELECT MAX(trans_id) AS mx FROM graft_cs.db.retail VERSION AS OF 1")
      .as[Long].head() === 35L)
    // a string column has no manifest range — data scan, still correct
    val s = spark.sql("SELECT MIN(event) AS e FROM graft_cs.db.retail")
    assert(!s.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(s.as[String].head() === "cart")
    // an IDENTITY-partition filter selects whole files → MIN/MAX still fold
    // from the matching files' manifest stats (mixed COUNT+MAX too)
    val filtered = spark.sql(
      "SELECT COUNT(*) AS c, MAX(trans_id) AS mx FROM graft_cs.db.retail " +
        "WHERE event = 'cart'")
    assert(filtered.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      s"partition-filtered MAX must fold:\n${filtered.queryExecution.executedPlan}")
    assert(filtered.as[(Long, Long)].head() === ((2L, 30L)))
    // a non-partition filter still scans
    val byData = spark.sql(
      "SELECT MAX(trans_id) AS mx FROM graft_cs.db.retail WHERE amount > 50")
    assert(!byData.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    // empty matching partition set → NULL bound, 0 count, still folded
    val none = spark.sql(
      "SELECT COUNT(*) AS c, MAX(trans_id) AS mx FROM graft_cs.db.retail " +
        "WHERE event = 'no_such_event'")
    assert(none.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    val nr = none.head()
    assert(nr.getLong(0) === 0L && nr.isNullAt(1))
    // timestamps fold too (footer INT64 µs ≡ catalyst micros)
    val ts = spark.sql("SELECT MIN(trans_datetime) AS t FROM graft_cs.db.retail")
    assert(ts.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(ts.selectExpr("date_format(t, 'yyyy-MM-dd HH:mm:ss')").as[String].head()
      === "2023-01-16 06:00:02")
  }

  test("DSv2 scan reports exact manifest statistics (rowCount + bytes)") {
    warehouse
    val st = spark.sql("SELECT * FROM graft_cs.db.retail")
      .queryExecution.optimizedPlan.stats
    assert(st.rowCount.contains(BigInt(12)),
      s"exact manifest row count must reach the planner, got ${st.rowCount}")
    assert(st.sizeInBytes > 0)
  }

  test("runtime filtering: a broadcast join prunes fact files by the dim key set") {
    val w = tmpDir("graft-rf-warehouse")
    spark.conf.set("spark.sql.catalog.graft_rf", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_rf.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    val t = TransactionalTable.create(spark, s"$w/db/retail", Cdc.tableSchema,
      Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario1Lines, batchId = 0)

    // destroy every file of the 'visit' partition: only join-time pruning
    // (the broadcast dim's key set arriving as an IN runtime filter) can
    // keep the scan from opening it — there is no static fact-side filter
    val destroyed = t.snapshot.files.filter(_.partition.contains("visit"))
    assert(destroyed.nonEmpty, "test premise: a visit-partition file exists")
    destroyed.foreach(f => java.nio.file.Files.delete(java.nio.file.Paths.get(f.path)))

    // the dim must be a REAL source: a literal VALUES view constant-folds to
    // a LocalRelation and leaves no selective filter for DPP to latch onto
    val dimSch = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("tag",
        org.apache.spark.sql.types.StringType)))
    val dim = TransactionalTable.create(spark, s"$w/db/dim", dimSch, "event")
    dim.append(Seq(("cart", "keep"), ("like", "keep"), ("visit", "drop"))
      .toDF("event", "tag"))
    val df = spark.sql(
      """SELECT f.trans_id FROM graft_rf.db.retail f
        |JOIN graft_rf.db.dim d ON f.event = d.event WHERE d.tag = 'keep'""".stripMargin)
    val got = df.as[Long].collect().sorted.toSeq
    assert(got === Seq(21L, 23L, 27L, 30L, 33L, 35L),
      "runtime-filtered join must return exactly the cart/like rows")
    assert(df.queryExecution.executedPlan.toString.contains("dynamicpruningexpression"),
      "the fact scan must carry the dim key set as a runtime filter")

    // PK path: the runtime IN filter prunes by manifest PK range ∧ bloom too.
    // A far-key commit lands in its own file; destroy it; a join keyed to the
    // low range must never open it.
    val far = TransactionalTable.open(spark, s"$w/db/retail")
    far.append(Seq((1000000L, "z", "visit", "Z", 1, "pc",
      new java.sql.Timestamp(0L))).toDF(Cdc.tableSchema.fieldNames.toIndexedSeq: _*))
    val farFiles = far.snapshot.files.filter(_.pkMin >= 1000000L)
    assert(farFiles.nonEmpty, "test premise: the far key got its own file")
    farFiles.foreach(f => java.nio.file.Files.delete(java.nio.file.Paths.get(f.path)))
    val keys = TransactionalTable.create(spark, s"$w/db/keys",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("tag",
          org.apache.spark.sql.types.StringType))), "id")
    keys.append(Seq((21L, "keep"), (27L, "keep"), (999L, "drop")).toDF("id", "tag"))
    val pkJoin = spark.sql(
      """SELECT f.trans_id FROM graft_rf.db.retail f
        |JOIN graft_rf.db.keys k ON f.trans_id = k.id WHERE k.tag = 'keep'""".stripMargin)
    assert(pkJoin.as[Long].collect().sorted.toSeq === Seq(21L, 27L),
      "PK-keyed runtime filter must skip the destroyed far-range file")
  }

  test("hidden partitioning days(ts): DDL + write-side derivation + destroyed-file pruning") {
    val w = tmpDir("graft-hp-warehouse")
    spark.conf.set("spark.sql.catalog.graft_hp", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_hp.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    spark.sql(
      """CREATE TABLE graft_hp.db.ev (event_id BIGINT, ts TIMESTAMP, val INT)
        |PARTITIONED BY (days(ts)) TBLPROPERTIES ('pk'='event_id')""".stripMargin)
    spark.sql(
      """INSERT INTO graft_hp.db.ev VALUES
        |  (1, TIMESTAMP '2024-01-01 01:00:00', 10),
        |  (2, TIMESTAMP '2024-01-01 23:00:00', 20),
        |  (3, TIMESTAMP '2024-01-02 01:00:00', 30),
        |  (4, TIMESTAMP '2024-01-03 05:00:00', 40)""".stripMargin)
    val t = TransactionalTable.open(spark, s"$w/db/ev")
    // write-side derivation: epoch-day partition values (2024-01-01 = 19723)
    assert(t.snapshot.files.flatMap(_.partition).distinct.sorted ===
      Seq("19723", "19724", "19725"))
    // destroy day 19723's files: only pruning can answer later-day queries
    t.snapshot.files.filter(_.partition.contains("19723"))
      .foreach(f => java.nio.file.Files.delete(java.nio.file.Paths.get(f.path)))
    val later = spark.sql(
      """SELECT event_id FROM graft_hp.db.ev
        |WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' ORDER BY event_id""".stripMargin)
      .as[Long].collect().toSeq
    assert(later === Seq(3L, 4L), "day-range pruning must skip the destroyed day")
    val point = spark.sql(
      "SELECT val FROM graft_hp.db.ev WHERE ts = TIMESTAMP '2024-01-02 01:00:00'")
      .as[Int].collect().toSeq
    assert(point === Seq(30), "ts-equality pruning must skip the destroyed day")
    // a scan that genuinely needs the destroyed day fails loudly
    intercept[Exception] {
      spark.sql("SELECT SUM(val) FROM graft_hp.db.ev").as[Long].head()
    }
  }

  test("hidden partitioning months(ts)/years(ts): derivation + destroyed-file pruning") {
    val w = tmpDir("graft-hm-warehouse")
    spark.conf.set("spark.sql.catalog.graft_hm", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_hm.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    spark.sql(
      """CREATE TABLE graft_hm.db.ev (event_id BIGINT, ts TIMESTAMP, val INT)
        |PARTITIONED BY (months(ts)) TBLPROPERTIES ('pk'='event_id')""".stripMargin)
    spark.sql(
      """INSERT INTO graft_hm.db.ev VALUES
        |  (1, TIMESTAMP '2024-01-05 01:00:00', 10),
        |  (2, TIMESTAMP '2024-01-31 23:00:00', 20),
        |  (3, TIMESTAMP '2024-02-01 00:30:00', 30),
        |  (4, TIMESTAMP '2024-03-15 05:00:00', 40),
        |  (5, TIMESTAMP '1969-12-31 22:00:00', 50)""".stripMargin)
    val t = TransactionalTable.open(spark, s"$w/db/ev")
    // months since 1970-01: 2024-01 = 648, 2024-02 = 649, 2024-03 = 650,
    // 1969-12 = -1 (pre-epoch floors DOWN, not toward zero)
    assert(t.snapshot.files.flatMap(_.partition).distinct.sorted ===
      Seq("-1", "648", "649", "650"))
    // destroy January's file: only month pruning can answer later months
    t.snapshot.files.filter(_.partition.contains("648"))
      .foreach(f => java.nio.file.Files.delete(java.nio.file.Paths.get(f.path)))
    val later = spark.sql(
      """SELECT event_id FROM graft_hm.db.ev
        |WHERE ts >= TIMESTAMP '2024-02-01 00:00:00' ORDER BY event_id""".stripMargin)
      .as[Long].collect().toSeq
    assert(later === Seq(3L, 4L), "month-range pruning must skip the destroyed month")
    val point = spark.sql(
      "SELECT val FROM graft_hm.db.ev WHERE ts = TIMESTAMP '2024-03-15 05:00:00'")
      .as[Int].collect().toSeq
    assert(point === Seq(40), "ts-equality pruning must skip the destroyed month")
    intercept[Exception] { // a scan that needs the destroyed month fails loudly
      spark.sql("SELECT SUM(val) FROM graft_hm.db.ev").as[Long].head()
    }
    // years(ts): same table shape, year ordinals since 1970
    spark.sql(
      """CREATE TABLE graft_hm.db.ev2 (event_id BIGINT, ts TIMESTAMP, val INT)
        |PARTITIONED BY (years(ts)) TBLPROPERTIES ('pk'='event_id')""".stripMargin)
    spark.sql(
      """INSERT INTO graft_hm.db.ev2 VALUES
        |  (1, TIMESTAMP '2023-06-01 00:00:00', 1),
        |  (2, TIMESTAMP '2024-06-01 00:00:00', 2)""".stripMargin)
    val t2 = TransactionalTable.open(spark, s"$w/db/ev2")
    assert(t2.snapshot.files.flatMap(_.partition).distinct.sorted === Seq("53", "54"))
    t2.snapshot.files.filter(_.partition.contains("53"))
      .foreach(f => java.nio.file.Files.delete(java.nio.file.Paths.get(f.path)))
    assert(spark.sql(
      "SELECT val FROM graft_hm.db.ev2 WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'")
      .as[Int].collect().toSeq === Seq(2), "year pruning must skip the destroyed year")
  }

  test("hidden partitioning truncate(w, col): integral floor-multiples and string prefixes prune") {
    val w = tmpDir("graft-ht-warehouse")
    spark.conf.set("spark.sql.catalog.graft_ht", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_ht.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    // integral truncate: val floors to the nearest multiple of 100
    // (negatives floor DOWN — Iceberg truncate semantics)
    spark.sql(
      """CREATE TABLE graft_ht.db.t (id BIGINT, amount BIGINT, val INT)
        |PARTITIONED BY (truncate(100, amount)) TBLPROPERTIES ('pk'='id')""".stripMargin)
    spark.sql(
      """INSERT INTO graft_ht.db.t VALUES
        |  (1, 7, 10), (2, 142, 20), (3, 299, 30), (4, -5, 40)""".stripMargin)
    val t = TransactionalTable.open(spark, s"$w/db/t")
    assert(t.snapshot.files.flatMap(_.partition).distinct.sorted ===
      Seq("-100", "0", "100", "200"))
    // destroy every partition except amount=142's: equality AND range prune
    t.snapshot.files.filterNot(_.partition.contains("100"))
      .foreach(f => java.nio.file.Files.delete(java.nio.file.Paths.get(f.path)))
    assert(spark.sql("SELECT val FROM graft_ht.db.t WHERE amount = 142")
      .as[Int].collect().toSeq === Seq(20), "truncate equality pruning")
    assert(spark.sql(
      "SELECT val FROM graft_ht.db.t WHERE amount >= 100 AND amount < 200")
      .as[Int].collect().toSeq === Seq(20), "truncate range pruning (ordered transform)")
    intercept[Exception] {
      spark.sql("SELECT SUM(val) FROM graft_ht.db.t").as[Long].head()
    }
    // string truncate: first-w-chars prefix partitions; a non-PK string
    // column has no stats, so only the transform can prune the lookup
    spark.sql(
      """CREATE TABLE graft_ht.db.s (id BIGINT, region STRING, val INT)
        |PARTITIONED BY (truncate(2, region)) TBLPROPERTIES ('pk'='id')""".stripMargin)
    spark.sql(
      """INSERT INTO graft_ht.db.s VALUES
        |  (1, 'eu-west-1', 10), (2, 'eu-north-1', 20),
        |  (3, 'us-east-1', 30), (4, 'ap-south-1', 40)""".stripMargin)
    val ts = TransactionalTable.open(spark, s"$w/db/s")
    assert(ts.snapshot.files.flatMap(_.partition).distinct.sorted ===
      Seq("ap", "eu", "us"))
    ts.snapshot.files.filterNot(_.partition.contains("us"))
      .foreach(f => java.nio.file.Files.delete(java.nio.file.Paths.get(f.path)))
    assert(spark.sql("SELECT val FROM graft_ht.db.s WHERE region = 'us-east-1'")
      .as[Int].collect().toSeq === Seq(30), "string-prefix pruning must skip destroyed prefixes")
    intercept[Exception] {
      spark.sql("SELECT SUM(val) FROM graft_ht.db.s").as[Long].head()
    }
  }

  test("hidden partitioning bucket(n, col) on a stats-free string column prunes point lookups") {
    val w = tmpDir("graft-hb-warehouse")
    spark.conf.set("spark.sql.catalog.graft_hb", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_hb.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    // bucket on a STRING non-PK column: the manifest carries no stats and no
    // bloom for it, so ONLY the bucket transform can prune these lookups.
    spark.sql(
      """CREATE TABLE graft_hb.db.ev (event_id BIGINT, device STRING, val INT)
        |PARTITIONED BY (bucket(4, device)) TBLPROPERTIES ('pk'='event_id')""".stripMargin)
    val devices = (0 until 32).map(i => (i.toLong, s"dev-$i", i * 10))
    devices.toDF("event_id", "device", "val").createOrReplaceTempView("hb_src")
    spark.sql("INSERT INTO graft_hb.db.ev SELECT * FROM hb_src")
    val t = TransactionalTable.open(spark, s"$w/db/ev")
    val parts = t.snapshot.files.flatMap(_.partition).distinct
    assert(parts.size > 1 && parts.forall(p => (0 until 4).map(_.toString).contains(p)),
      s"expected multiple hash buckets in 0..3, got $parts")
    // find dev-7's bucket via the engine's own write-side derivation
    val probe = Seq(("dev-7", 0)).toDF("device", "x")
      .select(graft.table.PartitionTransform.Bucket(4, "device").valueExpr.as("b"))
      .as[String].head()
    // destroy every OTHER bucket's files
    t.snapshot.files.filterNot(_.partition.contains(probe))
      .foreach(f => java.nio.file.Files.delete(java.nio.file.Paths.get(f.path)))
    val got = spark.sql("SELECT val FROM graft_hb.db.ev WHERE device = 'dev-7'")
      .as[Int].collect().toSeq
    assert(got === Seq(70), "bucket pruning must skip the destroyed buckets")
    intercept[Exception] { // full scan genuinely needs the destroyed buckets
      spark.sql("SELECT SUM(val) FROM graft_hb.db.ev").as[Long].head()
    }
  }

  test("analyzed NDV feeds CBO: low-NDV filter flips the join to broadcast") {
    val w = tmpDir("graft-ndv-warehouse")
    spark.conf.set("spark.sql.catalog.graft_nv", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_nv.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    // fact table: 2000 rows, join-hot g has NDV 4, padding inflates bytes
    spark.sql(
      """CREATE TABLE graft_nv.db.f (id BIGINT, g BIGINT, pad STRING)
        |TBLPROPERTIES ('pk'='id')""".stripMargin)
    (0 until 2000).map(i => (i.toLong, (i % 4).toLong, s"pad-$i-" + ("x" * 64)))
      .toDF("id", "g", "pad").createOrReplaceTempView("nv_src")
    spark.sql("INSERT INTO graft_nv.db.f SELECT * FROM nv_src")
    spark.sql(
      """CREATE TABLE graft_nv.db.d (id BIGINT, tag STRING, pad STRING)
        |TBLPROPERTIES ('pk'='id')""".stripMargin)
    (0 until 2000).map(i => (i.toLong, s"t$i", s"dpd-$i-" + ("y" * 64)))
      .toDF("id", "tag", "pad").createOrReplaceTempView("nv_src_d")
    spark.sql("INSERT INTO graft_nv.db.d SELECT * FROM nv_src_d")
    val fBytes = TransactionalTable.open(spark, s"$w/db/f").snapshot.files.map(_.bytes).sum
    val q = """SELECT f.id, d.tag FROM graft_nv.db.f f
              |JOIN graft_nv.db.d d ON f.id = d.id WHERE f.g = 1""".stripMargin
    val cboKeys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.planStats.enabled")
    try {
      cboKeys.foreach(k => spark.conf.set(k, "true"))
      // threshold between the FULL fact size and the g=1 quarter: without
      // NDV the filter cannot be estimated and both sides stay above it
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (fBytes / 2).toString)
      def strategy(): String = {
        val plan = spark.sql(q).queryExecution.sparkPlan.toString
        if (plan.contains("BroadcastHashJoin")) "broadcast"
        else if (plan.contains("SortMergeJoin")) "smj"
        else plan
      }
      assert(strategy() === "smj",
        "premise: without NDV stats the filtered fact side must not broadcast")
      val res = spark.sql("CALL graft_nv.system.analyze('db.f', 'g')").collect().head
      assert(res.getString(2) === "4", s"HLL NDV of a 4-value column must be 4: $res")
      // the scan now reports distinctCount → CBO estimates g=1 at ~1/4 of
      // the fact table → under the threshold → broadcast
      assert(strategy() === "broadcast",
        "analyzed NDV must flip the filtered fact side to a broadcast join")
      // and the recorded stat is visible in the optimized plan's attribute
      // stats (the planner's food, not just the file on disk): the bare
      // scan reports 4; after the g=1 filter CBO narrows it to 1
      val scanStat = spark.sql("SELECT * FROM graft_nv.db.f")
        .queryExecution.optimizedPlan.stats
        .attributeStats.find(_._1.name == "g").map(_._2)
      assert(scanStat.exists(_.distinctCount.exists(_.toLong == 4L)),
        s"scan attributeStats must carry distinctCount=4 for g, got $scanStat")
      val filteredStat = spark.sql("SELECT * FROM graft_nv.db.f WHERE g = 1")
        .queryExecution.optimizedPlan.stats
        .attributeStats.find(_._1.name == "g").map(_._2)
      assert(filteredStat.exists(_.distinctCount.exists(_.toLong == 1L)),
        s"equality filter must narrow the NDV estimate to 1, got $filteredStat")
    } finally {
      cboKeys.foreach(spark.conf.unset)
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("ManifestFileIndex prunes by transform alone (entries without stats)") {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, GreaterThanOrEqual, LessThan, Literal}
    import org.apache.spark.sql.graftshim.{ManifestEntry, ManifestFileIndex, PartitionTransformDesc}
    import org.apache.spark.sql.types._
    def entry(p: String, d: PartitionTransformDesc) = ManifestEntry(s"/nope/$p.parquet",
      Some(p), Long.MinValue, Long.MaxValue, 100L, stats = Map.empty, part = Some(d))
    val daysDesc = PartitionTransformDesc("days", "ts")
    val ts = AttributeReference("ts", TimestampType)()
    def microsOf(day: Long) = day * 86400000000L
    val daysIdx = new ManifestFileIndex(spark, ManifestFileIndex.chunksOf(
      Seq(entry("19723", daysDesc), entry("19725", daysDesc))), "id")
    def kept(idx: ManifestFileIndex, e: org.apache.spark.sql.catalyst.expressions.Expression) =
      idx.listFiles(Nil, Seq(e)).head.files.map(_.getPath.getName).toSeq
    assert(kept(daysIdx, GreaterThanOrEqual(ts, Literal(microsOf(19725L), TimestampType)))
      === Seq("19725.parquet"))
    assert(kept(daysIdx, LessThan(ts, Literal(microsOf(19724L), TimestampType)))
      === Seq("19723.parquet"))
    assert(kept(daysIdx, EqualTo(ts, Literal(microsOf(19723L) + 5L, TimestampType)))
      === Seq("19723.parquet"))
    // bucket: equality prunes to the literal's hash bucket, ranges keep all
    val dev = AttributeReference("device", StringType)()
    val bucketDesc = PartitionTransformDesc("bucket", "device", 4)
    val buckets = (0 until 4).map(b => entry(b.toString, bucketDesc))
    val bIdx = new ManifestFileIndex(spark, ManifestFileIndex.chunksOf(buckets), "id")
    val lit = Literal(org.apache.spark.unsafe.types.UTF8String.fromString("dev-7"), StringType)
    val keptB = kept(bIdx, EqualTo(dev, lit))
    assert(keptB.size === 1, s"bucket equality must keep exactly one bucket, got $keptB")
  }

  test("ALTER TABLE ADD COLUMN: merge → evolve → merge → unified scan; time travel intact") {
    val w = tmpDir("graft-evolve-warehouse")
    spark.conf.set("spark.sql.catalog.graft_ev", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_ev.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    val root = s"$w/db/retail"
    val t = TransactionalTable.create(spark, root, Cdc.tableSchema, Cdc.PrimaryKey,
      Some(Cdc.PartitionColumn))
    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario1Lines, batchId = 0)

    spark.sql("ALTER TABLE graft_ev.db.retail ADD COLUMN note STRING")

    // evolved handle: merge a row WITH the new column, and verify a writer
    // that predates the column still works (null-filled)
    val t2 = TransactionalTable.open(spark, root)
    assert(t2.schema.fieldNames.contains("note"))
    Seq((500L, "x", "visit", "S", 999, "pc", new java.sql.Timestamp(0L), "evolved"))
      .toDF(t2.schema.fieldNames.toIndexedSeq: _*)
      .createOrReplaceTempView("ev_src")
    spark.sql(
      """MERGE INTO graft_ev.db.retail t USING ev_src s ON t.trans_id = s.trans_id
        |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    CdcPipeline.replayLines(spark, TransactionalTable.open(spark, root),
      CdcFixtures.scenario2Lines, batchId = 1) // pre-evolution shape, null-filled

    val got = spark.sql(
      "SELECT trans_id, note FROM graft_ev.db.retail ORDER BY trans_id")
      .as[(Long, Option[String])].collect().toMap
    assert(got(500L) === Some("evolved"))
    assert(got.size === 13 && got.count(_._2.isDefined) === 1,
      "pre-evolution rows must read as null in the new column")
    // old snapshot still time-travels (read with unified schema, note = null)
    val v1 = spark.sql(
      "SELECT COUNT(*) AS c FROM graft_ev.db.retail VERSION AS OF 1").as[Long].head()
    assert(v1 === 10L)
    // duplicate adds fail loudly
    intercept[Exception] {
      spark.sql("ALTER TABLE graft_ev.db.retail ADD COLUMN note STRING")
    }

    // DROP COLUMN: the live schema loses the column with zero data movement…
    val preDropVersion = TransactionalTable.open(spark, root).currentVersion
    spark.sql("ALTER TABLE graft_ev.db.retail DROP COLUMN note")
    val t3 = TransactionalTable.open(spark, root)
    assert(!t3.schema.fieldNames.contains("note"))
    assert(!spark.sql("SELECT * FROM graft_ev.db.retail").columns.contains("note"))
    assert(spark.sql("SELECT COUNT(*) AS c FROM graft_ev.db.retail").as[Long].head() === 13L)
    // …but snapshots committed before the drop keep it (per-snapshot schema)
    val travel = spark.sql(
      s"SELECT trans_id, note FROM graft_ev.db.retail VERSION AS OF $preDropVersion")
    assert(travel.columns.contains("note"))
    assert(travel.filter($"note".isNotNull).count() === 1L)
    // load-bearing columns are protected
    intercept[Exception] {
      spark.sql("ALTER TABLE graft_ev.db.retail DROP COLUMN trans_id")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE graft_ev.db.retail DROP COLUMN event")
    }
  }

  test("ALTER COLUMN TYPE widening: int→long metadata-only; both file eras in one scan") {
    val w = tmpDir("graft-widen-warehouse")
    spark.conf.set("spark.sql.catalog.graft_wd", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_wd.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    val root = s"$w/db/retail"
    val t = TransactionalTable.create(spark, root, Cdc.tableSchema, Cdc.PrimaryKey,
      Some(Cdc.PartitionColumn))
    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario1Lines, batchId = 0)
    val preWiden = TransactionalTable.open(spark, root).currentVersion

    spark.sql("ALTER TABLE graft_wd.db.retail ALTER COLUMN amount TYPE BIGINT")
    assert(TransactionalTable.open(spark, root).schema("amount").dataType
      === org.apache.spark.sql.types.LongType)

    // pre-widen INT32 files read directly under the widened schema
    val live = spark.sql("SELECT amount FROM graft_wd.db.retail WHERE trans_id = 28")
    assert(live.schema("amount").dataType === org.apache.spark.sql.types.LongType)
    assert(live.as[Long].head() === 1L)
    // post-widen merge (narrow-typed batch, the pipeline's original shape):
    // both eras answer one scan
    CdcPipeline.replayLines(spark, TransactionalTable.open(spark, root),
      CdcFixtures.scenario2Lines, batchId = 1)
    val got = spark.sql(
      "SELECT trans_id, amount FROM graft_wd.db.retail ORDER BY trans_id")
      .as[(Long, Long)].collect().toMap
    assert(got.size === 12 && got(19L) === 39L && got(41L) === 5L)
    // time travel reads the PRE-widen snapshot under its narrow schema
    val travel = spark.sql(
      s"SELECT amount FROM graft_wd.db.retail VERSION AS OF $preWiden")
    assert(travel.schema("amount").dataType === org.apache.spark.sql.types.IntegerType)
    // narrowing and load-bearing columns are rejected
    intercept[Exception] {
      spark.sql("ALTER TABLE graft_wd.db.retail ALTER COLUMN amount TYPE INT")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE graft_wd.db.retail ALTER COLUMN customer_id TYPE BIGINT")
    }
    // PK guard at the engine API (a same-type SQL change no-ops upstream,
    // so the require is only reachable through the API)
    intercept[Exception] {
      TransactionalTable.open(spark, root)
        .widenColumn("trans_id", org.apache.spark.sql.types.LongType)
    }
  }

  test("ALTER TABLE RENAME COLUMN: metadata-only, bridges old files; time travel keeps old name") {
    val w = tmpDir("graft-rename-warehouse")
    spark.conf.set("spark.sql.catalog.graft_rn", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_rn.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    val root = s"$w/db/retail"
    val t = TransactionalTable.create(spark, root, Cdc.tableSchema, Cdc.PrimaryKey,
      Some(Cdc.PartitionColumn))
    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario1Lines, batchId = 0)
    val preRenameVersion = t.currentVersion
    val preSkus = spark.sql("SELECT trans_id, sku FROM graft_rn.db.retail")
      .as[(Long, String)].collect().toMap

    spark.sql("ALTER TABLE graft_rn.db.retail RENAME COLUMN sku TO product_sku")

    // Live reads: new name, values from OLD-name files (coalesce bridge) —
    // zero data movement happened.
    val t2 = TransactionalTable.open(spark, root)
    assert(t2.schema.fieldNames.contains("product_sku") &&
      !t2.schema.fieldNames.contains("sku"))
    val post = spark.sql("SELECT trans_id, product_sku FROM graft_rn.db.retail")
      .as[(Long, String)].collect().toMap
    assert(post === preSkus, "renamed column must carry every pre-rename value")

    // A post-rename writer uses the new name; reads mix both file eras.
    Seq((600L, "y", "visit", "NEWSKU-1", 7, "pc", new java.sql.Timestamp(0L)))
      .toDF(t2.schema.fieldNames.toIndexedSeq: _*)
      .createOrReplaceTempView("rn_src")
    spark.sql(
      """MERGE INTO graft_rn.db.retail t USING rn_src s ON t.trans_id = s.trans_id
        |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val mixed = spark.sql("SELECT trans_id, product_sku FROM graft_rn.db.retail")
      .as[(Long, String)].collect().toMap
    assert(mixed(600L) === "NEWSKU-1" && mixed.size === preSkus.size + 1)
    assert(preSkus.forall { case (k, v) => mixed(k) === v })

    // Time travel to a pre-rename snapshot reads under the OLD name.
    val travel = spark.sql(
      s"SELECT trans_id, sku FROM graft_rn.db.retail VERSION AS OF $preRenameVersion")
    assert(travel.columns.contains("sku"))
    assert(travel.as[(Long, String)].collect().toMap === preSkus)

    // Chained rename: files from BOTH earlier eras still resolve.
    spark.sql("ALTER TABLE graft_rn.db.retail RENAME COLUMN product_sku TO item_sku")
    val chained = spark.sql("SELECT trans_id, item_sku FROM graft_rn.db.retail")
      .as[(Long, String)].collect().toMap
    assert(chained === mixed)

    // Load-bearing and colliding names are protected.
    intercept[Exception] {
      spark.sql("ALTER TABLE graft_rn.db.retail RENAME COLUMN trans_id TO id2")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE graft_rn.db.retail RENAME COLUMN event TO kind")
    }
    intercept[Exception] { // former name reuse would resurrect old bytes
      spark.sql("ALTER TABLE graft_rn.db.retail ADD COLUMN sku STRING")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE graft_rn.db.retail RENAME COLUMN device TO amount")
    }
  }

  test("rollbackTo: re-points state as a new commit; history and fencing intact") {
    val root = tmpDir("ttable-rollback")
    val t = TransactionalTable.create(spark, root, Cdc.tableSchema, Cdc.PrimaryKey,
      Some(Cdc.PartitionColumn))
    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario1Lines, batchId = 0)
    val goodVersion = t.currentVersion
    val goodState = t.scan().orderBy("trans_id").collect().toSeq
    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario2Lines, batchId = 1)
    val badVersion = t.currentVersion
    assert(t.scan().count() !== goodState.size.toLong)

    t.rollbackTo(goodVersion)
    // rollback is a NEW commit: version grows, restored state equals the target
    assert(t.currentVersion === badVersion + 1)
    assert(t.scan().orderBy("trans_id").collect().toSeq === goodState)
    // the rolled-back-over version stays time-travelable (history preserved)
    assert(t.scanAt(badVersion).count() === 12L)
    // the replay fence keeps its high-water mark: re-delivering batch 1 is
    // how a stream refills the table, and it must still apply exactly once
    assert(t.snapshot.batchId === 1L)
    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario2Lines, batchId = 2)
    assert(t.scan().count() === 12L)
    // guards: only strictly-older, still-retained targets
    intercept[IllegalArgumentException](t.rollbackTo(t.currentVersion))
    intercept[IllegalArgumentException](t.rollbackTo(999L))
  }

  test("TIMESTAMP AS OF time travel resolves to the snapshot live at that time") {
    val w = tmpDir("graft-tt-warehouse")
    spark.conf.set("spark.sql.catalog.graft_tt", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_tt.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    val t = TransactionalTable.create(spark, s"$w/db/retail", Cdc.tableSchema,
      Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario1Lines, batchId = 0)
    Thread.sleep(5)
    val betweenMs = System.currentTimeMillis()
    Thread.sleep(5)
    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario2Lines, batchId = 1)
    assert(t.versionAt(betweenMs) === 1L)
    val ts = new java.sql.Timestamp(betweenMs)
    val n = spark.sql(
      s"SELECT COUNT(*) AS c FROM graft_tt.db.retail TIMESTAMP AS OF '$ts'")
      .as[Long].head()
    assert(n === 10L) // the post-batch-0 snapshot, not the 12-row current one
    assert(spark.sql("SELECT COUNT(*) AS c FROM graft_tt.db.retail").as[Long].head() === 12L)
    // before the first commit → loud error, not an empty table
    intercept[Exception] { t.versionAt(0L) }
  }

  test("CREATE TABLE AS SELECT lands through the engine commit path") {
    val w = tmpDir("graft-ctas-warehouse")
    spark.conf.set("spark.sql.catalog.graft_ct", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_ct.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L))
      .toDF("id", "grp", "v").createOrReplaceTempView("ctas_src")
    spark.sql(
      """CREATE TABLE graft_ct.db.derived
        |TBLPROPERTIES ('pk' = 'id')
        |AS SELECT id, grp, v * 2 AS v2 FROM ctas_src""".stripMargin)
    // readable through SQL, and a REAL engine table (manifest + snapshot v1)
    val got = spark.sql("SELECT id, grp, v2 FROM graft_ct.db.derived ORDER BY id")
      .as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((1L, "a", 20L), (2L, "b", 40L), (3L, "a", 60L)))
    val t = TransactionalTable.open(spark, s"$w/db/derived")
    assert(t.pk === "id" && t.currentVersion === 1L)
    // and the usual write surface works on it afterwards
    spark.sql("INSERT INTO graft_ct.db.derived VALUES (4, 'c', 80)")
    assert(spark.sql("SELECT COUNT(*) AS c FROM graft_ct.db.derived").as[Long].head() === 4L)
  }

  test("metadata tables: history/snapshots/files resolve through SQL") {
    warehouse
    val hist = spark.sql(
      "SELECT version, batch_id, n_rows FROM graft_cs.db.retail.history ORDER BY version")
      .as[(Long, Long, Long)].collect().toSeq
    assert(hist === Seq((0L, -1L, 0L), (1L, 0L, 10L), (2L, 1L, 12L)))
    // snapshots is an alias of history
    assert(spark.sql("SELECT COUNT(*) AS c FROM graft_cs.db.retail.snapshots")
      .as[Long].head() === 3L)
    // files: per-partition row totals match the golden end-state devices
    val byPart = spark.sql(
      """SELECT partition, CAST(SUM(n_rows) AS BIGINT) AS n
        |FROM graft_cs.db.retail.files WHERE kind = 'data'
        |GROUP BY partition ORDER BY partition""".stripMargin)
      .as[(String, Long)].collect().toSeq
    val want = CdcFixtures.expectedEndState.groupBy(_._3) // partitioned by event
      .map { case (ev, rows) => (ev, rows.size.toLong) }.toSeq.sortBy(_._1)
    assert(byPart === want)
    // partitions: the same per-partition totals, directly (Iceberg parity)
    val parts = spark.sql(
      """SELECT partition, n_rows FROM graft_cs.db.retail.partitions
        |ORDER BY partition""".stripMargin).as[(String, Long)].collect().toSeq
    assert(parts === want)
    // refs: main is always present, pointing at the current version
    val refs = spark.sql(
      "SELECT name, type, version FROM graft_cs.db.retail.refs")
      .as[(String, String, Long)].collect().toSeq
    assert(refs.contains(("main", "branch", 2L)), s"refs missing main: $refs")
    // an unknown suffix is still a missing table, not a metadata hit
    intercept[Exception] { spark.sql("SELECT * FROM graft_cs.db.retail.bogus").collect() }
  }

  test("snapshot summary: history reports per-commit churn (API and SQL)") {
    warehouse
    val t = TransactionalTable.open(spark,
      spark.conf.get("spark.sql.catalog.graft_cs.warehouse") + "/db/retail")
    val h = t.history().orderBy("version")
      .select("version", "added_rows", "removed_rows", "n_delete_files")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(h.head === ((0L, 0L, 0L, 0L)))
    assert(h(1) === ((1L, 10L, 0L, 0L)), "scenario 1: pure insert, no rewrite")
    val (v2, a2, r2, d2) = h(2)
    // scenario 2 under CoW: the rewrite amplification is visible (rows
    // rewritten alongside the net +2), and no delete files pend
    assert(v2 === 2L && a2 - r2 === 2L && r2 > 0L && d2 === 0L, s"got $h")
    val sqlRow = spark.sql(
      """SELECT added_rows, removed_rows FROM graft_cs.db.retail.history
        |WHERE version = 1""".stripMargin).as[(Long, Long)].head()
    assert(sqlRow === ((10L, 0L)))
  }

  test("SHOW TABLES; INSERT INTO appends through the engine commit path") {
    warehouse
    val tables = spark.sql("SHOW TABLES IN graft_cs.db").select("tableName")
      .as[String].collect().toSeq
    assert(tables === Seq("retail"))
    spark.sql("INSERT INTO graft_cs.db.retail VALUES (99, 'c', 'cart', 'S', 1, 'pc', NULL)")
    val got = spark.sql("SELECT amount FROM graft_cs.db.retail WHERE trans_id = 99")
      .as[Int].collect().toSeq
    assert(got === Seq(1))
    // the append went through a manifest commit, not a rogue file write
    val t = graft.table.TransactionalTable.open(spark,
      spark.conf.get("spark.sql.catalog.graft_cs.warehouse") + "/db/retail")
    assert(t.countRows === 13)
  }

  test("metadata tables: delete_files (MOR inventory) and all_files (retained reach)") {
    val cat = s"graft_cs_af${System.nanoTime()}"
    val w = tmpDir("graft-warehouse-af")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    val t = TransactionalTable.create(spark, s"$w/db/retail", Cdc.tableSchema,
      Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    def applyMor(lines: Seq[String], b: Long): Unit = {
      val d = Cdc.latestPerKey(Cdc.flatten(Cdc.parse(lines.toDS())))
      t.merge(Cdc.projectToTable(Cdc.upserts(d)),
        Cdc.deletes(d).select(org.apache.spark.sql.functions.col(Cdc.PrimaryKey)),
        b, graft.table.MergeMode.MergeOnRead)
    }
    applyMor(CdcFixtures.scenario1Lines, 0)
    applyMor(CdcFixtures.scenario2Lines, 1)
    // scenario 2 deletes key 6 and upserts over existing keys → MOR wrote
    // delete files instead of rewriting batch-0 data
    val del = spark.sql(
      s"SELECT kind, n_rows FROM $cat.db.retail.delete_files")
      .as[(String, Long)].collect().toSeq
    assert(del.nonEmpty && del.forall(_._1 == "equality-deletes"), s"unexpected: $del")
    // delete_files ⊂ files (same rows flagged *-deletes there)
    val filesDel = spark.sql(
      s"SELECT COUNT(*) AS c FROM $cat.db.retail.files WHERE kind LIKE '%-deletes'")
      .as[Long].head()
    assert(filesDel === del.size.toLong)
    // all_files: every data file of every retained snapshot, deduped, with
    // its live version range; batch-0 files span version 1 → current
    val af = spark.sql(
      s"""SELECT path, first_version, last_version FROM $cat.db.retail.all_files""")
      .as[(String, Long, Long)].collect().toSeq
    val live = spark.sql(
      s"SELECT path FROM $cat.db.retail.files WHERE kind = 'data'")
      .as[String].collect().toSet
    assert(live.subsetOf(af.map(_._1).toSet), "all_files missing live files")
    assert(af.exists(f => f._2 === 1L && f._3 === t.currentVersion),
      "batch-0 MOR files should stay live from v1 to current")
    // sanity: all_files row count >= live files (historical reach)
    assert(af.size >= live.size)
    // scan-reported column statistics: chunk-merged [min,max] surfaces
    // through DSv2 estimateStatistics (CBO range selectivity food). The MOR
    // table above reads through the delete-aware rewrite, so probe the CoW
    // fixture table's plain V2 scan instead.
    warehouse
    val scanRel = spark.sql(s"SELECT trans_id, amount FROM graft_cs.db.retail")
      .queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
      }.get
    val colStats = scanRel.scan.asInstanceOf[
      org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics().columnStats()
    import scala.jdk.CollectionConverters._
    val byName = colStats.asScala.map { case (k, v) => k.describe() -> v }
    assert(byName.contains("trans_id"), s"missing pk stats: ${byName.keys}")
    val pkStats = byName("trans_id")
    val ids = spark.sql("SELECT trans_id FROM graft_cs.db.retail")
      .as[Long].collect()
    assert(pkStats.min().get().asInstanceOf[Long] === ids.min)
    assert(pkStats.max().get().asInstanceOf[Long] === ids.max)

    // entries: status 1 = added by the CURRENT commit, 0 = carried from the
    // parent; batch-0 files carry over under MOR (never rewritten)
    val entries = spark.sql(
      s"SELECT status, added_version FROM $cat.db.retail.entries WHERE kind = 'data'")
      .as[(java.lang.Long, java.lang.Long)].collect().toSeq
    assert(entries.nonEmpty)
    assert(entries.exists(e => e._1 == 0L && e._2 == 1L),
      s"expected carried batch-0 entries, got $entries")
    assert(entries.exists(e => e._1 == 1L && e._2 == 2L),
      s"expected entries added at v2, got $entries")
  }

  test("ALTER TABLE RENAME TO (E214): dir move + path rewrite — data, travel, MOR masks, writes survive") {
    val cat = s"graft_cs_rn${System.nanoTime()}"
    val w = tmpDir("graft-warehouse-rn")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    TransactionalTable.create(spark, s"$w/db/a",
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v BIGINT"), "id", None)
    spark.sql(s"INSERT INTO $cat.db.a VALUES (1, 10), (2, 20)")
    spark.sql(s"INSERT INTO $cat.db.a VALUES (3, 30)")
    // a PENDING merge-on-read delete: its artifact path must survive the move
    spark.sql(s"ALTER TABLE $cat.db.a SET TBLPROPERTIES('write.delete.mode'='merge-on-read')")
    spark.sql(s"DELETE FROM $cat.db.a WHERE id = 2")
    spark.sql(s"ALTER TABLE $cat.db.a RENAME TO db.b")
    // the old identifier is gone
    intercept[Exception](spark.sql(s"SELECT * FROM $cat.db.a").collect())
    // live reads mask the MOR delete through the rewritten artifact path
    assert(spark.sql(s"SELECT id FROM $cat.db.b ORDER BY id")
      .as[Long].collect().toSeq === Seq(1L, 3L))
    // time travel crosses the rename (manifest chunk paths rewritten)
    assert(spark.sql(s"SELECT COUNT(*) AS c FROM $cat.db.b VERSION AS OF 1")
      .as[Long].head() === 2L)
    // the renamed table stays fully writable
    spark.sql(s"INSERT INTO $cat.db.b VALUES (4, 40)")
    assert(spark.sql(s"SELECT COUNT(*) AS c FROM $cat.db.b").as[Long].head() === 3L)
  }

  test("rename crash-heal: an interrupted rename completes on open; guards refuse views and collisions") {
    val cat = s"graft_cs_rh${System.nanoTime()}"
    val w = tmpDir("graft-warehouse-rh")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    TransactionalTable.create(spark, s"$w/db/c",
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v BIGINT"), "id", None)
    spark.sql(s"INSERT INTO $cat.db.c VALUES (1, 10), (2, 20)")
    // simulate a crash right AFTER the directory move, BEFORE the rewrite:
    // manifests still reference the old absolute paths
    val (oldRoot, newRoot) = (s"$w/db/c", s"$w/db/d")
    java.nio.file.Files.write(java.nio.file.Paths.get(newRoot + ".rename_pending"),
      oldRoot.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(java.nio.file.Paths.get(oldRoot),
      java.nio.file.Paths.get(newRoot))
    // open heals: the rewrite completes and reads serve
    val healed = TransactionalTable.open(spark, newRoot)
    assert(healed.scan().select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(newRoot + ".rename_pending")), "marker swept")
    assert(spark.sql(s"SELECT COUNT(*) AS c FROM $cat.db.d").as[Long].head() === 2L)
    // guard: renaming onto an existing table refuses
    TransactionalTable.create(spark, s"$w/db/e",
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT"), "id", None)
    intercept[Exception](spark.sql(s"ALTER TABLE $cat.db.d RENAME TO db.e"))
    // guard: a VIEW through the TABLE statement errors (Spark's analyzer
    // refuses to resolve a stored view as a table; the catalog's own
    // wrong-command guard backs it up for direct API callers) — and the
    // view stays intact, never silently moved
    spark.sql(s"CREATE VIEW $cat.db.vv AS SELECT id FROM $cat.db.d")
    intercept[Exception](spark.sql(s"ALTER TABLE $cat.db.vv RENAME TO db.vv2"))
    assert(spark.sql(s"SELECT COUNT(*) AS c FROM $cat.db.vv").as[Long].head() === 2L,
      "the refused rename must leave the view intact")
  }
}
