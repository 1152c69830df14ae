package graft

import graft.cdc.Cdc
import graft.fixtures.CdcFixtures
import graft.stream.CdcPipeline
import graft.table.TransactionalTable

/** SQL `MERGE INTO` against graft catalog tables — the reference's statement
  * shapes (`spark_sql_merge_into_iceberg.py:118-122,133-136`) executed
  * verbatim through the GraftExtensions rule/strategy. */
class MergeSqlSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String = {
    val w = tmpDir("graft-merge-warehouse")
    spark.conf.set("spark.sql.catalog.graft_ms", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_ms.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    val t = TransactionalTable.create(spark, s"$w/db/retail", Cdc.tableSchema,
      Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario1Lines, batchId = 0)
    s"$w/db/retail"
  }

  test("MERGE INTO ... UPDATE SET * / INSERT * (upsert) and ... DELETE") {
    val root = freshTable()
    // source: update amount of key 19 → 999, insert new key 77
    Seq(
      (19L, "826787813308", "visit", "DK2617NXBK", 999, "tablet", new java.sql.Timestamp(0L)),
      (77L, "c77", "cart", "SKU7", 7, "pc", new java.sql.Timestamp(0L)))
      .toDF(Cdc.tableSchema.fieldNames.toIndexedSeq: _*)
      .createOrReplaceTempView("upd_src")
    spark.sql(
      """MERGE INTO graft_ms.db.retail AS t USING upd_src AS s ON t.trans_id = s.trans_id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val t = TransactionalTable.open(spark, root)
    assert(t.countRows === 11)
    val amounts = t.scan().select($"trans_id", $"amount").as[(Long, Int)].collect().toMap
    assert(amounts(19L) === 999 && amounts(77L) === 7)

    // delete keys 6 and 77 via MERGE DELETE
    Seq(6L, 77L).toDF("trans_id").createOrReplaceTempView("del_src")
    spark.sql(
      """MERGE INTO graft_ms.db.retail AS t USING del_src AS s ON t.trans_id = s.trans_id
        |WHEN MATCHED THEN DELETE""".stripMargin)
    val ids = TransactionalTable.open(spark, root)
      .scan().select($"trans_id").as[Long].collect().sorted.toSeq
    assert(!ids.contains(6L) && !ids.contains(77L) && ids.contains(19L))
    assert(ids.size === 9)
    // SQL merges must not consume stream batch ids: the replay fence stays
    // where the stream left it, so a checkpointed stream can still resume.
    assert(TransactionalTable.open(spark, root).snapshot.batchId === 0L,
      "ad-hoc SQL MERGE advanced the stream replay fence")
  }

  /** Catalog instances are cached by name per session — unique name per test
    * so the warehouse binding is fresh (same pattern as ReplayQueries). */
  private def freshCatalog(): (String, String) = {
    val cat = s"graft_ms${System.nanoTime()}"
    val w = tmpDir("graft-merge-warehouse")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    val t = TransactionalTable.create(spark, s"$w/db/retail", Cdc.tableSchema,
      Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario1Lines, batchId = 0)
    (cat, s"$w/db/retail")
  }

  test("DELETE FROM ... WHERE routes through the transactional delete merge") {
    val (cat, root) = freshCatalog()
    val nLike = TransactionalTable.open(spark, root).scan()
      .filter($"event" === "like").count()
    assert(nLike > 0, "test premise: some 'like' rows exist in the v1 state")
    spark.sql(s"DELETE FROM $cat.db.retail WHERE event = 'like'")
    val t = TransactionalTable.open(spark, root)
    val left = t.scan().select($"trans_id", $"event").as[(Long, String)].collect()
    assert(!left.exists(_._2 == "like"))
    assert(left.length === 10 - nLike)
    // the commit went through the engine (new snapshot version)
    assert(t.currentVersion === 2L)
    // DELETE matching nothing still leaves the data intact
    spark.sql(s"DELETE FROM $cat.db.retail WHERE trans_id = -42")
    assert(TransactionalTable.open(spark, root).scan().count() === left.length)
  }

  test("DELETE/UPDATE with subquery conditions (IN / EXISTS / scalar)") {
    val (cat, root) = freshCatalog()
    // scalar subquery in an UPDATE condition (on the full 10-row state,
    // where amounts genuinely vary around their mean)
    val pre = TransactionalTable.open(spark, root)
      .scan().select($"trans_id", $"amount").as[(Long, Int)].collect()
    val avg = pre.map(_._2).sum.toDouble / pre.length
    val expectZeroed = pre.filter(_._2 > avg).map(_._1).toSet
    assert(expectZeroed.nonEmpty, "test premise: some rows sit above the mean")
    spark.sql(
      s"""UPDATE $cat.db.retail SET amount = 0
         |WHERE amount > (SELECT AVG(amount) FROM $cat.db.retail)""".stripMargin)
    val zeroed = TransactionalTable.open(spark, root)
      .scan().filter($"amount" === 0).select($"trans_id").as[Long].collect().toSet
    assert(zeroed === expectZeroed)

    Seq(19L, 21L).toDF("id").createOrReplaceTempView("doomed_ids")
    spark.sql(
      s"DELETE FROM $cat.db.retail WHERE trans_id IN (SELECT id FROM doomed_ids)")
    val afterIn = TransactionalTable.open(spark, root)
      .scan().select($"trans_id").as[Long].collect().toSet
    assert(!afterIn.contains(19L) && !afterIn.contains(21L) && afterIn.size === 8)

    // correlated EXISTS
    Seq("cart").toDF("ev").createOrReplaceTempView("doomed_events")
    spark.sql(
      s"""DELETE FROM $cat.db.retail t
         |WHERE EXISTS (SELECT 1 FROM doomed_events d WHERE d.ev = t.event)""".stripMargin)
    val afterExists = TransactionalTable.open(spark, root)
      .scan().select($"event").as[String].collect()
    assert(!afterExists.contains("cart"))
  }

  test("serializable isolation: a stale self-read write conflicts instead of retrying") {
    val (cat, root) = freshCatalog()
    val t = TransactionalTable.open(spark, root)
    val v0 = t.currentVersion
    // the doomed-key set reads the table itself — pinned at v0
    val selfRead = t.scan().filter($"event" === "like").select($"trans_id")
    // a concurrent writer lands a commit before our delete does
    Seq((888L, "c888", "visit", "SKU", 1, "pc", new java.sql.Timestamp(0L)))
      .toDF(Cdc.tableSchema.fieldNames.toIndexedSeq: _*)
      .createOrReplaceTempView("conc_src")
    spark.sql(s"INSERT INTO $cat.db.retail SELECT * FROM conc_src")
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], t.schema)
    val e = intercept[graft.table.CommitConflictException] {
      t.mergeAdhoc(empty, selfRead, expectedVersion = Some(v0))
    }
    assert(e.getMessage.contains("serializable"), e.getMessage)
    // nothing was committed by the failed attempt
    assert(TransactionalTable.open(spark, root).currentVersion === v0 + 1)

    // the SQL layer wires the detection: a DELETE FROM's lowered source scans
    // the target, and the analyzer-resolved plan carries its pinned version
    val plan = spark.sql(s"SELECT trans_id FROM $cat.db.retail WHERE event = 'like'")
      .queryExecution.analyzed
    assert(graft.sql.GraftWriteValidation.selfReadVersion(plan, root) === Some(v0 + 1))
    // and an independent source reports no pin
    val indep = spark.sql("SELECT 1 AS x").queryExecution.analyzed
    assert(graft.sql.GraftWriteValidation.selfReadVersion(indep, root) === None)
  }

  test("UPDATE ... SET ... WHERE routes through the transactional upsert merge") {
    val (cat, root) = freshCatalog()
    spark.sql(
      s"UPDATE $cat.db.retail SET amount = amount + 100 WHERE event = 'cart'")
    val t = TransactionalTable.open(spark, root)
    val got = t.scan().select($"trans_id", $"event", $"amount")
      .as[(Long, String, Int)].collect()
    assert(got.length === 10) // row count unchanged — update, not insert
    assert(got.filter(_._2 == "cart").forall(_._3 > 100))
    assert(got.filter(_._2 != "cart").forall(_._3 <= 100))
    // reassigning the PK is rejected loudly
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $cat.db.retail SET trans_id = trans_id + 1")
    }
    assert(e.getMessage.contains("primary key"))
  }

  test("partial assignments route through the general merge: unassigned cols preserved") {
    val (cat, root) = freshCatalog()
    Seq((19L, 123), (555L, 55)).toDF("trans_id", "amount")
      .createOrReplaceTempView("part_src")
    spark.sql(
      s"""MERGE INTO $cat.db.retail t USING part_src s ON t.trans_id = s.trans_id
         |WHEN MATCHED THEN UPDATE SET t.amount = s.amount
         |WHEN NOT MATCHED THEN INSERT (trans_id, amount) VALUES (s.trans_id, s.amount)""".stripMargin)
    val t = TransactionalTable.open(spark, root)
    val rows = t.scan()
      .select($"trans_id", $"amount", $"customer_id", $"event")
      .as[(Long, Int, String, String)].collect().map(r => r._1 -> r).toMap
    // matched: amount updated, every other column keeps its target value
    assert(rows(19L)._2 === 123)
    assert(rows(19L)._3 === "826787813308", "unassigned customer_id was clobbered")
    assert(rows(19L)._4 != null, "unassigned event was clobbered")
    // not matched: inserted with unassigned columns NULL
    assert(rows(555L)._2 === 55 && rows(555L)._3 == null && rows(555L)._4 == null)
    assert(t.countRows === 11)
  }

  test("guarded MERGE (WHEN MATCHED AND s.ts >= t.ts) through SQL") {
    val w = tmpDir("graft-gms-warehouse")
    spark.conf.set("spark.sql.catalog.graft_gms", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_gms.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    val root = s"$w/db/retail"
    val t = TransactionalTable.create(spark, root, Cdc.guardedTableSchema,
      Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    CdcPipeline.applyCdcBatchGuarded(t, Cdc.parse(CdcFixtures.scenario1Lines.toDS()), 0)
    val before = t.scan().select($"trans_id", $"amount").as[(Long, Int)].collect().toMap

    // A LATE update of key 19 (op ts older than the stored one) plus a FRESH
    // update of key 21: the guard must drop the former and apply the latter.
    Seq(
      (19L, "x", "visit", "S", 111, "pc", new java.sql.Timestamp(0L),
        java.sql.Timestamp.valueOf("2000-01-01 00:00:00")),
      (21L, "y", "like", "S", 222, "pc", new java.sql.Timestamp(0L),
        java.sql.Timestamp.valueOf("2030-01-01 00:00:00")))
      .toDF(Cdc.guardedTableSchema.fieldNames.toIndexedSeq: _*)
      .createOrReplaceTempView("guard_src")
    spark.sql(
      """MERGE INTO graft_gms.db.retail t USING guard_src s ON t.trans_id = s.trans_id
        |WHEN MATCHED AND s._op_ts >= t._op_ts THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val after = TransactionalTable.open(spark, root)
      .scan().select($"trans_id", $"amount").as[(Long, Int)].collect().toMap
    assert(after(19L) === before(19L), "late update must not clobber newer row")
    assert(after(21L) === 222, "fresh update must apply")

    // guarded DELETE: late delete of 19 is a no-op; fresh delete of 21 lands
    Seq((19L, java.sql.Timestamp.valueOf("2000-01-01 00:00:00")),
        (21L, java.sql.Timestamp.valueOf("2031-01-01 00:00:00")))
      .toDF("trans_id", "_op_ts").createOrReplaceTempView("guard_del")
    spark.sql(
      """MERGE INTO graft_gms.db.retail t USING guard_del s ON t.trans_id = s.trans_id
        |WHEN MATCHED AND s._op_ts >= t._op_ts THEN DELETE""".stripMargin)
    val ids = TransactionalTable.open(spark, root)
      .scan().select($"trans_id").as[Long].collect().toSet
    assert(ids.contains(19L) && !ids.contains(21L))
  }

  test("INSERT OVERWRITE: full table, static partition, dynamic mode — one commit each") {
    val (cat, root) = freshCatalog()
    def t = TransactionalTable.open(spark, root)
    val preVersion = t.currentVersion

    // static PARTITION overwrite: replace exactly the 'cart' partition;
    // every other partition's files are carried by identity
    val otherFiles = t.snapshot.files.filterNot(_.partition.contains("cart"))
      .map(_.path).toSet
    spark.sql(
      s"""INSERT OVERWRITE $cat.db.retail PARTITION (event = 'cart')
        |SELECT 700L, 'c700', 'SKU0', 1, 'pc', TIMESTAMP '2023-01-16 09:00:00'""".stripMargin)
    val afterStatic = t
    val ids = afterStatic.scan().select($"trans_id").as[Long].collect().sorted.toSeq
    assert(ids.contains(700L) && !ids.exists(Set(21L, 23L, 30L, 33L)),
      s"cart rows must be replaced, got $ids")
    assert(ids.size === 7, "non-cart rows survive") // 10 - 4 cart + 1 new
    assert(afterStatic.snapshot.files.filterNot(_.partition.contains("cart"))
      .map(_.path).toSet === otherFiles, "untouched partitions carry their files")
    // rows outside the declared partition abort
    intercept[Exception] {
      spark.sql(
        s"""INSERT OVERWRITE $cat.db.retail PARTITION (event = 'cart')
          |SELECT 701L, 'c', 'visit', 'S', 1, 'pc', TIMESTAMP '2023-01-16 09:00:00'""".stripMargin)
    }

    // dynamic mode: only the partitions present in the new rows are replaced
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql(
        s"""INSERT OVERWRITE $cat.db.retail
          |SELECT 800L, 'c800', 'visit', 'SKU8', 8, 'pc',
          |       TIMESTAMP '2023-01-16 09:30:00'""".stripMargin)
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    val afterDyn = t.scan().select($"trans_id", $"event").as[(Long, String)]
      .collect().toMap
    assert(afterDyn(800L) === "visit" && !afterDyn.contains(19L),
      "visit partition replaced") // 19 was the only visit row
    assert(afterDyn.contains(700L) && afterDyn.contains(28L),
      "other partitions untouched in dynamic mode")

    // full overwrite (static mode, no PARTITION clause): table replaced whole
    spark.sql(
      s"""INSERT OVERWRITE $cat.db.retail
        |SELECT 900L, 'c900', 'purchase', 'SKU9', 9, 'mobile',
        |       TIMESTAMP '2023-01-16 10:00:00'""".stripMargin)
    assert(t.scan().select($"trans_id").as[Long].collect().toSeq === Seq(900L))
    // history preserved: the pre-overwrite snapshot still time-travels
    assert(t.scanAt(preVersion).count() === 10L)
  }

  test("static PARTITION overwrite on a non-identity transform is rejected") {
    val cat = s"graft_iow${System.nanoTime()}"
    val w = tmpDir("graft-iow-warehouse")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    // bucket(4, device): PARTITION (device = 'dev-1') would replace the whole
    // BUCKET dev-1 hashes into — silently deleting every other device sharing
    // it. The statement must be rejected, not widened.
    spark.sql(
      s"""CREATE TABLE $cat.db.ev (event_id BIGINT, device STRING, val INT)
         |PARTITIONED BY (bucket(4, device)) TBLPROPERTIES ('pk'='event_id')""".stripMargin)
    val devices = (0 until 16).map(i => (i.toLong, s"dev-$i", i * 10))
    devices.toDF("event_id", "device", "val").createOrReplaceTempView("iow_src")
    spark.sql(s"INSERT INTO $cat.db.ev SELECT * FROM iow_src")
    // the SQL PARTITION clause is already blocked by the analyzer (device is
    // a transform source, not a partition column); the DataFrameWriterV2
    // condition API is the route that reaches the static-overwrite rule
    val e = intercept[Exception] {
      Seq((100L, "dev-1", 999)).toDF("event_id", "device", "val")
        .writeTo(s"$cat.db.ev").overwrite($"device" === "dev-1")
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Seq.empty
      else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("identity")), s"got $e")
    // nothing was deleted by the refused statement
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.ev").head().getLong(0) === 16L)
    // full-table overwrite and dynamic mode remain available on such tables
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try spark.sql(s"INSERT OVERWRITE $cat.db.ev SELECT 100L, 'dev-1', 999")
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    val vals = spark.sql(s"SELECT val FROM $cat.db.ev WHERE device = 'dev-1'")
      .collect().map(_.getInt(0)).toSet
    assert(vals === Set(999), "dynamic overwrite replaced dev-1's bucket")
  }

  test("MERGE ... WHEN NOT MATCHED BY SOURCE THEN DELETE (full sync, one commit)") {
    val (cat, root) = freshCatalog()
    val pre = TransactionalTable.open(spark, root).currentVersion
    // source keeps 19 (updated) and introduces 500; every other key must go
    Seq(
      (19L, "826787813308", "visit", "DK2617NXBK", 999, "tablet", new java.sql.Timestamp(0L)),
      (500L, "c500", "cart", "SKU5", 5, "pc", new java.sql.Timestamp(0L)))
      .toDF(Cdc.tableSchema.fieldNames.toIndexedSeq: _*)
      .createOrReplaceTempView("sync_src")
    spark.sql(
      s"""MERGE INTO $cat.db.retail t USING sync_src s ON t.trans_id = s.trans_id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    val t = TransactionalTable.open(spark, root)
    val got = t.scan().select($"trans_id", $"amount").as[(Long, Int)]
      .collect().toMap
    assert(got === Map(19L -> 999, 500L -> 5),
      s"full sync must leave exactly the source keys, got $got")
    assert(t.currentVersion === pre + 1, "upserts and sync-deletes land as ONE commit")
  }

  test("TRUNCATE TABLE empties the table in one commit; history survives") {
    val (cat, root) = freshCatalog()
    val pre = TransactionalTable.open(spark, root).currentVersion
    spark.sql(s"TRUNCATE TABLE $cat.db.retail")
    val t = TransactionalTable.open(spark, root)
    assert(t.scan().count() === 0L)
    assert(t.currentVersion === pre + 1, "truncate is one engine commit")
    assert(t.scanAt(pre).count() === 10L, "pre-truncate snapshot time-travels")
    // empty table stays fully usable
    spark.sql(s"INSERT INTO $cat.db.retail SELECT 5L, 'c', 'visit', 'S', 1, 'pc', " +
      "TIMESTAMP '2023-01-16 13:00:00'")
    assert(TransactionalTable.open(spark, root).scan().count() === 1L)
  }

  test("general MERGE: conditional clauses, first matching clause wins") {
    val (cat, root) = freshCatalog()
    // key 19 matches BOTH the 'big' clause and the catch-all UPDATE — first
    // clause must win (amount*10, not -1). key 6 hits the DELETE clause.
    // key 21 falls through to the catch-all. 900 passes the INSERT condition,
    // 901 fails it (no-op).
    Seq(
      (19L, "big", 5), (6L, "del", 0), (21L, "other", 9),
      (900L, "new", 500), (901L, "new", 50))
      .toDF("trans_id", "tag", "amount").createOrReplaceTempView("gen_src")
    spark.sql(
      s"""MERGE INTO $cat.db.retail t USING gen_src s ON t.trans_id = s.trans_id
         |WHEN MATCHED AND s.tag = 'big' THEN UPDATE SET t.amount = s.amount * 10
         |WHEN MATCHED AND s.tag = 'del' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET t.amount = -1
         |WHEN NOT MATCHED AND s.amount > 100 THEN
         |  INSERT (trans_id, amount) VALUES (s.trans_id, s.amount)""".stripMargin)
    val t = TransactionalTable.open(spark, root)
    val rows = t.scan().select($"trans_id", $"amount").as[(Long, Int)].collect().toMap
    assert(rows(19L) === 50, "first-matching-clause precedence violated")
    assert(!rows.contains(6L), "conditional DELETE clause did not fire")
    assert(rows(21L) === -1, "catch-all MATCHED clause did not fire")
    assert(rows(900L) === 500, "conditional INSERT did not fire")
    assert(!rows.contains(901L), "INSERT fired despite false condition")
    assert(rows.size === 10) // 10 - 1 deleted + 1 inserted
    // general merges are ad-hoc: the stream replay fence must not advance
    assert(t.snapshot.batchId === 0L,
      "general SQL MERGE advanced the stream replay fence")
  }

  test("general MERGE: NOT MATCHED BY SOURCE UPDATE with condition") {
    val (cat, root) = freshCatalog()
    Seq((19L, 777)).toDF("trans_id", "amount").createOrReplaceTempView("nmbs_src")
    spark.sql(
      s"""MERGE INTO $cat.db.retail t USING nmbs_src s ON t.trans_id = s.trans_id
         |WHEN MATCHED THEN UPDATE SET t.amount = s.amount
         |WHEN NOT MATCHED BY SOURCE AND t.trans_id = 6 THEN
         |  UPDATE SET t.device = 'flagged'""".stripMargin)
    val rows = TransactionalTable.open(spark, root).scan()
      .select($"trans_id", $"amount", $"device").as[(Long, Int, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(rows(19L)._2 === 777)
    assert(rows(6L)._3 === "flagged", "NOT MATCHED BY SOURCE UPDATE did not fire")
    assert(rows.size === 10, "row count changed on an update-only merge")
    assert(rows.count(_._2._3 == "flagged") === 1,
      "NOT MATCHED BY SOURCE condition ignored")
  }

  test("general MERGE: conditional UPDATE SET * routes through the general path") {
    val (cat, root) = freshCatalog()
    Seq(
      (19L, "c19", "visit", "SKU19", 4242, "pc", new java.sql.Timestamp(0L)),
      (902L, "c902", "cart", "SKU902", 9, "pc", new java.sql.Timestamp(0L)))
      .toDF(Cdc.tableSchema.fieldNames.toIndexedSeq: _*)
      .createOrReplaceTempView("condstar_src")
    spark.sql(
      s"""MERGE INTO $cat.db.retail t USING condstar_src s ON t.trans_id = s.trans_id
         |WHEN MATCHED AND s.amount > 100 THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val rows = TransactionalTable.open(spark, root).scan()
      .select($"trans_id", $"amount", $"customer_id").as[(Long, Int, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(rows(19L)._2 === 4242 && rows(19L)._3 === "c19")
    assert(rows(902L)._2 === 9, "INSERT * arm of the conditional-star merge")
    assert(rows.size === 11)
  }

  test("general MERGE against a MOR-pending target reads delete-aware") {
    // The staged outer join scans the target relation itself; with pending
    // merge-on-read delete files, GraftMorScanRule (which runs AFTER the
    // merge rule) must rewrite that embedded scan delete-aware, or the
    // general merge would resurrect masked rows into its row images.
    val cat = s"graft_gmor${System.nanoTime()}"
    val w = tmpDir("graft-gmor-wh")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    val root = s"$w/db/retail"
    val t = TransactionalTable.create(spark, root, Cdc.tableSchema,
      Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    CdcPipeline.applyCdcBatch(t, Cdc.parse(CdcFixtures.scenario1Lines.toDS()), 0,
      graft.table.MergeMode.MergeOnRead)
    CdcPipeline.applyCdcBatch(t, Cdc.parse(CdcFixtures.scenario2Lines.toDS()), 1,
      graft.table.MergeMode.MergeOnRead)
    assert(t.snapshot.deletes.nonEmpty, "test premise: MOR delete files pending")
    val before = t.scan().select($"trans_id", $"amount").as[(Long, Int)].collect().toMap
    Seq((19L, 123), (555L, 55)).toDF("trans_id", "amount")
      .createOrReplaceTempView("gmor_src")
    spark.sql(
      s"""MERGE INTO $cat.db.retail t USING gmor_src s ON t.trans_id = s.trans_id
         |WHEN MATCHED THEN UPDATE SET t.amount = s.amount
         |WHEN NOT MATCHED THEN INSERT (trans_id, amount) VALUES (s.trans_id, s.amount)""".stripMargin)
    val rows = TransactionalTable.open(spark, root).scan()
      .select($"trans_id", $"amount").as[(Long, Int)].collect().toMap
    assert(rows(19L) === 123)
    assert(rows(555L) === 55)
    assert(rows.size === before.size + 1,
      "a masked row was resurrected (or a live row lost) through the MOR merge")
  }

  test("general MERGE: cardinality violation (two source rows, one target key) fails") {
    val (cat, _) = freshCatalog()
    Seq((19L, 1), (19L, 2)).toDF("trans_id", "amount")
      .createOrReplaceTempView("dup_src")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $cat.db.retail t USING dup_src s ON t.trans_id = s.trans_id
           |WHEN MATCHED AND s.amount > 0 THEN UPDATE SET t.amount = s.amount""".stripMargin)
    }
    assert(e.getMessage.toLowerCase.contains("cardinality"), e.getMessage)
  }

  test("general MERGE: reassigning the primary key is rejected") {
    val (cat, _) = freshCatalog()
    Seq((19L, 1)).toDF("trans_id", "amount").createOrReplaceTempView("pkre_src")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $cat.db.retail t USING pkre_src s ON t.trans_id = s.trans_id
           |WHEN MATCHED AND s.amount > 0 THEN
           |  UPDATE SET t.trans_id = s.trans_id + 1""".stripMargin)
    }
    assert(e.getMessage.contains("primary key"), e.getMessage)
  }

  test("unsupported MERGE shapes and version-pinned targets are rejected") {
    freshTable()
    Seq((1L, 1)).toDF("trans_id", "x").createOrReplaceTempView("bad_src")
    val e1 = intercept[Exception] {
      spark.sql(
        """MERGE INTO graft_ms.db.retail t USING bad_src s ON t.amount = s.x
          |WHEN MATCHED THEN DELETE""".stripMargin)
    }
    assert(e1.getMessage.contains("requires ON"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(
        """MERGE INTO graft_ms.db.retail VERSION AS OF 1 t USING bad_src s
          |ON t.trans_id = s.trans_id WHEN MATCHED THEN DELETE""".stripMargin)
    }
    assert(e2.getMessage.toLowerCase.contains("version") ||
      e2.getMessage.toLowerCase.contains("syntax"), e2.getMessage)
  }

  test("write.<op>.mode TBLPROPERTIES pick the row-level write strategy") {
    import graft.table.DeleteFile
    val (cat, root) = freshCatalog()
    def t = TransactionalTable.open(spark, root)

    // default: copy-on-write — DELETE leaves no delete files
    spark.sql(s"DELETE FROM $cat.db.retail WHERE trans_id = 6")
    assert(t.snapshot.deletes.isEmpty, "CoW delete produced delete files")

    // write.delete.mode=merge-on-read-vector: DELETE lands a deletion vector
    spark.sql(s"ALTER TABLE $cat.db.retail SET TBLPROPERTIES(" +
      "'write.delete.mode'='merge-on-read-vector')")
    spark.sql(s"DELETE FROM $cat.db.retail WHERE trans_id = 19")
    assert(t.snapshot.deletes.nonEmpty &&
      t.snapshot.deletes.forall(_.kind == DeleteFile.Vector),
      s"expected vector deletes, got ${t.snapshot.deletes.map(_.kind)}")
    // SQL reads stay correct while the DV is pending (MOR substitution)
    assert(spark.sql(s"SELECT count(*) c FROM $cat.db.retail")
      .first().getLong(0) === 8L)

    // write.update.mode=merge-on-read: UPDATE masks via equality deletes,
    // the delete strategy stays vector — per-operation independence
    spark.sql(s"ALTER TABLE $cat.db.retail SET TBLPROPERTIES(" +
      "'write.update.mode'='merge-on-read')")
    spark.sql(s"UPDATE $cat.db.retail SET amount = 123 WHERE trans_id = 21")
    assert(t.snapshot.deletes.exists(_.kind == DeleteFile.Equality),
      "MOR update left no equality delete")
    assert(spark.sql(
      s"SELECT amount FROM $cat.db.retail WHERE trans_id = 21")
      .first().getInt(0) === 123)

    // write.merge.mode applies to MERGE INTO (star and general forms)
    spark.sql(s"ALTER TABLE $cat.db.retail SET TBLPROPERTIES(" +
      "'write.merge.mode'='merge-on-read-positional')")
    Seq(23L).toDF("trans_id").createOrReplaceTempView("mode_del_src")
    spark.sql(
      s"""MERGE INTO $cat.db.retail tt USING mode_del_src s
         |ON tt.trans_id = s.trans_id WHEN MATCHED THEN DELETE""".stripMargin)
    assert(t.snapshot.deletes.exists(_.kind == DeleteFile.Position),
      "MOR-positional merge left no positional delete")
    assert(spark.sql(s"SELECT count(*) c FROM $cat.db.retail")
      .first().getLong(0) === 7L)

    // properties surface in SHOW TBLPROPERTIES; bad values refuse loudly
    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.db.retail")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("write.delete.mode").contains("merge-on-read-vector"))
    assert(props.get("write.update.mode").contains("merge-on-read"))
    assert(props.get("write.merge.mode").contains("merge-on-read-positional"))
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.db.retail SET TBLPROPERTIES(" +
        "'write.delete.mode'='sideways')")
    }
    assert(e.getMessage.contains("unknown write mode"), e.getMessage)

    // end state is the golden v1 rows minus keys 6, 19, 23 with 21's update —
    // whatever mix of artifacts produced it
    val rows = t.scan().select($"trans_id", $"amount").as[(Long, Int)]
      .collect().toMap
    assert(!rows.contains(6L) && !rows.contains(19L) && !rows.contains(23L))
    assert(rows(21L) === 123)
    assert(rows.size === 7)
  }
}
