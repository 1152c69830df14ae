package graft

import java.nio.file.{Files, Paths}

import graft.cdc.Cdc
import graft.fixtures.CdcFixtures
import graft.stream.CdcPipeline
import graft.table.TransactionalTable

/** `[CREATE OR] REPLACE TABLE ... AS SELECT` (Iceberg RTAS parity): one
  * atomic commit swaps schema/pk/partition-spec/contents while prior
  * snapshots stay time-travelable, and the `_table.json` cache heals from
  * the manifest stamp after a crash between commit and meta rewrite. */
class RtasSpec extends SparkSpec {
  import spark.implicits._

  /** Unique catalog per test (catalog instances are cached by name). */
  private def freshCatalog(): (String, String) = {
    val cat = s"graft_rt${System.nanoTime()}"
    val w = tmpDir("graft-rtas-warehouse")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    Files.createDirectories(Paths.get(s"$w/db"))
    (cat, w)
  }

  private def seedRetail(w: String): TransactionalTable = {
    val t = TransactionalTable.create(spark, s"$w/db/retail", Cdc.tableSchema,
      Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
    CdcPipeline.replayLines(spark, t, CdcFixtures.scenario1Lines, batchId = 0)
    t
  }

  test("CREATE OR REPLACE TABLE AS SELECT swaps schema+data atomically; history survives") {
    val (cat, w) = freshCatalog()
    seedRetail(w)
    val preVersion = TransactionalTable.open(spark, s"$w/db/retail").currentVersion
    val preCount = spark.sql(s"SELECT COUNT(*) AS n FROM $cat.db.retail")
      .as[Long].head()

    spark.sql(
      s"""CREATE OR REPLACE TABLE $cat.db.retail TBLPROPERTIES('pk'='event') AS
         |SELECT event, CAST(SUM(amount) AS BIGINT) AS total, COUNT(*) AS n
         |FROM $cat.db.retail GROUP BY event""".stripMargin)

    val t = TransactionalTable.open(spark, s"$w/db/retail")
    assert(t.pk === "event")
    assert(t.schema.fieldNames.toSeq === Seq("event", "total", "n"))
    // exactly ONE commit for the whole replace
    assert(t.currentVersion === preVersion + 1)
    val rows = spark.sql(s"SELECT event, total, n FROM $cat.db.retail ORDER BY event")
      .as[(String, Long, Long)].collect().toSeq
    assert(rows.map(_._3).sum === preCount)
    // time travel to the pre-replace version reads the OLD schema and data
    val old = spark.sql(
      s"SELECT trans_id, event FROM $cat.db.retail VERSION AS OF $preVersion")
    assert(old.schema.fieldNames.toSeq === Seq("trans_id", "event"))
    assert(old.count() === preCount)
    // the history metadata table still lists the pre-replace commits
    val versions = spark.sql(s"SELECT version FROM $cat.db.retail.history")
      .as[Long].collect().toSeq
    assert(versions.contains(preVersion) && versions.contains(preVersion + 1))
    // replace is an ad-hoc SQL op: the stream replay fence must not move
    assert(t.snapshot.batchId === 0L)
  }

  test("CREATE OR REPLACE on a missing table creates it; bare REPLACE fails") {
    val (cat, w) = freshCatalog()
    spark.sql(
      s"""CREATE OR REPLACE TABLE $cat.db.fresh TBLPROPERTIES('pk'='id') AS
         |SELECT * FROM VALUES (1L, 'a'), (2L, 'b') AS t(id, v)""".stripMargin)
    assert(TransactionalTable.exists(s"$w/db/fresh"))
    assert(spark.sql(s"SELECT * FROM $cat.db.fresh").count() === 2)

    val e = intercept[Exception] {
      spark.sql(
        s"""REPLACE TABLE $cat.db.nope AS
           |SELECT * FROM VALUES (1L, 'a') AS t(id, v)""".stripMargin)
    }
    assert(e.getMessage.toLowerCase.contains("table"), e.getMessage)
    assert(!TransactionalTable.exists(s"$w/db/nope"))
  }

  test("RTAS with PARTITIONED BY installs the new partition spec") {
    val (cat, w) = freshCatalog()
    seedRetail(w)
    spark.sql(
      s"""CREATE OR REPLACE TABLE $cat.db.retail
         |PARTITIONED BY (bucket(4, trans_id)) TBLPROPERTIES('pk'='trans_id') AS
         |SELECT trans_id, customer_id, amount FROM $cat.db.retail""".stripMargin)
    val t = TransactionalTable.open(spark, s"$w/db/retail")
    assert(t.partitionSpec.exists {
      case graft.table.PartitionTransform.Bucket(4, c) => c.equalsIgnoreCase("trans_id")
      case _ => false
    })
    assert(spark.sql(s"SELECT * FROM $cat.db.retail").count() === 10)
    // old spec must not leak into the replaced table's era bookkeeping
    assert(t.pastSpecs.isEmpty && t.currentSpecId === 0)
  }

  test("replace keeps the existing pk when the new schema still carries it") {
    val (cat, w) = freshCatalog()
    seedRetail(w)
    spark.sql(
      s"""CREATE OR REPLACE TABLE $cat.db.retail AS
         |SELECT trans_id, amount FROM $cat.db.retail WHERE amount > 20""".stripMargin)
    val t = TransactionalTable.open(spark, s"$w/db/retail")
    assert(t.pk === Cdc.PrimaryKey)
    // and a post-replace MERGE works against the new shape
    Seq((999L, 1)).toDF("trans_id", "amount").createOrReplaceTempView("rt_src")
    spark.sql(
      s"""MERGE INTO $cat.db.retail t USING rt_src s ON t.trans_id = s.trans_id
         |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql(s"SELECT * FROM $cat.db.retail WHERE trans_id = 999").count() === 1)
  }

  test("active branches reject REPLACE; MOR deletes are cleared by it") {
    val (cat, w) = freshCatalog()
    val t = seedRetail(w)
    t.createBranch("audit")
    val e = intercept[Exception] {
      spark.sql(s"CREATE OR REPLACE TABLE $cat.db.retail AS SELECT 1L AS id")
    }
    assert(e.getMessage.contains("branches"), e.getMessage)
    t.dropBranch("audit")

    // MOR-pending table: replace clears the delete files with the contents
    t.mergeAdhoc(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], t.schema),
      Seq(6L).toDF("trans_id"), mode = graft.table.MergeMode.MergeOnRead)
    assert(TransactionalTable.open(spark, s"$w/db/retail").snapshot.deletes.nonEmpty)
    spark.sql(
      s"""CREATE OR REPLACE TABLE $cat.db.retail AS
         |SELECT trans_id, amount FROM $cat.db.retail""".stripMargin)
    val nt = TransactionalTable.open(spark, s"$w/db/retail")
    assert(nt.snapshot.deletes.isEmpty)
    // the MOR delete applied: key 6 was masked, so the replaced contents lack it
    assert(nt.scan().filter($"trans_id" === 6L).count() === 0)
    assert(nt.countRows === 9)
  }

  test("DESCRIBE EXTENDED / SHOW TBLPROPERTIES surface engine metadata") {
    val (cat, w) = freshCatalog()
    seedRetail(w)
    spark.sql(s"ALTER TABLE $cat.db.retail SET TBLPROPERTIES(" +
      "'write.sort-order'='trans_datetime desc')")
    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.db.retail")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("pk") === Cdc.PrimaryKey)
    assert(props("partition") === s"identity(${Cdc.PartitionColumn})")
    assert(props("row-count") === "10")
    assert(props("write.sort-order") === "trans_datetime desc")
    val desc = spark.sql(s"DESCRIBE TABLE EXTENDED $cat.db.retail")
      .collect().map(_.getString(0))
    assert(desc.contains("trans_id"), desc.mkString(", "))
  }

  test("crash between commit and meta rewrite heals from the manifest stamp on open") {
    val (cat, w) = freshCatalog()
    seedRetail(w)
    val root = s"$w/db/retail"
    val oldMeta = Files.readAllBytes(Paths.get(root, "_table.json"))
    spark.sql(
      s"""CREATE OR REPLACE TABLE $cat.db.retail TBLPROPERTIES('pk'='event') AS
         |SELECT event, COUNT(*) AS n FROM $cat.db.retail GROUP BY event""".stripMargin)
    // Simulate the crash window: restore the PRE-replace meta cache and
    // resurrect the pending marker, aged past the in-flight grace window.
    Files.write(Paths.get(root, "_table.json"), oldMeta)
    val marker = Paths.get(root, "_replace_pending")
    Files.write(marker, Array.emptyByteArray)
    Files.setLastModifiedTime(marker, java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - TransactionalTable.OrphanManifestGraceMs - 1000))

    val healed = TransactionalTable.open(spark, root)
    assert(healed.pk === "event")
    assert(healed.schema.fieldNames.toSeq === Seq("event", "n"))
    assert(!Files.exists(marker), "heal must consume the marker")
    // a FRESH marker (in-flight replace) is left alone
    Files.write(marker, Array.emptyByteArray)
    TransactionalTable.open(spark, root)
    assert(Files.exists(marker))
    Files.delete(marker)
  }
}
