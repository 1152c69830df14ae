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
}
