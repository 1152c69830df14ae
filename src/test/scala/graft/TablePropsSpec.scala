package graft

import org.apache.spark.sql.functions._

import graft.table.TransactionalTable

/** TRUNCATE TABLE (DSv2 TruncatableTable) and per-column parquet bloom
  * filters (`write.parquet.bloom-filter-enabled.column.<col>`). */
class TablePropsSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat(): String = {
    val cat = s"graft_tp${System.nanoTime()}"
    val warehouse = tmpDir("graft-tp-wh")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$warehouse/db"))
    cat
  }

  test("TRUNCATE TABLE: metadata-only empty state; time travel intact; reusable") {
    val cat = freshCat()
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v STRING) TBLPROPERTIES('pk'='id')")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 'a'), (2, 'b')")
    val vFull = spark.sql(s"SELECT version FROM $cat.db.t.history ORDER BY version DESC")
      .collect().head.getLong(0)
    spark.sql(s"TRUNCATE TABLE $cat.db.t")
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.db.t").collect().head.getLong(0) === 0L)
    // pre-truncate snapshot still time-travels (files were not deleted)
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.db.t VERSION AS OF $vFull")
      .collect().head.getLong(0) === 2L)
    // operation stamped in history
    val ops = spark.sql(s"SELECT operation FROM $cat.db.t.history ORDER BY version")
      .collect().map(_.getString(0)).toSeq
    assert(ops.last === "truncate")
    // table stays writable after truncation
    spark.sql(s"INSERT INTO $cat.db.t VALUES (9, 'z')")
    assert(spark.sql(s"SELECT id FROM $cat.db.t").as[Long].collect().toSeq === Seq(9L))
  }

  test("parquet bloom property: footer carries the filter; reads stay correct") {
    val cat = freshCat()
    spark.sql(s"CREATE TABLE $cat.db.b (id BIGINT, req STRING) TBLPROPERTIES(" +
      "'pk'='id', 'write.parquet.bloom-filter-enabled.column.req'='true')")
    spark.sql(s"INSERT INTO $cat.db.b SELECT id, concat('r-', id) " +
      "FROM range(0, 1000)")
    // SHOW TBLPROPERTIES round-trips the property
    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.db.b").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("write.parquet.bloom-filter-enabled.column.req").contains("true"))
    // the written files' footers carry a bloom filter for `req` and not `id`
    val warehouse = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
    val t = TransactionalTable.open(spark, s"$warehouse/db/b")
    val path = t.snapshot.files.head.path
    val conf = spark.sessionState.newHadoopConf()
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(path), conf))
    try {
      val cols = reader.getFooter.getBlocks.get(0).getColumns
      import scala.jdk.CollectionConverters._
      val byName = cols.asScala.map(c => c.getPath.toDotString -> c).toMap
      assert(byName("req").getBloomFilterOffset > 0,
        "declared column lacks a parquet bloom filter")
      assert(byName("id").getBloomFilterOffset <= 0,
        "undeclared column unexpectedly has a bloom filter")
    } finally reader.close()
    // point lookup stays correct (the filter is a skipping aid, not a change)
    assert(spark.sql(s"SELECT id FROM $cat.db.b WHERE req = 'r-77'")
      .as[Long].collect().toSeq === Seq(77L))
    // disable: future writes stop emitting it
    spark.sql(s"ALTER TABLE $cat.db.b SET TBLPROPERTIES(" +
      "'write.parquet.bloom-filter-enabled.column.req'='false')")
    assert(TransactionalTable.open(spark, s"$warehouse/db/b").parquetBloomCols.isEmpty)
  }
}
