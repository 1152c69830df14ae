package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.table.TransactionalTable

/** Column DEFAULT values (Iceberg v3): `EXISTS_DEFAULT` (initial-default —
  * what files written before the column existed read back; frozen at ADD
  * time) vs `CURRENT_DEFAULT` (write-default — what writes omitting the
  * column get; changeable via ALTER COLUMN SET DEFAULT). The parquet reader
  * distinguishes a genuine NULL in a post-add file from column ABSENCE, so
  * defaults never clobber explicit NULLs. */
class DefaultValuesSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat(): (String, String) = {
    val cat = s"graft_dv${System.nanoTime()}"
    val warehouse = tmpDir("graft-dv-wh")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$warehouse/db"))
    (cat, warehouse)
  }

  test("CREATE TABLE with DEFAULT: omitted columns and the DEFAULT keyword") {
    val (cat, _) = freshCat()
    spark.sql(s"CREATE TABLE $cat.db.d (id BIGINT, v STRING DEFAULT 'none') " +
      "TBLPROPERTIES('pk'='id')")
    spark.sql(s"INSERT INTO $cat.db.d (id) VALUES (1)")
    spark.sql(s"INSERT INTO $cat.db.d VALUES (2, DEFAULT), (3, 'x'), (4, NULL)")
    val m = spark.sql(s"SELECT id, v FROM $cat.db.d")
      .as[(Long, Option[String])].collect().toMap
    assert(m === Map(1L -> Some("none"), 2L -> Some("none"),
      3L -> Some("x"), 4L -> None))
  }

  test("ADD COLUMN DEFAULT: pre-add files serve the initial-default; NULL stays NULL") {
    val (cat, _) = freshCat()
    spark.sql(s"CREATE TABLE $cat.db.e (id BIGINT, v STRING) TBLPROPERTIES('pk'='id')")
    spark.sql(s"INSERT INTO $cat.db.e VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"ALTER TABLE $cat.db.e ADD COLUMN w INT DEFAULT 7")
    spark.sql(s"INSERT INTO $cat.db.e (id, v) VALUES (3, 'c')")
    spark.sql(s"INSERT INTO $cat.db.e VALUES (4, 'd', NULL), (5, 'e', 9)")
    val m = spark.sql(s"SELECT id, w FROM $cat.db.e")
      .as[(Long, Option[Int])].collect().toMap
    assert(m === Map(1L -> Some(7), 2L -> Some(7), 3L -> Some(7),
      4L -> None, 5L -> Some(9)),
      "initial-default must fill pre-add files; explicit NULL must survive")
  }

  test("SET/DROP DEFAULT changes the write-default, never the frozen initial") {
    val (cat, _) = freshCat()
    spark.sql(s"CREATE TABLE $cat.db.f (id BIGINT, v STRING) TBLPROPERTIES('pk'='id')")
    spark.sql(s"INSERT INTO $cat.db.f VALUES (1, 'a')")
    spark.sql(s"ALTER TABLE $cat.db.f ADD COLUMN d STRING DEFAULT 'init'")
    spark.sql(s"ALTER TABLE $cat.db.f ALTER COLUMN d SET DEFAULT 'later'")
    spark.sql(s"INSERT INTO $cat.db.f (id, v) VALUES (2, 'b')")
    val m1 = spark.sql(s"SELECT id, d FROM $cat.db.f")
      .as[(Long, Option[String])].collect().toMap
    assert(m1 === Map(1L -> Some("init"), 2L -> Some("later")),
      "pre-add rows keep the FROZEN initial-default; new writes take the new one")
    spark.sql(s"ALTER TABLE $cat.db.f ALTER COLUMN d DROP DEFAULT")
    spark.sql(s"INSERT INTO $cat.db.f (id, v) VALUES (3, 'c')")
    val m2 = spark.sql(s"SELECT id, d FROM $cat.db.f")
      .as[(Long, Option[String])].collect().toMap
    assert(m2(3L).isEmpty, "after DROP DEFAULT an omitted column is NULL")
    assert(m2(1L) === Some("init"))
  }

  test("CoW rewrite materializes the initial-default for carried rows") {
    val (cat, _) = freshCat()
    spark.sql(s"CREATE TABLE $cat.db.g (id BIGINT, v STRING) TBLPROPERTIES('pk'='id')")
    spark.sql(s"INSERT INTO $cat.db.g VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"ALTER TABLE $cat.db.g ADD COLUMN w INT DEFAULT 5")
    // UPDATE rewrites the file holding both rows; row 1 is carried
    spark.sql(s"UPDATE $cat.db.g SET v = 'B' WHERE id = 2")
    val m = spark.sql(s"SELECT id, w FROM $cat.db.g")
      .as[(Long, Option[Int])].collect().toMap
    assert(m === Map(1L -> Some(5), 2L -> Some(5)),
      "carried + updated rows must keep serving the initial-default after rewrite")
  }

  test("engine API: conformed() fills the write-default for omitted columns") {
    val root = tmpDir("ttable-defaults")
    val t0 = TransactionalTable.create(spark, root,
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))), "id")
    t0.merge(Seq((1L, "a")).toDF("id", "v"),
      spark.emptyDataset[Long].toDF("id"), batchId = 0)
    val md = new MetadataBuilder()
      .putString("CURRENT_DEFAULT", "42").putString("EXISTS_DEFAULT", "42").build()
    val t = t0.addColumn("w", IntegerType, md)
    t.merge(Seq((2L, "b")).toDF("id", "v"),
      spark.emptyDataset[Long].toDF("id"), batchId = 1)
    val m = t.scan().select($"id", $"w").as[(Long, Option[Int])].collect().toMap
    assert(m === Map(1L -> Some(42), 2L -> Some(42)))
  }
}
