package graft

import org.apache.spark.sql.types._

import graft.table.TransactionalTable

/** MERGE WITH SCHEMA EVOLUTION (Iceberg/Delta parity): source-only columns
  * are added to the target as nullable columns (zero data movement — old
  * files null-fill at read) before the merge routes through the normal star
  * paths. General clause lists under evolution are rejected loudly.
  */
class MergeEvolveSpec extends SparkSpec {
  import spark.implicits._

  private def mkCatalog(cat: String): String = {
    val w = tmpDir(s"mev-$cat")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    w
  }

  test("star merge adds source-only columns; old rows null-fill; time travel keeps old schema") {
    val w = mkCatalog("gme1")
    val t = TransactionalTable.create(spark, s"$w/db/t",
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))), "id")
    t.append(Seq(1L -> "a", 2L -> "b").toDF("id", "v"))
    val preEvolve = t.currentVersion
    Seq((2L, "B", 20), (3L, "C", 30)).toDF("id", "v", "extra")
      .createOrReplaceTempView("gme1_src")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO gme1.db.t t USING gme1_src s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val evolved = TransactionalTable.open(spark, s"$w/db/t")
    assert(evolved.schema.fieldNames.toSeq === Seq("id", "v", "extra"))
    val got = spark.sql("SELECT id, v, extra FROM gme1.db.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)))).toSeq
    assert(got === Seq((1L, "a", None), (2L, "B", Some(20)), (3L, "C", Some(30))))
    // pre-evolution snapshot keeps its narrow schema
    assert(evolved.schemaAt(preEvolve).fieldNames.toSeq === Seq("id", "v"))
  }

  test("without the clause, an extra source column does not evolve the target") {
    val w = mkCatalog("gme2")
    val t = TransactionalTable.create(spark, s"$w/db/t",
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))), "id")
    t.append(Seq(1L -> "a").toDF("id", "v"))
    Seq((1L, "A", 9)).toDF("id", "v", "extra").createOrReplaceTempView("gme2_src")
    spark.sql(
      """MERGE INTO gme2.db.t t USING gme2_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(TransactionalTable.open(spark, s"$w/db/t").schema.fieldNames.toSeq
      === Seq("id", "v"), "plain MERGE must not evolve the schema")
  }

  test("evolution with an identical source schema is a plain merge") {
    val w = mkCatalog("gme3")
    val t = TransactionalTable.create(spark, s"$w/db/t",
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))), "id")
    t.append(Seq(1L -> "a").toDF("id", "v"))
    Seq((1L, "A"), (2L, "b2")).toDF("id", "v").createOrReplaceTempView("gme3_src")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO gme3.db.t t USING gme3_src s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val opened = TransactionalTable.open(spark, s"$w/db/t")
    assert(opened.schema.fieldNames.toSeq === Seq("id", "v"))
    assert(opened.scan().count() === 2L)
  }

  test("general clause list under evolution is rejected with guidance") {
    val w = mkCatalog("gme4")
    val t = TransactionalTable.create(spark, s"$w/db/t",
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))), "id")
    t.append(Seq(1L -> "a").toDF("id", "v"))
    Seq((1L, "A", 9)).toDF("id", "v", "extra").createOrReplaceTempView("gme4_src")
    val e = intercept[Exception](spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO gme4.db.t t USING gme4_src s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin))
    assert(e.getMessage.contains("star-form"),
      s"expected the star-form guidance, got: ${e.getMessage}")
  }

  test("second evolving merge is idempotent on the schema") {
    val w = mkCatalog("gme5")
    val t = TransactionalTable.create(spark, s"$w/db/t",
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))), "id")
    t.append(Seq(1L -> "a").toDF("id", "v"))
    Seq((1L, "A", 1), (2L, "B", 2)).toDF("id", "v", "extra")
      .createOrReplaceTempView("gme5_src")
    val stmt =
      """MERGE WITH SCHEMA EVOLUTION INTO gme5.db.t t USING gme5_src s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin
    spark.sql(stmt)
    spark.sql(stmt)
    val opened = TransactionalTable.open(spark, s"$w/db/t")
    assert(opened.schema.fieldNames.toSeq === Seq("id", "v", "extra"),
      "re-running the evolving merge must not duplicate the column")
    assert(opened.scan().count() === 2L)
  }
}
