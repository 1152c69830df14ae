package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.table.{MergeMode, TransactionalTable}

/** Stored VARIANT columns (Iceberg v3): engine tables persist variant
  * binary, serve typed gets, evolve schema, time travel — and SHRED declared
  * hot paths into typed physical side-columns so a typed read never decodes
  * the variant binary ([[TransactionalTable.setVariantShred]]). */
class VariantColumnSpec extends SparkSpec {
  import spark.implicits._

  private val sch = StructType(Seq(
    StructField("id", LongType), StructField("v", VariantType)))

  private def mk(prefix: String): TransactionalTable =
    TransactionalTable.create(spark, tmpDir(prefix), sch, "id")

  private def rows(pairs: (Long, String)*) =
    pairs.toDF("id", "js").select(col("id"), parse_json(col("js")).as("v"))

  private def noDel = spark.emptyDataset[Long].toDF("id")

  test("variant column: write, scan, typed get, time travel") {
    val t = mk("ttable-var")
    t.merge(rows(1L -> """{"a": 10, "b": "x"}""", 2L -> """{"a": 20, "b": "y"}"""),
      noDel, batchId = 0)
    val got = t.scan()
      .select(col("id"), variant_get(col("v"), "$.a", "bigint").as("a"),
        variant_get(col("v"), "$.b", "string").as("b"))
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 10L, "x"), (2L, 20L, "y")))
    val v1 = t.currentVersion
    // CoW update rewrites the variant binary losslessly
    t.merge(rows(2L -> """{"a": 99, "b": "z", "c": true}"""), noDel, batchId = 1)
    assert(t.scan().select(variant_get(col("v"), "$.a", "bigint"))
      .as[Long].collect().sorted.toSeq === Seq(10L, 99L))
    // time travel reads the old binary under the old snapshot
    assert(t.scanAt(v1).select(variant_get(col("v"), "$.a", "bigint"))
      .as[Long].collect().sorted.toSeq === Seq(10L, 20L))
  }

  test("shredding declared at create: typed reads never touch the variant binary") {
    val t = mk("ttable-var-shred")
    t.setVariantShred("v", Seq(("a", "$.a", "bigint"), ("b", "$.b", "string")))
    t.merge(rows(1L -> """{"a": 1, "b": "x"}""", 2L -> """{"a": 2, "b": "y"}"""),
      noDel, batchId = 0)
    // ordinary scans are untouched: logical schema has no side-columns
    assert(t.scan().columns.toSeq === Seq("id", "v"))
    val sh = t.scanShredded("v")
    assert(sh.columns.toSeq === Seq("id", "a", "b"))
    assert(sh.as[(Long, Long, String)].collect().sortBy(_._1).toSeq ===
      Seq((1L, 1L, "x"), (2L, 2L, "y")))
    // PRUNING PROOF: the physical plan's parquet read schema contains the
    // typed side-columns and NOT the variant column
    val plan = sh.queryExecution.executedPlan.toString
    assert(plan.contains("_sh_v_a"), s"shredded column missing from plan:\n$plan")
    assert(!plan.contains("v: variant") && !plan.contains("v#"),
      s"variant binary must not be read by the shredded scan:\n$plan")
  }

  test("declaring shredding on existing data rewrites files; merges keep the invariant") {
    val t = mk("ttable-var-late")
    t.merge(rows(1L -> """{"a": 1}""", 2L -> """{"a": 2}"""), noDel, batchId = 0)
    val vBefore = t.currentVersion
    t.setVariantShred("v", Seq(("a", "$.a", "bigint")))
    assert(t.currentVersion === vBefore + 1, "late shred must rewrite in one commit")
    assert(t.operationOf(t.currentVersion).contains("shred"))
    assert(t.scanShredded("v").select("a").as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L))
    // a CoW merge after the declaration regenerates side-columns
    t.merge(rows(2L -> """{"a": 22}""", 3L -> """{"a": 3}"""), noDel, batchId = 1)
    assert(t.scanShredded("v").select("a").as[Long].collect().sorted.toSeq ===
      Seq(1L, 3L, 22L))
    // missing path shreds to NULL, not an error
    t.merge(rows(4L -> """{"b": "only"}"""), noDel, batchId = 2)
    assert(t.scanShredded("v").filter(col("id") === 4L)
      .select("a").collect().head.isNullAt(0))
  }

  test("MOR deletes are applied by the shredded scan") {
    val t = mk("ttable-var-mor")
    t.setVariantShred("v", Seq(("a", "$.a", "bigint")))
    t.merge(rows(1L -> """{"a": 1}""", 2L -> """{"a": 2}"""), noDel, batchId = 0)
    t.merge(rows(), Seq(1L).toDF("id"), batchId = 1, mode = MergeMode.MergeOnRead)
    assert(t.scanShredded("v").select("id", "a").as[(Long, Long)].collect().toSeq ===
      Seq((2L, 2L)))
  }

  test("transparent rewrite: SQL variant_get over a shredded table reads the side-column") {
    val cat = s"graft_vsr${System.nanoTime()}"
    val w = tmpDir("graft-vsr-wh")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    spark.sql(s"""CREATE TABLE $cat.db.t (id BIGINT, v VARIANT)
      TBLPROPERTIES('pk'='id', 'variant.shred.v'='a:$$.a:bigint')""")
    spark.sql(s"""INSERT INTO $cat.db.t
      SELECT 1L, parse_json('{"a": 7, "b": "x"}')
      UNION ALL SELECT 2L, parse_json('{"a": 8, "b": "y"}')
      UNION ALL SELECT 3L, parse_json('{"b": "z"}')""")

    // declared path + type: rewritten — plan reads _sh_v_a, never the binary
    val q = spark.sql(
      s"SELECT id, variant_get(v, '$$.a', 'bigint') AS a FROM $cat.db.t ORDER BY id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("_sh_v_a"), s"rewrite did not engage:\n$plan")
    assert(!plan.contains("variant_get") && !plan.toLowerCase.contains("variantget"),
      s"binary decode survived the rewrite:\n$plan")
    assert(q.collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSeq === Seq((1L, Some(7L)), (2L, Some(8L)), (3L, None)))

    // WHERE on the shredded path rewrites too
    val f = spark.sql(
      s"SELECT id FROM $cat.db.t WHERE variant_get(v, '$$.a', 'bigint') > 7")
    assert(f.queryExecution.executedPlan.toString.contains("_sh_v_a"))
    assert(f.as[Long].collect().toSeq === Seq(2L))

    // aggregate over the shredded path
    val ag = spark.sql(
      s"SELECT SUM(variant_get(v, '$$.a', 'bigint')) AS s FROM $cat.db.t")
    assert(ag.queryExecution.executedPlan.toString.contains("_sh_v_a"))
    assert(ag.as[Long].head() === 15L)

    // UNDECLARED path: falls back to the binary decode, still correct
    val nb = spark.sql(
      s"SELECT variant_get(v, '$$.b', 'string') AS b FROM $cat.db.t ORDER BY id")
    assert(!nb.queryExecution.executedPlan.toString.contains("_sh_v_b"))
    assert(nb.as[String].collect().toSeq === Seq("x", "y", "z"))

    // DECLARED path at a DIFFERENT target type: not provably the same value
    val dt = spark.sql(
      s"SELECT variant_get(v, '$$.a', 'string') AS a FROM $cat.db.t WHERE id = 1")
    assert(!dt.queryExecution.executedPlan.toString.contains("_sh_v_a"))
    assert(dt.as[String].head() === "7")
  }

  test("shred spec parses comma-bearing target types (decimal, struct, map)") {
    import graft.sql.GraftCatalog.parseShredSpec
    assert(parseShredSpec("d:$.price:decimal(10,2), s:$.obj:struct<a:int,b:string>") ===
      Seq(("d", "$.price", "decimal(10,2)"), ("s", "$.obj", "struct<a:int,b:string>")))
    assert(parseShredSpec("m:$.kv:map<string,int>") === Seq(("m", "$.kv", "map<string,int>")))
    // and end-to-end: a decimal shred column works through the table layer
    val t = mk("ttable-var-dec")
    t.setVariantShred("v", Seq(("p", "$.p", "decimal(10,2)")))
    t.merge(rows(1L -> """{"p": 12.34}""", 2L -> """{"p": 0.5}"""), noDel, batchId = 0)
    assert(t.scanShredded("v").select("p").as[java.math.BigDecimal].collect()
      .map(_.toPlainString).sorted.toSeq === Seq("0.50", "12.34"))
  }

  test("shred spec is additive-only on a live column; clear is the escape hatch") {
    val t = mk("ttable-var-add")
    t.setVariantShred("v", Seq(("a", "$.a", "bigint")))
    t.merge(rows(1L -> """{"a": 1, "b": "x"}"""), noDel, batchId = 0)
    // adding a field while keeping the old one: allowed, rewrites once
    t.setVariantShred("v", Seq(("a", "$.a", "bigint"), ("b", "$.b", "string")))
    assert(t.scanShredded("v").columns.toSeq === Seq("id", "a", "b"))
    // dropping a live field is refused (stale-spec readers would read NULLs)
    intercept[IllegalArgumentException] {
      t.setVariantShred("v", Seq(("b", "$.b", "string")))
    }
    // retyping a live field is refused for the same reason
    intercept[IllegalArgumentException] {
      t.setVariantShred("v", Seq(("a", "$.a", "string"), ("b", "$.b", "string")))
    }
    // explicit clear works and does not rewrite data files
    val v = t.currentVersion
    t.setVariantShred("v", Seq.empty)
    assert(t.variantShred.get("v").isEmpty)
    assert(t.currentVersion === v)
  }

  test("failed shred materialization rolls the spec back (no live spec without side-columns)") {
    val t = mk("ttable-var-roll")
    t.merge(rows(1L -> """{"a": 1}"""), noDel, batchId = 0)
    // an invalid JSON-path type pairing won't fail validation, so force the
    // rewrite to fail by colliding with a concurrently-held commit fence:
    // simplest deterministic failure = declare a shred whose target type
    // cannot cast (variant_get throws at execution inside rewriteAllFiles)
    intercept[Exception] {
      t.setVariantShred("v", Seq(("bad", "$.a", "array<int>")))
    }
    // the spec must NOT survive the failed rewrite
    assert(t.variantShred.get("v").isEmpty,
      s"spec leaked after failed rewrite: ${t.variantShred}")
    // and the table still scans fine
    assert(t.scan().count() === 1L)
  }

  test("crashed flip window: heal-pending marker serves the binary, heal restores the fast path") {
    val dir = tmpDir("ttable-var-crash")
    val t = TransactionalTable.create(spark, dir, sch, "id")
    t.merge(rows(1L -> """{"a": 1}""", 2L -> """{"a": 2}"""), noDel, batchId = 0)
    // Simulate a crash immediately after setVariantShred's spec flip: the
    // spec is LIVE and the heal-pending marker is set, but no live file
    // carries the side-columns — exactly the straddler state a crash
    // between the flip write and the heal commit leaves behind.
    val p = java.nio.file.Paths.get(dir, "_table.json")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val m = om.readTree(java.nio.file.Files.readAllBytes(p))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val arr = m.putObject("variantShred").putArray("v")
    val a = arr.addArray(); a.add("a"); a.add("$.a"); a.add("bigint")
    m.putArray("shredHealPending").add("v")
    java.nio.file.Files.write(p, om.writeValueAsBytes(m))

    val t2 = TransactionalTable.open(spark, dir)
    assert(t2.shredHealPending === Set("v"))
    // read path: REAL values from the variant binary — never silent NULLs
    assert(t2.scanShredded("v").select("a").as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L))
    // heal re-materializes every live file and clears the marker
    t2.healVariantShred()
    assert(t2.shredHealPending.isEmpty)
    val sh = t2.scanShredded("v")
    assert(sh.queryExecution.executedPlan.toString.contains("_sh_v_a"),
      "fast path must serve the physical side-column after heal")
    assert(sh.select("a").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    // idempotent: a second heal is a no-op
    val v = t2.currentVersion
    t2.healVariantShred()
    assert(t2.currentVersion === v)
  }

  test("SQL surface: CREATE with VARIANT + shred property, DML, SHOW TBLPROPERTIES") {
    val cat = s"graft_var${System.nanoTime()}"
    val w = tmpDir("graft-var-wh")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    spark.sql(s"""CREATE TABLE $cat.db.t (id BIGINT, v VARIANT)
      TBLPROPERTIES('pk'='id', 'variant.shred.v'='a:$$.a:bigint, b:$$.b:string')""")
    spark.sql(s"""INSERT INTO $cat.db.t
      SELECT 1L, parse_json('{"a": 7, "b": "x"}')
      UNION ALL SELECT 2L, parse_json('{"a": 8, "b": "y"}')""")
    assert(spark.sql(
      s"SELECT id, variant_get(v, '$$.a', 'bigint') AS a FROM $cat.db.t ORDER BY id")
      .as[(Long, Long)].collect().toSeq === Seq((1L, 7L), (2L, 8L)))
    // row-level SQL over the variant table (CoW rewrite keeps the invariant)
    spark.sql(s"DELETE FROM $cat.db.t WHERE id = 1")
    val t = TransactionalTable.open(spark, s"$w/db/t")
    assert(t.scanShredded("v").select("id", "a").as[(Long, Long)].collect().toSeq ===
      Seq((2L, 8L)))
    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.db.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("variant.shred.v").contains("a:$.a:bigint, b:$.b:string"))
    // schema evolution: a second variant column arrives nullable
    spark.sql(s"ALTER TABLE $cat.db.t ADD COLUMN w VARIANT")
    assert(spark.sql(s"SELECT w FROM $cat.db.t").collect().head.isNullAt(0))
  }
}
