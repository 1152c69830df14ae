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

  test("writer-behavior properties and custom metadata SURVIVE schema evolution and replace") {
    // _table.json rewrites (ALTER/evolution/replace) rebuilt the file from
    // scratch and carried only an allowlist — auto-compaction, parquet
    // blooms, codec, per-op write modes and custom.* metadata silently
    // vanished on the first DDL. The fix carries every non-structural field.
    import org.apache.spark.sql.types._
    val root = tmpDir("props-survive")
    val t = TransactionalTable.create(spark, root,
      StructType.fromDDL("id LONG, v LONG"), pk = "id")
    t.append(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"))
    t.setAutoCompact(minFiles = 7, targetRows = 1234L)
    t.setParquetBloom("v", on = true)
    t.setCompressionCodec("gzip")
    t.setRowLevelMode("delete", "merge-on-read")
    t.setCustomMeta("pq.books", "0.5,0.25|0.125,1.0")
    def assertCarried(label: String, tt: TransactionalTable): Unit = {
      assert(tt.autoCompact === Some((7, 1234L)), s"$label: autoCompact lost")
      assert(tt.parquetBloomCols === Seq("v"), s"$label: parquet bloom lost")
      assert(tt.compressionCodec === Some("gzip"), s"$label: codec lost")
      assert(tt.rowLevelModeName("delete") === "merge-on-read",
        s"$label: write mode lost")
      assert(tt.customMeta("pq.books") === Some("0.5,0.25|0.125,1.0"),
        s"$label: custom metadata lost")
    }
    val t2 = t.addColumn("w", LongType)
    assertCarried("addColumn", TransactionalTable.open(spark, root))
    val t3 = t2.addColumn("x", StringType)
    assertCarried("second addColumn", TransactionalTable.open(spark, root))
    // REPLACE is fresh-table semantics for content/schema-bound metadata:
    // custom.* stamps (they describe the REPLACED rows — e.g. PQ books
    // would decode new codes against books trained on dead data), blooms,
    // codec, per-op modes all drop; schema-free WRITER behavior carries
    // (the MV full-recompute path rides replaceWith — losing the
    // auto-compaction cadence there would undo bounded-file maintenance)
    val t4 = t3.replaceWith(Seq((5L, 50L)).toDF("id", "v"),
      StructType.fromDDL("id LONG, v LONG"), "id", None)
    val r = TransactionalTable.open(spark, root)
    assert(r.autoCompact === Some((7, 1234L)), "replace: autoCompact carries")
    assert(r.customMeta("pq.books").isEmpty,
      "replace: content-describing custom.* must NOT survive")
    assert(r.parquetBloomCols.isEmpty, "replace: schema-bound blooms drop")
    assert(r.rowLevelModeName("delete") !== "merge-on-read",
      "replace: per-op write modes reset")
    assert(t4.scan().select("id").as[Long].collect().toSeq === Seq(5L))
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

  test("auto-compaction: small-file debt triggers partition-scoped bin-pack; data exact") {
    val root = tmpDir("ttable-autoc") + "/t"
    val sch = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("p", org.apache.spark.sql.types.StringType)))
    val t = TransactionalTable.create(spark, root, sch, "id", partitionCol = Some("p"))
    t.setAutoCompact(minFiles = 6, targetRows = 1000L)
    assert(t.autoCompact === Some((6, 1000L)))
    // 10 tiny merges across 2 partitions: without auto-compact ~20 small
    // files accrete; the trigger must bin-pack along the way
    (0 until 10).foreach { i =>
      t.merge(Seq((i.toLong, "a"), (i + 100L, "b")).toDF("id", "p"),
        spark.emptyDataset[Long].toDF("id"), batchId = i.toLong)
    }
    val files = t.snapshot.files
    assert(files.size < 10, s"auto-compaction must bound file count, got ${files.size}")
    // a maintenance commit actually ran (operation stamped in history)
    val ops = (1L to t.currentVersion).flatMap(v => t.operationOf(v))
    assert(ops.exists(o => o.startsWith("compact")), s"no compaction in $ops")
    // data exact after the interleaved compactions
    assert(t.scan().select("id").as[Long].collect().sorted.toSeq ===
      ((0L until 10L) ++ (100L until 110L)).sorted)
    // replay fence intact: re-sending an old batch is a no-op — even with a
    // hair-trigger threshold (minFiles=1), a fenced replay must stay
    // version-stable (no maintenance commit rides on a no-op)
    t.setAutoCompact(minFiles = 1, targetRows = 1000L)
    val v = t.currentVersion
    t.merge(Seq((999L, "a")).toDF("id", "p"),
      spark.emptyDataset[Long].toDF("id"), batchId = 3L)
    assert(t.currentVersion === v, "fenced replay must not commit")
    // disable: property cleared, no further compactions
    t.setAutoCompact(0)
    assert(t.autoCompact.isEmpty)
  }

  test("auto-compaction detects MIXED chunks (tiny files hidden behind an above-target mean)") {
    val root = tmpDir("ttable-autoc-mixed") + "/t"
    val sch = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("p", org.apache.spark.sql.types.StringType)))
    val t = TransactionalTable.create(spark, root, sch, "id", partitionCol = Some("p"))
    t.setWriteDistribution("hash") // one file per partition value per commit
    t.setAutoCompact(minFiles = 2, targetRows = 1000L)
    // Each commit lands one 5000-row file + two 1-row files in ONE chunk:
    // chunk mean ≈ 1667 > target, so mean-only debt counting sees ZERO —
    // the minFileRows stat must still surface the tiny files as debt.
    (0 until 2).foreach { i =>
      val base = i * 1000000L
      val big = (0L until 5000L).map(j => (base + j, "big"))
      val tiny = Seq((base + 900001L, "s1"), (base + 900002L, "s2"))
      t.merge((big ++ tiny).toDF("id", "p"),
        spark.emptyDataset[Long].toDF("id"), batchId = i.toLong)
    }
    val ops = (1L to t.currentVersion).flatMap(v => t.operationOf(v))
    assert(ops.exists(_.startsWith("compact")),
      s"mixed-chunk debt must trigger auto-compaction, ops=$ops")
    // tiny files packed, big files untouched, data exact
    assert(t.scan().count() === 2 * 5002L)
    val small = t.snapshot.files.count(_.rows < 1000L)
    assert(small <= 2, s"tiny files must be packed, got $small small files")
  }

  test("auto-compaction via SQL TBLPROPERTIES: bounded files, property round-trips") {
    val cat = freshCat()
    spark.sql(s"""CREATE TABLE $cat.db.ac (id BIGINT, v STRING)
      TBLPROPERTIES('pk'='id', 'write.auto-compact.min-files'='5',
                    'write.auto-compact.target-rows'='1000')""")
    (0 until 9).foreach(i =>
      spark.sql(s"INSERT INTO $cat.db.ac VALUES ($i, 'x$i')"))
    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.db.ac").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("write.auto-compact.min-files").contains("5"))
    assert(props.get("write.auto-compact.target-rows").contains("1000"))
    val t = TransactionalTable.open(spark,
      s"${spark.conf.get(s"spark.sql.catalog.$cat.warehouse")}/db/ac")
    assert(t.snapshot.files.size < 9,
      s"SQL-declared auto-compaction must bound files, got ${t.snapshot.files.size}")
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.db.ac").collect().head.getLong(0) === 9L)
  }

  test("compression codec property: footers carry the codec; ALTER affects future writes; compaction migrates") {
    val cat = freshCat()
    spark.sql(s"CREATE TABLE $cat.db.cc (id BIGINT, v STRING) TBLPROPERTIES(" +
      "'pk'='id', 'write.parquet.compression-codec'='zstd')")
    spark.sql(s"INSERT INTO $cat.db.cc SELECT id, concat('v-', id) FROM range(0, 100)")
    val warehouse = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
    val t = TransactionalTable.open(spark, s"$warehouse/db/cc")
    def codecsOf(paths: Seq[String]): Set[String] = {
      val conf = spark.sessionState.newHadoopConf()
      paths.flatMap { p =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(p), conf))
        try {
          import scala.jdk.CollectionConverters._
          r.getFooter.getBlocks.get(0).getColumns.asScala.map(_.getCodec.name()).toSeq
        } finally r.close()
      }.toSet
    }
    assert(codecsOf(t.snapshot.files.map(_.path).toSeq) === Set("ZSTD"))
    // SHOW TBLPROPERTIES round-trips
    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.db.cc").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("write.parquet.compression-codec").contains("zstd"))
    // ALTER: future writes pick the new codec; old files keep theirs
    spark.sql(s"ALTER TABLE $cat.db.cc SET TBLPROPERTIES(" +
      "'write.parquet.compression-codec'='gzip')")
    spark.sql(s"INSERT INTO $cat.db.cc SELECT id, concat('w-', id) FROM range(100, 200)")
    val t2 = TransactionalTable.open(spark, s"$warehouse/db/cc")
    assert(codecsOf(t2.snapshot.files.map(_.path).toSeq) === Set("ZSTD", "GZIP"))
    // mixed codecs read fine (parquet is self-describing per file)
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.db.cc").collect().head.getLong(0) === 200L)
    // compaction migrates everything to the declared codec
    t2.compact(minFileRows = 1L << 20)
    val t3 = TransactionalTable.open(spark, s"$warehouse/db/cc")
    assert(codecsOf(t3.snapshot.files.map(_.path).toSeq) === Set("GZIP"))
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.db.cc").collect().head.getLong(0) === 200L)
    // invalid codec refused
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.db.cc SET TBLPROPERTIES(" +
        "'write.parquet.compression-codec'='bogus')")
    }
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
