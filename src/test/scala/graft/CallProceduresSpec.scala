package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.table.TransactionalTable

/** Stored procedures (CALL graft.system.*): the Iceberg-style maintenance
  * runbook through SQL — each call mutates the table via the engine commit
  * path and returns a one-row result describing what happened.
  */
class CallProceduresSpec extends SparkSpec {
  import spark.implicits._

  private val sch = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def mkWarehouse(cat: String): String = {
    val w = tmpDir(s"proc-wh-$cat")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    w
  }

  private def noDel = spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
    StructType(Seq(StructField("id", LongType))))

  test("rollback_to_snapshot / create_tag / expire_snapshots round-trip") {
    val w = mkWarehouse("gp1")
    val t = TransactionalTable.create(spark, s"$w/db/t", sch, "id")
    t.append(Seq(1L -> "a").toDF("id", "v"))
    t.append(Seq(2L -> "b").toDF("id", "v"))
    val tagged = spark.sql("CALL gp1.system.create_tag('db.t', 'good', -1)")
      .as[Long].head()
    assert(tagged === 2L)
    t.append(Seq(3L -> "c").toDF("id", "v")) // the "bad" commit
    val rb = spark.sql("CALL gp1.system.rollback_to_snapshot('db.t', 2)")
      .as[(Long, Long)].head()
    assert(rb === ((3L, 4L)), "rollback is a NEW commit on top of v3")
    assert(TransactionalTable.open(spark, s"$w/db/t").scan().count() === 2L)
    val retained = spark.sql("CALL gp1.system.expire_snapshots('db.t', 2)")
      .as[Long].head()
    assert(retained >= 2L && retained <= 3L, s"keepLast=2 plus the tag, got $retained")
  }

  test("expire_snapshots_older_than: age-based retention, tags and keep_last survive") {
    val w = mkWarehouse("gpe")
    val t = TransactionalTable.create(spark, s"$w/db/t", sch, "id")
    t.append(Seq(1L -> "a").toDF("id", "v")) // v1
    t.append(Seq(2L -> "b").toDF("id", "v")) // v2
    spark.sql("CALL gpe.system.create_tag('db.t', 'pin', 1)")
    Thread.sleep(20)
    val boundary = System.currentTimeMillis()
    Thread.sleep(20)
    t.append(Seq(3L -> "c").toDF("id", "v")) // v3, after the boundary
    // age boundary expires v0/v2 (committed before); v1 survives via the
    // tag, v3 is young
    val retained = spark.sql(
      s"CALL gpe.system.expire_snapshots_older_than('db.t', ${boundary}L, 1)")
      .as[Long].head()
    assert(retained === 2L, s"want tagged v1 + young v3, got $retained")
    val h = TransactionalTable.open(spark, s"$w/db/t")
    assert(!h.manifestExists(0L) && h.manifestExists(1L) &&
      !h.manifestExists(2L) && h.manifestExists(3L))
    assert(h.scan().count() === 3L, "current state intact after expiry")
    // a boundary in the future still keeps keep_last young versions
    val retained2 = spark.sql(
      s"CALL gpe.system.expire_snapshots_older_than('db.t', ${boundary + 3600000}L, 1)")
      .as[Long].head()
    assert(retained2 === 2L, "keep_last + tag floor holds against a future boundary")
  }

  test("compact / compact_clustered / compact_zordered / remove_orphan_files") {
    val w = mkWarehouse("gp2")
    val t = TransactionalTable.create(spark, s"$w/db/t",
      StructType(Seq(StructField("id", LongType), StructField("x", LongType),
        StructField("y", LongType))), "id")
    (0 until 3).foreach(i => t.append(
      (0L until 64L).map(j => (i * 64L + j, j % 8, j / 8)).toDF("id", "x", "y"),
      batchId = i))
    val Seq((before, after)) = spark.sql("CALL gp2.system.compact('db.t', 1048576)")
      .as[(Long, Long)].collect().toSeq
    assert(before > after, s"compaction must shrink the file count ($before -> $after)")
    val clustered = spark.sql("CALL gp2.system.compact_clustered('db.t', 4)")
      .as[Long].head()
    assert(clustered === 4L)
    val zed = spark.sql("CALL gp2.system.compact_zordered('db.t', 'x', 'y', 4)")
      .as[Long].head()
    assert(zed >= 1L)
    val swept = spark.sql("CALL gp2.system.remove_orphan_files('db.t', 0)").as[Long].head()
    assert(swept >= 0L)
    assert(TransactionalTable.open(spark, s"$w/db/t").scan().count() === 192L)
  }

  test("compact_partitions rewrites only the named partitions' files") {
    val w = mkWarehouse("gpcp")
    val t = TransactionalTable.create(spark, s"$w/db/t",
      StructType(Seq(StructField("id", LongType), StructField("p", StringType))),
      "id", Some("p"))
    // 3 appends × 2 partitions → several small files per partition value
    (0 until 3).foreach(i => t.append(
      (0L until 20L).map(j => (i * 20L + j, if (j % 2 == 0) "hot" else "cold"))
        .toDF("id", "p"),
      batchId = i))
    val beforeFiles = TransactionalTable.open(spark, s"$w/db/t").snapshot.files
    val coldBefore = beforeFiles.filter(_.partition.contains("cold")).map(_.path).toSet
    val hotBefore = beforeFiles.filter(_.partition.contains("hot")).map(_.path).toSet
    assert(hotBefore.size > 1, "fixture should fragment the hot partition")
    val Seq((rewritten, written)) =
      spark.sql("CALL gpcp.system.compact_partitions('db.t', 'hot', 1048576)")
        .as[(Long, Long)].collect().toSeq
    assert(rewritten === hotBefore.size.toLong && written < rewritten)
    val afterFiles = TransactionalTable.open(spark, s"$w/db/t").snapshot.files
    // cold files untouched (same paths, carried by reference); hot rewritten
    assert(afterFiles.filter(_.partition.contains("cold")).map(_.path).toSet === coldBefore)
    assert(afterFiles.filter(_.partition.contains("hot")).map(_.path).toSet
      .intersect(hotBefore).isEmpty)
    // contents identical
    assert(TransactionalTable.open(spark, s"$w/db/t").scan().count() === 60L)
    // second call: nothing left to do
    val Seq((r2, w2)) =
      spark.sql("CALL gpcp.system.compact_partitions('db.t', 'hot', 1048576)")
        .as[(Long, Long)].collect().toSeq
    assert(r2 === 0L && w2 === 0L)
  }

  test("rewrite_manifests repacks fragmented chunks; state and history intact") {
    val w = mkWarehouse("gp4")
    val root = s"$w/db/t"
    val t = TransactionalTable.create(spark, root, sch, "id")
    // 6 tiny commits → 6 single-file chunks of metadata debt (below the
    // automatic small-chunk fold threshold, which self-heals past 8)
    (1L to 6L).foreach(i => t.append(Seq(i -> s"v$i").toDF("id", "v").coalesce(1)))
    t.append((7L to 10L).map(i => i -> s"v$i").toDF("id", "v").coalesce(1))
    val (before, after) = spark.sql("CALL gp4.system.rewrite_manifests('db.t')")
      .as[(Long, Long)].head()
    assert(before >= 5L, s"premise: fragmented manifest, got $before chunks")
    assert(after === 1L, s"repack must yield one full-size chunk, got $after")
    val t2 = TransactionalTable.open(spark, root)
    // metadata-only: file list identical, data untouched, rowCount from stats
    assert(t2.snapshot.files.map(_.path).toSet ===
      t2.snapshotAt(t2.currentVersion - 1).files.map(_.path).toSet)
    assert(t2.snapshot.rowCount === 10L)
    assert(t2.scan().as[(Long, String)].collect().toMap.apply(7L) === "v7")
    // pre-rewrite history still travels
    assert(t2.scanAt(3).count() === 3L)
    // and merging on the repacked manifest stays correct
    t2.merge(Seq(3L -> "vv").toDF("id", "v"), noDel, batchId = 0)
    assert(t2.scan().as[(Long, String)].collect().toMap.apply(3L) === "vv")
  }

  test("add_files registers external parquet: zero data movement, then merges/deletes work") {
    val w = mkWarehouse("gp5")
    val root = s"$w/db/t"
    val t = TransactionalTable.create(spark, root, sch, "id")
    t.append(Seq(1L -> "own").toDF("id", "v"))
    // external data written OUTSIDE the table by a foreign job
    val ext = tmpDir("gp5-external")
    (2L to 6L).map(i => i -> s"ext$i").toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(ext)
    val (nf, nr) = spark.sql(s"CALL gp5.system.add_files('db.t', '$ext')")
      .as[(Long, Long)].head()
    assert(nf === 1L && nr === 5L)
    val t2 = TransactionalTable.open(spark, root)
    assert(t2.snapshot.rowCount === 6L, "registered rows must count via manifest stats")
    assert(t2.scan().as[(Long, String)].collect().toMap.apply(4L) === "ext4")
    // the registered file was never copied: still exactly where it was
    assert(t2.snapshot.files.exists(_.path.startsWith(ext)),
      "add_files must register in place, not rewrite")
    // double registration is rejected (checked while the file is still live)
    val e = intercept[Exception] {
      spark.sql(s"CALL gp5.system.add_files('db.t', '$ext')")
    }
    assert(e.getMessage.contains("already registered"), e.getMessage)
    // row-level ops treat registered rows like any others (CoW rewrites the
    // external file's slice into table-owned storage; the original survives
    // on disk, just unreferenced)
    t2.merge(Seq(4L -> "upd").toDF("id", "v"), Seq(5L).toDF("id"), batchId = 0)
    val after = t2.scan().as[(Long, String)].collect().toMap
    assert(after(4L) === "upd" && !after.contains(5L) && after(2L) === "ext2")
  }

  test("cherrypick_snapshot redoes one commit's delta after a rollback") {
    val w = mkWarehouse("gp6")
    val root = s"$w/db/t"
    val t = TransactionalTable.create(spark, root, sch, "id")
    t.append(Seq(1L -> "a", 2L -> "b").toDF("id", "v"))            // v1
    t.merge(Seq(2L -> "B2", 3L -> "c").toDF("id", "v"), noDel, 0)  // v2: bad
    t.merge(Seq(4L -> "d").toDF("id", "v"), Seq(1L).toDF("id"), 1) // v3: good
    // roll back past the bad v2, then cherry-pick ONLY v3's delta
    spark.sql("CALL gp6.system.rollback_to_snapshot('db.t', 1)")
    val (applied, cur) = spark
      .sql("CALL gp6.system.cherrypick_snapshot('db.t', 3)")
      .as[(Long, Long)].head()
    assert(applied === 3L && cur === 5L)
    val got = TransactionalTable.open(spark, root).scan()
      .as[(Long, String)].collect().toMap
    // v1 state {1->a, 2->b} + v3 delta {delete 1, insert 4->d}; v2's update
    // of 2 and insert of 3 must NOT reappear
    assert(got === Map(2L -> "b", 4L -> "d"), got.toString)
  }

  test("create_branch / publish_branch; evolve_partitioning; unknown procedure fails") {
    val w = mkWarehouse("gp3")
    val t = TransactionalTable.create(spark, s"$w/db/t",
      StructType(Seq(StructField("id", LongType), StructField("ts", TimestampType),
        StructField("v", StringType))), "id")
    t.append(Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "a"))
      .toDF("id", "ts", "v"))
    val fork = spark.sql("CALL gp3.system.create_branch('db.t', 'wip')").as[Long].head()
    assert(fork === 1L)
    t.branch("wip").append(
      Seq((2L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), "b")).toDF("id", "ts", "v"))
    val pub = spark.sql("CALL gp3.system.publish_branch('db.t', 'wip')").as[Long].head()
    assert(pub === 3L, "publish jumps past the branch head (1 -> max(1,2)+1)")
    assert(TransactionalTable.open(spark, s"$w/db/t").scan().count() === 2L)
    val specId = spark.sql("CALL gp3.system.evolve_partitioning('db.t', 'days(ts)')")
      .as[Long].head()
    assert(specId === 1L)
    assert(TransactionalTable.open(spark, s"$w/db/t").partitionSpec ===
      Some(graft.table.PartitionTransform.Days("ts")))
    intercept[Exception] { spark.sql("CALL gp3.system.no_such_proc('db.t')").collect() }
  }

  test("create_changelog_view: the incremental diff is queryable as plain SQL") {
    // gp7, not gp4: Spark caches the catalog PLUGIN INSTANCE per name, so
    // reusing a name from an earlier test would silently resolve against the
    // first test's warehouse path, not the fresh one set by mkWarehouse.
    val w = mkWarehouse("gp7")
    val t = TransactionalTable.create(spark, s"$w/db/t", sch, "id")
    t.append(Seq(1L -> "a", 2L -> "b").toDF("id", "v"), batchId = 0)
    t.merge(Seq(2L -> "B2", 3L -> "c").toDF("id", "v"), noDel, batchId = 1)
    val Seq((view, rows)) =
      spark.sql("CALL gp7.system.create_changelog_view('db.t', 1, 2, 'gp4_changes')")
        .as[(String, Long)].collect().toSeq
    assert(view === "gp4_changes")
    assert(rows === 3L, "update of key 2 = delete+insert pair, plus insert of 3")
    val got = spark.sql(
      "SELECT id, v, _change_type FROM gp4_changes ORDER BY id, _change_type")
      .as[(Long, String, String)].collect().toSeq
    assert(got === Seq((2L, "b", "delete"), (2L, "B2", "insert"), (3L, "c", "insert")))
    // untouched key 1 must not appear even though CoW rewrote its file
    assert(!got.exists(_._1 == 1L))
  }

  test("index_status: one-pass observability over the banded index families") {
    val w = mkWarehouse("gp9")
    val base = (1 to 30).map(k => s"commonword$k").mkString(" ")
    Seq((10L, s"$base extra8")).toDF("doc_id", "text")
      .createOrReplaceTempView("gp9_b0")
    Seq((5L, s"$base extra4")).toDF("doc_id", "text")
      .createOrReplaceTempView("gp9_b1")
    spark.sql("CALL gp9.system.keep_best_index_create('db.kb')").collect()
    spark.sql("CALL gp9.system.keep_best_index_append('db.kb', 'gp9_b0', 0, " +
      "'gp9_k0', 'gp9_e0')").collect()
    spark.sql("CALL gp9.system.keep_best_index_append('db.kb', 'gp9_b1', 1, " +
      "'gp9_k1', 'gp9_e1')").collect()
    // doc 5 evicted doc 10: 4 live band rows + 1 eviction-log row; batch
    // coverage reflects LIVE rows — batch 0's rows left with the eviction
    val Seq((n, live, evl, nb, lb, _, files)) =
      spark.sql("CALL gp9.system.index_status('db.kb')")
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(n === 5L && live === 1L && evl === 1L && nb === 1L && lb === 1L,
      s"keep-best status: n=$n live=$live evl=$evl nb=$nb lb=$lb")
    assert(files >= 1L)
    // a plain dedup index reports zero eviction debt
    spark.sql("CALL gp9.system.dedup_index_create('db.dd')").collect()
    spark.sql("CALL gp9.system.dedup_index_append('db.dd', 'gp9_b0', 0, " +
      "'gp9_dk0')").collect()
    val Seq((_, liveD, evlD, _, _, _, _)) =
      spark.sql("CALL gp9.system.index_status('db.dd')")
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(liveD === 1L && evlD === 0L)
    // a non-index table fails fast
    val t = TransactionalTable.create(spark, s"$w/db/plain", sch, "id")
    t.append(Seq(1L -> "a").toDF("id", "v"), batchId = 0)
    intercept[Exception] {
      spark.sql("CALL gp9.system.index_status('db.plain')").collect()
    }
  }

  test("pq_rebuild: a retrained quantizer stales the codes; the CALL re-encodes and probes serve again (E206)") {
    val cat = "gppq"
    val w = mkWarehouse(cat)
    import graft.ops.{AnnIndex, PqOps}
    import org.apache.spark.sql.functions.col
    val base = Seq(
      Seq(1.0, 0, 0, 0, 1.0, 0, 0, 0),
      Seq(0, 1.0, 0, 0, 0, 1.0, 0, 0),
      Seq(0, 0, 1.0, 0, 0, 0, 1.0, 0))
    val vecs = (0 until 12).map { i =>
      val b = base(i % 3)
      (i.toLong, b.zipWithIndex.map { case (x, j) => x + 0.01 * ((i + j) % 5) })
    }.toDF("vec_id", "embedding")
    val h = AnnIndex.create(spark, s"$w/db/ann", vecs, cells = 3)
    AnnIndex.appendBatch(h, vecs, batchId = 0)
    val books = PqOps.codebooks(
      h.assignments.scan().select(col("vec_id"), col("v").as("embedding")),
      m = 2, k = 4)
    PqOps.buildPqCodes(h, s"$w/db/codes", books)
    vecs.limit(2).createOrReplaceTempView("pq_rebuild_queries")
    spark.sql(s"CALL $cat.system.pq_probe('db.ann', 'db.codes', " +
      "'pq_rebuild_queries', 2, 3, 'pq_rb_hits')")
    assert(spark.table("pq_rb_hits").count() > 0)
    AnnIndex.retrain(h, cells = 3, fenceId = 50L)
    val e = intercept[Exception](spark.sql(
      s"CALL $cat.system.pq_probe('db.ann', 'db.codes', " +
        "'pq_rebuild_queries', 2, 3, 'pq_rb_hits2')"))
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(chain.contains("STALE"), chain)
    val r = spark.sql(s"CALL $cat.system.pq_rebuild('db.ann', 'db.codes', 0)")
      .select("n_vectors").as[Long].head()
    assert(r === 12L)
    spark.sql(s"CALL $cat.system.pq_probe('db.ann', 'db.codes', " +
      "'pq_rebuild_queries', 2, 3, 'pq_rb_hits3')")
    assert(spark.table("pq_rb_hits3").count() > 0)
  }

  test("media_index_create/append dispatch on kind; unknown kind fails fast") {
    val w = mkWarehouse("gp8")
    // audio + video kinds exercised with undecodable payloads: both paths
    // must keep them bandless (the hashless-keep rule) through the CALL
    // surface; the full image flow is oracled by cdc_media_index_sql
    Seq(1L -> "not a wav", 2L -> "nor this").map { case (id, t) => (id, t.getBytes) }
      .toDF("media_id", "content").createOrReplaceTempView("gp8_media")
    for (kind <- Seq("audio", "video")) {
      spark.sql(s"CALL gp8.system.media_index_create('db.$kind', '$kind')").collect()
      val Seq((view, kept, _)) = spark.sql(
        s"CALL gp8.system.media_index_append('db.$kind', '$kind', 'gp8_media', 0, " +
          s"'gp8_kept_$kind')").as[(String, Long, Long)].collect().toSeq
      assert(view === s"gp8_kept_$kind" && kept === 2L,
        s"$kind: undecodable payloads must be kept bandless")
      assert(spark.sql(s"SELECT media_id FROM gp8_kept_$kind ORDER BY media_id")
        .as[Long].collect().toSeq === Seq(1L, 2L))
    }
    intercept[Exception] {
      spark.sql("CALL gp8.system.media_index_create('db.x', 'hologram')").collect()
    }
  }

  test("decontamination from SQL: decontaminate_spans scrubs the leak, decontaminate_near flags the ball") {
    mkWarehouse("gpd")
    def longText(seed: String): String =
      (1 to 24).map(k => s"${seed}word$k").mkString(" ")
    val benchText = (1 to 8).map(k => s"evaltok$k").mkString(" ")
    Seq((900L, benchText)).toDF("doc_id", "text")
      .createOrReplaceTempView("gpd_bench")
    val leaky = longText("alpha").split(" ").take(12).mkString(" ") +
      s" $benchText " + longText("alpha").split(" ").drop(12).mkString(" ")
    Seq((1L, leaky), (2L, longText("gamma")))
      .toDF("doc_id", "text").createOrReplaceTempView("gpd_corpus")
    val Seq((v1, rows1, dirty)) = spark.sql(
      "CALL gpd.system.decontaminate_spans('gpd_corpus', 'gpd_bench', 8, 'gpd_clean')")
      .as[(String, Long, Long)].collect().toSeq
    assert(v1 === "gpd_clean" && rows1 === 2L && dirty === 1L)
    val clean = spark.sql(
      "SELECT doc_id, clean_text, n_removed FROM gpd_clean ORDER BY doc_id")
      .as[(Long, String, Long)].collect()
    assert(!clean(0)._2.contains("evaltok") && clean(0)._3 === 8L,
      s"the leaked example must scrub: ${clean(0)}")
    assert(clean(1)._3 === 0L, "clean docs lose nothing")
    // near-dup flag: doc 3 re-publishes the benchmark text verbatim
    // (distance 0), doc 2 is unrelated
    Seq((3L, benchText), (2L, longText("gamma")))
      .toDF("doc_id", "text").createOrReplaceTempView("gpd_corpus2")
    val Seq((v2, flagged)) = spark.sql(
      "CALL gpd.system.decontaminate_near('gpd_corpus2', 'gpd_bench', 3, 'gpd_flag')")
      .as[(String, Long)].collect().toSeq
    assert(v2 === "gpd_flag" && flagged === 1L)
    assert(spark.sql("SELECT doc_id, min_hamming FROM gpd_flag")
      .as[(Long, Int)].collect().toSeq === Seq(3L -> 0))
  }

  test("quality-drift monitor from SQL: append histograms, score the tail, planted shift flips the verdict") {
    val w = mkWarehouse("gpq")
    graft.ops.QualityMonitor.statsTable(spark, s"$w/db/stats")
    def docsView(name: String, words: Int, ids: Range): Unit =
      ids.map(i => (i.toLong, (1 to words).map(k => s"w${i}x$k").mkString(" ")))
        .toDF("doc_id", "text").createOrReplaceTempView(name)
    docsView("gpq_b0", 24, 1 to 8)
    docsView("gpq_b1", 24, 11 to 18)
    docsView("gpq_b2", 2, 21 to 28) // the collapse
    for ((v, b) <- Seq(("gpq_b0", 0), ("gpq_b1", 1), ("gpq_b2", 2))) {
      val Seq((bid, committed, n, _)) = spark.sql(
        s"CALL gpq.system.quality_monitor_append('db.stats', '$v', $b)")
        .as[(Long, Boolean, Long, Long)].collect().toSeq
      assert(bid === b.toLong && committed && n === 8L)
    }
    // an out-of-order backfill behind the writer fence is VISIBLE, not
    // silently absorbed
    assert(!spark.sql(
      "CALL gpq.system.quality_monitor_append('db.stats', 'gpq_b0', 1)")
      .select("committed").as[Boolean].head())
    val Seq((psiStable, nr, nc, dStable)) = spark.sql(
      "CALL gpq.system.quality_drift('db.stats', 0, 0.25)")
      .as[(Double, Long, Long, Boolean)].collect().toSeq
    // ref = batch 0 (8 docs), cur = batches 1+2 (8 same + 8 collapsed):
    // half the tail shifted — already past the 0.25 band
    assert(nr === 8L && nc === 16L && dStable === (psiStable > 0.25))
    val Seq((psi2, _, _, drifted)) = spark.sql(
      "CALL gpq.system.quality_drift('db.stats', 1, 0.25)")
      .as[(Double, Long, Long, Boolean)].collect().toSeq
    assert(drifted && psi2 > 0.25,
      s"the collapsed tail alone must trip the verdict: $psi2")
    assert(psi2 > psiStable, "a purer shifted tail scores higher")
    // per-source twin (r18): these views carry no source column, so the
    // whole corpus scores as the single "" source — the worst-source row
    // must agree with the corpus-level verdict
    val Seq((src, psiS, _, _, driftedS, nSrc)) = spark.sql(
      "CALL gpq.system.quality_drift_by_source('db.stats', 1, 0.25)")
      .as[(String, Double, Long, Long, Boolean, Long)].collect().toSeq
    assert(src === "" && nSrc === 1L && driftedS &&
      math.abs(psiS - psi2) < 1e-12,
      s"sourceless stats must score as one '' source: $src $psiS vs $psi2")
  }

  test("ann_delete from SQL: removals leave the index and the codes table; fenced replay no-ops") {
    val w = mkWarehouse("gad")
    val vecs = (0 until 90).map { i =>
      val a = Array.fill(8)(0.05); a(i % 4) = 1.0
      (i.toLong, a.toSeq)
    }.toDF("vec_id", "embedding")
    vecs.createOrReplaceTempView("gad_vecs")
    spark.sql("CALL gad.system.ann_index_create('db.ann', 'gad_vecs', 4)").collect()
    spark.sql("CALL gad.system.ann_index_append('db.ann', 'gad_vecs', 0, 0)").collect()
    spark.sql("CALL gad.system.pq_codes_build('db.ann', 'db.codes', 4, 8)").collect()
    vecs.filter($"vec_id" >= 60).select("vec_id")
      .createOrReplaceTempView("gad_dead")
    val Seq((deleted, nVec, v1)) = spark.sql(
      "CALL gad.system.ann_delete('db.ann', 'gad_dead', 1, 'db.codes')")
      .as[(Long, Long, Long)].collect().toSeq
    assert(deleted === 30L && nVec === 60L)
    val codes = TransactionalTable.open(spark, s"$w/db/codes")
    assert(codes.countRows === 60L &&
      codes.scan().where($"vec_id" >= 60).count() === 0L,
      "the codes table must forget the deleted vectors too")
    // replayed delete epoch: both tables hold their versions
    val cv = codes.currentVersion
    val Seq((_, nVec2, v2)) = spark.sql(
      "CALL gad.system.ann_delete('db.ann', 'gad_dead', 1, 'db.codes')")
      .as[(Long, Long, Long)].collect().toSeq
    assert(nVec2 === 60L && v2 === v1 && codes.currentVersion === cv,
      "a replayed ann_delete must no-op on the fence")
    // no ghost neighbors through the SQL probe either
    vecs.filter($"vec_id" < 3).createOrReplaceTempView("gad_q")
    spark.sql("CALL gad.system.ann_probe('db.ann', 'gad_q', 10, 4, 'gad_hits')").collect()
    assert(spark.sql("SELECT * FROM gad_hits WHERE neighbor_id >= 60").count() === 0L)
  }

  test("export_snapshot from SQL: registers the consumer and returns the tail version") {
    val w = mkWarehouse("gps")
    val corpus = TransactionalTable.create(spark, s"$w/db/corpus",
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))),
      "doc_id", None)
    corpus.append(Seq(1L -> "one doc body", 2L -> "two doc body")
      .toDF("doc_id", "text"), batchId = 0)
    assert(graft.ops.ExportOps.exportLatest(corpus, s"$w/db/exp",
      nShards = 2, capacity = 16L).exported)
    val Seq((view, n, tailV)) = spark.sql(
      "CALL gps.system.export_snapshot('db.exp', 'trainer-z', 'gps_snap')")
      .as[(String, Long, Long)].collect().toSeq
    assert(view === "gps_snap" && n === 2L)
    assert(tailV === graft.ops.ExportOps.manifest(spark, s"$w/db/exp").currentVersion)
    assert(spark.sql("SELECT doc_id FROM gps_snap ORDER BY doc_id")
      .as[Long].collect().toSeq === Seq(1L, 2L))
    assert(graft.ops.ExportOps.consumerAcks(spark, s"$w/db/exp")
      .contains("trainer-z"))
  }

  test("export consumer watermark from SQL: export_ack / export_consumers / export_drop_consumer") {
    val w = mkWarehouse("gpa")
    val corpus = TransactionalTable.create(spark, s"$w/db/corpus",
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))),
      "doc_id", None)
    def pub(): Long = {
      assert(graft.ops.ExportOps.exportLatest(corpus, s"$w/db/exp",
        nShards = 2, capacity = 16L).exported)
      corpus.currentVersion
    }
    corpus.append(Seq(1L -> "one doc body").toDF("doc_id", "text"), batchId = 0)
    val v1 = pub()
    corpus.append(Seq(2L -> "two doc body").toDF("doc_id", "text"), batchId = 1)
    val v2 = pub()
    val Seq((c1, a1, wm1)) = spark.sql(
      s"CALL gpa.system.export_ack('db.exp', 'trainer-a', $v1)")
      .as[(String, Long, Long)].collect().toSeq
    assert(c1 === "trainer-a" && a1 === v1 && wm1 === v1)
    spark.sql(s"CALL gpa.system.export_ack('db.exp', 'trainer-b', $v2)").collect()
    val Seq((n, wm)) = spark.sql(
      "CALL gpa.system.export_consumers('db.exp', 'gpa_acks')")
      .as[(Long, Long)].collect().toSeq
    assert(n === 2L && wm === v1)
    assert(spark.sql("SELECT consumer, acked_to FROM gpa_acks ORDER BY consumer")
      .as[(String, Long)].collect().toSeq ===
      Seq("trainer-a" -> v1, "trainer-b" -> v2))
    // the watermark blocks pack at v1 (one foldable interval): no-op
    assert(!spark.sql("CALL gpa.system.export_pack('db.exp')")
      .select("packed").as[Boolean].head())
    // dropping the laggard unpins; pack folds both intervals
    val remaining = spark.sql(
      "CALL gpa.system.export_drop_consumer('db.exp', 'trainer-a')")
      .as[Long].head()
    assert(remaining === 1L)
    assert(spark.sql("CALL gpa.system.export_pack('db.exp')")
      .select("packed").as[Boolean].head())
    assert(graft.ops.ExportOps.intervals(spark, s"$w/db/exp").size === 1)
  }

  test("sampling family from SQL: hash_split / temperature_sample / cap_per_group / upsample_epochs match the Scala ops") {
    mkWarehouse("gp9")
    import org.apache.spark.sql.functions.col
    val docs = (0L until 40L).map(i =>
      (i, s"doc $i body", if (i % 3 == 0) "wiki" else "web"))
      .toDF("doc_id", "text", "source")
    docs.createOrReplaceTempView("gp9_docs")
    // hash_split: CALL view == Scala op, bit for bit
    val Seq((sv, sn)) = spark.sql(
      "CALL gp9.system.hash_split('gp9_docs', 'train:8,val:1,test:1', '', 'doc_id', 'gp9_splits')")
      .as[(String, Long)].collect().toSeq
    assert(sv === "gp9_splits" && sn === 40L)
    val sqlSplit = spark.table("gp9_splits").select("doc_id", "split")
      .as[(Long, String)].collect().toSet
    val apiSplit = graft.ops.DedupOps.hashSplit(docs,
        Seq("train" -> 8, "val" -> 1, "test" -> 1))
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(sqlSplit === apiSplit)
    // temperature_sample (double args through CALL)
    spark.sql(
      "CALL gp9.system.temperature_sample('gp9_docs', 'source', 0.5, 0.5, 'doc_id', 'gp9_temp')")
      .collect()
    val sqlTemp = spark.table("gp9_temp").select("doc_id").as[Long].collect().toSet
    val apiTemp = graft.ops.DedupOps.temperatureSample(docs, "source",
      alpha = 0.5, frac = 0.5).select("doc_id").as[Long].collect().toSet
    assert(sqlTemp === apiTemp && sqlTemp.nonEmpty)
    // cap_per_group
    spark.sql(
      "CALL gp9.system.cap_per_group('gp9_docs', 'source', 3, 'doc_id', 'gp9_cap')")
      .collect()
    val sqlCap = spark.table("gp9_cap").select("doc_id", "source", "rk")
      .as[(Long, String, Int)].collect().toSet
    val apiCap = graft.ops.DedupOps.capPerGroup(docs, "source", k = 3)
      .as[(Long, String, Int)].collect().toSet
    assert(sqlCap === apiCap && sqlCap.map(_._2).toSeq.distinct.size === 2)
    // upsample_epochs: spec-string factors, epoch fan-out preserved
    spark.sql(
      "CALL gp9.system.upsample_epochs('gp9_docs', 'wiki:2.5,web:0.0', 'source', 'doc_id', 'gp9_up')")
      .collect()
    val sqlUp = spark.table("gp9_up").select("doc_id", "epoch")
      .as[(Long, Long)].collect().toSet
    val apiUp = graft.ops.DedupOps.upsampleEpochs(docs,
        Seq("wiki" -> 2.5, "web" -> 0.0))
      .select("doc_id", "epoch").as[(Long, Long)].collect().toSet
    assert(sqlUp === apiUp && sqlUp.nonEmpty)
    assert(spark.table("gp9_up").filter(col("source") === "web").count() === 0L)
    // malformed spec fails fast
    intercept[Exception] {
      spark.sql(
        "CALL gp9.system.hash_split('gp9_docs', 'trainval', '', 'doc_id', 'gp9_bad')")
        .collect()
    }
  }
}
