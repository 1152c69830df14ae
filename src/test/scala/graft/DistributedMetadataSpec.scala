package graft

import java.nio.file.{Files, Paths}

import graft.table.TransactionalTable

/** Distributed entry-level metadata tables (`files` / `entries` /
  * `all_files`): semantics must be identical to the pre-distribution
  * driver-side computation — including the rollback corner where per-path
  * (first, last) ranges alone would mislabel re-added files as carried. */
class DistributedMetadataSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): (String, String, TransactionalTable) = {
    val cat = s"graft_dm${System.nanoTime()}"
    val w = tmpDir(s"graft-dmeta-$name")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    Files.createDirectories(Paths.get(s"$w/db"))
    val t = TransactionalTable.create(spark, s"$w/db/t",
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v BIGINT"), "id", None)
    (cat, w, t)
  }

  test("entries/all_files over an append history: carried vs added, version ranges") {
    val (cat, _, t) = fresh("hist")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 10), (2, 20)") // v1
    spark.sql(s"INSERT INTO $cat.db.t VALUES (3, 30)")          // v2
    val entries = spark.sql(
      s"SELECT status, added_version, n_rows FROM $cat.db.t.entries WHERE kind = 'data'")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    // v1 files carried (status 0, added at 1); v2 file added (status 1)
    assert(entries.count(e => e._1 == 0L && e._2 == 1L) >= 1, s"carried: $entries")
    assert(entries.count(e => e._1 == 1L && e._2 == 2L) >= 1, s"added: $entries")
    assert(entries.map(_._3).sum === 3L)
    val af = spark.sql(
      s"SELECT first_version, last_version, n_rows FROM $cat.db.t.all_files")
      .as[(Long, Long, Long)].collect().toSeq
    assert(af.map(_._3).sum === 3L)
    assert(af.forall(_._2 === t.currentVersion), s"all files live to current: $af")
    assert(af.exists(_._1 === 1L) && af.exists(_._1 === 2L), af.toString)
    // files matches the engine's own snapshot inventory bit-for-bit
    val filesRows = spark.sql(
      s"SELECT path, n_rows, n_bytes FROM $cat.db.t.files WHERE kind = 'data'")
      .as[(String, Long, Long)].collect().toSet
    val internal = t.snapshot.files.map(f => (f.path, f.rows, f.bytes)).toSet
    assert(filesRows === internal)
  }

  test("metadata tables honor VERSION AS OF (travel reads never serve the live state)") {
    val (cat, _, t) = fresh("tt")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 10), (2, 20)") // v1
    spark.sql(s"INSERT INTO $cat.db.t VALUES (3, 30)")          // v2
    // files of snapshot 1: only the v1 rows
    val f1 = spark.sql(
      s"SELECT SUM(n_rows) AS r FROM $cat.db.t.files VERSION AS OF 1 WHERE kind = 'data'")
      .as[Long].head()
    assert(f1 === 2L, "files AS OF 1 must show snapshot 1's inventory")
    assert(spark.sql(
      s"SELECT SUM(n_rows) AS r FROM $cat.db.t.files WHERE kind = 'data'")
      .as[Long].head() === 3L)
    // history AS OF 1 stops at version 1
    val h1 = spark.sql(s"SELECT MAX(version) AS v FROM $cat.db.t.history VERSION AS OF 1")
      .as[Long].head()
    assert(h1 === 1L)
    // entries AS OF 1: everything added at v1 (v0 is the empty create)
    val e1 = spark.sql(
      s"SELECT status, added_version FROM $cat.db.t.entries VERSION AS OF 1 WHERE kind = 'data'")
      .as[(Long, Long)].collect().toSeq
    assert(e1.nonEmpty && e1.forall(e => e._1 === 1L && e._2 === 1L), e1.toString)
    // partitions AS OF 1 aggregates snapshot 1 only
    assert(spark.sql(s"SELECT SUM(n_rows) AS r FROM $cat.db.t.partitions VERSION AS OF 1")
      .as[Long].head() === 2L)
    // TAG refs resolve against the parent table and scope the answer
    t.createTag("first", 1L)
    assert(spark.sql(
      s"SELECT SUM(n_rows) AS r FROM $cat.db.t.files VERSION AS OF 'first' WHERE kind = 'data'")
      .as[Long].head() === 2L)
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM $cat.db.t.files VERSION AS OF 'nope'").collect())
    assert(e.getMessage.contains("no tag"))
  }

  test("entries after rollback: re-added files grade as ADDED (parent membership, not age)") {
    val (cat, _, t) = fresh("rb")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 10), (2, 20)") // v1: files A
    spark.sql(s"DELETE FROM $cat.db.t WHERE id >= 1")           // v2: A rewritten away
    assert(spark.sql(s"SELECT COUNT(*) AS c FROM $cat.db.t").as[Long].head() === 0L)
    t.rollbackTo(1L)                                            // v3: A re-added
    assert(t.currentVersion === 3L)
    val entries = spark.sql(
      s"SELECT status, added_version FROM $cat.db.t.entries WHERE kind = 'data'")
      .as[(Long, Long)].collect().toSeq
    assert(entries.nonEmpty)
    // parent (v2) does NOT reference A: a (first < current) age test would
    // wrongly say carried — exact parent membership must say ADDED, while
    // added_version stays the first RETAINED version that contained the file
    assert(entries.forall(e => e._1 === 1L && e._2 === 1L), entries.toString)
  }
}
