package graft.table

import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import graft.table.TransactionalTable

/**
 * Object-store `ALTER TABLE RENAME TO` (r17 review #6): with
 * `renameMode=metadata` the rename is a name rebinding in the namespace's
 * [[graft.sql.CatalogLinks]] map, committed claim/publish through
 * [[CommitIO]] — the data directory NEVER moves, so S3's copy+delete
 * rename (and its dual-root crash window) never enters the picture. The
 * simulated store below is the ObjectStoreCommitSpec posture: conditional
 * PUT + full-object PUT only, with crash injection between the claim and
 * the HEAD publish.
 */
class CatalogMetadataRenameSpec extends graft.SparkSpec {
  import spark.implicits._

  private final class SimStoreIO extends CommitIO {
    /** The writer dies BEFORE its conditional PUT reaches the store:
      * the commit observably never happened. */
    @volatile var crashBeforeClaim = false
    /** The store ACKS the conditional PUT and THEN the writer dies: the
      * claim IS the commit, so the rename is fully applied despite the
      * statement erroring — there is no third, half-applied state. */
    @volatile var crashAfterClaim = false
    override def putIfAbsent(path: Path, bytes: Array[Byte]): Unit = {
      if (crashBeforeClaim) {
        crashBeforeClaim = false
        throw new RuntimeException("simulated crash: writer died before the claim PUT")
      }
      // an object store has no directories — any key is writable; on the
      // local simulation that means preparing the parent (CommitIO contract)
      Option(path.getParent).foreach(Files.createDirectories(_))
      Files.write(path, bytes, StandardOpenOption.CREATE_NEW)
      if (crashAfterClaim) {
        crashAfterClaim = false
        throw new RuntimeException("simulated crash: claim acked, writer died")
      }
      ()
    }
    override def putAtomic(path: Path, bytes: Array[Byte]): Unit = {
      // ONE full-object PUT — no tmp file, no move
      Files.write(path, bytes, StandardOpenOption.CREATE,
        StandardOpenOption.TRUNCATE_EXISTING)
      ()
    }
    override def read(path: Path): Array[Byte] = Files.readAllBytes(path)
    override def exists(path: Path): Boolean = Files.exists(path)
    override def modifiedAtMs(path: Path): Long =
      Files.getLastModifiedTime(path).toMillis
    override def delete(path: Path): Unit = { Files.deleteIfExists(path); () }
    override def list(dir: Path): Seq[Path] =
      if (!Files.isDirectory(dir)) Seq.empty
      else {
        val s = Files.list(dir)
        try { import scala.jdk.CollectionConverters._; s.iterator().asScala.toSeq }
        finally s.close()
      }
  }

  test("metadata rename: zero directory moves; a crash leaves either the old or the new binding whole, never both; lifecycle composes") {
    val cat = s"graft_mrn${System.nanoTime()}"
    val w = tmpDir("graft-warehouse-mrn")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    spark.conf.set(s"spark.sql.catalog.$cat.renameMode", "metadata")
    Files.createDirectories(Paths.get(s"$w/db"))
    TransactionalTable.create(spark, s"$w/db/t",
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v BIGINT"),
      "id", None)
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 10), (2, 20)")
    val plugin = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[graft.sql.GraftCatalog]
    val io = new SimStoreIO
    plugin.linksIo = io

    // CRASH (a): the writer dies BEFORE its claim reaches the store —
    // the rename observably never happened; the old binding is fully live
    io.crashBeforeClaim = true
    intercept[RuntimeException](spark.sql(s"ALTER TABLE $cat.db.t RENAME TO db.t2"))
    assert(spark.sql(s"SELECT COUNT(*) AS c FROM $cat.db.t").as[Long].head() === 2L,
      "a pre-claim crash must leave the old binding fully live")
    intercept[Exception](spark.sql(s"SELECT * FROM $cat.db.t2").collect())
    assert(Files.isDirectory(Paths.get(s"$w/db/t")) &&
      !Files.exists(Paths.get(s"$w/db/t2")), "the data directory never moves")

    // CRASH (b): the store ACKS the claim, THEN the writer dies — the
    // claim IS the commit, so the rename is fully applied despite the
    // statement erroring: both names resolve consistently, no half-state
    io.crashAfterClaim = true
    intercept[RuntimeException](spark.sql(s"ALTER TABLE $cat.db.t RENAME TO db.t2"))
    assert(spark.sql(s"SELECT id FROM $cat.db.t2 ORDER BY id")
      .as[Long].collect().toSeq === Seq(1L, 2L),
      "a post-claim crash must leave the rename fully applied")
    intercept[Exception](spark.sql(s"SELECT * FROM $cat.db.t").collect())
    assert(Files.isDirectory(Paths.get(s"$w/db/t")) &&
      !Files.exists(Paths.get(s"$w/db/t2")), "rename is metadata-only")
    // an operator RETRYING the crashed statement discovers it applied:
    // the source name no longer resolves — loud, never a double-apply
    intercept[Exception](spark.sql(s"ALTER TABLE $cat.db.t RENAME TO db.t2"))

    // the renamed table stays fully writable and listable under the new name
    spark.sql(s"INSERT INTO $cat.db.t2 VALUES (3, 30)")
    assert(spark.sql(s"SELECT COUNT(*) AS c FROM $cat.db.t2").as[Long].head() === 3L)
    val listed = spark.sql(s"SHOW TABLES IN $cat.db").select("tableName")
      .as[String].collect().toSet
    assert(listed.contains("t2") && !listed.contains("t"),
      s"SHOW TABLES must follow the binding, not the directory: $listed")

    // a SECOND metadata rename chains through the link (t2 -> t3, physical
    // dir still db/t)
    spark.sql(s"ALTER TABLE $cat.db.t2 RENAME TO db.t3")
    assert(spark.sql(s"SELECT COUNT(*) AS c FROM $cat.db.t3").as[Long].head() === 3L)
    intercept[Exception](spark.sql(s"SELECT * FROM $cat.db.t2").collect())
    assert(Files.isDirectory(Paths.get(s"$w/db/t")), "data stays put across chains")

    // guards: the renamed-away name cannot host a NEW table while the
    // physical directory still occupies it (loud, not silent co-location)
    val ex = intercept[Exception](spark.sql(
      s"CREATE TABLE $cat.db.t (id BIGINT) TBLPROPERTIES('pk'='id')"))
    assert(ex.getMessage.contains("renamed away"), ex.getMessage)

    // DROP through the linked name deletes the physical directory and
    // frees both names
    spark.sql(s"DROP TABLE $cat.db.t3")
    assert(!Files.exists(Paths.get(s"$w/db/t")), "drop must reclaim the physical dir")
    intercept[Exception](spark.sql(s"SELECT * FROM $cat.db.t3").collect())
    // the old name is reusable now: the tombstone lifts on CREATE
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) TBLPROPERTIES('pk'='id')")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (9, 90)")
    assert(spark.sql(s"SELECT COUNT(*) AS c FROM $cat.db.t").as[Long].head() === 1L,
      "a renamed-away name must be reusable once its directory is free")
  }

  test("metadata rename guards: occupied targets refuse; cross-namespace refuses; concurrent double-bind loses loudly") {
    val cat = s"graft_mrg${System.nanoTime()}"
    val w = tmpDir("graft-warehouse-mrg")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    spark.conf.set(s"spark.sql.catalog.$cat.renameMode", "metadata")
    Files.createDirectories(Paths.get(s"$w/db"))
    Files.createDirectories(Paths.get(s"$w/db2"))
    for (n <- Seq("a", "b"))
      TransactionalTable.create(spark, s"$w/db/$n",
        org.apache.spark.sql.types.StructType.fromDDL("id BIGINT"), "id", None)
    // onto an existing table: refuse
    intercept[Exception](spark.sql(s"ALTER TABLE $cat.db.a RENAME TO db.b"))
    // cross-namespace under metadata mode: refuse (one map cannot flip two
    // namespaces atomically)
    intercept[Exception](spark.sql(s"ALTER TABLE $cat.db.a RENAME TO db2.a"))
    assert(spark.sql(s"SHOW TABLES IN $cat.db").count() === 2L,
      "refused renames must change nothing")
    // after a -> c, the TARGET name's directory (db/a, tombstoned) still
    // physically occupies 'a': binding another table onto 'a' must refuse
    spark.sql(s"ALTER TABLE $cat.db.a RENAME TO db.c")
    intercept[Exception](spark.sql(s"ALTER TABLE $cat.db.b RENAME TO db.a"))
    assert(spark.sql(s"SHOW TABLES IN $cat.db").select("tableName")
      .as[String].collect().toSet === Set("b", "c"))
    // a DANGLING link (physical dir gone out-of-band, or a drop that
    // crashed between unlink and delete) must not wedge the name: the
    // name reads as absent and CREATE reclaims it (r18 review)
    spark.sql(s"ALTER TABLE $cat.db.b RENAME TO db.d")
    graft.util.Fs.deleteRecursively(Paths.get(s"$w/db/b"))
    assert(!spark.sql(s"SHOW TABLES IN $cat.db").select("tableName")
      .as[String].collect().contains("d"), "a dangling link must not list")
    spark.sql(s"CREATE TABLE $cat.db.d (id BIGINT) TBLPROPERTIES('pk'='id')")
    spark.sql(s"INSERT INTO $cat.db.d VALUES (7)")
    assert(spark.sql(s"SELECT COUNT(*) AS c FROM $cat.db.d").as[Long].head() === 1L,
      "CREATE must reclaim a dangling-linked name")
    // rename BACK to the original name (r18 review pass 2): the occupied
    // target directory is the source's OWN data dir — allowed, and the
    // map normalizes to a plain binding (no permanent self-link)
    spark.sql(s"ALTER TABLE $cat.db.c RENAME TO db.a")
    assert(spark.sql(s"SELECT COUNT(*) AS c FROM $cat.db.a").as[Long].head() === 0L,
      "a table must be renamable back to its original name")
    intercept[Exception](spark.sql(s"SELECT * FROM $cat.db.c").collect())
    assert(spark.sql(s"SHOW TABLES IN $cat.db").select("tableName")
      .as[String].collect().toSet === Set("a", "d"),
      "the rename-back must restore the plain binding (b was consumed above)")
    // a dangling-linked TARGET name is reclaimable by rename, like CREATE
    TransactionalTable.create(spark, s"$w/db/f",
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT"), "id", None)
    spark.sql(s"ALTER TABLE $cat.db.f RENAME TO db.e")
    graft.util.Fs.deleteRecursively(Paths.get(s"$w/db/f"))
    spark.sql(s"ALTER TABLE $cat.db.d RENAME TO db.e")
    assert(spark.sql(s"SELECT id FROM $cat.db.e").as[Long].collect().toSeq ===
      Seq(7L), "rename must reclaim a dangling-linked target name")
  }
}
