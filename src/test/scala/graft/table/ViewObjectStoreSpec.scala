package graft.table

import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util.concurrent.atomic.AtomicInteger

import graft.sql.GraftViewStore

/**
 * Object-store portability for the VIEW/MV metadata layer (r18 review
 * missing #1): every `_view` metadata mutation — CREATE/REPLACE/ALTER
 * VIEW, SET/UNSET TBLPROPERTIES, MV creation and refresh bookkeeping —
 * commits as a claim-is-commit versioned chain through [[CommitIO]]
 * (conditional PUT + GET only, the [[graft.sql.CatalogLinks]] idiom), and
 * `ALTER VIEW ... RENAME TO` honors `renameMode=metadata`. The pre-r19
 * store was tmp+ATOMIC_MOVE with a JVM-local-lock CAS — rename atomicity
 * and single-process locking, neither of which an S3-class store has.
 */
class ViewObjectStoreSpec extends graft.SparkSpec {
  import spark.implicits._

  /** No-rename store: conditional PUT (claim) + GET, with crash injection
    * around the claim and a one-shot competing-writer hook. */
  private final class SimStoreIO extends CommitIO {
    val conditionalPuts = new AtomicInteger(0)
    @volatile var crashBeforeClaim = false
    @volatile var crashAfterClaim = false
    /** Runs once at the START of the next putIfAbsent — simulates ANOTHER
      * PROCESS committing between this writer's read and its claim. */
    @volatile var sneakOnce: Option[() => Unit] = None
    override def putIfAbsent(path: Path, bytes: Array[Byte]): Unit = {
      sneakOnce.foreach { f => sneakOnce = None; f() }
      if (crashBeforeClaim) {
        crashBeforeClaim = false
        throw new RuntimeException("simulated crash: writer died before the claim PUT")
      }
      conditionalPuts.incrementAndGet()
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
      Option(path.getParent).foreach(Files.createDirectories(_))
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

  /** Fresh metadata-rename-mode catalog on a simulated store, with a
    * `db.t(id, v)` base table of 3 rows. */
  private def fresh(): (String, String, SimStoreIO) = {
    val cat = s"graft_vos${System.nanoTime()}"
    val w = tmpDir("graft-view-objstore")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    spark.conf.set(s"spark.sql.catalog.$cat.renameMode", "metadata")
    Files.createDirectories(Paths.get(s"$w/db"))
    TransactionalTable.create(spark, s"$w/db/t",
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v BIGINT"),
      "id", None)
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 10), (2, 20), (3, 30)")
    val io = new SimStoreIO
    spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[graft.sql.GraftCatalog].linksIo = io
    (cat, w, io)
  }

  test("view DDL lifecycle commits as a claim chain on a no-rename store; crash windows leave whole states only") {
    val (cat, w, io) = fresh()
    spark.sql(s"CREATE VIEW $cat.db.v AS SELECT id, v * 2 AS v2 FROM $cat.db.t")
    assert(io.conditionalPuts.get() >= 1, "the CREATE must claim through the store")
    assert(Files.exists(Paths.get(s"$w/db/v/_view/v1.json")) &&
      !Files.exists(Paths.get(s"$w/db/v/_view.json")),
      "metadata must live in the chain, not the legacy single file")
    assert(spark.sql(s"SELECT v2 FROM $cat.db.v WHERE id = 2").as[Long].head() === 40L)

    // REPLACE appends a chain version AND a definition version
    spark.sql(s"CREATE OR REPLACE VIEW $cat.db.v AS SELECT id, v * 3 AS v3 FROM $cat.db.t")
    assert(Files.exists(Paths.get(s"$w/db/v/_view/v2.json")))
    assert(spark.sql(s"SELECT v3 FROM $cat.db.v WHERE id = 2").as[Long].head() === 60L)
    val meta = GraftViewStore.load(s"$w/db/v", io)
    assert(meta.currentVersionId === 2 && meta.versions.map(_.versionId) === Seq(1, 2),
      "definition history must survive the chain commits")

    // CRASH (a): writer dies BEFORE the claim — nothing happened
    io.crashBeforeClaim = true
    intercept[RuntimeException](
      spark.sql(s"ALTER VIEW $cat.db.v SET TBLPROPERTIES('team'='core')"))
    assert(GraftViewStore.load(s"$w/db/v", io).properties.get("team").isEmpty,
      "a pre-claim crash must leave the old metadata fully live")

    // CRASH (b): the store ACKS the claim, THEN the writer dies — the claim
    // IS the commit: the DDL is fully applied despite the statement erroring
    io.crashAfterClaim = true
    intercept[RuntimeException](
      spark.sql(s"ALTER VIEW $cat.db.v SET TBLPROPERTIES('team'='core')"))
    assert(GraftViewStore.load(s"$w/db/v", io).properties.get("team") === Some("core"),
      "a post-claim crash must leave the DDL fully applied — no half state")

    spark.sql(s"DROP VIEW $cat.db.v")
    assert(!Files.exists(Paths.get(s"$w/db/v")), "drop must reclaim the view dir")
    intercept[Exception](spark.sql(s"SELECT * FROM $cat.db.v").collect())
  }

  test("concurrent DDLs serialize cross-process through the conditional PUT: no lost update") {
    val (cat, w, io) = fresh()
    spark.sql(s"CREATE VIEW $cat.db.race AS SELECT id FROM $cat.db.t")
    val root = s"$w/db/race"
    // ANOTHER PROCESS commits v2 between this writer's read and its claim:
    // the claim conflicts, the writer re-reads the racer's state and
    // re-applies its own change on top — both updates survive
    val otherProcessIo = new SimStoreIO
    io.sneakOnce = Some(() => {
      GraftViewStore.mutate(root, otherProcessIo) { cur =>
        val m = cur.get; m.copy(properties = m.properties + ("racer" -> "yes"))
      }
      ()
    })
    spark.sql(s"ALTER VIEW $cat.db.race SET TBLPROPERTIES('mine'='yes')")
    val fin = GraftViewStore.load(root, io)
    assert(fin.properties.get("racer") === Some("yes") &&
      fin.properties.get("mine") === Some("yes"),
      s"both writers' updates must land: ${fin.properties}")
    assert(Files.exists(Paths.get(s"$root/_view/v3.json")),
      "the loser must have re-committed as the next chain version")
  }

  test("RENAME VIEW under renameMode=metadata: name rebinds, directory never moves, lifecycle composes") {
    val (cat, w, io) = fresh()
    spark.sql(s"CREATE VIEW $cat.db.v AS SELECT id, v FROM $cat.db.t")

    // post-claim crash: the rename is fully applied despite the error
    io.crashAfterClaim = true
    intercept[RuntimeException](spark.sql(s"ALTER VIEW $cat.db.v RENAME TO db.v2"))
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.db.v2").as[Long].head() === 3L,
      "a post-claim crash must leave the rename fully applied")
    intercept[Exception](spark.sql(s"SELECT * FROM $cat.db.v").collect())
    assert(Files.isDirectory(Paths.get(s"$w/db/v")) &&
      !Files.exists(Paths.get(s"$w/db/v2")), "the view directory never moves")

    // SHOW VIEWS follows the binding, not the directory
    val listed = spark.sql(s"SHOW VIEWS IN $cat.db").select("viewName")
      .as[String].collect().toSet
    assert(listed.contains("v2") && !listed.contains("v"),
      s"SHOW VIEWS must follow the binding: $listed")

    // a SECOND rename chains through the link (v2 -> v3, dir still db/v)
    spark.sql(s"ALTER VIEW $cat.db.v2 RENAME TO db.v3")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.db.v3").as[Long].head() === 3L)
    assert(Files.isDirectory(Paths.get(s"$w/db/v")), "data stays put across chains")

    // DDL through the linked name mutates the LINKED root
    spark.sql(s"ALTER VIEW $cat.db.v3 SET TBLPROPERTIES('k'='1')")
    assert(GraftViewStore.load(s"$w/db/v", io).properties.get("k") === Some("1"))

    // ... while DDL through a RENAMED-AWAY name must refuse, not mutate the
    // renamed view through its dead name (r19 review pass 1: the mutation
    // execs bypassed the tombstone guard via the raw store probe)
    intercept[Exception](
      spark.sql(s"ALTER VIEW $cat.db.v SET TBLPROPERTIES('stolen'='yes')"))
    intercept[Exception](
      spark.sql(s"ALTER VIEW $cat.db.v2 AS SELECT id FROM $cat.db.t"))
    val metaAfter = GraftViewStore.load(s"$w/db/v", io)
    assert(metaAfter.properties.get("stolen").isEmpty &&
      metaAfter.versions.length === 1,
      "a dead name must never reach the renamed view's metadata")

    // the renamed-away name cannot host a NEW view while the directory is
    // occupied (loud, not silent co-location) — mirrors the table guard
    val ex = intercept[Exception](
      spark.sql(s"CREATE VIEW $cat.db.v AS SELECT id FROM $cat.db.t"))
    assert(ex.getMessage.contains("renamed away"), ex.getMessage)

    // DROP through the linked name reclaims the directory and frees BOTH
    // names: the original is creatable again (tombstone retired with the
    // link in one commit)
    spark.sql(s"DROP VIEW $cat.db.v3")
    assert(!Files.exists(Paths.get(s"$w/db/v")), "drop must reclaim the view dir")
    spark.sql(s"CREATE VIEW $cat.db.v AS SELECT id FROM $cat.db.t")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.db.v").as[Long].head() === 3L,
      "a renamed-away name must be reusable once its directory is free")
  }

  test("rename guards: occupied target refuses; table/view cross-claims refuse; dangling links reclaim on CREATE") {
    val (cat, w, io) = fresh()
    spark.sql(s"CREATE VIEW $cat.db.a AS SELECT id FROM $cat.db.t")
    spark.sql(s"CREATE VIEW $cat.db.b AS SELECT v FROM $cat.db.t")
    // onto an existing view or table: refuse
    intercept[Exception](spark.sql(s"ALTER VIEW $cat.db.a RENAME TO db.b"))
    intercept[Exception](spark.sql(s"ALTER VIEW $cat.db.a RENAME TO db.t"))
    // after a -> c, the tombstoned dir still occupies 'a': binding another
    // view onto 'a' must refuse
    spark.sql(s"ALTER VIEW $cat.db.a RENAME TO db.c")
    intercept[Exception](spark.sql(s"ALTER VIEW $cat.db.b RENAME TO db.a"))
    // a DANGLING view link (dir gone out-of-band) must not wedge the name:
    // it does not list, and CREATE VIEW reclaims it (r18 advice #2 — the
    // old path wrote the new view at the STALE physical directory)
    spark.sql(s"ALTER VIEW $cat.db.b RENAME TO db.d")
    graft.util.Fs.deleteRecursively(Paths.get(s"$w/db/b"))
    assert(!spark.sql(s"SHOW VIEWS IN $cat.db").select("viewName")
      .as[String].collect().contains("d"), "a dangling link must not list")
    spark.sql(s"CREATE VIEW $cat.db.d AS SELECT id, v FROM $cat.db.t")
    assert(Files.exists(Paths.get(s"$w/db/d/_view/v1.json")),
      "CREATE must reclaim the dangling link and store under the view's OWN dir")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.db.d").as[Long].head() === 3L)
    // rename BACK to the original name: allowed (own-dir exemption), map
    // normalizes to a plain binding
    spark.sql(s"ALTER VIEW $cat.db.c RENAME TO db.a")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.db.a").as[Long].head() === 3L)
    intercept[Exception](spark.sql(s"SELECT * FROM $cat.db.c").collect())
  }

  test("materialized view: creation, refresh bookkeeping and rename all commit through the store") {
    val (cat, w, io) = fresh()
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.db.m TBLPROPERTIES('pk'='id') " +
      s"AS SELECT id, v FROM $cat.db.t")
    assert(Files.exists(Paths.get(s"$w/db/m/_view/v1.json")),
      "MV metadata must live in the chain")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (4, 40)")
    val r = spark.sql(s"CALL $cat.system.refresh_mv('db.m')")
      .select("refreshed").as[Boolean].head()
    assert(r, "stale MV must refresh")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.db.m").as[Long].head() === 4L)
    assert(Files.exists(Paths.get(s"$w/db/m/_view/v2.json")),
      "the refresh's sourceVersions update must commit as the next chain version")
    // metadata rename of an MV: reads + refresh follow the new name
    spark.sql(s"ALTER VIEW $cat.db.m RENAME TO db.m2")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.db.m2").as[Long].head() === 4L)
    assert(spark.sql(s"CALL $cat.system.refresh_mv('db.m2')")
      .select("refreshed").as[Boolean].head() === false, "fresh → no-op")
    spark.sql(s"DROP VIEW $cat.db.m2")
    assert(!Files.exists(Paths.get(s"$w/db/m")), "MV drop reclaims storage + dir")
  }

  test("legacy single-file metadata migrates: reads fall back, the first chain commit supersedes and retires it") {
    val (cat, w, io) = fresh()
    // handcraft a pre-r19 `_view.json` (the tmp+ATOMIC_MOVE format)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.createObjectNode()
    node.put("formatVersion", 1)
    node.put("currentVersionId", 1)
    node.putObject("properties").put("origin", "legacy")
    val ver = node.putArray("versions").addObject()
    ver.put("versionId", 1)
    ver.put("sql", "SELECT id, v FROM t")
    ver.put("currentCatalog", cat)
    val ns = ver.putArray("currentNamespace"); ns.add("db")
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v BIGINT")
    ver.put("schema", schema.json)
    val q = ver.putArray("queryColumnNames"); q.add("id"); q.add("v")
    val a = ver.putArray("columnAliases"); a.add("id"); a.add("v")
    val c = ver.putArray("columnComments"); c.addNull(); c.addNull()
    Files.createDirectories(Paths.get(s"$w/db/leg"))
    Files.write(Paths.get(s"$w/db/leg/_view.json"), om.writeValueAsBytes(node))
    // reads fall back to the legacy file
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.db.leg").as[Long].head() === 3L)
    // the first DDL commits chain v1 and retires the legacy file; the
    // definition (and its history) carries over
    spark.sql(s"ALTER VIEW $cat.db.leg SET TBLPROPERTIES('team'='core')")
    assert(Files.exists(Paths.get(s"$w/db/leg/_view/v1.json")) &&
      !Files.exists(Paths.get(s"$w/db/leg/_view.json")),
      "the chain must supersede and retire the legacy file")
    val meta = GraftViewStore.load(s"$w/db/leg", io)
    assert(meta.properties === Map("origin" -> "legacy", "team" -> "core"))
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.db.leg").as[Long].head() === 3L)
  }

  test("index CREATE procedures refuse tombstoned names (r18 advice #1)") {
    val (cat, w, io) = fresh()
    spark.sql(s"ALTER TABLE $cat.db.t RENAME TO db.t9")
    // db.t is tombstoned and its directory still holds t9's live data: an
    // index create there would nest index subtables inside the renamed
    // table's directory (and die with its DROP) — refuse loudly
    val ex = intercept[Exception](
      spark.sql(s"CALL $cat.system.dedup_index_create('db.t')"))
    assert(ex.getMessage.contains("renamed away"), ex.getMessage)
    // the linked name resolves to the live directory, so index ops on the
    // NEW name keep working
    spark.sql(s"CALL $cat.system.dedup_index_create('db.idx')")
    assert(spark.sql(s"SHOW TABLES IN $cat.db").select("tableName")
      .as[String].collect().toSet === Set("t9", "idx"))
    // a READ/open procedure on the tombstoned name refuses loudly too —
    // and WITHOUT committing anything to the links map (r19 review pass 1:
    // the create guard's clearTombstone briefly made read-only CALLs
    // mutate catalog state)
    def linkVersions(): Set[String] =
      graft.util.Fs.listSeq(java.nio.file.Paths.get(s"$w/db/_catalog_links"))
        .map(_.getFileName.toString).toSet
    val before = linkVersions()
    val ex2 = intercept[Exception](
      spark.sql(s"CALL $cat.system.ann_status('db.t')"))
    assert(ex2.getMessage.contains("does not resolve"), ex2.getMessage)
    assert(linkVersions() === before,
      "a read-only CALL must not commit a links version")
  }
}
