package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.table.{MergeMode, TransactionalTable}

/** Row lineage (Iceberg v3 `first_row_id` inheritance): every row gets a
  * stable `_row_id` — inherited as firstRowId + ordinal from the manifest
  * unless a rewrite materialized it — and a `_last_updated_seq` stamp of the
  * commit that last changed it. CoW updates keep the id and bump the stamp;
  * compaction/fold keep both; discarded ids are never reused. */
class RowLineageSpec extends SparkSpec {
  import spark.implicits._

  private val sch = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def fresh(prefix: String = "ttable-lineage"): TransactionalTable = {
    val t = TransactionalTable.create(spark, tmpDir(prefix), sch, "id")
    t.setRowLineage(true)
    t
  }

  private def rows(t: TransactionalTable): Map[Long, (Long, Long, String)] =
    t.scanLineage().select($"id", $"_row_id", $"_last_updated_seq", $"v")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  private def noDels = spark.emptyDataset[Long].toDF("id")

  private def up(pairs: (Long, String)*) = pairs.toDF("id", "v")

  test("inserts get distinct contiguous ids; last_updated = insert commit") {
    val t = fresh()
    t.merge(up(1L -> "a", 2L -> "b", 3L -> "c"), noDels, batchId = 0)
    t.merge(up(10L -> "x", 11L -> "y"), noDels, batchId = 1)
    val m = rows(t)
    assert(m.keySet === Set(1L, 2L, 3L, 10L, 11L))
    val ids = m.values.map(_._1).toSeq
    assert(ids.distinct.size === 5, s"duplicate row ids: $ids")
    assert(ids.sorted === (0L until 5L), s"ids not contiguous from 0: $ids")
    // batch-1 rows (v1) carry lower ids than batch-2 rows (v2)
    assert(Seq(1L, 2L, 3L).map(m(_)._1).max < Seq(10L, 11L).map(m(_)._1).min)
    assert(Seq(1L, 2L, 3L).forall(k => m(k)._2 === 1L))
    assert(Seq(10L, 11L).forall(k => m(k)._2 === 2L))
  }

  test("CoW update keeps _row_id, bumps _last_updated_seq; carried rows keep both") {
    val t = fresh()
    t.merge(up(1L -> "a", 2L -> "b", 3L -> "c"), noDels, batchId = 0)
    val before = rows(t)
    t.merge(up(2L -> "B!"), noDels, batchId = 1)
    val after = rows(t)
    assert(after(2L)._1 === before(2L)._1, "update changed the row id")
    assert(after(2L)._2 === 2L, "update did not bump last_updated_seq")
    assert(after(2L)._3 === "B!")
    // rows 1 and 3 were carried through the CoW rewrite of their file:
    // id AND last-updated stamp both survive the rewrite
    Seq(1L, 3L).foreach { k =>
      assert(after(k) === before(k), s"carried row $k lineage changed")
    }
  }

  test("deleted ids are never reused; later inserts continue the sequence") {
    val t = fresh()
    t.merge(up(1L -> "a", 2L -> "b"), noDels, batchId = 0)
    val idOf2 = rows(t)(2L)._1
    t.merge(up(), Seq(2L).toDF("id"), batchId = 1)
    t.merge(up(3L -> "c"), noDels, batchId = 2)
    val m = rows(t)
    assert(!m.contains(2L))
    assert(m(3L)._1 > idOf2, "a discarded row id was reused")
  }

  test("compaction and clustered rewrite preserve lineage exactly") {
    val t = fresh()
    t.merge(up(1L -> "a", 2L -> "b"), noDels, batchId = 0)
    t.merge(up(3L -> "c", 2L -> "B"), noDels, batchId = 1)
    val before = rows(t)
    t.compact(minFileRows = 1000L)
    assert(rows(t) === before, "compact() changed lineage")
    t.compactClustered(targetFiles = 1)
    assert(rows(t) === before, "compactClustered() changed lineage")
  }

  test("MOR merge + foldDeletes: updated key gets a new id, fold preserves it") {
    val t = fresh()
    t.merge(up(1L -> "a", 2L -> "b"), noDels, batchId = 0)
    val before = rows(t)
    // MOR upsert: the new image is a NEW row (Iceberg v3 MOR semantics —
    // equality-delete + insert does not carry identity)
    t.merge(up(2L -> "B"), noDels, batchId = 1, mode = MergeMode.MergeOnRead)
    val after = rows(t)
    assert(after(1L) === before(1L))
    assert(after(2L)._1 !== before(2L)._1)
    assert(after(2L)._2 === 2L)
    val preFold = rows(t)
    t.foldDeletes()
    assert(rows(t) === preFold, "foldDeletes changed lineage")
  }

  test("enable on a non-empty table assigns ids to existing rows (v3 upgrade commit)") {
    val t = TransactionalTable.create(spark, tmpDir("ttable-latelineage"), sch, "id")
    t.merge(up(1L -> "a"), noDels, batchId = 0)
    val vPre = t.currentVersion
    t.setRowLineage(true)
    // the upgrade is ONE metadata-only commit (no data file written)
    assert(t.currentVersion === vPre + 1, "upgrade did not commit exactly once")
    t.merge(up(2L -> "b"), noDels, batchId = 1)
    val m = t.scanLineage().select($"id", $"_row_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(m(1L).contains(0L), "pre-upgrade row not assigned an id at enable time")
    assert(m(2L).isDefined && m(2L) != m(1L))
    // disabling again is refused — readers may have recorded ids
    intercept[IllegalArgumentException](t.setRowLineage(false))
  }

  test("rewrites of pre-upgrade rows preserve their upgrade-assigned ids") {
    // Regression: before the upgrade commit existed, a compaction/CoW of
    // pre-lineage rows materialized NULL ids which the inheritance read then
    // re-invented as firstRowId + ordinal — unstable identity + spurious
    // changelog churn. With enable-time assignment, ids survive any rewrite.
    val t = TransactionalTable.create(spark, tmpDir("ttable-upgrade-rw"), sch, "id")
    t.merge(up(1L -> "a", 2L -> "b"), noDels, batchId = 0)
    t.merge(up(3L -> "c"), noDels, batchId = 1)
    t.setRowLineage(true)
    val assigned = rows(t)
    assert(assigned.values.map(_._1).toSeq.sorted === (0L until 3L))
    val vUp = t.currentVersion
    t.compact(minFileRows = 1000L)
    assert(rows(t) === assigned, "compaction changed upgrade-assigned ids")
    // a compaction-only interval after the upgrade diffs to ZERO under lineage
    assert(t.changesWithLineage(vUp, t.currentVersion).count() === 0L)
    // CoW update of a pre-upgrade row keeps its id
    t.merge(up(2L -> "B!"), noDels, batchId = 2)
    val after = rows(t)
    assert(after(2L)._1 === assigned(2L)._1, "CoW update changed a pre-upgrade row's id")
    assert(after(1L) === assigned(1L) && after(3L) === assigned(3L))
  }

  test("time travel reads lineage as of the old snapshot") {
    val t = fresh()
    t.merge(up(1L -> "a", 2L -> "b"), noDels, batchId = 0)
    val v1 = t.currentVersion
    t.merge(up(2L -> "B", 3L -> "c"), noDels, batchId = 1)
    val old = t.scanLineage(v1).select($"id", $"_row_id", $"_last_updated_seq")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(old.keySet === Set(1L, 2L))
    assert(old.values.forall(_._2 === 1L))
    val now = rows(t)
    assert(now(2L)._1 === old(2L)._1) // same identity across versions
    assert(now(2L)._2 === 2L)
  }

  test("scanLineage on a lineage-less table is refused") {
    val t = TransactionalTable.create(spark, tmpDir("ttable-nolineage"), sch, "id")
    intercept[IllegalArgumentException](t.scanLineage())
  }

  test("changesWithLineage: update = delete+insert pair sharing _row_id; compaction diffs empty") {
    val t = fresh("ttable-lineage-cdc")
    t.merge(up(1L -> "a", 2L -> "b", 3L -> "c"), noDels, batchId = 0)
    val v1 = t.currentVersion
    t.merge(up(2L -> "B", 9L -> "new"), Seq(3L).toDF("id"), batchId = 1)
    val v2 = t.currentVersion
    val d = t.changesWithLineage(v1, v2)
      .select($"id", $"v", $"_row_id", $"_last_updated_seq", $"_change_type")
      .as[(Long, String, Long, Long, String)].collect().toSet
    val ridOf = rows(t) // post-change ids
    val rid2 = ridOf(2L)._1
    // the UPDATE of key 2: both sides of the pair carry the SAME row id
    assert(d.filter(_._1 == 2L).map(r => (r._3, r._5)) ===
      Set((rid2, "insert"), (rid2, "delete")))
    assert(d.filter(_._1 == 2L).map(r => (r._2, r._5)) ===
      Set(("b", "delete"), ("B", "insert")))
    // the DELETE of key 3 surfaces its old identity once
    assert(d.filter(_._1 == 3L).map(_._5) === Set("delete"))
    // the INSERT of key 9 carries its fresh id and the new stamp
    val ins9 = d.filter(_._1 == 9L)
    assert(ins9.map(_._5) === Set("insert") && ins9.head._4 === v2)
    // carried key 1 cancels (same data, id, stamp on both sides)
    assert(!d.exists(_._1 == 1L))
    // a compaction-only interval diffs to ZERO rows under lineage — the
    // reason maintenance rewrites materialize ids
    t.compact(minFileRows = 1000L)
    assert(t.changesWithLineage(v2, t.currentVersion).count() === 0L)
    // lineage-less twin still works and a lineage-less table refuses
    assert(t.changes(v1, v2).count() === d.size)
  }

  test("SQL surface: TBLPROPERTIES at CREATE, db.t.lineage table, time travel") {
    val cat = s"graft_rl${System.nanoTime()}"
    val warehouse = tmpDir("graft-rl-wh")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$warehouse/db"))
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v STRING) " +
      "TBLPROPERTIES('pk'='id','row.lineage'='true')")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 'a'), (2, 'b')")
    val before = spark.sql(s"SELECT id, _row_id FROM $cat.db.t.lineage")
      .as[(Long, Long)].collect().toMap
    assert(before.values.toSeq.distinct.size === 2)
    spark.sql(s"UPDATE $cat.db.t SET v = 'B' WHERE id = 2")
    val after = spark.sql(
      s"SELECT id, _row_id, _last_updated_seq, v FROM $cat.db.t.lineage ORDER BY id")
      .as[(Long, Long, Long, String)].collect()
    assert(after.map(r => r._1 -> r._2).toMap === before, "SQL UPDATE changed row ids")
    assert(after.find(_._1 === 2L).get._3 > after.find(_._1 === 1L).get._3,
      "updated row's last_updated_seq did not advance past the carried row's")
    assert(after.find(_._1 === 2L).get._4 === "B")
    // time travel composes: at the insert version both rows carry that stamp
    val v1 = spark.sql(s"SELECT version FROM $cat.db.t.history ORDER BY version")
      .collect().map(_.getLong(0)).find(_ > 0).get
    val old = spark.sql(
      s"SELECT id, _last_updated_seq FROM $cat.db.t.lineage VERSION AS OF $v1")
      .as[(Long, Long)].collect().toMap
    assert(old === Map(1L -> v1, 2L -> v1))
    // surfaced by SHOW TBLPROPERTIES
    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.db.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("row.lineage").contains("true"))
    // ALTER-time upgrade on a second table
    spark.sql(s"CREATE TABLE $cat.db.u (id BIGINT, v STRING) TBLPROPERTIES('pk'='id')")
    intercept[Exception](
      spark.sql(s"SELECT * FROM $cat.db.u.lineage").collect())
    spark.sql(s"ALTER TABLE $cat.db.u SET TBLPROPERTIES('row.lineage'='true')")
    spark.sql(s"INSERT INTO $cat.db.u VALUES (7, 'x')")
    assert(spark.sql(s"SELECT _row_id FROM $cat.db.u.lineage").collect().head.getLong(0) === 0L)
  }
}
