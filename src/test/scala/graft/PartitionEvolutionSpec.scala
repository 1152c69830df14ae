package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.table.{PartitionTransform, TransactionalTable}

/** Partition evolution (Iceberg spec-evolution parity): the table's transform
  * changes over time; files keep the spec they were written under; every
  * prune path reverses each file's OWN transform; compaction migrates old
  * files to the current spec.
  */
class PartitionEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private val sch = StructType(Seq(
    StructField("id", LongType), StructField("ts", TimestampType),
    StructField("cat", StringType), StructField("v", DoubleType)))

  private def ts(day: Int): Timestamp = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  private def noDel = spark.createDataFrame(
    spark.sparkContext.emptyRDD[Row], StructType(Seq(StructField("id", LongType))))

  test("identity -> days evolution: mixed-spec scan correct, per-spec pruning, metadata round-trip") {
    val root = tmpDir("pevo") + "/t"
    val t0 = TransactionalTable.createPartitioned(spark, root, sch, "id",
      Some(PartitionTransform.Identity("cat")))
    // era 0 (identity on cat): days 1-2
    t0.merge(Seq((1L, ts(1), "a", 1.0), (2L, ts(2), "b", 2.0)).toDF("id", "ts", "cat", "v"),
      noDel, batchId = 0)
    val t1 = t0.evolvePartitioning(Some(PartitionTransform.Days("ts")))
    assert(t1.currentSpecId === 1)
    assert(t1.pastSpecs(0) === PartitionTransform.Identity("cat"))
    // era 1 (days on ts): days 10 and 20
    t1.merge(Seq((3L, ts(10), "a", 3.0), (4L, ts(20), "b", 4.0)).toDF("id", "ts", "cat", "v"),
      noDel, batchId = 1)

    // open() round-trips the spec history
    val reopened = TransactionalTable.open(spark, root)
    assert(reopened.currentSpecId === 1)
    assert(reopened.pastSpecs === Map(0 -> PartitionTransform.Identity("cat")))
    assert(reopened.partitionSpec === Some(PartitionTransform.Days("ts")))

    // files of each era carry their own spec id and value language
    val byId = reopened.snapshot.files.groupBy(_.specId)
    assert(byId(0).flatMap(_.partition).toSet === Set("a", "b"))
    assert(byId(1).flatMap(_.partition).forall(_.forall(_.isDigit)),
      "days-era files must carry epoch-day ordinals")

    // full mixed-spec scan is complete
    assert(reopened.scan().select("id").as[Long].collect().toSet === Set(1L, 2L, 3L, 4L))
  }

  test("SQL pruning reverses each file's own transform (destroyed-file proofs)") {
    val w = tmpDir("pevo-warehouse")
    spark.conf.set("spark.sql.catalog.graft_pe", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_pe.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    val t0 = TransactionalTable.createPartitioned(spark, s"$w/db/ev", sch, "id",
      Some(PartitionTransform.Identity("cat")))
    t0.merge(Seq((1L, ts(1), "a", 1.0), (2L, ts(2), "b", 2.0)).toDF("id", "ts", "cat", "v"),
      noDel, batchId = 0)
    val t1 = t0.evolvePartitioning(Some(PartitionTransform.Days("ts")))
    t1.merge(Seq((3L, ts(10), "a", 3.0), (4L, ts(20), "b", 4.0)).toDF("id", "ts", "cat", "v"),
      noDel, batchId = 1)

    // destroy the day-20 era-1 file: a day-10 point query must never plan it
    val day20 = t1.snapshot.files.find(f => f.specId == 1 && f.partition.contains(
      (java.time.LocalDate.of(2024, 1, 20).toEpochDay).toString)).get
    java.nio.file.Files.delete(java.nio.file.Paths.get(day20.path))
    val got = spark.sql(
      """SELECT id FROM graft_pe.db.ev
         WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
           AND ts <  TIMESTAMP '2024-01-11 00:00:00'""").as[Long].collect().toSeq
    assert(got === Seq(3L), "day-range query must skip the destroyed other-day file")

    // era-0 files still answer cat-identity prunes: a cat='a' query must not
    // plan the destroyed era-1 file either (its day ordinal is not 'a' — but
    // the prune that saves it must NOT treat era-0 'a'/'b' values as days)
    val cats = spark.sql(
      """SELECT id FROM graft_pe.db.ev
         WHERE cat = 'a' AND ts < TIMESTAMP '2024-01-05 00:00:00'""").as[Long].collect().toSeq
    assert(cats === Seq(1L),
      "identity prune on era-0 files + day prune on era-1 files must compose")
  }

  test("bucket evolution on a string column: only the file's own transform can prune") {
    val w = tmpDir("pevo-bucket-wh")
    spark.conf.set("spark.sql.catalog.graft_pb", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_pb.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    val s2 = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("v", DoubleType)))
    // era 0: UNPARTITIONED
    val t0 = TransactionalTable.create(spark, s"$w/db/b", s2, "id")
    t0.merge(Seq((1L, "alpha", 1.0), (2L, "beta", 2.0)).toDF("id", "name", "v"),
      noDel, batchId = 0)
    val t1 = t0.evolvePartitioning(Some(PartitionTransform.Bucket(8, "name")))
    t1.merge((10L to 40L).map(i => (i, s"n$i", i.toDouble)).toDF("id", "name", "v"),
      noDel, batchId = 1)
    val buckets = t1.snapshot.files.filter(_.specId == 1).flatMap(_.partition).distinct
    assert(buckets.size > 1, "test premise: several hash buckets")

    // the bucket of 'n10' — destroy a file of a DIFFERENT bucket; the point
    // lookup must answer (string column: no numeric stats, only the bucket
    // transform can prune era-1 files; the era-0 file has id-range stats that
    // cannot help a name predicate and must simply be read)
    val target = t1.snapshot.files.find(f => f.specId == 1 &&
      !f.partition.contains(bucketOf("n10", 8))).get
    java.nio.file.Files.delete(java.nio.file.Paths.get(target.path))
    val v = spark.sql("SELECT v FROM graft_pb.db.b WHERE name = 'n10'")
      .as[Double].collect().toSeq
    assert(v === Seq(10.0), "bucket prune must skip the destroyed other-bucket file")
  }

  private def bucketOf(s: String, n: Int): String = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(s),
      org.apache.spark.sql.types.StringType, 42L)
    (((h % n) + n) % n).toString
  }

  test("compaction migrates old-spec files to the current spec") {
    val root = tmpDir("pevo-compact") + "/t"
    val t0 = TransactionalTable.createPartitioned(spark, root, sch, "id",
      Some(PartitionTransform.Identity("cat")))
    t0.merge(Seq((1L, ts(1), "a", 1.0), (2L, ts(2), "b", 2.0)).toDF("id", "ts", "cat", "v"),
      noDel, batchId = 0)
    val t1 = t0.evolvePartitioning(Some(PartitionTransform.Days("ts")))
    t1.merge(Seq((3L, ts(10), "a", 3.0)).toDF("id", "ts", "cat", "v"), noDel, batchId = 1)
    t1.compact()
    val files = t1.snapshot.files
    assert(files.forall(_.specId == 1),
      s"compaction must stamp the current spec, got ${files.map(_.specId)}")
    assert(files.flatMap(_.partition).forall(_.forall(_.isDigit)),
      "rewritten files must carry day-ordinal partition values")
    assert(t1.scan().select("id").as[Long].collect().toSet === Set(1L, 2L, 3L))
  }

  test("ALTER TABLE SET TBLPROPERTIES('partition'=...) evolves through SQL") {
    val w = tmpDir("pevo-sql-wh")
    spark.conf.set("spark.sql.catalog.graft_ps", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_ps.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    spark.sql("""CREATE TABLE graft_ps.db.e
                 (id BIGINT, ts TIMESTAMP, cat STRING, v DOUBLE)
                 PARTITIONED BY (cat) TBLPROPERTIES ('pk'='id')""")
    spark.sql("ALTER TABLE graft_ps.db.e SET TBLPROPERTIES ('partition'='days(ts)')")
    val t = TransactionalTable.open(spark, s"$w/db/e")
    assert(t.partitionSpec === Some(PartitionTransform.Days("ts")))
    assert(t.currentSpecId === 1)
    assert(t.pastSpecs === Map(0 -> PartitionTransform.Identity("cat")))
    // and back to none
    spark.sql("ALTER TABLE graft_ps.db.e SET TBLPROPERTIES ('partition'='none')")
    val t2 = TransactionalTable.open(spark, s"$w/db/e")
    assert(t2.partitionSpec === None)
    assert(t2.currentSpecId === 2)
    // the files metadata table reports each file's spec era
    spark.sql("INSERT INTO graft_ps.db.e VALUES (1, TIMESTAMP '2024-01-01 00:00:00', 'a', 1.0)")
    val specIds = spark.sql("SELECT spec_id FROM graft_ps.db.e.files WHERE kind = 'data'")
      .as[Long].collect().toSeq
    assert(specIds === Seq(2L), s"post-evolution write must carry spec 2, got $specIds")
  }
}
