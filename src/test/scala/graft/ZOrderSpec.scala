package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.table.TransactionalTable

/** Z-order rewrite: after compactZOrdered on (x, y), per-file min/max stats
  * are tight in BOTH dimensions, so 2-D box predicates prune to the few
  * files whose rectangles intersect the box — which PK clustering cannot do
  * for the non-PK dimension.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private val sch = StructType(Seq(
    StructField("id", LongType), StructField("x", LongType),
    StructField("y", LongType), StructField("v", DoubleType)))

  private def noDel = spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
    StructType(Seq(StructField("id", LongType))))

  // 64×64 grid: x and y are independent; id (the PK) correlates with y only.
  private def grid(t: TransactionalTable): Unit =
    t.merge((0L until 4096L).map(i => (i, i % 64, i / 64, i.toDouble))
      .toDF("id", "x", "y", "v"), noDel, batchId = 0)

  private def boxFiles(t: TransactionalTable, lo: Long, hi: Long): Seq[graft.table.DataFile] =
    t.snapshot.files.filter { f =>
      val rx = f.stats.get("x"); val ry = f.stats.get("y")
      rx.exists(r => r._1 <= hi && r._2 >= lo) && ry.exists(r => r._1 <= hi && r._2 >= lo)
    }

  test("z-order clusters both dimensions: box predicates prune most files") {
    val t = TransactionalTable.create(spark, tmpDir("zorder") + "/t", sch, "id")
    grid(t)
    t.compactZOrdered(Seq("x", "y"), targetFiles = 16)
    val files = t.snapshot.files
    assert(files.size >= 8, s"test premise: several output files, got ${files.size}")
    // a 16×16 box = 1/16 of the plane; z-clustered 16 files ≈ quadrants of
    // quadrants, so the box should intersect only a small minority
    val kept = boxFiles(t, 0L, 15L)
    assert(kept.size * 3 <= files.size,
      s"box should prune most files: kept ${kept.size} of ${files.size}")
    // correctness unchanged by the rewrite
    val got = t.scan().filter(col("x") <= 15 && col("y") <= 15).count()
    assert(got === 16L * 16L)
  }

  test("destroyed-file proof: the SQL path answers a box query from the kept files alone") {
    val w = tmpDir("zorder-wh")
    spark.conf.set("spark.sql.catalog.graft_zo", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_zo.warehouse", w)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    val t = TransactionalTable.create(spark, s"$w/db/z", sch, "id")
    grid(t)
    t.compactZOrdered(Seq("x", "y"), targetFiles = 16)
    val kept = boxFiles(t, 0L, 15L).map(_.path).toSet
    t.snapshot.files.filterNot(f => kept.contains(f.path))
      .foreach(f => java.nio.file.Files.delete(java.nio.file.Paths.get(f.path)))
    val n = spark.sql(
      "SELECT COUNT(*) FROM graft_zo.db.z WHERE x BETWEEN 0 AND 15 AND y BETWEEN 0 AND 15")
      .as[Long].head()
    assert(n === 256L, "box query must plan only the box-intersecting files")
  }

  test("z-order composes with hidden partitioning: rewrite keeps directory layout") {
    val root = tmpDir("zorder-part") + "/t"
    val t = TransactionalTable.createPartitioned(spark, root,
      StructType(sch.fields :+ StructField("cat", StringType)), "id",
      Some(graft.table.PartitionTransform.Identity("cat")))
    t.merge((0L until 1024L).map(i => (i, i % 32, i / 32, i.toDouble,
      if (i % 2 == 0) "even" else "odd")).toDF("id", "x", "y", "v", "cat"),
      noDel, batchId = 0)
    t.compactZOrdered(Seq("x", "y"), targetFiles = 8)
    val files = t.snapshot.files
    assert(files.flatMap(_.partition).toSet === Set("even", "odd"),
      "rewritten files must keep the partition spec's directory values")
    assert(t.scan().filter(col("cat") === "even").count() === 512L)
    assert(t.scan().filter(col("x") <= 7 && col("y") <= 7).count() === 8L * 8L)
  }

  test("manifest-stats normalization: no extra scan needed, MOR deletes folded") {
    val t = TransactionalTable.create(spark, tmpDir("zorder-mor") + "/t", sch, "id")
    grid(t)
    t.merge(spark.emptyDataFrame.select(), noDel.select(col("id")), batchId = 1,
      graft.table.MergeMode.MergeOnRead) // no-op MOR commit is fine
    t.merge(Seq((0L, 0L, 0L, -1.0)).toDF("id", "x", "y", "v"),
      Seq(1L).toDF("id"), batchId = 2, graft.table.MergeMode.MergeOnRead)
    assert(t.snapshot.deletes.nonEmpty)
    t.compactZOrdered(Seq("x", "y"), targetFiles = 8)
    assert(t.snapshot.deletes.isEmpty, "z-order rewrite folds pending deletes")
    assert(t.scan().count() === 4095L) // 4096 - deleted id 1 (id 0 updated)
    assert(t.scan().filter(col("id") === 0L).select("v").as[Double].head() === -1.0)
  }
}
