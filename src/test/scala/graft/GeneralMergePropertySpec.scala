package graft

import scala.util.Random

import graft.table.TransactionalTable

/**
 * Property check for the general N-clause MERGE: for randomized target and
 * source tables, the engine's first-matching-clause-wins lowering must equal
 * a direct in-memory model of the same clauses. Guards the CaseWhen
 * branch-ordering, row-image assembly, and join-type narrowing against
 * subtle regressions no single fixture would catch.
 */
class GeneralMergePropertySpec extends SparkSpec {
  import spark.implicits._

  private val sch = new org.apache.spark.sql.types.StructType()
    .add("id", "bigint").add("v", "bigint").add("w", "bigint")

  test("general merge equals the reference model across random tables") {
    for (seed <- 1 to 5) {
      val rng = new Random(seed)
      val targetRows = (0L to 40L).filter(_ => rng.nextBoolean())
        .map(i => (i, rng.nextInt(100).toLong, rng.nextInt(100).toLong))
      val sourceRows = (20L to 60L).filter(_ => rng.nextBoolean())
        .map(i => (i, rng.nextInt(100).toLong))
      val k = rng.nextInt(100).toLong

      val cat = s"graft_gmp${seed}_${System.nanoTime()}"
      val w = tmpDir(s"gmp-$seed")
      spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
      val t = TransactionalTable.create(spark, s"$w/db/t", sch, "id", None)
      if (targetRows.nonEmpty) t.append(targetRows.toDF("id", "v", "w"))
      sourceRows.toDF("id", "x").createOrReplaceTempView(s"gmp_src_$seed")

      spark.sql(
        s"""MERGE INTO $cat.db.t t USING gmp_src_$seed s ON t.id = s.id
           |WHEN MATCHED AND s.x % 3 = 0 THEN UPDATE SET t.v = s.x * 2
           |WHEN MATCHED AND s.x % 3 = 1 THEN DELETE
           |WHEN MATCHED THEN UPDATE SET t.w = -1
           |WHEN NOT MATCHED AND s.x % 2 = 0 THEN
           |  INSERT (id, v) VALUES (s.id, s.x)
           |WHEN NOT MATCHED BY SOURCE AND t.v > $k THEN
           |  UPDATE SET t.w = 99""".stripMargin)

      // The same clauses, modeled directly.
      val srcById = sourceRows.toMap
      val matchedOut = targetRows.flatMap { case (id, v, wv) =>
        srcById.get(id) match {
          case Some(x) =>
            if (x % 3 == 0) Some((id, x * 2, wv))
            else if (x % 3 == 1) None // deleted
            else Some((id, v, -1L))
          case None => // not matched by source
            if (v > k) Some((id, v, 99L)) else Some((id, v, wv))
        }
      }
      val targetIds = targetRows.map(_._1).toSet
      val inserted = sourceRows.collect {
        case (id, x) if !targetIds.contains(id) && x % 2 == 0 => (id, x, null)
      }
      val expected = (matchedOut.map(r => (r._1, r._2, Option(r._3))) ++
        inserted.map(r => (r._1, r._2, None: Option[Long]))).toSet

      val got = TransactionalTable.open(spark, s"$w/db/t").scan()
        .select($"id", $"v", $"w").as[(Long, Long, Option[Long])]
        .collect().map(r => (r._1, r._2, r._3)).toSet
      assert(got === expected, s"seed $seed: engine merge diverged from the model")
    }
  }
}
