package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.table.{PartitionTransform, TransactionalTable}

/**
 * Storage-partitioned joins (SPJ): two tables bucketed `bucket(n, pk)` under
 * the SAME catalog join on the pk WITHOUT a shuffle exchange — each scan
 * reports KeyGroupedPartitioning over the bucket transform (resolved through
 * the catalog's FunctionCatalog) and plans one keyed input partition per
 * bucket, so the join zips co-bucketed partitions in place. At 100 TB this
 * removes the dominant cost of fact-fact joins between co-bucketed tables.
 */
class StoragePartitionedJoinSpec extends SparkSpec {
  import spark.implicits._

  private val sch = new org.apache.spark.sql.types.StructType()
    .add("id", "bigint").add("v", "bigint")

  private def mkTable(root: String, n: Int, rows: Seq[(Long, Long)]): TransactionalTable = {
    val t = TransactionalTable.createPartitioned(spark, root, sch, "id",
      Some(PartitionTransform.Bucket(n, "id")))
    t.append(rows.toDF("id", "v"))
    t
  }

  private def withSpj[A](body: => A): A = {
    val saved = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> spark.conf.getOption(
        "spark.sql.sources.v2.bucketing.enabled"),
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.getOption(
        "spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.enabled" -> spark.conf.getOption("spark.sql.adaptive.enabled"))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("co-bucketed pk join plans with zero shuffle exchanges and exact results") {
    val w = tmpDir("spj-wh")
    Files.createDirectories(Paths.get(s"$w/db"))
    val cat = s"graft_spj${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    val left = (1L to 400L).map(i => (i, i * 10))
    val right = (201L to 600L).map(i => (i, i * 7))
    mkTable(s"$w/db/a", 8, left)
    mkTable(s"$w/db/b", 8, right)
    withSpj {
      val df = spark.sql(
        s"""SELECT a.id, a.v AS av, b.v AS bv
           |FROM $cat.db.a a JOIN $cat.db.b b ON a.id = b.id""".stripMargin)
      val shuffles = df.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"co-bucketed join planned ${shuffles.size} shuffle exchange(s):\n" +
          df.queryExecution.executedPlan)
      val got = df.as[(Long, Long, Long)].collect().sortBy(_._1)
      val want = (201L to 400L).map(i => (i, i * 10, i * 7))
      assert(got.toSeq === want, "SPJ join returned wrong rows")
    }
  }

  test("GROUP BY the bucket column aggregates without a shuffle exchange") {
    val w = tmpDir("spj-agg-wh")
    Files.createDirectories(Paths.get(s"$w/db"))
    val cat = s"graft_spja${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    mkTable(s"$w/db/a", 8, (1L to 300L).map(i => (i, i * 3)))
    withSpj {
      val df = spark.sql(
        s"SELECT id, sum(v) AS sv FROM $cat.db.a GROUP BY id")
      val shuffles = df.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"bucket-keyed aggregation shuffled:\n${df.queryExecution.executedPlan}")
      assert(df.count() === 300)
    }
  }

  test("SPJ holds past the chunk partition-value cap (32 buckets > cap 16)") {
    val w = tmpDir("spj-big-wh")
    Files.createDirectories(Paths.get(s"$w/db"))
    val cat = s"graft_spjb${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    assert(32 > graft.table.ChunkRef.PartitionCap, "test premise")
    mkTable(s"$w/db/a", 32, (1L to 300L).map(i => (i, i)))
    mkTable(s"$w/db/b", 32, (1L to 300L).map(i => (i, i * 2)))
    withSpj {
      val df = spark.sql(
        s"SELECT a.id, b.v FROM $cat.db.a a JOIN $cat.db.b b ON a.id = b.id")
      val shuffles = df.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"32-bucket join shuffled (spec id lost past the value cap?):\n" +
          df.queryExecution.executedPlan)
      assert(df.count() === 300)
    }
  }

  test("SPJ holds with AQE enabled (the production configuration)") {
    val w = tmpDir("spj-aqe-wh")
    Files.createDirectories(Paths.get(s"$w/db"))
    val cat = s"graft_spjq${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    mkTable(s"$w/db/a", 8, (1L to 200L).map(i => (i, i)))
    mkTable(s"$w/db/b", 8, (1L to 200L).map(i => (i, i * 2)))
    val saved = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = spark.sql(
        s"SELECT a.id, b.v FROM $cat.db.a a JOIN $cat.db.b b ON a.id = b.id")
      assert(df.count() === 200) // execute first: AQE finalizes the plan
      val finalPlan = df.queryExecution.executedPlan.toString
      assert(!finalPlan.contains("Exchange"),
        s"AQE-final plan still shuffles the co-bucketed join:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("mismatched bucket counts fall back to a correct shuffle join") {
    val w = tmpDir("spj-mm-wh")
    Files.createDirectories(Paths.get(s"$w/db"))
    val cat = s"graft_spjm${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    mkTable(s"$w/db/a", 8, (1L to 100L).map(i => (i, i)))
    mkTable(s"$w/db/b", 4, (1L to 100L).map(i => (i, i * 2)))
    withSpj {
      val df = spark.sql(
        s"SELECT a.id, b.v FROM $cat.db.a a JOIN $cat.db.b b ON a.id = b.id")
      // correctness first: different bucket counts must still join right
      assert(df.count() === 100)
    }
  }

  test("SPJ survives merges (all rewritten files stay in their buckets)") {
    val w = tmpDir("spj-m-wh")
    Files.createDirectories(Paths.get(s"$w/db"))
    val cat = s"graft_spjw${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    val ta = mkTable(s"$w/db/a", 4, (1L to 100L).map(i => (i, i)))
    mkTable(s"$w/db/b", 4, (1L to 100L).map(i => (i, i * 2)))
    // churn table a: update some keys, delete others — rewritten files keep
    // their bucket dirs, so the co-partitioning claim must still hold
    ta.merge((1L to 10L).map(i => (i, i + 1000)).toDF("id", "v"),
      Seq(95L, 96L).toDF("id"), batchId = 0)
    withSpj {
      val df = spark.sql(
        s"SELECT a.id, a.v, b.v AS bv FROM $cat.db.a a JOIN $cat.db.b b ON a.id = b.id")
      val shuffles = df.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty, s"post-merge co-bucketed join shuffled:\n" +
        df.queryExecution.executedPlan)
      val got = df.as[(Long, Long, Long)].collect()
      assert(got.length === 98) // 100 - 2 deleted
      val m = got.map(r => r._1 -> r._2).toMap
      assert(m(1L) === 1001 && m(50L) === 50 && !m.contains(95L))
    }
  }
}
