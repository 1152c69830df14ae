package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev profiler: run ONE registry query and print every Spark job with its
  * wall time, task count and callsite — attributes a pipeline's job storm to
  * the actions that launch them.
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.JobBreak <query>" */
object JobBreak {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.queries.Registry.byName(args(0))
    spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
      if (q.streaming) cpus else (cpus.toInt * 8).toString)
    q.fn(spark, sfDir).count() // warm
    val starts = mutable.Map.empty[Int, (Long, String)]
    val rows = mutable.ArrayBuffer.empty[(Int, Double, Int, String)]
    val taskCount = mutable.Map.empty[Int, Int].withDefaultValue(0)
    val stageJobs = mutable.Map.empty[Int, Int]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short")))).getOrElse("?")
        starts(e.jobId) = (e.time, site)
        e.stageIds.foreach(s => stageJobs(s) = e.jobId)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stageJobs.get(e.stageInfo.stageId).foreach { j =>
          taskCount(j) += e.stageInfo.numTasks
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        starts.remove(e.jobId).foreach { case (t0, site) =>
          rows += ((e.jobId, (e.time - t0) / 1e3, taskCount(e.jobId), site))
        }
    })
    val t0 = System.nanoTime()
    q.fn(spark, sfDir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"[jobbreak] ${args(0)} total=$sec%.3f s, ${rows.size} jobs")
    rows.sortBy(_._1).foreach { case (id, s, nt, site) =>
      println(f"  job=$id%4d ${s}%7.3f s tasks=$nt%5d  $site")
    }
    val bySite = rows.groupBy(_._4).map { case (site, rs) =>
      (site, rs.map(_._2).sum, rs.size, rs.map(_._3).sum)
    }.toSeq.sortBy(-_._2)
    println("[jobbreak] by callsite:")
    bySite.foreach { case (site, s, n, nt) =>
      println(f"  ${s}%8.3f s  jobs=$n%4d tasks=$nt%6d  $site")
    }
    spark.stop()
  }
}
