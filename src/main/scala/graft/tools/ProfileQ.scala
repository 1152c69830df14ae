package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev profiler (optimization rounds): for each named registry query, run
  * once warm under the Bench session config, then run again counting Spark
  * jobs, stages, tasks, and shuffle read/write bytes via a listener, and
  * dump the final adaptive plan (`explain formatted`) to `plansDir`.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ProfileQ <plansDir> q1 q2"
  * (empty query list = all headlines). Suffix via SPARK_GRAFT_PLAN_SUFFIX
  * (default "_before"). */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "_before")
    val plansDir = args.headOption.getOrElse("plans/r19")
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
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(plansDir))
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shufR = new AtomicLong; val shufW = new AtomicLong
    val inB = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          inB.addAndGet(m.inputMetrics.bytesRead)
        }
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    })
    val byName = graft.queries.Registry.all.map(q => q.name -> q).toMap
    val names = if (args.length > 1) args.toSeq.tail
                else graft.queries.Registry.headlines.map(_.name)
    names.foreach { n =>
      val q = byName.getOrElse(n, sys.error(s"unknown query $n"))
      spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        if (q.streaming) cpus else (cpus.toInt * 8).toString)
      try {
        q.fn(spark, sfDir).count() // warm
        Thread.sleep(300) // listener bus drain
        jobs.set(0); stages.set(0); tasks.set(0)
        shufR.set(0); shufW.set(0); inB.set(0)
        val t0 = System.nanoTime()
        val df = q.fn(spark, sfDir)
        df.count()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // listener bus drain
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$plansDir/$n$suffix.txt"), plan)
        println(f"[profile] $n%-30s sec=$sec%7.3f jobs=${jobs.get}%4d " +
          f"stages=${stages.get}%5d tasks=${tasks.get}%6d " +
          f"shufR=${shufR.get / 1e6}%9.1fMB shufW=${shufW.get / 1e6}%9.1fMB " +
          f"input=${inB.get / 1e6}%9.1fMB")
      } catch {
        case e: Throwable =>
          println(s"[profile] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
