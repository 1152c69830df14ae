package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.cdc.Cdc
import graft.fixtures.CdcFixtures
import graft.stream.CdcPipeline
import graft.table.TransactionalTable

/** A/B probe attributing `cdc_stream_mv_fresh`'s cost to the MV-storage
  * post-commit auto-compact cadence (r16 verdict #5: the query regressed
  * +63% in the round that put MV storage/aux tables on the cadence, with
  * no measurement separating compaction cost from VM noise). Runs the
  * headline query's exact body alternately with the production cadence
  * (minFiles = 16, the CREATE MATERIALIZED VIEW default) and with
  * auto-compaction DISABLED on the MV storage, interleaved within one
  * session so VM drift hits both arms equally. Prints per-arm min/median
  * and the median cadence cost — the attribution PERF.md records.
  *
  * Usage: sbt "runMain graft.tools.MvFreshProbe [runsPerArm=5]"
  */
object MvFreshProbe {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(compact: Boolean): Double = {
      val cat = s"graft_mvp${System.nanoTime()}"
      val work = Files.createTempDirectory("graft_mvfresh_ab").toString
      spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", s"$work/wh")
      Files.createDirectories(java.nio.file.Paths.get(s"$work/wh/db"))
      Files.createDirectories(java.nio.file.Paths.get(s"$work/input"))
      val t0 = System.nanoTime()
      val t = TransactionalTable.create(spark, s"$work/wh/db/retail",
        Cdc.tableSchema, Cdc.PrimaryKey, Some(Cdc.PartitionColumn))
      spark.sql(s"CREATE MATERIALIZED VIEW $cat.db.ev_tot " +
        "TBLPROPERTIES('pk'='event') AS " +
        "SELECT event, SUM(amount) AS total, COUNT(amount) AS na, " +
        s"COUNT(*) AS n FROM $cat.db.retail GROUP BY event")
      if (!compact)
        TransactionalTable.open(spark, s"$work/wh/db/ev_tot/_storage")
          .setAutoCompact(minFiles = 0) // 0 = cadence off
      def runOnce(): Unit = {
        val q = CdcPipeline.start(spark, s"$work/input", t, s"$work/ckpt",
          trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"),
          maintainViews = Seq(s"$cat.db.ev_tot"))
        q.processAllAvailable(); q.stop(); q.awaitTermination()
      }
      CdcFixtures.write(s"$work/input", "b1.jsonl", CdcFixtures.scenario1Lines)
      runOnce()
      CdcFixtures.write(s"$work/input", "b2.jsonl", CdcFixtures.scenario2Lines)
      runOnce()
      spark.sql(s"SELECT event, total, na, n FROM $cat.db.ev_tot ORDER BY event")
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(work))
      sec
    }

    once(compact = true) // warm-up, discarded
    val on = scala.collection.mutable.ArrayBuffer.empty[Double]
    val off = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to runs).foreach { _ => on += once(compact = true); off += once(compact = false) }
    def stats(xs: Seq[Double]): (Double, Double) = {
      val s = xs.sorted; (s.head, s(s.size / 2))
    }
    val (onMin, onMed) = stats(on.toSeq)
    val (offMin, offMed) = stats(off.toSeq)
    println(f"[mvfresh] compact-ON  (minFiles=16): min=$onMin%6.3f med=$onMed%6.3f (n=$runs)")
    println(f"[mvfresh] compact-OFF (disabled)   : min=$offMin%6.3f med=$offMed%6.3f (n=$runs)")
    println(f"[mvfresh] cadence cost = ${onMed - offMed}%6.3f s median, ${onMin - offMin}%6.3f s min")
    spark.stop()
  }
}
