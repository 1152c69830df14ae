package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev tool: physical-plan pathology check for named registry queries.
  * Usage: runMain graft.tools.PlanAudit <sfDir> <query> [query ...]
  * EXECUTES each query first — under AQE the pre-execution plan is the
  * initial one (exchanges AQE later elides, joins it later converts); only
  * the post-run adaptive plan shows what actually happened. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: PlanAudit <sfDir> <queryName> [queryName ...]")
      sys.exit(2)
    }
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.head
    args.tail.foreach { name =>
      val df = graft.queries.Registry.byName(name).fn(spark, dir)
      df.collect() // materialize: AQE finalizes the adaptive plan
      val plan = df.queryExecution.executedPlan.toString
      val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
        .filter(plan.contains)
      val exchanges = "Exchange".r.findAllIn(plan).length
      println(s"[audit] $name: exchanges=$exchanges bad=${bad.mkString(",")}")
    }
    spark.stop()
  }
}
