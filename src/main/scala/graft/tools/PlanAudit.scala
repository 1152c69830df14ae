package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev tool: print physical-plan pathology check for named registry queries. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
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
      val plan = df.queryExecution.executedPlan.toString
      val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
        .filter(plan.contains)
      val exchanges = "Exchange".r.findAllIn(plan).length
      println(s"[audit] $name: exchanges=$exchanges bad=${bad.mkString(",")}")
    }
    spark.stop()
  }
}
