package graft.tools
import org.apache.spark.sql.SparkSession
object SingleQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = args(0); val sf = args(1); val out = args(2)
    val q = graft.queries.Registry.byName(name)
    q.fn(spark, sf).coalesce(1).write.mode("overwrite").parquet(s"$out/$name")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.createObjectNode()
    node.put(name, q.oracle.get)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$out/oracle_sql.json"), om.writeValueAsString(node))
    spark.stop()
  }
}
