package graft.queries
import org.apache.spark.sql.SparkSession
/** Dev probe: min-of-3 wall timing of one registry query at sf0.1
  * (`runMain graft.queries.QueryProbe <name>`). */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = if (args.nonEmpty) args.head else "x4_corpus_build"
    val best = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val n = Registry.byName(name).fn(spark, "/root/testdata/sf0.1").count()
      ((System.nanoTime() - t0) / 1e9, n)
    }.minBy(_._1)
    println(f"[probe] $name ${best._1}%6.3f s rows=${best._2}")
    spark.stop()
  }
}
