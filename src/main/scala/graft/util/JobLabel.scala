package graft.util

import org.apache.spark.sql.SparkSession

/** Job labeling for the Spark UI / listener profilers (optimization guide
  * §1.5): every multi-job pipeline leg sets a description so a job storm is
  * attributable to the action that launched it. Thread-local (Spark's own
  * contract); the previous label is restored so nested legs compose. */
object JobLabel {
  def labeled[A](spark: SparkSession, desc: String)(body: => A): A = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body
    finally sc.setJobDescription(prev)
  }
}
