package graft

import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** The native Md5Hash60 kernel must be bit-identical to the built-in chain
  * `conv(substring(md5(s),1,15),16,10)` — every oracle-replayable pipeline
  * (fingerprints, samplers, SimHash, the near-dup index) keys on it. */
class Md5Hash60Spec extends SparkSpec {
  import spark.implicits._

  private val inputs = (Seq("", "a", "hello world", "ünïcødé ☃ tøkens",
    "x" * 10000, "123", "line\nbreak\ttab", "trailing space ") ++
    (0 until 500).map(i => s"doc-$i-token")).toDF("s")

  test("native kernel == conv(substring(md5)) chain, both eval paths; non-negative") {
    val both = inputs.select(
      TextOps.md5Hash60($"s").as("native"),
      TextOps.md5Hash60Chain($"s").as("chain"))
    assert(both.filter($"native" =!= $"chain").count() === 0)
    assert(both.filter($"native" < 0).count() === 0)
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(both.filter($"native" =!= $"chain").count() === 0)
    }
    // NULL in, NULL out
    val n = Seq(Option.empty[String]).toDF("s")
      .select(TextOps.md5Hash60($"s").as("h")).collect().head
    assert(n.isNullAt(0))
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
