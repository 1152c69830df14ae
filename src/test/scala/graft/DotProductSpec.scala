package graft

import org.apache.spark.sql.functions._

import graft.ops.SimilarityOps

/** The native codegen DotProduct expression must be bit-identical to the HOF
  * fold (same accumulation order) and survive both codegen and interpreted
  * evaluation paths. */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = {
    val rnd = new scala.util.Random(11)
    (0L until 200L).map { i =>
      (i, Array.fill(64)(rnd.nextDouble() * 2 - 1), Array.fill(64)(rnd.nextDouble() * 2 - 1))
    }.toDF("id", "a", "b")
  }

  test("codegen expression == HOF fold, bit-exact on 200x64 random vectors") {
    val both = vecs.select(
      SimilarityOps.dot($"a", $"b").as("native"),
      SimilarityOps.dotHof($"a", $"b").as("hof"))
    assert(both.filter($"native" =!= $"hof").count() === 0)
    // also under forced interpreted evaluation (nullSafeEval path)
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(both.filter($"native" =!= $"hof").count() === 0)
    }
  }

  test("null inputs yield null; plan shows the expression codegen-compatible") {
    val df = Seq((Some(Seq(1.0, 2.0)), None: Option[Seq[Double]]))
      .toDF("a", "b")
      .select(SimilarityOps.dot($"a".cast("array<double>"), $"b".cast("array<double>")).as("d"))
    assert(df.collect().head.isNullAt(0))
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

  test("graft_dot / graft_shingles are callable from pure SQL (codegen kernels)") {
    import spark.implicits._
    val d = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .as[Double].head()
    assert(d === 32.0)
    val sh = spark.sql("SELECT graft_shingles(array('a','b','c','d'), 3) AS s")
      .as[Seq[String]].head()
    assert(sh === Seq("a b c", "b c d"))
    // default n = 3
    assert(spark.sql("SELECT graft_shingles(array('a','b','c','d')) AS s")
      .as[Seq[String]].head() === Seq("a b c", "b c d"))
  }
}
