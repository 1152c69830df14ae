package graft

import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll

import graft.cdc.Cdc
import graft.stream.CdcPipeline
import graft.table.TransactionalTable

/** SURVEY §5.2.4: random CDC event sequences ⇒ engine table state equals a
  * sequential in-memory map fold; replaying every batch twice (at-least-once
  * delivery) leaves the state unchanged. */
class CdcPropertySpec extends SparkSpec {
  import spark.implicits._

  private case class Ev(key: Long, op: String, amount: Int)

  private val genEvents: Gen[List[Ev]] = for {
    n <- Gen.choose(1, 40)
    evs <- Gen.listOfN(n, for {
      k <- Gen.choose(1L, 12L)
      op <- Gen.oneOf("insert", "update", "delete")
      a <- Gen.choose(0, 100)
    } yield Ev(k, op, a))
  } yield evs

  private def toLine(e: Ev, idx: Int): String = {
    val ts = f"2023-01-16T06:00:00.$idx%06dZ" // strictly increasing, unique
    s"""{"data": {"trans_id": ${e.key}, "customer_id": "c", "event": "cart", "sku": "S", "amount": ${e.amount}, "device": "pc", "trans_datetime": "2023-01-16T06:00:00Z"}, """ +
      s""""metadata": {"timestamp": "$ts", "record-type": "data", "operation": "${e.op}", "partition-key-type": "primary-key", "schema-name": "testdb", "table-name": "t", "transaction-id": $idx}}"""
  }

  /** Reference semantics: apply events one at a time to a map (upsert puts,
    * delete removes) — the reference's net effect on the OLTP table. */
  private def foldExpected(evs: List[Ev]): Map[Long, Int] =
    evs.foldLeft(Map.empty[Long, Int]) { (m, e) =>
      if (e.op == "delete") m - e.key else m + (e.key -> e.amount)
    }

  test("random CDC sequences: table state == in-memory fold; double-replay is a no-op") {
    val prop = forAll(genEvents, Gen.choose(1, 4)) { (evs, nBatches) =>
      val lines = evs.zipWithIndex.map { case (e, i) => toLine(e, i) }
      val batches = if (lines.isEmpty) Seq(Seq.empty[String])
        else lines.grouped(math.max(1, lines.size / nBatches)).toSeq
      val root = tmpDir("ttable-prop")
      val t = TransactionalTable.create(spark, root, Cdc.tableSchema, Cdc.PrimaryKey,
        Some(Cdc.PartitionColumn))
      batches.zipWithIndex.foreach { case (b, i) =>
        CdcPipeline.replayLines(spark, t, b, batchId = i)
        CdcPipeline.replayLines(spark, t, b, batchId = i) // at-least-once replay
      }
      val got = t.scan().select($"trans_id", $"amount").as[(Long, Int)].collect().toMap
      val want = foldExpected(evs)
      if (got != want)
        println(s"MISMATCH: got=$got want=$want evs=$evs batches=${batches.size}")
      got == want
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.status.toString)
  }
}
