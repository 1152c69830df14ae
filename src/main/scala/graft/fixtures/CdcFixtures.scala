package graft.fixtures

import java.nio.file.{Files, Paths}

/**
 * The reference's two golden CDC scenarios, ported as data (values transcribed
 * from `/root/reference/src/utils/gen_fake_cdc_data.py:26-38` (insert-only) and
 * `:40-59` (insert-update-or-delete)). These are the de-facto golden inputs of
 * the reference's manual test procedure (`README.md:386-513`); the expected end
 * states are hand-derivable and asserted in the test suite.
 *
 * Deliberately preserved dirty-data quirks of the original fixture:
 *  - trans_id 47 carries the invalid hour-29 timestamp ("2023-01-16T29:10:49…")
 *    which must parse to NULL, not fail;
 *  - trans_id 41 carries the leading-space table name " retail_trans".
 */
object CdcFixtures {

  /** (transId, customerId, event, sku, amount, device, transDt, metaTs, op, tableName, txnId) */
  private type Rec = (Long, String, String, String, Int, String, String, String, String, String, Long)

  private val insertOnly: Seq[Rec] = Seq(
    (6L, "387378799012", "list", "AI6161BEFX", 1, "pc", "2023-01-16T06:18:32Z", "2023-01-16T06:25:34.444953Z", "insert", "retail_trans", 12884904641L),
    (19L, "826787813308", "visit", "DK2617NXBK", 1, "tablet", "2023-01-16T06:11:06Z", "2023-01-16T06:26:14.899137Z", "insert", "retail_trans", 12884909253L),
    (21L, "997346006365", "cart", "NL7461YPIB", 77, "tablet", "2023-01-16T06:03:01Z", "2023-01-16T06:26:19.942369Z", "insert", "retail_trans", 12884909966L),
    (23L, "110409389008", "cart", "KZ7560ZRLA", 60, "pc", "2023-01-16T06:13:05Z", "2023-01-16T06:26:25.001169Z", "insert", "retail_trans", 12884910678L),
    (24L, "240977651465", "list", "LB9146CJTW", 1, "pc", "2023-01-16T06:24:10Z", "2023-01-16T06:26:30.146196Z", "insert", "retail_trans", 12884911030L),
    (27L, "877946792067", "like", "EJ2923TPZU", 1, "tablet", "2023-01-16T06:24:59Z", "2023-01-16T06:26:35.233576Z", "insert", "retail_trans", 12884912098L),
    (28L, "342761190559", "list", "MM5584BTYQ", 1, "mobile", "2023-01-16T06:00:02Z", "2023-01-16T06:26:40.280210Z", "insert", "retail_trans", 12884912454L),
    (30L, "783305627923", "cart", "SZ9293QYKU", 14, "pc", "2023-01-16T06:24:51Z", "2023-01-16T06:26:45.381542Z", "insert", "retail_trans", 12884913162L),
    (33L, "992164363133", "cart", "CM8337UAUY", 78, "tablet", "2023-01-16T06:03:02Z", "2023-01-16T06:26:55.484725Z", "insert", "retail_trans", 12884914226L),
    (35L, "168395939233", "like", "HQ9147QPJK", 1, "pc", "2023-01-16T06:01:00Z", "2023-01-16T06:27:00.589359Z", "insert", "retail_trans", 12884914938L))

  private val insertUpdateOrDelete: Seq[Rec] = Seq(
    // updates: amounts → 39,60,42,67,85 for keys 19,21,24,30,35
    (19L, "826787813308", "visit", "DK2617NXBK", 39, "tablet", "2023-01-16T06:11:06Z", "2023-01-16T08:05:36.061467Z", "update", "retail_trans", 12884974367L),
    (21L, "997346006365", "cart", "NL7461YPIB", 60, "tablet", "2023-01-16T06:03:01Z", "2023-01-16T08:05:46.158075Z", "update", "retail_trans", 12884974787L),
    (24L, "240977651465", "list", "LB9146CJTW", 42, "pc", "2023-01-16T06:24:10Z", "2023-01-16T08:06:21.584627Z", "update", "retail_trans", 12884975615L),
    (30L, "783305627923", "cart", "SZ9293QYKU", 67, "pc", "2023-01-16T06:24:51Z", "2023-01-16T08:06:41.807706Z", "update", "retail_trans", 12884976861L),
    (35L, "168395939233", "like", "HQ9147QPJK", 85, "pc", "2023-01-16T06:01:00Z", "2023-01-16T08:07:02.085752Z", "update", "retail_trans", 12884977689L),
    // deletes: keys 6, 33, 23
    (6L, "387378799012", "list", "AI6161BEFX", 3, "pc", "2023-01-16T06:18:32Z", "2023-01-16T08:10:49.737891Z", "delete", "retail_trans", 12884978099L),
    (33L, "992164363133", "cart", "CM8337UAUY", 34, "tablet", "2023-01-16T06:03:02Z", "2023-01-16T08:11:15.067609Z", "delete", "retail_trans", 12884978449L),
    (23L, "110409389008", "cart", "KZ7560ZRLA", 4, "pc", "2023-01-16T06:13:05Z", "2023-01-16T08:13:16.515265Z", "delete", "retail_trans", 12884978803L),
    // inserts: keys 37, 38, 41, 43, 47
    (37L, "818177069814", "like", "JS6166YPTE", 1, "mobile", "2023-01-16T08:08:44Z", "2023-01-16T08:08:16.515265Z", "insert", "retail_trans", 12884978815L),
    (38L, "387378799012", "list", "AI6161BEFX", 1, "pc", "2023-01-16T08:09:33Z", "2023-01-16T08:10:15.067609Z", "insert", "retail_trans", 12884978849L),
    (41L, "839828949919", "purchase", "AC2306JBRJ", 5, "tablet", "2023-01-16T08:14:20Z", "2023-01-16T08:14:41.807706Z", "insert", " retail_trans", 12884978861L),
    (43L, "248083404876", "visit", "AS8552DVOO", 1, "pc", "2023-01-16T08:21:05Z", "2023-01-16T08:21:32.085752Z", "insert", "retail_trans", 12884978889L),
    (47L, "731184658511", "like", "XZ9997LSJN", 1, "tablet", "2023-01-16T08:33:47Z", "2023-01-16T29:10:49.737891Z", "insert", "retail_trans", 12884978897L))

  private def toJsonLine(r: Rec): String = {
    val (id, cust, event, sku, amount, device, dt, ts, op, table, txn) = r
    s"""{"data": {"trans_id": $id, "customer_id": "$cust", "event": "$event", "sku": "$sku", "amount": $amount, "device": "$device", "trans_datetime": "$dt"}, """ +
      s""""metadata": {"timestamp": "$ts", "record-type": "data", "operation": "$op", "partition-key-type": "primary-key", "schema-name": "testdb", "table-name": "$table", "transaction-id": $txn}}"""
  }

  /** Scenario 1 (`--cdc-type insert-only`): 10 insert envelopes. */
  def scenario1Lines: Seq[String] = insertOnly.map(toJsonLine)

  /** Scenario 2 (`--cdc-type insert-update-or-delete`): 5 updates, 3 deletes, 5 inserts. */
  def scenario2Lines: Seq[String] = insertUpdateOrDelete.map(toJsonLine)

  /** Write a scenario as a JSON-lines file (the producer's `json-unformatted`
   *  wire format) into `dir`; returns the file path. */
  def write(dir: String, name: String, lines: Seq[String]): String = {
    Files.createDirectories(Paths.get(dir))
    val p = Paths.get(dir, name)
    Files.write(p, lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    p.toString
  }

  /** Expected state after scenario 1 alone (the 10 inserts verbatim), same
   *  tuple shape as [[expectedEndState]] — the "before" side of the golden
   *  incremental diff. */
  val expectedStateV1: Seq[(Long, String, String, String, Int, String, String)] =
    insertOnly.map { case (id, cust, ev, sku, amt, dev, dt, _, _, _, _) =>
      (id, cust, ev, sku, amt, dev, dt.replace("T", " ").stripSuffix("Z"))
    }

  /** Expected final state after replaying scenario 1 then scenario 2:
   *  (trans_id, customer_id, event, sku, amount, device, trans_datetime-string). */
  val expectedEndState: Seq[(Long, String, String, String, Int, String, String)] = Seq(
    (19L, "826787813308", "visit", "DK2617NXBK", 39, "tablet", "2023-01-16 06:11:06"),
    (21L, "997346006365", "cart", "NL7461YPIB", 60, "tablet", "2023-01-16 06:03:01"),
    (24L, "240977651465", "list", "LB9146CJTW", 42, "pc", "2023-01-16 06:24:10"),
    (27L, "877946792067", "like", "EJ2923TPZU", 1, "tablet", "2023-01-16 06:24:59"),
    (28L, "342761190559", "list", "MM5584BTYQ", 1, "mobile", "2023-01-16 06:00:02"),
    (30L, "783305627923", "cart", "SZ9293QYKU", 67, "pc", "2023-01-16 06:24:51"),
    (35L, "168395939233", "like", "HQ9147QPJK", 85, "pc", "2023-01-16 06:01:00"),
    (37L, "818177069814", "like", "JS6166YPTE", 1, "mobile", "2023-01-16 08:08:44"),
    (38L, "387378799012", "list", "AI6161BEFX", 1, "pc", "2023-01-16 08:09:33"),
    (41L, "839828949919", "purchase", "AC2306JBRJ", 5, "tablet", "2023-01-16 08:14:20"),
    (43L, "248083404876", "visit", "AS8552DVOO", 1, "pc", "2023-01-16 08:21:05"),
    (47L, "731184658511", "like", "XZ9997LSJN", 1, "tablet", "2023-01-16 08:33:47"))
}
