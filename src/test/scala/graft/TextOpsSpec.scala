package graft

import org.apache.spark.sql.functions._

import graft.ops.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("tokens: whitespace split, empties dropped") {
    val got = docs((1L, "  a  bb\tccc\nd "), (2L, ""), (3L, "solo"))
      .select($"doc_id", TextOps.tokens($"text").as("t"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) === Seq("a", "bb", "ccc", "d"))
    assert(got(2L) === Seq.empty)
    assert(got(3L) === Seq("solo"))
  }

  test("shingles: word 3-grams, distinct, short docs yield empty") {
    val got = docs((1L, "a b c d"), (2L, "a b"), (3L, "x y z x y z x y z"))
      .select($"doc_id", TextOps.shingles($"text").as("s"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) === Seq("a b c", "b c d"))
    assert(got(2L) === Seq.empty)
    // 7 positions but only 3 distinct shingles
    assert(got(3L).sorted === Seq("x y z", "y z x", "z x y"))
  }

  test("docStats: exact counts") {
    val r = TextOps.docStats(docs((1L, "aa b aa cccc")))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(r === ((1L, 12L, 4L, 3L, 4L, 9L)))
  }

  test("langId: marker argmax with en-first tie-break, no markers → und") {
    val got = TextOps.langId(docs(
        (1L, "the cat is happy"),
        (2L, "der hund ist gut und der"),
        (3L, "xyz qrs"),
        (4L, "la la"))) // fr and es both match 'la' → tie → fr (marker order)
      .select($"doc_id", $"lang_pred").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "en", 2L -> "de", 3L -> "und", 4L -> "fr"))
  }

  test("fingerprint: identical text ⇒ identical hashes; differing text differs") {
    val f = TextOps.fingerprint(docs(
        (1L, "one two three four"), (2L, "one two three four"), (3L, "five six seven eight")))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(f(1L) === f(2L))
    assert(f(1L) !== f(3L))
  }

  test("qualityScore: ratios exact") {
    val r = TextOps.qualityScore(docs((1L, "the cat sat on the mat")))
      .select($"n_tokens", $"n_stopwords", $"stopword_ratio", $"length_ok")
      .as[(Long, Long, Double, Boolean)].head()
    assert(r === ((6L, 2L, 2.0 / 6.0, true)))
  }

  test("scrubPii: redacts emails/phones/IPs, leaves clean text untouched") {
    val out = TextOps.scrubPii(docs(
        (1L, "mail a.b%c@sub.host.org or call 555-123-4567 via 192.168.0.1 now"),
        (2L, "nothing sensitive here")))
      .as[(Long, String, Boolean)].collect().map { case (k, v, b) => k -> ((v, b)) }.toMap
    assert(out(1L) === (("mail <EMAIL> or call <PHONE> via <IP> now", true)))
    assert(out(2L) === (("nothing sensitive here", false)))
  }
}
