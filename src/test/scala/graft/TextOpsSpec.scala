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

  test("termCounts: in-row tf equals explode+groupBy, first-occurrence order") {
    val d = docs((1L, "a b a c b a"), (2L, ""), (3L, "solo"), (4L, "x x x"))
    val got = d
      .select($"doc_id", TextOps.termCounts($"text").as("tc"))
      .as[(Long, Seq[(String, Long)])].collect().toMap
    assert(got(1L) === Seq(("a", 3L), ("b", 2L), ("c", 1L)))
    assert(got(2L) === Seq.empty)
    assert(got(3L) === Seq(("solo", 1L)))
    assert(got(4L) === Seq(("x", 3L)))
    // equivalence with the declarative form over a wider corpus
    val wide = docs((1 to 50).map(i =>
      (i.toLong, Seq.fill(i % 7 + 1)(s"w${i % 5} t${i % 3} u").mkString(" "))): _*)
    val kernel = wide
      .select($"doc_id", explode(TextOps.termCounts($"text")).as("tc"))
      .select($"doc_id", $"tc.term", $"tc.tf")
      .as[(Long, String, Long)].collect().toSet
    val declarative = wide
      .select($"doc_id", explode(TextOps.tokens($"text")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      .as[(Long, String, Long)].collect().toSet
    assert(kernel === declarative)
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

  test("bigramRarity: integer stats + exact ratio; common bigrams not rare") {
    // "a b" appears in 3 docs (df=3 > rareDf=2); every other bigram df=1
    val r = TextOps.bigramRarity(docs(
        (1L, "a b c"), (2L, "a b d"), (3L, "a b"), (4L, "x y")), rareDf = 2)
      .select($"doc_id", $"n_bigrams", $"n_rare", $"rarity")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(r(1L) === ((2L, 1L, 0.5)))   // "a b"(df3), "b c"(df1 rare)
    assert(r(2L) === ((2L, 1L, 0.5)))
    assert(r(3L) === ((1L, 0L, 0.0)))
    assert(r(4L) === ((1L, 1L, 1.0)))
  }

  test("bigramLogProb: hand-computed Laplace-smoothed mean log prob") {
    // corpus: doc1 "a b a b" → bigrams ab, ba, ab ; doc2 "a b" → ab
    // c(ab)=3, c(ba)=1 ; prefix counts: c(a·)=3, c(b·)=1 ; vocab(w2)={a,b} V=2
    val out = TextOps.bigramLogProb(docs((1L, "a b a b"), (2L, "a b")))
      .select($"doc_id", $"n_bigrams", $"mean_log_prob")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val pAb = math.log((3.0 + 1) / (3.0 + 2))   // P(b|a)
    val pBa = math.log((1.0 + 1) / (1.0 + 2))   // P(a|b)
    assert(out(1L)._1 === 3L)
    assert(math.abs(out(1L)._2 - (2 * pAb + pBa) / 3) < 1e-12)
    assert(out(2L) === ((1L, pAb)) || math.abs(out(2L)._2 - pAb) < 1e-12)
  }

  test("variant ops: parse/shred/explode/inferSchema round-trip") {
    import graft.ops.VariantOps
    val df = Seq(
        (1L, """{"k": 5, "tag": "x", "nest": {"d": 7}}"""),
        (2L, """{"k": 9, "tag": "y", "nest": {"d": 1}}"""))
      .toDF("id", "j")
    val shredded = VariantOps.shred(VariantOps.parse(df, "j"), "var",
        Seq(("k", "$.k", "bigint"), ("tag", "$.tag", "string"), ("d", "$.nest.d", "int")))
      .select($"id", $"k", $"tag", $"d")
      .as[(Long, Long, String, Int)].collect().toSet
    assert(shredded === Set((1L, 5L, "x", 7), (2L, 9L, "y", 1)))
    val kv = VariantOps.explodeFields(VariantOps.parse(df, "j"), "var", keep = Seq("id"))
      .select($"id", $"key").as[(Long, String)].collect().toSet
    assert(kv === Set((1L, "k"), (1L, "tag"), (1L, "nest"),
      (2L, "k"), (2L, "tag"), (2L, "nest")))
    val schema = VariantOps.inferSchema(VariantOps.parse(df, "j"), "var")
    assert(schema.contains("k") && schema.contains("nest"))
    // invalid JSON: parse throws, tryParse nulls
    val bad = Seq((1L, "{not json")).toDF("id", "j")
    intercept[Exception](VariantOps.parse(bad, "j").collect())
    assert(VariantOps.tryParse(bad, "j").where($"var".isNull).count() === 1)
  }

  test("repetitionStats: duplicate-line fractions and top-bigram coverage") {
    val out = TextOps.repetitionStats(docs(
        // 4 lines, "spam spam" twice (8 chars each), "ok" once, "fine" once
        (1L, "spam spam\nok\nspam spam\nfine"),
        // no repetition at all
        (2L, "all distinct words here")))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Double, String, Long, Double)].collect()
    val d1 = out(0)
    assert(d1._2 === 4L && d1._3 === 3L)              // 4 lines, 3 distinct
    assert(d1._4 === 1.0 / 4.0)                       // frac_dup_lines
    val lineChars1 = 2 * 9 + 2 + 4                    // "spam spam"×2, "ok", "fine"
    assert(d1._5 === (2.0 * 9) / lineChars1)          // dup-line chars
    assert(d1._6 === "spam spam" && d1._7 === 2L)     // top bigram ×2
    assert(d1._8 === (2.0 * 9) / lineChars1)
    val d2 = out(1)
    assert(d2._4 === 0.0 && d2._5 === 0.0 && d2._7 === 1L)
  }

  test("repetitionStats: empty / whitespace-only / single-token docs don't crash") {
    // empty token arrays used to feed slice(toks, 1, size-1) a length of -1
    // (INVALID_PARAMETER_VALUE at runtime); the clamp yields zero bigrams.
    val out = TextOps.repetitionStats(docs(
        (1L, ""),               // no lines, no tokens
        (2L, "   \n  \n"),      // whitespace-only lines
        (3L, "solo"),           // one token: no bigram
        (4L, "two words")))     // exactly one bigram
      .orderBy("doc_id").collect()
    // docs with no non-empty lines produce no line rows and drop out;
    // the load-bearing assertion is that nothing throws and the single-token
    // doc reports a null top bigram.
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId.contains(3L) && byId(3L).isNullAt(5)) // top_bigram null
    assert(byId(4L).getString(5) === "two words" && byId(4L).getLong(6) === 1L)
  }

  test("qualitySignals: Gopher-rule ratios, hand-computed; empty doc yields NULLs") {
    val out = TextOps.qualitySignals(docs(
        // tokens: -, the, fox2, runs, #, ... (6); lines: bullet + ellipsis
        (1L, "- the fox2\nruns # ...\n"),
        (2L, "")))
      .orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getLong(1) === 6L)
    assert(r1.getDouble(2) === 16.0 / 6)  // mean token len (1+3+4+4+1+3)/6
    assert(r1.getDouble(3) === 2.0 / 6)   // alpha: the, runs
    assert(r1.getDouble(4) === 1.0 / 6)   // stopword: the
    assert(r1.getDouble(5) === 1.0 / 6)   // symbols: one '#'
    assert(r1.getDouble(6) === 0.5)       // bullet line
    assert(r1.getDouble(7) === 0.5)       // ellipsis line
    val r2 = out(1)
    assert(r2.getLong(1) === 0L && r2.isNullAt(2) && r2.isNullAt(6))
  }

  test("scrubPii: redacts emails/phones/IPs, leaves clean text untouched") {
    val out = TextOps.scrubPii(docs(
        (1L, "mail a.b%c@sub.host.org or call 555-123-4567 via 192.168.0.1 now"),
        (2L, "nothing sensitive here")))
      .as[(Long, String, Boolean)].collect().map { case (k, v, b) => k -> ((v, b)) }.toMap
    assert(out(1L) === (("mail <EMAIL> or call <PHONE> via <IP> now", true)))
    assert(out(2L) === (("nothing sensitive here", false)))
  }

  test("removeDuplicateLines: cross-doc boilerplate drops, structure survives") {
    val out = graft.ops.DedupOps.removeDuplicateLines(docs(
        (1L, "unique opening\ncookie banner here\n\nbody one"),
        (2L, "  cookie banner here \nbody two\nrepeated in self\nrepeated in self"),
        (3L, "all alone")))
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // the banner (trim-equal across docs 1 and 2) drops from BOTH; the blank
    // line in doc 1 survives; within-doc repetition alone does NOT drop
    assert(out(1L) === (("unique opening\n\nbody one", 1L)))
    assert(out(2L) === (("body two\nrepeated in self\nrepeated in self", 1L)))
    assert(out(3L) === (("all alone", 0L)))
    // a doc that becomes empty still surfaces with its removal count
    val gone = graft.ops.DedupOps.removeDuplicateLines(docs(
        (1L, "only the banner"), (2L, "only the banner")))
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(gone(1L) === (("", 1L)) && gone(2L) === (("", 1L)))
  }

  test("qualityClassify: logit decision equals the sigmoid decision; exact integers") {
    val out = TextOps.qualityClassify(docs(
        (1L, "alpha beta beta gamma"), (2L, ""), (3L, "one token")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    out.foreach { case (_, n, logit, keep) =>
      // the contract: keep == sigmoid(logit) >= 0.5, and |logit| <= 1
      assert(keep === (1.0 / (1.0 + math.exp(-logit)) >= 0.5))
      assert(math.abs(logit) <= 1.0)
      if (n == 0) assert(logit === 0.0 && keep)
    }
    assert(out.find(_._1 == 2L).get._2 === 0L)
  }

  test("filterFunnel: first failing stage labels; NULL predicate drops; report sums") {
    import org.apache.spark.sql.functions.{col, lit, when}
    val df = docs((1L, "keep"), (2L, "failA"), (3L, "failB"), (4L, "failBoth"),
      (5L, "nullpred"))
    val labeled = TextOps.filterFunnel(df, Seq(
      "a" -> (!col("text").contains("failA") && !col("text").contains("failBoth")),
      "b" -> (!col("text").contains("failB") && !col("text").contains("failBoth")),
      // a predicate evaluating to NULL counts as FAIL
      "c" -> when(col("text") === "nullpred", lit(null).cast("boolean")).otherwise(lit(true))))
    val m = labeled.collect().map(r =>
      r.getLong(0) -> Option(r.getString(1))).toMap
    assert(m === Map(1L -> None, 2L -> Some("a"), 3L -> Some("b"),
      4L -> Some("a"), 5L -> Some("c")))
    val rep = TextOps.funnelReport(labeled).collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(rep === Map(Some("a") -> 2L, Some("b") -> 1L, Some("c") -> 1L, None -> 1L))
  }

  test("qualityBuckets: per-lang tertiles from explicit rank rule; ties land low; per-lang independence") {
    // doc i: 2 shared bigrams (df = all docs -> not rare) + m unique ones
    // (df = 1 -> rare): rarity = m/(m+2), strictly increasing in m.
    def doc(id: Long, lang: String, m: Int): (Long, String, String) =
      (id, lang, ("aa bb cc" +: (1 to m).map(j => s"u${id}x$j")).mkString(" "))
    val docs = (
      (1 to 6).map(i => doc(i.toLong, "en", i - 1)) ++      // rarity 0 .. 5/7
      (7 to 9).map(i => doc(i.toLong, "fr", i))             // 3 fr docs
    ).toDF("doc_id", "lang", "text")
    val got = graft.ops.TextOps.qualityBuckets(docs, buckets = 3)
      .select("doc_id", "lang", "rarity", "bucket")
      .as[(Long, String, Double, Long)].collect().sortBy(_._1).toSeq
    // en, n=6: cutoffs at ranks ceil(k*6/3) = 2, 4 -> buckets 1,1,2,2,3,3
    assert(got.filter(_._2 == "en").map(_._4) === Seq(1L, 1L, 2L, 2L, 3L, 3L))
    // fr, n=3: cutoffs at ranks 1, 2 -> buckets 1,2,3 (ties-land-low rule)
    assert(got.filter(_._2 == "fr").map(_._4) === Seq(1L, 2L, 3L))
    // bucket is monotone in rarity within each lang
    got.groupBy(_._2).values.foreach { g =>
      val byRarity = g.sortBy(_._3)
      assert(byRarity.map(_._4) === byRarity.map(_._4).sorted)
    }
    // sampled cutoffs: rate < 1 still deterministic and monotone
    val s1 = graft.ops.TextOps.qualityBuckets(docs, buckets = 3, sampleRate = 0.6)
      .select("doc_id", "bucket").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val s2 = graft.ops.TextOps.qualityBuckets(docs, buckets = 3, sampleRate = 0.6)
      .select("doc_id", "bucket").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(s1 === s2)
  }

  test("qualityBuckets equals the reference model across random corpora") {
    import graft.ops.TextOps
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 4) {
      val langs = Seq("en", "fr", "de").take(1 + rng.nextInt(3))
      val vocab = (1 to 6).map(i => s"w$i")
      val docs = (1L to (8 + rng.nextInt(20)).toLong).map { id =>
        val n = 2 + rng.nextInt(8)
        (id, langs(rng.nextInt(langs.length)),
          Seq.fill(n)(vocab(rng.nextInt(vocab.length))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "lang", "text")
      val got = TextOps.qualityBuckets(df, buckets = 3)
        .select("doc_id", "bucket").as[(Long, Long)].collect().toMap
      // reference model: rarity from distinct-bigram dfs, explicit rank rule
      val bigrams: Map[Long, Set[String]] = docs.map { case (id, _, t) =>
        val w = t.split("\\s+").filter(_.nonEmpty)
        id -> w.zip(w.drop(1)).map { case (a, b) => s"$a $b" }.toSet
      }.toMap
      val dfCount: Map[String, Int] =
        bigrams.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
      val rarity: Map[Long, Double] = bigrams.collect {
        case (id, bs) if bs.nonEmpty =>
          id -> bs.count(dfCount(_) <= 2).toDouble / bs.size
      }.toMap
      val byLang = docs.filter(d => rarity.contains(d._1)).groupBy(_._2)
      val expect = byLang.flatMap { case (_, ds) =>
        val ordered = ds.map(d => (rarity(d._1), d._1)).sortBy(identity)
        val n = ordered.length
        // distinct cutoff RANKS (tiny n collapses several k onto one rank)
        val cuts = (1 to 2).map(k => (k * n + 2) / 3).distinct
          .map(rk => ordered(rk - 1)._1).sorted
        ds.map { d =>
          d._1 -> (1L + cuts.count(c => rarity(d._1) > c))
        }
      }
      assert(got === expect, s"trial $trial: got $got expected $expect")
    }
  }

  test("qualityBuckets: tiny sample dedupes cutoff ranks; empty-sample lang gets NULL bucket") {
    import graft.ops.TextOps
    import org.apache.spark.unsafe.types.UTF8String
    // doc(id, m): rarity = m/(m+2), strictly increasing in m (as above)
    def doc(id: Long, lang: String, m: Int): (Long, String, String) =
      (id, lang, ("aa bb cc" +: (1 to m).map(j => s"u${id}x$j")).mkString(" "))
    val ids = 1L to 5L
    val h = ids.map(i => i -> graft.functions.Md5Hash60.hash(
      UTF8String.fromString(i.toString))).toMap
    // rate admits EXACTLY the smallest-hash doc: the gate threshold sits at
    // the MIDPOINT of the two smallest hashes (gap ≈ 2^55 ≫ double ulp, so
    // float rounding of rate*2^60 can never flip either side)
    val sortedH = h.values.toSeq.sorted
    val rate = ((sortedH(0) + sortedH(1)) / 2).toDouble / (1L << 60).toDouble
    val docs = ids.map(i => doc(i, "en", i.toInt)).toDF("doc_id", "lang", "text")
    val got = TextOps.qualityBuckets(docs, buckets = 3, sampleRate = rate)
      .select("doc_id", "bucket").as[(Long, Long)].collect().toMap
    // sample n=1: ranks for k=1,2 both collapse to 1 — ONE cutoff, so
    // buckets above it are 2, never the rank-duplicated 3
    val sampled = ids.minBy(h)
    // rarity is strictly increasing in id, so id order = rarity order
    ids.foreach { i =>
      assert(got(i) === (if (i > sampled) 2L else 1L),
        s"id $i (sampled=$sampled): got ${got(i)}")
    }
    assert(!got.values.exists(_ > 2L), "duplicate cutoffs must never produce bucket 3 here")

    // a language whose entire sample is gated out surfaces with NULL bucket
    // instead of silently dropping from the output
    val twoLang = (ids.map(i => doc(i, "en", i.toInt)) :+ doc(100L, "zz", 1))
      .toDF("doc_id", "lang", "text")
    val hZz = graft.functions.Md5Hash60.hash(UTF8String.fromString("100"))
    assume(hZz > sortedH(1), "construction: zz doc must be gated out at `rate`")
    val out = TextOps.qualityBuckets(twoLang, buckets = 3, sampleRate = rate)
      .select("doc_id", "bucket").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out.contains(100L), "empty-sample language must not vanish from the output")
    assert(out(100L).isEmpty, "empty-sample language must surface with a NULL bucket")
    assert(out(sampled) === Some(1L))
  }

  test("bpeLearn: greedy merges with closed-form counts; ties break lexicographically") {
    import graft.ops.BpeOps
    // words: "aaab" ×2, "ab" ×1 (sampleMod = 1 ⇒ everything sampled)
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val got = BpeOps.bpeLearn(docs, merges = 3, sampleMod = 1)
      .as[(Long, String, String, String, Long)].collect().toSeq
    // iter 1: (a,a) 4 vs (a,b) 3 → merge aa (greedy: <a><a><a><b> → <aa><a><b>)
    // iter 2: (aa,a) 2, (a,b) 3 → merge ab
    // iter 3: (aa,ab) 2 → merge aaab
    assert(got === Seq(
      (1L, "a", "a", "aa", 4L),
      (2L, "a", "b", "ab", 3L),
      (3L, "aa", "ab", "aaab", 2L)))
    // lexicographic tie-break: "ba ca" — pairs (b,a) 1, (c,a) 1 → (b,a) wins
    val tie = BpeOps.bpeLearn(Seq((1L, "ba ca")).toDF("doc_id", "text"),
      merges = 1, sampleMod = 1)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(tie === Seq((1L, "b", "a", "ba", 1L)))
    // preprocessing: case folded, non-alpha stripped, 1-char words dropped
    val prep = BpeOps.bpeLearn(Seq((1L, "AB a-b! c")).toDF("doc_id", "text"),
      merges = 1, sampleMod = 1)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(prep === Seq((1L, "a", "b", "ab", 2L)))
  }

  test("bpeLearn at 256 merges: bounded plan (checkpoint cadence), exact vs driver reference") {
    import graft.ops.BpeOps
    // A 256-step learn exercises the periodic localCheckpoint: without it,
    // step k re-executes all k−1 prior replaces (O(merges²) work) and the
    // accumulated plan nests 256 expressions deep. Corpus: 500 deterministic
    // pseudo-words (LCG over a 12-letter alphabet) — enough adjacent-pair
    // diversity to sustain 256 greedy merges.
    val rng = new java.util.Random(7)
    val words = (0 until 500).map { _ =>
      (0 until 12).map(_ => ('a' + rng.nextInt(12)).toChar).mkString
    }
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val got = BpeOps.bpeLearn(docs, merges = 256, sampleMod = 1)
      .as[(Long, String, String, String, Long)].collect().toSeq
    val sec = (System.nanoTime() - t0) / 1e9
    assert(got.size === 256)
    // driver-side reference: same preprocessing, greedy left-to-right
    // non-overlapping merge application, max-count lexicographic tie-break
    var state: Map[Vector[String], Long] = words
      .groupBy(identity).map { case (w, ws) =>
        w.map(_.toString).toVector -> ws.size.toLong
      }
    val ref = (1 to 256).map { step =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (syms, f) =>
        syms.indices.dropRight(1).foreach { i =>
          counts((syms(i), syms(i + 1))) =
            counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
        }
      }
      val ((l, r), cnt) = counts.toSeq
        .minBy { case ((l, r), c) => (-c, l, r) }
      state = state.groupBy { case (syms, _) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.size) {
          if (i + 1 < syms.size && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.result()
      }.map { case (syms, m) => syms -> m.values.sum }
      (step.toLong, l, r, l + r, cnt)
    }
    assert(got === ref, "learned merge table diverged from the reference")
    // bounded per-step cost: generous smoke bound — the pre-fix quadratic
    // re-execution shape would trend far past this long before 32k merges
    assert(sec / 256 < 1.5, f"per-step time ${sec / 256}%.2f s — plan growth?")
  }

  test("bpeApply: learned merges encode the FULL corpus, sampled or not; empty docs keep (0,0)") {
    import graft.ops.BpeOps
    // same training corpus as the learn test: merges aa, ab, aaab (in order)
    val docs = Seq(
      (1L, "aaab aaab ab"),
      (2L, "aaabab b aab"), // NOT symbol-identical to training words
      (3L, "!!! 7 x")       // nothing survives preprocessing → (0, 0)
    ).toDF("doc_id", "text")
    val got = BpeOps.bpeApply(docs, merges = 3, sampleMod = 1)
      .as[(Long, Long, Long)].collect().toSeq
    // doc 1: aaab→<aaab> (1), aaab→1, ab→<ab> (1) ⇒ 3 words, 3 symbols
    // doc 2: aaabab: <a><a><a><b><a><b> →aa→ <aa><a><b><a><b> →ab→
    //        <aa><ab><ab> →aaab→ <aaab><ab> = 2 symbols; "b" dropped (len 1);
    //        aab: <a><a><b> → <aa><b> → (no <a><b> adjacency left) 2 symbols
    assert(got === Seq((1L, 3L, 3L), (2L, 2L, 4L), (3L, 0L, 0L)))
    // application order matters: with only the FIRST merge learned, doc 1's
    // aaab is <aa><a><b> = 3 symbols, ab stays 2
    val one = BpeOps.bpeApply(docs.filter($"doc_id" === 1), merges = 1, sampleMod = 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(one === Seq((1L, 3L, 8L))) // 3 + 3 + 2
  }

  test("upsampleEpochs copy counts equal the md5 model across random factor specs") {
    import graft.ops.{DedupOps, TextOps}
    import org.apache.spark.unsafe.types.UTF8String
    val rng = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val fac = Map("a" -> (rng.nextInt(12) * 0.25), "b" -> (rng.nextInt(12) * 0.25))
      val docs = (1L to 30L).map(i => (i, if (i % 2 == 0) "a" else "b") )
        .toDF("doc_id", "source")
      val got = DedupOps.upsampleEpochs(docs, fac.toSeq)
        .as[(Long, String, Long)].collect().groupBy(_._1).view
        .mapValues(_.map(_._3).sorted.toSeq).toMap
      (1L to 30L).foreach { id =>
        val f = fac(if (id % 2 == 0) "a" else "b")
        val h = graft.functions.Md5Hash60.hash(UTF8String.fromString(id.toString))
        val copies = math.floor(f).toLong +
          (if (h.toDouble < (f - math.floor(f)) * (1L << 60).toDouble) 1L else 0L)
        if (copies == 0) assert(!got.contains(id), s"trial $trial id $id must drop")
        else assert(got(id) === (0L until copies),
          s"trial $trial id $id: got ${got.get(id)}, want 0 until $copies")
      }
    }
  }

  test("count-min sketch: est >= true for every term; shard sketches merge exactly") {
    import graft.ops.SketchOps
    val docs = Seq(
      (1L, "aa bb aa cc dd aa"), (2L, "bb cc bb ee"), (3L, "aa ff gg aa"))
      .toDF("doc_id", "text")
    val truth = docs.select(explode(graft.ops.TextOps.tokens($"text")).as("t"))
      .groupBy("t").count().as[(String, Long)].collect().toMap
    // narrow width forces collisions — the guarantee must still hold
    val sk = SketchOps.cmsSketch(docs, depth = 3, width = 4)
    val est = SketchOps.cmsEstimate(sk,
      truth.keys.toSeq.toDF("term"), depth = 3, width = 4)
      .as[(String, Long)].collect().toMap
    truth.foreach { case (t, c) =>
      assert(est(t) >= c, s"CMS underestimated '$t': ${est(t)} < $c")
    }
    // an unseen term estimates from whatever collides — never negative
    val unseen = SketchOps.cmsEstimate(sk, Seq("zz_unseen").toDF("term"),
      depth = 3, width = 4).as[(String, Long)].head()
    assert(unseen._2 >= 0L)
    // mergeability: sketch(A ∪ B) == cmsMerge(sketch(A), sketch(B)) exactly
    val (a, b) = (docs.filter($"doc_id" <= 1), docs.filter($"doc_id" > 1))
    val merged = SketchOps.cmsMerge(
      SketchOps.cmsSketch(a, depth = 3, width = 4),
      SketchOps.cmsSketch(b, depth = 3, width = 4))
      .as[(Long, Long, Long)].collect().toSet
    val whole = sk.as[(Long, Long, Long)].collect().toSet
    assert(merged === whole, "per-shard sketches must roll up to the corpus sketch")
  }

  test("chunkWindows: full coverage with overlap, tail pinned, short docs one chunk") {
    val toks = (1 to 10).map(i => s"t$i").mkString(" ")
    val out = TextOps.chunkWindows(docs((1L, toks), (2L, "a b"), (3L, "")),
        window = 4, stride = 3)
      .as[(Long, Long, Long, String, Long)].collect()
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // starts 0,3,6 then the pinned tail 6 == n-window — no duplicate
    assert(d1.map(_._3).toSeq === Seq(0L, 3L, 6L))
    assert(d1.map(_._4).toSeq === Seq("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(d1.forall(_._5 === 4L))
    // tail NOT divisible: 11 tokens -> starts 0,3,6,7 (pinned)
    val out11 = TextOps.chunkWindows(
        docs((9L, (1 to 11).map(i => s"t$i").mkString(" "))), window = 4, stride = 3)
      .as[(Long, Long, Long, String, Long)].collect().sortBy(_._2)
    assert(out11.map(_._3).toSeq === Seq(0L, 3L, 6L, 7L))
    assert(out11.last._4 === "t8 t9 t10 t11")
    // short doc: one (possibly partial) chunk; empty doc: none
    val d2 = out.filter(_._1 == 2L)
    assert(d2.length === 1 && d2.head._4 === "a b" && d2.head._5 === 2L)
    assert(!out.exists(_._1 == 3L))
  }
}
