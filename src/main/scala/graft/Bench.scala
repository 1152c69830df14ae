package graft

import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Per-round benchmark: runs the headline query subset on
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line for the driver
  * (compared against BASELINE.md's 2×-DuckDB target).
  *
  * Timing protocol: after one warm-up pass (JVM/codegen/footer caches), each
  * query runs `SPARK_GRAFT_BENCH_RUNS` times (default 3) and reports the
  * per-query MINIMUM — the shared VM shows up to 3× run-to-run variance on
  * identical plans (PERF.md), and min-of-N is the standard way to measure the
  * plan rather than the noise. The JSON line goes to stdout (unprefixed —
  * build.sbt sets StdoutOutput for forked runs) and to `BENCH_LAST.json`.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      // Cached plans otherwise bypass AQE partition coalescing (Spark
      // default false): the pipelines' persisted micro-batch intermediates
      // materialized at the full shuffle-partition count, so every
      // downstream stage over them scheduled 32 tasks of near-empty data
      // and every commit wrote one near-empty file per partition (63 part
      // files per 2-batch index build, r19 JobBreak). Scale-adaptive by
      // construction — AQE sizes partitions by bytes, so production batches
      // keep their parallelism. SPARK_GRAFT_CACHE_AQE=false restores the
      // Spark default for A/B.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // AQE headroom, scoped per query: batch analytics start shuffles at 8×
    // the core count and let adaptive coalescing shrink to fit — small
    // queries still land near `cpus` post-coalesce, while the 10×-scale
    // point stops serializing through `cpus` oversized partitions (the r08
    // scaling outliers x7_q1/x7_q5/x4_tfidf all cleared with this). The
    // micro-batch CDC replay keeps the native partition count: its batches
    // are small and frequent, and 8× headroom there is pure per-stage task
    // overhead ×8 checkpointed batches (measured 2.6× slower). Same posture
    // a production job takes: AQE headroom for the analytic tier, small
    // fixed partitions for the streaming tier.
    val aqeHeadroom = (cpus.toInt * 8).toString
    // A query that THROWS must never read as a (fast) wall time: failures are
    // recorded per query, reported as -1 in the JSON with the exception in an
    // "errors" map, and the bench exits nonzero.
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def timedRun(q: graft.queries.Q, fn: () => Long): Double = {
      // Tier comes from the query definition (Q.streaming), not a name set.
      spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        if (q.streaming) cpus else aqeHeadroom)
      val t0 = System.nanoTime()
      try { fn(); (System.nanoTime() - t0) / 1e9 }
      catch {
        case e: Throwable =>
          failures.put(q.name, (e.getClass.getName + ": " +
            String.valueOf(e.getMessage)).replaceAll("[\"\\\\\n\r\t]", " ").take(300))
          Double.NaN
      }
    }
    def minOk(times: Seq[Double]): Double = {
      val ok = times.filterNot(_.isNaN)
      if (ok.isEmpty) -1.0 else ok.min
    }
    // Warm the JVM/session once (codegen + parquet footer caches) so per-query
    // numbers measure the query, not first-touch initialization.
    Registry.headlines.headOption.foreach(q =>
      try q.fn(spark, sfDir).count() catch { case _: Throwable => () })
    // SELF-QUALIFICATION: a fixed floor probe — warm documents.count(),
    // min of 3 — measures the local-mode scheduling floor of THIS run. The
    // probe's plan never changes, so a floor above the documented band
    // (default 0.25 s; SPARK_GRAFT_FLOOR_BAND overrides) proves the VM was
    // contended during the run and the artifact flags itself
    // `contended: true` — floor-dominated per-query regressions in such a
    // run are environment, not plans (PERF.md's ±15–45 % band, measured
    // in-band instead of asserted).
    val floorBand = sys.env.getOrElse("SPARK_GRAFT_FLOOR_BAND", "0.25").toDouble
    // Probes must never abort the bench: any probe failure (missing file,
    // transient executor loss) degrades to NaN → the field is omitted from
    // the artifact and `contended` stays un-flagged (ADVICE r14). NonFatal
    // only: a fatal VM error (OOM, stack overflow) must propagate — timings
    // taken in an undefined VM state would be flagged healthy (ADVICE r15).
    def probed(f: => Double): Double =
      try f catch { case scala.util.control.NonFatal(_) => Double.NaN }
    // The probe is re-runnable: the scaled tiers execute MINUTES after
    // start-up, and r16 shipped xhi factors 3–6× off the same round's calm
    // narrative run with `contended: false` because the floor was probed at
    // start-up only (r16 verdict #2) — each tier now re-probes immediately
    // before it runs and records its own floor/contended pair.
    def floorProbe(): Double = probed {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      docs.count() // warm footer/listing caches: the probe measures scheduling
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        docs.count()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    val floorSec = floorProbe()
    // Two further fixed probes, recorded for CROSS-ROUND normalization (the
    // r14 A/B proved the scheduling floor alone misses slow-VM modes that
    // inflate shuffle-heavy queries ~30% while tiny scans stay in-band —
    // PERF.md "VM normalization"): a one-stage codegen'd hash reduction
    // (cpu_sec) and a two-stage exchange + hash agg (shuffle_sec), both
    // data-independent with plans that never change. Comparing these fields
    // across round artifacts separates VM drift from plan changes.
    def minOf3(f: () => Unit): Double = {
      f() // warm (codegen + stage caches)
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.min
    }
    import org.apache.spark.sql.functions._
    val cpuSec = probed(minOf3(() => {
      spark.range(0, 1L << 26, 1, 32)
        .select(sum(bit_count(xxhash64(col("id"))))).collect(); ()
    }))
    val shuffleSec = probed(minOf3(() => {
      spark.range(0, 1L << 23, 1, 32)
        .withColumn("k", pmod(xxhash64(col("id")), lit(100000)))
        .groupBy("k").agg(count(lit(1))).orderBy(desc("count(1)"))
        .limit(5).collect(); ()
    }))
    val contended = !floorSec.isNaN && floorSec > floorBand
    def r3p(v: Double): Double = math.rint(v * 1000) / 1000
    def optField(name: String, v: Double): String =
      if (v.isNaN) "" else s""","$name":${r3p(v)}"""
    val floorJson = optField("floor_sec", floorSec) +
      s""","floor_band":$floorBand""" + optField("cpu_sec", cpuSec) +
      optField("shuffle_sec", shuffleSec) + s""","contended":$contended"""
    // compact line: floor + contended only (band is a constant, cpu/shuffle
    // are cross-round normalization fields — full artifact keeps them)
    val floorCompact = optField("floor_sec", floorSec) +
      s""","contended":$contended"""
    // Streaming-tier freshness: the batch kernels record per-batch wall time
    // into BatchStats; collect it per query (across the min-of-N runs) and
    // publish p50/p95 — the number the ratio exclusion policy promises
    // (seconds per micro-batch vs the reference's 100 s trigger).
    val batchSec = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    graft.util.BatchStats.drain() // discard warm-up noise
    val results = Registry.headlines.map { q =>
      val r = q.name -> minOk((1 to runs).map(_ =>
        timedRun(q, () => q.fn(spark, sfDir).count())))
      val recorded = graft.util.BatchStats.drain().map(_._2)
      if (q.streaming && recorded.nonEmpty) batchSec.put(q.name, recorded)
      r
    }
    def pct(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      s(math.min(s.length - 1, math.ceil(p * s.length).toInt - 1).max(0))
    }
    val batchJson =
      if (batchSec.isEmpty) ""
      else batchSec.map { case (n, xs) =>
        "\"" + n + "\":{\"p50\":" + (math.rint(pct(xs, 0.5) * 1000) / 1000) +
          ",\"p95\":" + (math.rint(pct(xs, 0.95) * 1000) / 1000) +
          ",\"n\":" + xs.length + "}"
      }.mkString(""","batch_sec":{""", ",", "}")
    // Second scale point: a 10×-sharded copy (~sf1 from sf0.1) so the
    // comparison measures plans, not the local-mode scheduling floor, and any
    // superlinear plan shows up. Fixture-bound replay queries are
    // scale-invariant (they read hand-written CDC lines, not sfDir tables)
    // and excluded; single run — at this size per-query seconds dwarf the
    // noise floor that motivates min-of-3 at sf0.1.
    val scaleCopies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    val scaleRuns = sys.env.getOrElse("SPARK_GRAFT_SCALE_RUNS", "1").toInt
    val scaleInvariant = Set("cdc_replay_end_state", "cdc_replay_mor_end_state",
      "j1_merge_upsert", "cdc_stream_mv_fresh")
    var scaledTotal = Double.NaN
    var rs10: Seq[(String, Double)] = Nil
    // per-tier self-qualification (r16 verdict #2): floor re-probed at each
    // tier's start; NaN probes degrade to an omitted field as at start-up
    var floor10, floor30, floorXhi = Double.NaN
    if (scaleCopies > 1) {
      val dir = graft.tools.ScaledData.materialize(spark, sfDir, scaleCopies)
      floor10 = floorProbe()
      rs10 = Registry.headlines.filterNot(q => scaleInvariant(q.name)).map { q =>
        q.name -> minOk((1 to scaleRuns).map(_ =>
          timedRun(q, () => q.fn(spark, dir).count())))
      }
      graft.tools.ScaledData.delete(dir)
    }

    // HIGH scale point (30× by default) for the HEAVY subset only: replaces
    // extrapolation with measurement on the queries whose absolute cost
    // dominates the round — any superlinear per-query factor
    // (sec@30× / sec@1×  vs  copies) is a plan bug, not noise, at this size.
    // Since r18 the scaled tiers run MIN-OF-2 (r17 verdict #1: two rounds
    // of single-run tiers shipped factors 3–6× the same-HEAD calm run with
    // every probe reading contended:false — the trivial floor probe does
    // not register whatever slows multi-stage scaled queries; a second
    // run of the query itself does).
    val hiCopies = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI_COPIES", "30").toInt
    val hiRuns = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI_RUNS", "2").toInt
    // x1_dedup_keep_best left this list in r17 (verdict #1): the per-run
    // closure is O(pairs-within-the-run) BY CONSTRUCTION, so its 30× factor
    // grows with duplicate density rather than staying flat — r15 6.56 →
    // r16 25.16 past the copies/2 bound, exactly as its hardening note
    // predicted. The production posture at scale IS the incremental
    // KeepBestIndex (30× factor 1.69, 100× 7.2 — both measured in this
    // list), so the index twin carries the scaling headline and the
    // closure remains a base-tier headline + DuckDB-oracled query only.
    // x3_ivf_pq joins the 30× tier (r17): the cross-tier consistency rule
    // below needs a 30× anchor for every 100× entry — r16's 21.89-vs-3.48
    // xhi swing was undecidable precisely because the query had no
    // intermediate scale point.
    // x2_jaccard_capped joins the 30× tier (r17 verdict #2): the query sat
    // above the 2× gate in the shipped artifact with no scaling evidence
    // and no exception row — the gate's own protocol had no data to
    // adjudicate with; its 30× factor is that data.
    val heavy = Seq("cdc_events_replay", "x2_dedup_index", "x2_dup_spans",
      "x4_tfidf", "x7_q5_revenue_by_nation", "x2_line_dedup",
      "x4_corpus_build", "x3_ann_index", "x3_ivf_pq",
      "cdc_corpus_stream", "x1_keep_best_index", "x2_jaccard_capped")
    var rs30: Seq[(String, Double)] = Nil
    var hiDir: Option[String] = None // kept alive through requalification
    if (hiCopies > 1) {
      val dir = graft.tools.ScaledData.materialize(spark, sfDir, hiCopies)
      hiDir = Some(dir)
      floor30 = floorProbe()
      rs30 = Registry.headlines.filter(q => heavy.contains(q.name)).map { q =>
        q.name -> minOk((1 to hiRuns).map(_ =>
          timedRun(q, () => q.fn(spark, dir).count())))
      }
    }

    // EXTREME scale point (100× ≈ sf10 from sf0.1), INDEX pipelines only
    // (r15 verdict #4): the 100 TB judgment for the persistent-index
    // families extrapolated from ≤30× tiers; this tier replaces that
    // extrapolation with a measurement another decade up. The subset is
    // the three index headlines plus the keep-best INDEX twin (the
    // flat-shape replacement for the closure's steep curve — the closure
    // itself is O(pairs) by construction and stays on the 30× tier).
    val xhiCopies = sys.env.getOrElse("SPARK_GRAFT_SCALE_XHI_COPIES", "100").toInt
    val xhiRuns = sys.env.getOrElse("SPARK_GRAFT_SCALE_XHI_RUNS", "2").toInt
    // cdc_events_replay joins the 100× tier (r17 verdict #6): the
    // CDC/merge path is the reference's actual workload — it carries
    // measured 100× evidence beside the LLM index pipelines instead of
    // stopping at its 30× point.
    val indexPipelines = Seq("x3_ivf_pq", "x2_dedup_index", "cdc_corpus_stream",
      "x1_keep_best_index", "cdc_events_replay")
    var rsXhi: Seq[(String, Double)] = Nil
    var xhiDir: Option[String] = None
    if (xhiCopies > 1) {
      val dir = graft.tools.ScaledData.materialize(spark, sfDir, xhiCopies)
      xhiDir = Some(dir)
      floorXhi = floorProbe()
      rsXhi = Registry.headlines.filter(q => indexPipelines.contains(q.name)).map { q =>
        q.name -> minOk((1 to xhiRuns).map(_ =>
          timedRun(q, () => q.fn(spark, dir).count())))
      }
    }

    // PRIOR-CALM-FACTOR CROSS-CHECK (r17 verdict #1, the in-artifact half):
    // tools/factors_calm.json persists the per-tier scaling factors of the
    // last CALM narrative run (PERF.md's qualified measurement, committed
    // per round). A tier entry whose factor exceeds 1.5× its recorded calm
    // factor re-measures once more; if it STILL exceeds, the artifact
    // carries it under the tier's "calm_flagged" list — the reader can
    // tell contention-suspect entries from clean ones without trusting
    // any narrative.
    val calmPath = java.nio.file.Paths.get("tools/factors_calm.json")
    val (calmHi, calmXhi): (Map[String, Double], Map[String, Double]) =
      if (!java.nio.file.Files.exists(calmPath)) (Map.empty, Map.empty)
      else try {
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(java.nio.file.Files.readAllBytes(calmPath))
        def tier(key: String): Map[String, Double] = Option(node.get(key))
          .map { t =>
            val m = scala.collection.mutable.Map.empty[String, Double]
            t.fields().forEachRemaining(e => m.put(e.getKey, e.getValue.asDouble()))
            m.toMap
          }.getOrElse(Map.empty)
        (tier("hi"), tier("xhi"))
      } catch { case _: Exception => (Map.empty, Map.empty) }
    val calmFlagged30 = scala.collection.mutable.LinkedHashSet.empty[String]
    val calmFlaggedXhi = scala.collection.mutable.LinkedHashSet.empty[String]

    // INTERNAL-CONSISTENCY REQUALIFICATION (r14 verdict): a base-tier
    // min-of-N that EXCEEDS the same query's single run at 10× (or 30×) the
    // data is physically impossible for a healthy measurement — the base
    // tier caught a VM transient the run-level floor probes missed (they
    // qualify the RUN, not each measurement). Each inverted query
    // re-measures once, after a forced GC and a short settle, and the final
    // value is the min of both passes (both time the same plan; min-of-N is
    // the protocol). The artifact lists the re-measured names under
    // "requalified" so a reader can tell second-pass entries from
    // first-pass ones — and any name still inverted after the retry stays
    // listed with its inversion intact rather than being massaged.
    val scaledFloor: Map[String, Double] = (rs10 ++ rs30 ++ rsXhi).filter(_._2 >= 0)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
    val requalified = scala.collection.mutable.LinkedHashSet.empty[String]
    val finalResults = results.map { case (name, base) =>
      name -> (scaledFloor.get(name) match {
        case Some(s) if base > s && base >= 0 =>
          System.gc(); Thread.sleep(2000)
          val q = Registry.headlines.find(_.name == name).get
          val re = minOk((1 to runs).map(_ =>
            timedRun(q, () => q.fn(spark, sfDir).count())))
          requalified.add(name)
          if (re >= 0) math.min(base, re) else base
        case _ => base
      })
    }
    // The 30× tier gets the same treatment against the documented plan-
    // health bound (BASELINE.md: scaling factor ≤ ~copies/2 at 30× = flat-
    // to-sublinear): a single-run factor past the bound re-measures ONCE
    // on the still-materialized copy and takes the min — a transient
    // narrows back in-band, a genuinely superlinear plan reproduces and
    // stays reported. Runs against the FINAL (requalified) base values so
    // a lowered base cannot hide a breach decided on the stale one.
    val requalifiedHi = scala.collection.mutable.LinkedHashSet.empty[String]
    hiDir.foreach { dir =>
      val baseNow = finalResults.toMap
      rs30 = rs30.map { case (name, v) =>
        val b = baseNow.getOrElse(name, Double.NaN)
        def f(x: Double): Double = if (x >= 0 && b > 0) x / b else -1.0
        val calm = calmHi.get(name).filter(_ > 0)
        val trigger = f(v) > hiCopies / 2.0 ||
          calm.exists(c => f(v) > 1.5 * c)
        val v2 = if (v >= 0 && trigger) {
          System.gc(); Thread.sleep(2000)
          val q = Registry.headlines.find(_.name == name).get
          val re = timedRun(q, () => q.fn(spark, dir).count())
          requalifiedHi.add(name)
          if (re >= 0) math.min(v, re) else v
        } else v
        if (calm.exists(c => f(v2) > 1.5 * c)) calmFlagged30.add(name)
        name -> v2
      }
      graft.tools.ScaledData.delete(dir)
    }
    // the 100× tier gets the same one-retry requalification against the
    // flat-to-sublinear bound (factor ≤ copies/2), PLUS the cross-tier
    // consistency rule (r16 verdict #2): an xhi factor more than 3× the
    // LINEAR extrapolation of the same query's 30× factor
    // (f30 · copies_ratio) is contention until it reproduces — r16 shipped
    // x3_ivf_pq at 21.89 vs the calm narrative's 3.48 with
    // `contended: false` because nothing tied the tiers together.
    xhiDir.foreach { dir =>
      val baseNow = finalResults.toMap
      val factor30: Map[String, Double] = rs30.flatMap { case (n, v) =>
        baseNow.get(n).filter(_ > 0).filter(_ => v >= 0).map(b => n -> v / b)
      }.toMap
      val copiesRatio = xhiCopies.toDouble / math.max(1, hiCopies)
      rsXhi = rsXhi.map { case (name, v) =>
        val b = baseNow.getOrElse(name, Double.NaN)
        def fOf(x: Double): Double = if (x >= 0 && b > 0) x / b else -1.0
        val f = fOf(v)
        val calm = calmXhi.get(name).filter(_ > 0)
        val pastBound = f > xhiCopies / 2.0
        val pastTierConsistency = factor30.get(name)
          .exists(f30 => f30 > 0 && f > 3.0 * f30 * copiesRatio)
        val pastCalm = calm.exists(c => f > 1.5 * c)
        val v2 = if (f > 0 && (pastBound || pastTierConsistency || pastCalm)) {
          System.gc(); Thread.sleep(2000)
          val q = Registry.headlines.find(_.name == name).get
          val re = timedRun(q, () => q.fn(spark, dir).count())
          requalifiedHi.add(name)
          if (re >= 0) math.min(v, re) else v
        } else v
        if (calm.exists(c => fOf(v2) > 1.5 * c)) calmFlaggedXhi.add(name)
        name -> v2
      }
      graft.tools.ScaledData.delete(dir)
    }
    val requalJson =
      (if (requalified.isEmpty) ""
       else requalified.map("\"" + _ + "\"")
         .mkString(""","requalified":[""", ",", "]")) +
      (if (requalifiedHi.isEmpty) ""
       else requalifiedHi.map("\"" + _ + "\"")
         .mkString(""","requalified_hi":[""", ",", "]"))

    val qs = finalResults.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = finalResults.map(_._2).filter(_ >= 0).sum

    // per-tier self-qualification fields: each scaled block carries the
    // floor probed immediately before ITS queries ran, and its own
    // contended verdict against the same band as start-up
    def tierFloorJson(f: Double): String =
      optField("floor_sec", f) +
        (if (f.isNaN) "" else s""","contended":${f > floorBand}""")
    // compact-line twin: contended verdict only (the floor itself lives in
    // the full artifact — the 2000-char tail window is the constraint)
    def tierContendedJson(f: Double): String =
      if (f.isNaN) "" else s""","contended":${f > floorBand}"""
    val scaledJson =
      if (rs10.isEmpty) ""
      else {
        val sq = rs10.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
        // -1.0 failure sentinels are excluded like the base total — a failed
        // query must not subtract from the reported wall time.
        val sTotal = rs10.map(_._2).filter(_ >= 0).sum
        scaledTotal = sTotal
        s""","scaled":{"copies":$scaleCopies,"base_sf":"$sfDir","total":$sTotal,"runs_per_query":$scaleRuns${tierFloorJson(floor10)},"queries":$sq}"""
      }

    val baseSec = finalResults.toMap
    // compact twin: the check marker + flag list (the calm factors
    // themselves live in the full file) — the driver tail-captures the
    // compact line, so IT must be decidable too: "off" = the cross-check
    // never ran, distinct from "ran and found nothing"
    def calmCompactJson(calm: Map[String, Double],
        flagged: scala.collection.mutable.LinkedHashSet[String]): String =
      s""","calm_check":"${if (calm.isEmpty) "off" else "on"}"""" +
        (if (flagged.isEmpty) ""
         else flagged.map("\"" + _ + "\"").mkString(""","calm_flagged":[""", ",", "]"))
    // `calm_check` is EXPLICIT: "off" means the cross-check never ran
    // (factors file absent/unreadable/empty for this tier) — without the
    // marker a reader cannot tell "all entries clean" from "nothing was
    // checked" (r18 review pass 2), which defeats the in-artifact
    // decidability the protocol exists for
    def calmJson(calm: Map[String, Double],
        flagged: scala.collection.mutable.LinkedHashSet[String]): String =
      (if (calm.isEmpty) ""
       else calm.toSeq.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + v }
         .mkString(""","factors_calm":{""", ",", "}")) +
        calmCompactJson(calm, flagged)
    var hiJson = ""
    var hiCompactJson = "" // factors-only twin, built alongside (never parsed back)
    if (rs30.nonEmpty) {
      val sq = rs30.map { case (k, v) => "\"" + k + "\":" + (math.rint(v * 1000) / 1000) }
        .mkString("{", ",", "}")
      val factors = rs30.map { case (k, v) =>
        val b = baseSec.getOrElse(k, Double.NaN)
        val f = if (v >= 0 && b > 0) math.rint(v / b * 100) / 100 else -1.0
        "\"" + k + "\":" + f
      }.mkString("{", ",", "}")
      hiJson = s""","scaled_hi":{"copies":$hiCopies,"runs_per_query":$hiRuns${tierFloorJson(floor30)},"queries":$sq,"factors":$factors${calmJson(calmHi, calmFlagged30)}}"""
      hiCompactJson = s""","scaled_hi":{"copies":$hiCopies${tierContendedJson(floor30)},"factors":$factors${calmCompactJson(calmHi, calmFlagged30)}}"""
    }
    var xhiJson = ""
    var xhiCompactJson = ""
    if (rsXhi.nonEmpty) {
      val sq = rsXhi.map { case (k, v) => "\"" + k + "\":" + (math.rint(v * 1000) / 1000) }
        .mkString("{", ",", "}")
      val factors = rsXhi.map { case (k, v) =>
        val b = baseSec.getOrElse(k, Double.NaN)
        val f = if (v >= 0 && b > 0) math.rint(v / b * 100) / 100 else -1.0
        "\"" + k + "\":" + f
      }.mkString("{", ",", "}")
      xhiJson = s""","scaled_xhi":{"copies":$xhiCopies,"runs_per_query":$xhiRuns${tierFloorJson(floorXhi)},"queries":$sq,"factors":$factors${calmJson(calmXhi, calmFlaggedXhi)}}"""
      xhiCompactJson = s""","scaled_xhi":{"copies":$xhiCopies${tierContendedJson(floorXhi)},"factors":$factors${calmCompactJson(calmXhi, calmFlaggedXhi)}}"""
    }

    // "Within 2x of DuckDB" as a COMPUTED column: tools/check.py --times-out
    // records per-query DuckDB oracle wall times (tools/oracle_times_<sf>.json,
    // committed per round); when the file matches this run's sf dir, the JSON
    // carries oracle_sec and ratio_vs_duckdb. Ratios are emitted only for
    // queries whose oracle actually reads the sf tables (sf_bound) — engine-
    // only replays compare against a VALUES literal and have no meaningful
    // DuckDB twin — and whose engine side is a QUERY, not a streaming
    // pipeline (a 4-commit checkpointed replay vs DuckDB's one window query
    // is a freshness metric, not a per-query ratio; PERF.md frames those
    // against the reference's 100 s trigger instead). Oracle times are
    // floored at 1ms so the local scheduling floor doesn't divide by ~0.
    val streamingTier = Registry.headlines.filter(_.streaming).map(_.name).toSet
    val sfBase = sfDir.stripSuffix("/").split('/').last
    val oraclePath = java.nio.file.Paths.get(s"tools/oracle_times_$sfBase.json")
    // (name, engineSec, oracleSec, sfBound) for every headline with a recorded
    // DuckDB oracle time — shared by the full artifact and the compact line.
    val oracleEntries: Seq[(String, Double, Double, Boolean)] =
      if (!java.nio.file.Files.exists(oraclePath)) Nil
      else try {
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(java.nio.file.Files.readAllBytes(oraclePath))
        val times = node.get("times")
        finalResults.flatMap { case (name, sec) =>
          Option(times.get(name)).map { t =>
            (name, sec, t.get("sec").asDouble(), t.get("sf_bound").asBoolean())
          }
        }
      } catch { case _: Exception => Nil }
    def ratioJson(entries: Seq[(String, Double, Double, Boolean)],
        minOracleSec: Double = 0.0): String = entries
      .filter(e => e._4 && e._2 >= 0 && !streamingTier(e._1) && e._3 > minOracleSec)
      .map { case (n, s, o, _) =>
        "\"" + n + "\":" + (math.rint(s / math.max(o, 0.001) * 100) / 100)
      }.mkString("{", ",", "}")
    val oracleJson =
      if (oracleEntries.isEmpty) ""
      else {
        val os = oracleEntries.map { case (n, _, o, _) => "\"" + n + "\":" + o }
          .mkString("{", ",", "}")
        s""","oracle_sec":$os,"ratio_vs_duckdb":${ratioJson(oracleEntries)}"""
      }

    val errJson =
      if (failures.isEmpty) ""
      else failures.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
        .mkString(""","errors":{""", ",", "}")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs_per_query":$runs,"timing":"min_of_n"$floorJson$requalJson$errJson$scaledJson$hiJson$xhiJson$batchJson$oracleJson}"""
    // The FULL artifact goes to disk (both paths committed / inspectable):
    // round 11 proved the driver's stdout tail capture is a 2000-char window,
    // and the full line (2.9k and growing ~100 chars per new headline) no
    // longer fits, so "parsed" came back null. Stdout gets a COMPACT line
    // instead — complete JSON, same key names the perf gate reads (queries /
    // ratio_vs_duckdb), times at 1 ms precision, scaled reduced to totals,
    // scaled_hi to its factors, oracle_sec omitted (derivable: engine sec /
    // ratio) — sized to stay comfortably inside the window; full fidelity
    // (raw nanos, per-query scaled maps, oracle_sec incl. streaming-tier)
    // lives in the file the compact line points at.
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_LAST.json"), line)
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
      java.nio.file.Files.writeString(java.nio.file.Paths.get("target/bench.json"), line)
    } catch { case _: Exception => () }
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    val compactQs = finalResults.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val compactOracle =
      if (oracleEntries.isEmpty) ""
      else
        // ratio only: oracle_sec is derivable (engine sec / ratio) and the
        // full map lives in the file — the ~450 chars it cost pushed the
        // compact line past the 2000-char tail window once scaled_hi and
        // batch_sec joined it. The COMPACT line further carries only the
        // GATE-RELEVANT ratios (DuckDB denominator > 0.2 s — BASELINE.md's
        // measured floor-exclusion line: a sub-floor denominator expresses
        // the scheduling floor, not a plan, and is excluded from 2×-gate
        // judgment); the full artifact keeps every ratio.
        s""","ratio_vs_duckdb":${ratioJson(oracleEntries, minOracleSec = 0.2)}"""
    val compactScaled =
      if (scaledTotal.isNaN) ""
      else s""","scaled_total":${r3(scaledTotal)},"scaled_copies":$scaleCopies"""
    // batch_sec dropped from the COMPACT line only (r14: 30 headlines
    // pushed the line to 2108 chars, past the driver's 2000-char tail
    // window) — the streaming-tier p50/p95 live in the full artifact the
    // "full" pointer names.
    val compactLine =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$compactQs,"sf":"$sfBase"$floorCompact$requalJson$errJson$compactScaled$hiCompactJson$xhiCompactJson$compactOracle,"full":"BENCH_LAST.json"}"""
    if (compactLine.length >= 1950)
      System.err.println(s"WARNING: compact bench line ${compactLine.length} chars — " +
        "approaching the driver's 2000-char tail window; trim a block")
    spark.stop()
    // Printed LAST, after the session shuts down, so no later stdout can push
    // it out of the driver's tail window.
    println(compactLine)
    if (failures.nonEmpty) {
      System.err.println(s"BENCH FAILURES (${failures.size}): " +
        failures.keys.mkString(", "))
      sys.exit(1)
    }
  }
}
