package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, ONE JSON result line on stdout.
  *
  * Timing sink is a `noop`-format write, not `count()`: count lets
  * Catalyst prune unreferenced projections, under-measuring
  * compute-heavy queries (VERDICT r1 "What's wrong" #5). The noop sink
  * fully materializes every output row on the executors and discards
  * it — the honest end-to-end cost.
  */
object Bench {

  /** Five stable, cheap, fixture-free queries spread across families
    * (agg / string / window / text-agg / dedup) — the box-speed probe.
    */
  val canaryQueries: Seq[String] = Seq("q01_agg_summary",
    "q16_string_funcs", "q24_window_topn", "qt01_token_stats",
    "qt04_dedup_exact")

  /** Last-resort canary baseline when no calibration artifact exists:
    * the five canary queries summed in the r14 round-close clean run
    * of THE ORIGINAL BOX (/tmp/bench_r14c.log, total 259.3 s). On any
    * other machine this number is meaningless — run
    * `runMain graft.Bench --calibrate` once per box instead.
    */
  val FallbackCanaryBaselineSec = 3.218

  /** Calibration artifact (value + provenance), next to BASELINE.json
    * in the repo root. Written by `--calibrate`, read by every bench
    * run — the r16 fix for the hard-coded box constant: a new box or
    * Spark upgrade re-calibrates instead of silently skewing every
    * canary_factor.
    */
  val BaselineArtifact = "canary_baseline.json"

  /** Something that changes when the hardware does: core count + CPU
    * model. Recorded in the artifact so a baseline read on different
    * iron is detectable.
    */
  def boxFingerprint(): String = {
    val cores = Runtime.getRuntime.availableProcessors()
    val model = try {
      val src = scala.io.Source.fromFile("/proc/cpuinfo")
      try src.getLines().find(_.startsWith("model name"))
        .map(_.split(":").last.trim).getOrElse("unknown")
      finally src.close()
    } catch { case _: Throwable => "unknown" }
    s"${cores}x $model"
  }

  /** (baselineSec, source tag) — the artifact when present and
    * parseable, the literal (with a loud stderr warning) otherwise.
    */
  def readCanaryBaseline(): (Double, String) = {
    val p = java.nio.file.Paths.get(BaselineArtifact)
    if (java.nio.file.Files.exists(p)) {
      val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      val re = """"canary_baseline_sec"\s*:\s*([0-9.]+)""".r
      re.findFirstMatchIn(text).map(_.group(1).toDouble) match {
        case Some(v) if v > 0 =>
          val boxRe = """"box"\s*:\s*"([^"]*)"""".r
          val recorded = boxRe.findFirstMatchIn(text).map(_.group(1))
          if (!recorded.contains(boxFingerprint()))
            System.err.println(s"[bench] WARNING: $BaselineArtifact was " +
              s"calibrated on '${recorded.getOrElse("?")}' but this box " +
              s"is '${boxFingerprint()}' — re-run --calibrate")
          return (v, "artifact")
        case _ =>
          System.err.println(
            s"[bench] WARNING: $BaselineArtifact unparseable — " +
              "falling back to the r14 literal")
      }
    } else System.err.println(
      s"[bench] WARNING: no $BaselineArtifact — canary_factor uses the " +
        "r14 literal baseline of a DIFFERENT box; run " +
        "`runMain graft.Bench --calibrate` once on this machine")
    (FallbackCanaryBaselineSec, "literal")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if (args.contains("--calibrate")) { calibrate(sfDir); return }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/shuffle-machinery startup (~5-8 s)
    // otherwise lands entirely on whichever query runs first
    spark.range(1000000).selectExpr("id % 97 as k", "id * 1.5 as v")
      .groupBy("k").sum("v")
      .write.format("noop").mode("overwrite").save()
    // name order, so run order (and which query absorbs shared-fixture
    // or JIT warmup cost) is identical across rounds — Map iteration
    // order would silently reshuffle the attribution
    // optional comma-separated name filter for single-query iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // Per-query isolation inside the shared JVM: drop any cached plans
    // the previous query leaked, force a full GC, and let background
    // cleanup (AQE threads, shuffle file deletion, finalizers) drain
    // before the next timer starts. Without this, per-query attribution
    // is noise: in the r4 run q16 absorbed 14.4 s of neighbor GC/JIT
    // debt vs 2.6 s isolated, making round-over-round per-query diffs
    // meaningless. One timed execution per query (not median-of-N:
    // the qi* pipelines build shared per-JVM fixtures on first touch,
    // so re-runs would time a different, cheaper code path).
    def settle(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      Thread.sleep(250)
      System.gc()
    }
    // PERF.md contamination protocol, now executed by the harness
    // itself instead of by hand across sessions: run the FULL suite
    // N times (default 2), report the LOWER total as the round number,
    // and carry every run's total in the output so BENCH_rN.json is
    // self-describing. BOTH caches are cleared before every run — the
    // in-JVM fixture map AND the on-disk ensure-managed artifacts
    // (tokenizer/LM/verified-pairs), which otherwise survive runs and
    // whole sessions — so each run times the identical build+query
    // path, training included (per-query timings come from the chosen
    // run only, keeping the JSON line inside the driver's bounded
    // tail window).
    val nRuns = sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt).getOrElse(2)
    case class Run(results: Seq[(String, Double)], failed: Seq[String]) {
      def total: Double = results.map(_._2).sum
    }
    // CANARY (r15 verdict task 6): this box drifts 1.3–1.5× between
    // windows on identical code (PERF.md r14 closing — untouched
    // queries moved 7.32 → 2.34 s across runs), which exceeds most
    // real per-query deltas. Five stable, cheap, fixture-free queries
    // spread across families (agg / string / window / text-agg /
    // dedup) serve as the box-speed probe. Two readings land in the
    // JSON:
    //  - canary_start_sec: median of 3 up-front passes — an early
    //    window reading on a barely-JIT-warmed JVM (5.74 vs 3.92
    //    in-suite in one r15 window, 2.58 vs 2.81 in another —
    //    position-noisy either way), so it is NOT the normalizer;
    //  - canary_factor: the five queries' CHOSEN-RUN times (same JVM
    //    state as every other row) against the clean-window baseline
    //    — calibration-correct because baseline and reading sit in
    //    the identical position. Normalize rN vs rN−1 totals by this
    //    (factor > 1 = slow window) instead of hand-adjudicating.
    // Baseline: the per-box calibration artifact (r16 task 6) — the
    // same five queries measured by `--calibrate` on THIS machine,
    // probe-warmed like the in-suite reading (r15 ADVICE: the old
    // in-suite-vs-cold-baseline comparison was systematically biased
    // low). Falls back to the r14 literal with a warning.
    val (canaryBaselineSec, canaryBaselineSrc) = readCanaryBaseline()
    // skipped under SPARK_GRAFT_ONLY — subset iteration shouldn't pay
    // the ~17 s probe, and its factor is meaningless without the full
    // suite anyway
    val canaryStartSec = if (only.isDefined) 0.0 else {
      val sums = (1 to 3).map { _ =>
        canaryQueries.map { n =>
          settle()
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.sum
      }
      sums.sorted.apply(1)
    }
    val runs = (1 to math.max(1, nRuns)).map { _ =>
      graft.queries.IngestQueries.resetFixtures()
      graft.lake.Artifacts.resetManaged(sfDir)
      val failed = Seq.newBuilder[String]
      val results = SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => only.forall(_.contains(n)) }
        .map { case (name, fn) =>
          settle()
          val t0 = System.nanoTime()
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case e: Throwable =>
            // record the failure in the machine-readable output too — a
            // query that dies in 50 ms must not read as a 50 ms speedup
            failed += name
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
          }
          name -> (System.nanoTime() - t0) / 1e9
        }
      Run(results, failed.result())
    }
    // chosen = lowest CLEAN total (fewest failures first: a run where a
    // query died early must not win on wall clock)
    val chosenIdx = runs.zipWithIndex
      .minBy { case (r, _) => (r.failed.size, r.total) }._2
    val chosen = runs(chosenIdx)
    // 3-decimal timings: the driver recovers this line from a bounded
    // tail of the sbt output, so the per-query map must stay well under
    // that window (9-decimal doubles overflowed it in r3 -> parsed=null)
    val qs = chosen.results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val failedJson = chosen.failed.map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    val runsJson = runs.map(r => f"${r.total}%.3f").mkString("[", ",", "]")
    val canaryInSuite = chosen.results
      .filter { case (n, _) => canaryQueries.contains(n) }
      .map(_._2).sum
    // 0.0 under a SPARK_GRAFT_ONLY subset that drops canary queries
    val canaryFactor =
      if (chosen.results.count(r => canaryQueries.contains(r._1)) ==
        canaryQueries.size) canaryInSuite / canaryBaselineSec
      else 0.0
    val jsonLine = f"""{"metric":"total","value":${chosen.total}%.3f,"unit":"sec","queries":$qs,"failed":$failedJson,"runs":$runsJson,"chosen":$chosenIdx,"canary_start_sec":$canaryStartSec%.3f,"canary_in_suite_sec":$canaryInSuite%.3f,"canary_factor":$canaryFactor%.3f,"canary_baseline_sec":$canaryBaselineSec%.3f,"canary_baseline_src":"$canaryBaselineSrc","sf":"$sfDir"}"""
    // One-window outlier self-adjudication (r17 verdict task 2): a row
    // inflated in ONE run but normal in the other is a load-smear
    // window, not a code regression (the r17 qi26 6.6→32.6 s case cost
    // a cross-session re-run to adjudicate). Flag rows >2.5× across
    // runs on stderr; the full per-run maps below make the artifact
    // itself adjudicable.
    // r20 measurement-bug fix (declared per the round brief): these
    // OUTLIER lines are emitted BEFORE the JSON line now, and the JSON
    // is (re)printed as the absolute last stdout line below — in r18
    // AND r19 the ~6 KB JSON followed by this stderr trailer overflowed
    // the driver's bounded tail window and PERF came back with
    // parsed:null both rounds. Additions-only: same line, same timing.
    if (runs.size > 1) {
      val maps = runs.map(_.results.toMap)
      for ((name, t) <- chosen.results; other <- runs.indices
           if other != chosenIdx;
           ot = maps(other).getOrElse(name, t)
           if math.max(t, ot) > 2.5 * math.max(0.05, math.min(t, ot)))
        System.err.println(f"[bench] OUTLIER $name: chosen=$t%.2fs " +
          f"run$other=$ot%.2fs (>2.5x across runs — likely a one-window " +
          "smear; re-run isolated before reading it as a regression)")
    }
    println(jsonLine)
    // full per-query artifact at the repo root: the driver recovers
    // the stdout line from a BOUNDED tail that truncates as the suite
    // grows (r16: 111 of 173 per-query rows lost to cross-round
    // diffing) — this file is the same JSON, never truncated, written
    // only on full-suite runs so a SPARK_GRAFT_ONLY subset can't
    // clobber the round's record. It additionally carries EVERY run's
    // per-query map (`runs_queries`, run order) — the stdout line
    // can't afford them, but with both maps a spike in one run only is
    // window contamination, a spike in both is suspect code (r17
    // verdict task 2: qi26 was adjudicable only by re-running).
    if (only.isEmpty) {
      val runsQueries = runs.map { r =>
        r.results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
          .mkString("{", ",", "}")
      }.mkString("[", ",", "]")
      // per-row MIN across runs (r18 verdict nit 2): the chosen-by-
      // TOTAL map can carry a row's slower reading (qt55 r18:
      // chosen 1.78 s, other run 1.24 s) and cross-round per-query
      // diffs then chase phantom regressions. min(runs) per row is
      // the stable per-query number — totals still read `queries`.
      val allMaps = runs.map(_.results.toMap)
      val queriesMin = chosen.results.map { case (k, v) =>
        val mn = allMaps.flatMap(_.get(k)).foldLeft(v)(math.min)
        "\"" + k + "\":" + f"$mn%.3f"
      }.mkString("{", ",", "}")
      val fileJson = jsonLine.dropRight(1) +
        s""","queries_min":$queriesMin,"runs_queries":$runsQueries}"""
      try java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_latest.json"),
        (fileJson + "\n").getBytes("UTF-8"))
      catch { case e: Throwable =>
        System.err.println(s"[bench] bench_latest.json write failed: $e")
      }
    }
    spark.stop()
    // reprint the result as the ABSOLUTE LAST stdout line (after
    // spark.stop()'s own log chatter): the driver recovers this line
    // from a bounded tail of the sbt output, and with 189 queries the
    // line only survives that window when nothing follows it
    println(jsonLine)
    System.out.flush()
  }

  /** Calibration: run ONE FULL bench suite on THIS box (identical
    * warmup, probe, settle, and run-order conditions to every future
    * reading — in-suite position effects like neighbor GC pressure
    * are part of what the canary measures, so the baseline must sit
    * in the same position; a probe-warmed idle-JVM mini-calibration
    * read 2.28 s where the in-suite value reads ~3.2, which would
    * have skewed every factor ~1.4× high) and record the chosen run's
    * in-suite canary sum as `canary_baseline.json` with provenance.
    * Run once per box (or Spark upgrade), on an idle machine in a
    * clean window — by construction that run's canary_factor is 1.0.
    */
  /** One full bench suite under main()'s exact protocol (warmup,
    * 3-pass probe, per-query settle, N runs with fixture resets,
    * chosen = lowest clean total); returns the chosen run's in-suite
    * canary sum.
    */
  private def runSuite(sfDir: String): Double = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("id % 97 as k", "id * 1.5 as v")
      .groupBy("k").sum("v")
      .write.format("noop").mode("overwrite").save()
    def settle(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      System.gc(); Thread.sleep(250); System.gc()
    }
    (1 to 3).foreach { _ =>
      canaryQueries.foreach { n =>
        settle()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    val nRuns = sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt).getOrElse(2)
    val runs = (1 to math.max(1, nRuns)).map { _ =>
      graft.queries.IngestQueries.resetFixtures()
      graft.lake.Artifacts.resetManaged(sfDir)
      var failed = 0
      val results = SparkEntry.queries.toSeq.sortBy(_._1)
        .map { case (name, fn) =>
          settle()
          val t0 = System.nanoTime()
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case e: Throwable =>
            failed += 1
            System.err.println(s"[calibrate] $name failed: ${e.getMessage}")
          }
          name -> (System.nanoTime() - t0) / 1e9
        }
      (failed, results)
    }
    val chosen = runs.minBy { case (f, rs) => (f, rs.map(_._2).sum) }._2
    spark.stop()
    chosen.filter(r => canaryQueries.contains(r._1)).map(_._2).sum
  }

  private def calibrate(sfDir: String): Unit = {
    val canarySum = runSuite(sfDir)
    val date = java.time.LocalDate.now().toString
    val json =
      f"""{"canary_baseline_sec":$canarySum%.3f,"calibrated":"$date","box":"${boxFingerprint()}","sf":"$sfDir","queries":${canaryQueries.map("\"" + _ + "\"").mkString("[", ",", "]")},"protocol":"in-suite canary sum of the chosen run of one full bench suite"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(BaselineArtifact),
      json.getBytes("UTF-8"))
    println(json)
  }
}
