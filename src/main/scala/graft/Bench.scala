package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one warmup pass (JIT + codegen compile + file-index
  * caches), then a timed pass; prints the driver-contract JSON line.
  *
  * The JSON carries `calib_pre`/`calib_post`: wall seconds for a FIXED
  * deterministic CPU-bound job (200M xxhash64 partial-agg) run before the
  * warmup and after the timed pass. Adjacent full-catalog runs on this
  * shared host were measured drifting by a uniform ~1.35× with zero
  * per-query spikes — machine-level speed variance, not harness noise.
  * The calibration pins the machine factor of THIS run so cross-run and
  * cross-round comparisons can normalize it out instead of misreading
  * global drift as regression.
  */
object Bench {

  /** Fixed CPU-bound calibration: data-independent, shuffle-free (one
    * partial-agg row per partition), same cost every run on equal
    * hardware. The hash is masked to 32 bits before summing — 2e8 raw
    * xxhash64 longs overflow the Long sum almost surely, which ANSI mode
    * (Spark 4's default) turns into a run-killing error; the masked sum
    * peaks at ~2^59 and the per-row cost is unchanged. */
  def calibrate(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    spark.range(200000000L)
      .select(sum(xxhash64(col("id")).bitwiseAND(lit(0xFFFFFFFFL)))).head()
    (System.nanoTime() - t0) / 1e9
  }

  /** How often a calib probe is interleaved into the timed pass. r13's
    * driver run drifted 1.41× MID-run with only endpoint probes, so
    * per-query normalization was blind interpolation across 194 queries;
    * a probe every 25 localizes drift to a segment. */
  val CalibEvery = 25

  /** Per-query machine factors from interleaved calib probes: linear
    * interpolation of the probe series at each query index, divided by
    * the reference calib and clamped to [1, 3] (a fast machine never
    * loosens a budget; past 3× the host is too degraded for timings to
    * mean anything). Pure — unit-tested against synthetic drift in
    * BenchCalibSpec, shared by BenchGuardSpec's per-segment budgets. */
  def segmentFactors(probes: Seq[(Int, Double)], n: Int,
      ref: Double = 0.30): IndexedSeq[Double] = {
    require(probes.nonEmpty, "need at least one calib probe")
    val sorted = probes.sortBy(_._1)
    def calibAt(i: Int): Double = {
      val before = sorted.filter(_._1 <= i)
      val after = sorted.filter(_._1 > i)
      (before.lastOption, after.headOption) match {
        case (Some((i0, c0)), Some((i1, c1))) if i1 != i0 =>
          c0 + (c1 - c0) * (i - i0).toDouble / (i1 - i0)
        case (Some((_, c0)), _) => c0
        case (None, Some((_, c1))) => c1
        case _ => ref
      }
    }
    (0 until n).map(i => math.min(3.0, math.max(1.0, calibAt(i) / ref)))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // r19 (guide §9 / r18 verdict item 7): let the planner pick shuffled
      // hash join when its size conditions are met instead of always
      // preferring sort-merge — adopted after a controlled full-catalog
      // A/B (calib-normalized geomean 1.11 in favor, no reproducible
      // per-query regression; the 13 apparent ones collapsed to parity on
      // a back-to-back targeted rerun — see OPTIMIZATION_r19.md §7).
      // Scale note: SHJ is chosen only when a build side fits per-task
      // memory (canBuildLocalHashMapBySize), so this does not license
      // unbounded builds at 100 TB; SMJ remains the fallback. Env var
      // restores the old default for A/Bs without recompiling.
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      // the engine's own sessions run linted (warn-only): every planned
      // query passes through ScaleLint, error findings land in the log
      // and the count is surfaced as `lint_errors` in the JSON below
      .config("spark.sql.queryExecutionListeners", "graft.plans.GraftLintListener")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional arg: comma-separated substring filters for targeted timing
    // (dev tool; the driver invokes with no args = full catalog)
    val qs = args.headOption match {
      case Some(f) =>
        val fs = f.split(',').toSeq
        SparkEntry.queries.filter(q => fs.exists(q._1.contains))
      case None => SparkEntry.queries
    }
    // first calibrate() pays the calibration query's own JIT/codegen
    // compile (~10× the steady-state reading) — warm it untimed so
    // calib_pre measures the machine, not the compiler
    calibrate(spark)
    val calibPre = calibrate(spark)
    qs.foreach { case (_, fn) => // warmup
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      Housekeeping.releaseAndSettle(spark) // don't let one query's residue time the next
    }
    // A query that THROWS records -1, never its time-to-exception: an
    // exception in 0.1s would otherwise read as a 0.1s run and rc 0 would
    // mask a broken catalog (exactly how r10's 14 events-reader failures
    // hid inside a green-looking BENCH artifact). Failures are also listed
    // by name so the artifact is self-diagnosing.
    //
    // BEST-OF-2 per query: three straight rounds saw single-query 2–3.8×
    // spikes (GC / machine scheduling) manufacture false regression marks
    // that a same-session rerun couldn't reproduce. The min of two
    // back-to-back reps discards a one-off spike while an honest
    // regression shows in both reps; reps run adjacent so they see the
    // same machine state, and Housekeeping separates queries, not reps.
    // calib probes interleave every CalibEvery queries (see segmentFactors)
    val probes = scala.collection.mutable.ArrayBuffer[(Int, Double)]((0, calibPre))
    val results = qs.toSeq.zipWithIndex.map { case ((name, fn), qi) =>
      if (qi > 0 && qi % CalibEvery == 0) probes += ((qi, calibrate(spark)))
      val reps = (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        if (ok) dt else -1.0
      }
      Housekeeping.releaseAndSettle(spark) // outside the timed section
      val good = reps.filter(_ >= 0)
      name -> (if (good.nonEmpty) good.min else -1.0)
    }
    val calibPost = calibrate(spark)
    probes += ((qs.size, calibPost))
    val calibJson = probes.map { case (i, c) => s"[$i,$c]" }.mkString("[", ",", "]")
    val failures = results.collect { case (k, v) if v < 0 => k }.toSeq
    val fjson = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    val qjson = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // the lint listener dispatches async on the listener bus — drain it so
    // the tripwire has seen every executed plan before we read it
    org.apache.spark.graft.CleanerBridge.waitListenerBusEmpty(spark.sparkContext)
    val lintErrors = graft.plans.ScaleLint.errorCount.get()
    val line = s"""{"metric":"total","value":$total,"unit":"sec","calib_pre":$calibPre,"calib_post":$calibPost,"calib_series":$calibJson,"n_failed":${failures.size},"failures":$fjson,"lint_errors":$lintErrors,"queries":$qjson,"sf":"$sfDir"}"""
    println(line)
    // The driver's BENCH artifact truncates the per-query map; persist the
    // full map so later rounds can diff EVERY query, not a visible suffix.
    try {
      val out = java.nio.file.Paths.get("bench/last_run.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, (line + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () } // never fail the bench over a log file
    // The driver records only the last ~2000 chars of stdout, so the full
    // line above never parses in its artifact (its head is cut mid-map).
    // Emit a COMPACT line — headline queries only, small enough to sit
    // whole inside the tail window — so BENCH_rN.json self-parses; the full
    // per-query map lives in bench/last_run.json (and the full line above).
    // It must be the VERY LAST stdout: r10's compact line landed in the
    // tail but sbt's [success] epilogue followed it and the driver parsed
    // null — so print it AFTER spark.stop() (whose shutdown chatter goes
    // to stderr/log4j, not stdout) as the final act of main.
    // No per-query map here — even the 5-headline subset pushed past what
    // the tail window reliably holds; everything per-query lives in
    // bench/last_run.json. Failure NAMES are capped at 5 (count is always
    // exact in n_failed) to bound the line under ~500 bytes.
    val fCapped = failures.take(5).map("\"" + _ + "\"").mkString("[", ",", "]")
    val compact = s"""{"metric":"total","value":$total,"unit":"sec","calib_pre":$calibPre,"calib_post":$calibPost,"n_failed":${failures.size},"failures":$fCapped,"lint_errors":$lintErrors,"n_queries":${results.size},"full":"bench/last_run.json","sf":"$sfDir"}"""
    try {
      val out = java.nio.file.Paths.get("bench/summary.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, (compact + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    spark.stop()
    println(compact)
    System.out.flush()
  }
}
