package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark line. Round-3 hardening: the round-2 driver artifact
  * recorded a run degraded ~24x by external contention and there was no way
  * to tell from the JSON. This Bench defends itself:
  *  - every query is timed N_RUNS times after a warm-up pass; the line
  *    carries per-query p50 AND p90 plus n_runs, so a contended run shows
  *    up as p90 >> p50 instead of silently poisoning the one number;
  *  - per-run sweep totals are included (totals_per_run) — run-to-run
  *    agreement within ~10% is the health signal;
  *  - decode92 is measured corpus-warm (DecodeBench does warm-up + timed
  *    passes) at TWO corpus scales (500k and 2M records), each repeated,
  *    so the throughput number is provably not a small-corpus artifact and
  *    a degraded environment is visible as spread across decode92_runs.
  *
  * Round-4 hardening (the round-3 artifact lost its p50 map to tail
  * truncation — the driver keeps only the last ~2000 chars of output):
  *  - field order on the emitted line puts the secondary p90 map FIRST and
  *    the primary payload LAST, so a tail capture always preserves the
  *    numbers that matter. As the query set grew past ~90 entries the
  *    NAMED p50 map outgrew the tail budget, so the tail-safe payload is
  *    now a positional int-ms array (queries_ms_arr, sorted-name order —
  *    re-key against the sorted names in any named map here or the
  *    CORRECTNESS_r{N}.json keys) + decode figures + totals_per_run +
  *    resweep flags: ~0.9k chars at 116 queries;
  *  - the full line is ALSO written to BENCH_LOCAL.json in the working
  *    directory (the repo), so the artifact survives any stdout capture;
  *  - contention guard: a query sweep whose total is >3x the best sweep is
  *    re-run once and replaced (likewise a >3x-spread decode run); the
  *    line carries resweeps / decode_resweeps so a guarded artifact is
  *    distinguishable from a naturally quiet one.
  */
object Bench {
  private val NRuns = 3

  private def p50(xs: Seq[Double]): Double = {
    val s = xs.sorted; s(s.length / 2)
  }

  /** Trimmed median for the decode probes (round-4 finding: the 2M figure
    * reported `.max`, a best-case, and 3 runs let one contended run skew
    * the spread). Successful runs only; with ≥5 runs the single best and
    * worst are dropped before taking the median, so one outlier in either
    * direction cannot move the reported number.
    *
    * METRIC-SEMANTICS NOTE (round-5 advice): `decode92_2m_rec_per_s`
    * kept its JSON field name when it changed from max (≤ BENCH_r04) to
    * trimmed median (BENCH_r05 onward). Cross-round comparisons touching
    * r04-or-earlier decode figures must use `decode92_2m_max` (emitted
    * since r05) for like-for-like, or they will read the redefinition as
    * an apparent throughput regression. */
  private[graft] def trimmedP50(xs: Seq[Double]): Double = {
    val ok = xs.filter(_ > 0).sorted
    if (ok.isEmpty) 0.0
    else if (ok.length >= 5) p50(ok.slice(1, ok.length - 1))
    else p50(ok)
  }

  /** The emitted artifact line. Field order is load-bearing (see object
    * scaladoc). At 116 queries the NAMED int-ms p50 map alone is ~2.3k
    * chars — it no longer fits the driver's ~2000-char tail capture, so
    * the tail-safe primary payload is a POSITIONAL int-ms p50 array
    * ("queries_ms_arr", values in sorted query-name order — the same
    * sorted names as the "queries"/"queries_ms" maps and the
    * CORRECTNESS_r{N}.json keys, so it re-keys trivially) preceded by the
    * decode figures, totals_per_run and resweep flags: suffix ≈0.7k chars
    * at 116 queries. The full NAMED maps ride earlier in the line for
    * complete captures. BenchFormatSpec asserts the suffix budget holds
    * even at 250 queries. */
  /** Stable 12-hex-char digest of the sorted query names. Rides in the
    * tail so any future positional re-keying of `queries_ms_arr` can be
    * VALIDATED: recompute over the candidate name list (e.g.
    * CORRECTNESS_r{N}.json keys, sorted) and compare — a registry rename
    * or reorder mismatches loudly instead of silently mis-attributing
    * every timing (round-6 advice). */
  private[graft] def namesDigest(names: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(names.mkString("\n").getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
  }

  private[graft] def renderLine(names: Seq[String],
      perP50: Map[String, Double], perP90: Map[String, Double],
      env: String, sfDir: String, total: Double, decodeRate: Double,
      decodeRuns: Seq[Double], decode2mRuns: Seq[Double],
      totalsPerRun: Seq[Double], resweeps: Int, decodeResweeps: Int,
      loadavg: Seq[Double] = Seq(), cpuPerRun: Seq[Double] = Seq(),
      contended: Boolean = false,
      spreadRatio: Double = -1.0, spreadExceeded: Boolean = false,
      perExecP90: Map[String, Double] = Map(),
      perSetup: Map[String, Double] = Map()): String = {
    def r3(x: Double): Double = math.rint(x * 1000) / 1000
    def jmap(m: Map[String, Double]): String =
      names.map(n => s"\"" + n + "\":" + r3(m(n))).mkString("{", ",", "}")
    val qMs = names.map(n => s"\"" + n + "\":" +
      (if (perP50(n) < 0) -1 else math.rint(perP50(n) * 1000).toLong))
      .mkString("{", ",", "}")
    val qMsArr = names.map(n =>
      if (perP50(n) < 0) -1L else math.rint(perP50(n) * 1000).toLong)
      .mkString("[", ",", "]")
    // Harness-setup split (round 15, VERDICT-r14 #6): queries_exec_p90 is
    // the per-query p90 with the streaming-harness constant (StreamMeter)
    // subtracted — the number bench_diff compares when both artifacts
    // carry it; queries_setup_ms is the p50 harness constant itself
    // (0 for batch queries). Both ride EARLY in the line, ahead of the
    // tail-safe payload, so the ~2000-char tail budget is untouched.
    val execP90 = names.map(n => perExecP90.getOrElse(n, perP90.getOrElse(n, -1.0)))
    val execMap = names.zip(execP90)
      .map { case (n, v) => s"\"" + n + "\":" + r3(v) }.mkString("{", ",", "}")
    val setupMs = names.map(n => s"\"" + n + "\":" + {
      val v = perSetup.getOrElse(n, 0.0)
      if (v < 0) -1L else math.rint(v * 1000).toLong
    }).mkString("{", ",", "}")
    val setupSec = r3(perSetup.values.filter(_ > 0).sum)
    s"""{"metric":"total","value":$total,"unit":"sec","n_runs":$NRuns,"sf":"$sfDir","env":$env,"queries_exec_p90":$execMap,"queries_setup_ms":$setupMs,"stream_setup_sec":$setupSec,"queries_p90":${jmap(perP90)},"queries":${jmap(perP50)},"queries_ms":$qMs,"decode_rec_per_s":${decodeRate.round},"decode92_rec_per_s":${trimmedP50(decodeRuns).round},"decode92_runs":[${decodeRuns.map(_.round).mkString(",")}],"decode92_2m_rec_per_s":${trimmedP50(decode2mRuns).round},"decode92_2m_max":${decode2mRuns.max.round},"decode92_2m_runs":[${decode2mRuns.map(_.round).mkString(",")}],"totals_per_run":[${totalsPerRun.map(r3).mkString(",")}],"spread_ratio":${r3(spreadRatio)},"spread_exceeded":$spreadExceeded,"cpu_per_run":[${cpuPerRun.map(r3).mkString(",")}],"loadavg":[${loadavg.map(r3).mkString(",")}],"contended":$contended,"resweeps":$resweeps,"decode_resweeps":$decodeResweeps,"names_sha":"${namesDigest(names)}","n_queries":${names.length},"queries_ms_arr":$qMsArr}"""
  }

  /** 1-minute load average from /proc/loadavg; -1 if unreadable. */
  private def loadavg1m(): Double =
    try new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
      .split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** Loadavg GUARD (round-10, verdict item 6): the decode probe is the
    * measurement most exposed to external box load (r9 repeats spanned
    * 804k–1.54M rec/s across runs on an otherwise unchanged engine), so
    * before the decode sweeps we WAIT — bounded — for the 1-minute load
    * to fall below `threshold` rather than measuring into the noise and
    * hoping the trimmed median saves it. Returns the load actually
    * observed when measurement began (rides the artifact's loadavg
    * array), so a guarded-but-still-busy run stays self-identifying. */
  private def awaitQuietBox(maxWaitSec: Int, threshold: Double): Double = {
    val deadline = System.nanoTime() + maxWaitSec * 1000000000L
    var l = loadavg1m()
    while (l > threshold && System.nanoTime() < deadline) {
      Thread.sleep(5000)
      l = loadavg1m()
    }
    l
  }

  /** Cumulative process CPU seconds (all threads); -1 if unsupported. */
  private def processCpuSec(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean =>
        val ns = os.getProcessCpuTime
        if (ns < 0) -1.0 else ns / 1e9
      case _ => -1.0
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // keep typed TopK partial aggregation hash-based (GraftSession's
      // fallback-threshold note)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Contention telemetry (round-6 advice: a poisoned sweep must be
    // self-identifying): 1-minute load BEFORE any work and AFTER the
    // sweeps, plus process-CPU per sweep. On a quiet box the start load is
    // ~0 and wall*utilized-cores ~= cpu; external load shows up as high
    // loadavg with cpu << expectations.
    val loadStart = loadavg1m()

    // Decode-throughput probes FIRST: measured after the query sweep they
    // read ~2x low from accumulated heap/cache pressure. Apples-to-apples
    // with the reference converter's 13.7k rec/s (92 cols / ~98 B records,
    // full materialization). Each measure() call is corpus-warm (warm-up
    // pass then timed pass); repeats expose environmental degradation.
    def decodeOnce(n: Int = 500000): Double =
      try DecodeBench.measure(spark, n)._2 catch { case _: Throwable => 0.0 }
    var decodeResweeps = 0
    def guardDecode(runs0: Seq[Double], n: Int): Seq[Double] = {
      // >3x spread across repeats = a contended measurement, not the
      // engine; replace the slowest SUCCESSFUL run (ok.min — a failed 0.0
      // run is not the contended one the spread check fired on), up to
      // twice (round-10: one replacement left r9's spread standing when
      // two runs of seven were contended), flagged in the artifact.
      var runs = runs0
      var tries = 0
      while (tries < 2 && {
        val ok = runs.filter(_ > 0); ok.nonEmpty && ok.max > 3 * ok.min
      }) {
        decodeResweeps += 1; tries += 1
        val ok = runs.filter(_ > 0)
        runs = runs.updated(runs.indexOf(ok.min), decodeOnce(n))
      }
      runs
    }
    // loadavg guard before any decode measurement (see awaitQuietBox):
    // wait up to 90 s for the box to quiet below half the core budget
    val loadAtDecode = awaitQuietBox(90, cpus.toDouble / 2)
    // 7 runs each (round-10, was 5), reported as the trimmed median (drop
    // best + worst, median of the middle 5): BENCH_r04's decode92_runs
    // spread 4.3x inside one artifact while the >3x guard only catches
    // outright failures — a stat robust to outliers beats a wider guard,
    // and at ~2-4 s per corpus-warm run the extra sweeps are cheap.
    val DecodeRuns = 7
    val decodeRuns = guardDecode((1 to DecodeRuns).map(_ => decodeOnce()), 500000)
    // second corpus scale: 4x the records — shows the number is not a
    // small-corpus cache artifact
    val decode2mRuns = guardDecode((1 to DecodeRuns).map(_ => decodeOnce(2000000)), 2000000)

    // Warm-up pass: JIT + codegen + parquet footer caches, so the timed
    // passes measure steady-state throughput rather than JVM start-up.
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // N timed sweeps; each query's p50/p90 over them. Each sweep also
    // records the process-CPU seconds it consumed (wall >> cpu/cores with
    // a high loadavg = an externally contended measurement).
    // Each query records (wall, harness-setup) — setup is the StreamMeter
    // delta across the invocation (0 for batch queries), so the artifact
    // can split Trigger.AvailableNow machinery from plan execution
    // (round 15, VERDICT-r14 #6).
    def sweep(): (Map[String, (Double, Double)], Double) = {
      val cpu0 = processCpuSec()
      val m = SparkEntry.queries.map { case (name, fn) =>
        val s0 = graft.streaming.StreamMeter.setupNanos
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
        val wall = (System.nanoTime() - t0) / 1e9
        val setup = (graft.streaming.StreamMeter.setupNanos - s0) / 1e9
        name -> (if (ok) (wall, math.min(setup, wall)) else (-1.0, -1.0))
      }
      val cpu1 = processCpuSec()
      (m, if (cpu0 < 0 || cpu1 < 0) -1.0 else cpu1 - cpu0)
    }
    var runsCpu: Seq[(Map[String, (Double, Double)], Double)] = (1 to NRuns).map(_ => sweep())
    def totals(rs: Seq[(Map[String, (Double, Double)], Double)]): Seq[Double] =
      rs.map(_._1.values.map(_._1).filter(_ >= 0).sum)
    // Contention guard: one sweep >3x the fastest is external load (the
    // engine does not get 3x slower between back-to-back identical runs);
    // re-run it once and record that the guard fired.
    var resweeps = 0
    // a sweep whose total is 0 means every query failed (e.g. transient
    // executor loss) — re-run IT, don't let it masquerade as "fastest"
    val dead = totals(runsCpu).indexWhere(_ <= 0)
    if (dead >= 0) { resweeps += 1; runsCpu = runsCpu.updated(dead, sweep()) }
    val ts = totals(runsCpu)
    val pos = ts.filter(_ > 0)
    if (pos.nonEmpty && ts.max > 3 * pos.min) {
      resweeps += 1
      runsCpu = runsCpu.updated(ts.indexOf(ts.max), sweep())
    }
    // INTER-RUN SPREAD GATE (round-13, VERDICT-r12 #2): the r12 artifact
    // passed the start-of-run load gate but runs 1–2 absorbed a MID-RUN
    // host burst (totals 168.6/148.0/134.0) — and because per-query
    // figures are p90-biased, the cross-round diff read 19 phantom
    // regressions off it. Spread is therefore a gated property of the
    // artifact, not telemetry: the slowest sweep is re-run until
    // max/min(totals_per_run) <= MaxSpread or the budget runs out, and
    // the line carries spread_ratio + spread_exceeded so round_gate.sh
    // rejects a still-bursty artifact as non-comparable instead of
    // shipping it into the diff chain.
    val MaxSpread = 1.15
    // Convergence budget 3 -> 6 (round 14): on a host with multi-minute
    // burst windows, three re-sweeps can ALL land inside one burst and
    // the artifact is rejected even though the box reaches baseline
    // speed between bursts (attempt totals 149.8/175.8/224.7 where the
    // same box's quiet-window sweeps read 149-152 s — the min MATCHED
    // the committed baseline). More tries = more chances at three
    // genuinely comparable sweeps; the 1.15 acceptance bar is unchanged
    // and the artifact still records every re-sweep in `resweeps`.
    var spreadTries = 0
    while (spreadTries < 6 && {
      val t = totals(runsCpu).filter(_ > 0)
      t.nonEmpty && t.max > MaxSpread * t.min
    }) {
      resweeps += 1
      spreadTries += 1
      val t = totals(runsCpu)
      runsCpu = runsCpu.updated(t.indexOf(t.max), sweep())
    }
    val tsAfter = totals(runsCpu).filter(_ > 0)
    val spreadRatio =
      if (tsAfter.isEmpty || tsAfter.min <= 0) -1.0 else tsAfter.max / tsAfter.min
    val spreadExceeded = spreadRatio > MaxSpread
    val runs: Seq[Map[String, Double]] = runsCpu.map(_._1.map { case (k, v) => k -> v._1 })
    val setupRuns: Seq[Map[String, Double]] = runsCpu.map(_._1.map { case (k, v) => k -> v._2 })
    val cpuPerRun: Seq[Double] = runsCpu.map(_._2)
    val names = SparkEntry.queries.keys.toSeq.sorted
    val perP50 = names.map { n =>
      val xs = runs.map(_(n))
      n -> (if (xs.exists(_ < 0)) -1.0 else p50(xs))
    }.toMap
    val perP90 = names.map { n =>
      val xs = runs.map(_(n))
      n -> (if (xs.exists(_ < 0)) -1.0 else xs.max)
    }.toMap
    val perSetup = names.map { n =>
      val xs = setupRuns.map(_(n))
      n -> (if (xs.exists(_ < 0)) -1.0 else p50(xs))
    }.toMap
    // p90 of per-run EXECUTION time (wall minus that run's own harness
    // setup) — pairing wall and setup within a run, not p90s across runs
    val perExecP90 = names.map { n =>
      val xs = runs.map(_(n)).zip(setupRuns.map(_(n))).map { case (w, s) => w - math.max(s, 0.0) }
      n -> (if (runs.map(_(n)).exists(_ < 0)) -1.0 else xs.max)
    }.toMap
    val totalsPerRun = totals(runsCpu)

    val total = perP50.values.filter(_ >= 0).sum
    // BASELINE.md's one comparable number: decode throughput. q_dbc_scan
    // decodes one record per `orders` row through zip->blast->DBF.
    val decodeRate = perP50.get("q_dbc_scan").filter(_ > 0).map { secs =>
      val n = try Tables.orders(spark, sfDir).count() catch { case _: Throwable => 0L }
      n / secs
    }.getOrElse(0.0)
    val env = s"""{"cpus":"$cpus","max_heap_mb":${Runtime.getRuntime.maxMemory() / (1024 * 1024)},"spark":"${spark.version}"}"""
    val loadEnd = loadavg1m()
    // Post-guard contention verdict: the artifact self-flags when the
    // measurements still disagree with themselves (decode repeats spread
    // >3x, or sweep totals spread >3x) or when the box was visibly busy
    // beyond this JVM's own threads at the start (loadavg ~> cores BEFORE
    // any Spark work — this process is the load afterwards).
    def spread3x(xs: Seq[Double]): Boolean = {
      val ok = xs.filter(_ > 0); ok.nonEmpty && ok.max > 3 * ok.min
    }
    val contended = spread3x(decodeRuns) || spread3x(decode2mRuns) ||
      spread3x(totalsPerRun) ||
      (loadStart > 0 && loadStart > cpus.toDouble)
    val line = renderLine(names, perP50, perP90, env, sfDir, total, decodeRate,
      decodeRuns, decode2mRuns, totalsPerRun, resweeps, decodeResweeps,
      loadavg = Seq(loadStart, loadAtDecode, loadEnd), cpuPerRun = cpuPerRun,
      contended = contended,
      spreadRatio = spreadRatio, spreadExceeded = spreadExceeded,
      perExecP90 = perExecP90, perSetup = perSetup)
    // Belt and braces: the full line also lands in the repo, immune to any
    // stdout tail capture. SPARK_GRAFT_BENCH_OUT names the file so a
    // round's full artifact can be COMMITTED as BENCH_LOCAL_r{N}.json
    // (round-9 verdict item 5: the driver's 2000-char tail amputates the
    // per-query map, and the default BENCH_LOCAL.json gets overwritten —
    // cross-round per-query regression diffs need a kept copy per round).
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println(line)
    spark.stop()
  }
}
