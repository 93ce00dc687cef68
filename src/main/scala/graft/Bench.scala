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
  private[graft] def renderLine(names: Seq[String],
      perP50: Map[String, Double], perP90: Map[String, Double],
      env: String, sfDir: String, total: Double, decodeRate: Double,
      decodeRuns: Seq[Double], decode2mRuns: Seq[Double],
      totalsPerRun: Seq[Double], resweeps: Int, decodeResweeps: Int): String = {
    def r3(x: Double): Double = math.rint(x * 1000) / 1000
    def jmap(m: Map[String, Double]): String =
      names.map(n => s"\"" + n + "\":" + r3(m(n))).mkString("{", ",", "}")
    val qMs = names.map(n => s"\"" + n + "\":" +
      (if (perP50(n) < 0) -1 else math.rint(perP50(n) * 1000).toLong))
      .mkString("{", ",", "}")
    val qMsArr = names.map(n =>
      if (perP50(n) < 0) -1L else math.rint(perP50(n) * 1000).toLong)
      .mkString("[", ",", "]")
    s"""{"metric":"total","value":$total,"unit":"sec","n_runs":$NRuns,"sf":"$sfDir","env":$env,"queries_p90":${jmap(perP90)},"queries":${jmap(perP50)},"queries_ms":$qMs,"decode_rec_per_s":${decodeRate.round},"decode92_rec_per_s":${trimmedP50(decodeRuns).round},"decode92_runs":[${decodeRuns.map(_.round).mkString(",")}],"decode92_2m_rec_per_s":${trimmedP50(decode2mRuns).round},"decode92_2m_max":${decode2mRuns.max.round},"decode92_2m_runs":[${decode2mRuns.map(_.round).mkString(",")}],"totals_per_run":[${totalsPerRun.map(r3).mkString(",")}],"resweeps":$resweeps,"decode_resweeps":$decodeResweeps,"queries_ms_arr":$qMsArr}"""
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Decode-throughput probes FIRST: measured after the query sweep they
    // read ~2x low from accumulated heap/cache pressure. Apples-to-apples
    // with the reference converter's 13.7k rec/s (92 cols / ~98 B records,
    // full materialization). Each measure() call is corpus-warm (warm-up
    // pass then timed pass); repeats expose environmental degradation.
    def decodeOnce(n: Int = 500000): Double =
      try DecodeBench.measure(spark, n)._2 catch { case _: Throwable => 0.0 }
    var decodeResweeps = 0
    def guardDecode(runs: Seq[Double], n: Int): Seq[Double] = {
      // >3x spread across repeats = a contended measurement, not the
      // engine; one replacement of the worst run, flagged in the artifact.
      // The replacement targets the slowest SUCCESSFUL run (ok.min) — a
      // failed 0.0 run is not the contended one the spread check fired on.
      val ok = runs.filter(_ > 0)
      if (ok.isEmpty || ok.max <= 3 * ok.min) runs
      else {
        decodeResweeps += 1
        runs.updated(runs.indexOf(ok.min), decodeOnce(n))
      }
    }
    // 5 runs each, reported as the trimmed median (drop best + worst,
    // median of the middle 3): BENCH_r04's decode92_runs spread 4.3x
    // inside one artifact while the >3x guard only catches outright
    // failures — a stat robust to one outlier beats a wider guard.
    val DecodeRuns = 5
    val decodeRuns = guardDecode((1 to DecodeRuns).map(_ => decodeOnce()), 500000)
    // second corpus scale: 4x the records — shows the number is not a
    // small-corpus cache artifact
    val decode2mRuns = guardDecode((1 to DecodeRuns).map(_ => decodeOnce(2000000)), 2000000)

    // Warm-up pass: JIT + codegen + parquet footer caches, so the timed
    // passes measure steady-state throughput rather than JVM start-up.
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // N timed sweeps; each query's p50/p90 over them.
    def sweep(): Map[String, Double] =
      SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
    var runs: Seq[Map[String, Double]] = (1 to NRuns).map(_ => sweep())
    def totals(rs: Seq[Map[String, Double]]): Seq[Double] =
      rs.map(_.values.filter(_ >= 0).sum)
    // Contention guard: one sweep >3x the fastest is external load (the
    // engine does not get 3x slower between back-to-back identical runs);
    // re-run it once and record that the guard fired.
    var resweeps = 0
    // a sweep whose total is 0 means every query failed (e.g. transient
    // executor loss) — re-run IT, don't let it masquerade as "fastest"
    val dead = totals(runs).indexWhere(_ <= 0)
    if (dead >= 0) { resweeps += 1; runs = runs.updated(dead, sweep()) }
    val ts = totals(runs)
    val pos = ts.filter(_ > 0)
    if (pos.nonEmpty && ts.max > 3 * pos.min) {
      resweeps += 1
      runs = runs.updated(ts.indexOf(ts.max), sweep())
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
    val perP50 = names.map { n =>
      val xs = runs.map(_(n))
      n -> (if (xs.exists(_ < 0)) -1.0 else p50(xs))
    }.toMap
    val perP90 = names.map { n =>
      val xs = runs.map(_(n))
      n -> (if (xs.exists(_ < 0)) -1.0 else xs.max)
    }.toMap
    val totalsPerRun = totals(runs)

    val total = perP50.values.filter(_ >= 0).sum
    // BASELINE.md's one comparable number: decode throughput. q_dbc_scan
    // decodes one record per `orders` row through zip->blast->DBF.
    val decodeRate = perP50.get("q_dbc_scan").filter(_ > 0).map { secs =>
      val n = try Tables.orders(spark, sfDir).count() catch { case _: Throwable => 0L }
      n / secs
    }.getOrElse(0.0)
    val env = s"""{"cpus":"$cpus","max_heap_mb":${Runtime.getRuntime.maxMemory() / (1024 * 1024)},"spark":"${spark.version}"}"""
    val line = renderLine(names, perP50, perP90, env, sfDir, total, decodeRate,
      decodeRuns, decode2mRuns, totalsPerRun, resweeps, decodeResweeps)
    // Belt and braces: the full line also lands in the repo, immune to any
    // stdout tail capture.
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LOCAL.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println(line)
    spark.stop()
  }
}
