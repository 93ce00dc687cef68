package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression net for the bench artifact's tail-capture contract: the
  * driver keeps only the last ~2000 chars of Bench's stdout, and twice
  * now (round 3: p50 map ordered first; round 4: the named p50 map
  * outgrowing the budget) the primary measurement drifted outside the
  * capture as the query set grew. This spec renders the line with MORE
  * queries than the engine will plausibly have and asserts the primary
  * payload stays inside the tail. */
class BenchFormatSpec extends AnyFunSuite {

  private def render(n: Int): String = {
    // realistic name lengths (the longest real name is 22 chars)
    val names = (1 to n).map(i => f"q_dedup_jaccard_pref$i%03d").sorted
    val p50 = names.map(_ -> 3.141).toMap
    val p90 = names.map(_ -> 9.999).toMap
    Bench.renderLine(names, p50, p90,
      env = """{"cpus":"4","max_heap_mb":8192,"spark":"4.1.2"}""",
      sfDir = "/root/testdata/sf0.1", total = 57.3, decodeRate = 123456.0,
      decodeRuns = Seq(245931.0, 250000.0, 240000.0),
      decode2mRuns = Seq(318304.0, 320000.0),
      totalsPerRun = Seq(57.749, 53.19, 55.554), resweeps = 1, decodeResweeps = 0,
      loadavg = Seq(0.42, 31.7), cpuPerRun = Seq(801.2, 795.0, 799.9),
      contended = false)
  }

  test("primary payload survives a 2000-char tail capture even at 250 queries") {
    for (n <- Seq(116, 250)) {
      val line = render(n)
      val tail = line.takeRight(2000)
      // everything from the decode figures onward must be inside the tail
      assert(tail.contains("\"decode_rec_per_s\""), s"n=$n: decode figures truncated")
      assert(tail.contains("\"totals_per_run\":[57.749,53.19,55.554]"))
      assert(tail.contains("\"resweeps\":1"))
      // round-13 spread gate: the non-comparable flag must survive the
      // tail capture or round_gate.sh cannot reject a bursty artifact
      assert(tail.contains("\"spread_ratio\":-1.0"))
      assert(tail.contains("\"spread_exceeded\":false"))
      // round-7 contention telemetry must also survive the tail capture
      assert(tail.contains("\"loadavg\":[0.42,31.7]"))
      assert(tail.contains("\"cpu_per_run\":[801.2,795.0,799.9]"))
      assert(tail.contains("\"contended\":false"))
      assert(tail.contains("\"names_sha\":\""), s"n=$n: names digest truncated")
      assert(tail.contains(s"\"n_queries\":$n"))
      assert(tail.contains("\"queries_ms_arr\":["), s"n=$n: p50 array truncated")
      // and the array itself is complete (line ends with it)
      assert(line.endsWith("]}"))
      assert(line.count(_ == '{') == line.count(_ == '}'), "unbalanced JSON")
    }
  }

  test("the positional p50 array re-keys exactly against the sorted names") {
    val line = render(5)
    // values are int-ms of 3.141 s = 3141 for every query
    assert(line.contains("\"queries_ms_arr\":[3141,3141,3141,3141,3141]}"))
  }

  test("names digest is order-sensitive and validates a positional re-key") {
    val names = Seq("q_a", "q_b", "q_c")
    val d = Bench.namesDigest(names)
    assert(d.length == 12 && d.matches("[0-9a-f]{12}"))
    assert(Bench.namesDigest(names) == d, "digest must be deterministic")
    assert(Bench.namesDigest(names.reverse) != d, "reorder must mismatch")
    assert(Bench.namesDigest(names.updated(1, "q_b2")) != d, "rename must mismatch")
  }

  test("decode figures report the trimmed median, with max as a secondary stat") {
    val line = render(5)
    // decodeRuns [245931, 250000, 240000] -> median 245931 (< 5 runs: no trim)
    assert(line.contains("\"decode92_rec_per_s\":245931"))
    // 2M probe: median reported as the headline, max as a separate field
    assert(line.contains("\"decode92_2m_rec_per_s\":319152") ||
      line.contains("\"decode92_2m_rec_per_s\":320000"))
    assert(line.contains("\"decode92_2m_max\":320000"))
    // trimmed median drops exactly one best + one worst at >=5 runs, and
    // failed (0.0) runs never count
    assert(Bench.trimmedP50(Seq(100.0, 0.0, 900.0, 300.0, 310.0, 320.0, 305.0)) == 310.0)
    assert(Bench.trimmedP50(Seq(0.0, 0.0)) == 0.0)
  }
}
