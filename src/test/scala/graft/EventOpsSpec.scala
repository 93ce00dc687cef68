package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the late-round event/time-series operators —
  * properties the oracle hash can't state directly (contiguity,
  * non-overlap, flag consistency). */
class EventOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("gap-fill series is contiguous per type and flags exactly the zero rows") {
    val rows = SparkEntry.queries("q_ev_gapfill")(spark, sf)
      .select("event_type", "hour_s", "n", "is_gap").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, n, isGap) =>
      assert((n == 0) == (isGap == 1), "is_gap must mark exactly the zero-filled rows")
    }
    rows.groupBy(_._1).foreach { case (et, rs) =>
      val hours = rs.map(_._2).sorted
      assert(hours.zip(hours.tail).forall { case (a, b) => b - a == 3600 },
        s"$et: series not hourly-contiguous")
      // the endpoints are real observations by construction
      val byHour = rs.map(r => r._2 -> r._3).toMap
      assert(byHour(hours.head) > 0 && byHour(hours.last) > 0)
    }
  }

  test("SCD2 intervals are non-overlapping, chained, with exactly one open row per user") {
    val rows = SparkEntry.queries("q_ev_scd2")(spark, sf)
      .select("user_id", "version", "valid_from_s", "valid_to_s", "is_current").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_._2) // by version
      assert(sorted.count(_._5 == 1L) == 1, s"user $u: not exactly one open interval")
      assert(sorted.last._4 == -1L && sorted.last._5 == 1L,
        s"user $u: the open interval must be the last version")
      sorted.zip(sorted.tail).foreach { case (cur, next) =>
        assert(cur._4 == next._3,
          s"user $u: interval chain broken (${cur._4} != ${next._3})")
      }
    }
  }

  test("full-join reconciliation: presence flags consistent, no phantom days") {
    val rows = SparkEntry.queries("q_full_join")(spark, sf)
      .select("n_orders", "n_ships", "had_orders", "had_ships").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (no, ns, ho, hs) =>
      assert((no > 0) == (ho == 1) && (ns > 0) == (hs == 1))
      assert(ho == 1 || hs == 1, "a row must come from at least one side")
    }
    // both asymmetric tails genuinely exercised
    assert(rows.exists(r => r._3 == 1 && r._4 == 0), "no orders-only day")
    assert(rows.exists(r => r._3 == 0 && r._4 == 1), "no ships-only day")
  }

  test("containment pairs are >= 0.9 by construction and directional") {
    val rows = SparkEntry.queries("q_dedup_contain")(spark, sf)
      .select("doc_a", "doc_b", "n_a", "i", "containment_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, nA, i, ppm) =>
      assert(a != b && i <= nA)
      assert(ppm >= 900000L && ppm <= 1000000L, s"($a,$b): ppm $ppm out of band")
      assert(ppm == (i * 1000000L) / nA)
    }
    // directional: (a contained in b) does not force (b contained in a)
    val set = rows.map(r => (r._1, r._2)).toSet
    assert(set.size == rows.length, "duplicate directional pairs")
  }

  test("rolling burst peaks bound the hourly aggregation from above") {
    // the trailing-3600s peak count per user can never be smaller than
    // the user's busiest CALENDAR hour (every calendar hour is contained
    // in some trailing window)
    import org.apache.spark.sql.functions._
    val peak = SparkEntry.queries("q_ev_rolling")(spark, sf)
      .select("user_id", "peak_1h_n").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val busiest = Tables.events(spark, sf)
      .groupBy(col("user_id"), expr("CAST(ts AS LONG) DIV 3600").as("h"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id")).agg(max(col("n")).as("m")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(busiest.nonEmpty)
    busiest.foreach { case (u, m) =>
      assert(peak.getOrElse(u, 0L) >= m, s"user $u: peak ${peak.get(u)} < calendar-hour max $m")
    }
  }
}
