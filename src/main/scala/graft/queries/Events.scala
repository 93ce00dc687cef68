package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-stream analytics over the `events` table: the batch shapes of the
  * reference's streaming concerns (SURVEY §2.7) — windowed aggregation,
  * sessionization, JSON payload extraction. The Structured Streaming
  * equivalents live in graft.streaming; these batch forms are what the
  * DuckDB oracle can check.
  */
object Events {

  /** Exact cents of a 2-decimal double column (see Relational's gate
    * convention: outputs are BIGINT fixed-point, never DECIMAL/DOUBLE). */
  private def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")

  /** Tumbling 1-hour windowed aggregation (A1-flavor at event-time). */
  def qEvHourly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
           sum(cents($"value")).as("total_value_c"),
           countDistinct($"user_id").as("n_users"))
      .select($"window.start".as("hour_ts"), $"event_type", $"n", $"total_value_c", $"n_users")
  }

  val qEvHourlySql: String =
    """SELECT time_bucket(INTERVAL 1 HOUR, ts) AS hour_ts, event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_value_c,
      |  count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1, 2""".stripMargin

  /** MERGEABLE HISTOGRAM-QUANTILE SKETCH — the scale path for
    * percentiles that [[graft.queries.Relational]]'s exact
    * `q_percentile` cannot take at 100 TB: an exact global percentile
    * needs a whole-relation sort (the fourth PlanHygieneSpec
    * scale-killer class), while a fixed-bin histogram is ONE map-side-
    * combinable aggregate with O(|bins|) state per task — the same
    * mergeability contract as the KMV sketches (union state, then
    * resolve), so per-shard histograms roll up to the corpus histogram
    * by addition. Estimates are the lower edge of the first bin whose
    * cumulative count crosses ceil(q·n) — deterministic integers, so
    * the sketch itself gates hash-exact cross-engine (no float, no
    * tolerance). The cumulative window runs over the bin GRID
    * (value-domain bounded: cents DIV 100, ≈560 cells at any corpus
    * size — the recognized histogram-under-window pattern). Error bound
    * is half a bin width by construction ($1 here), the classic
    * fixed-width-histogram guarantee. */
  def qHistQuantile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hist = Tables.events(s, dir)
      .select(expr("CAST(round(value * 100) AS LONG) DIV 100").as("bin"))
      .groupBy($"bin").agg(count(lit(1)).as("c"))
    val w = Window.orderBy($"bin".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = hist.agg(sum($"c").as("n_total"))
    hist.withColumn("cum", sum($"c").over(w))
      .crossJoin(broadcast(tot)) // 1-row global agg: bounded forever
      .agg(
        min(when($"cum" * 100 >= $"n_total" * 50, $"bin")).as("b50"),
        min(when($"cum" * 100 >= $"n_total" * 90, $"bin")).as("b90"),
        min(when($"cum" * 100 >= $"n_total" * 99, $"bin")).as("b99"),
        max($"n_total").as("n_total"))
      .selectExpr("stack(3, 50L, b50, 90L, b90, 99L, b99) AS (q_pct, bin)", "n_total")
      .select($"q_pct", ($"bin" * 100).as("est_lo_c"), $"n_total")
  }

  val qHistQuantileSql: String =
    """WITH h AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) // 100 AS bin, count(*) AS c
      |  FROM events GROUP BY 1),
      |t AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM h),
      |cum AS (
      |  SELECT bin, CAST(sum(c) OVER (ORDER BY bin ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM h),
      |sel AS (
      |  SELECT
      |    min(CASE WHEN cum * 100 >= 50 * n_total THEN bin END) AS b50,
      |    min(CASE WHEN cum * 100 >= 90 * n_total THEN bin END) AS b90,
      |    min(CASE WHEN cum * 100 >= 99 * n_total THEN bin END) AS b99,
      |    max(n_total) AS n_total
      |  FROM cum, t)
      |SELECT CAST(u.r.q_pct AS BIGINT) AS q_pct,
      |  CAST(u.r.b AS BIGINT) * 100 AS est_lo_c, n_total
      |FROM sel, unnest([{'q_pct': 50, 'b': b50}, {'q_pct': 90, 'b': b90},
      |                  {'q_pct': 99, 'b': b99}]) u(r)""".stripMargin

  /** GROUP-WISE histogram quantiles — [[qHistQuantile]]'s per-key form,
    * over document LENGTH per source: the p50/p90/p99 length card every
    * corpus report carries (truncation-threshold and packing-bin sizing
    * read straight off it). Same sketch contract: per (source, bin)
    * counts from one combinable aggregate, cumulative selection over the
    * per-source bin grid (window partitioned by `source` whose input is
    * the (source, bin) histogram — per-partition row count is |bins|,
    * corpus-independent, the recognized bounded shape). 100-char bins. */
  def qHistQuantileSrc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hist = Tables.documents(s, dir)
      .select($"source", expr("n_chars DIV 100").as("bin"))
      .groupBy($"source", $"bin").agg(count(lit(1)).as("c"))
    val wc = Window.partitionBy($"source").orderBy($"bin".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy($"source")
    hist.withColumn("cum", sum($"c").over(wc))
      .withColumn("n_total", sum($"c").over(wt))
      .groupBy($"source").agg(
        min(when($"cum" * 100 >= $"n_total" * 50, $"bin")).as("b50"),
        min(when($"cum" * 100 >= $"n_total" * 90, $"bin")).as("b90"),
        min(when($"cum" * 100 >= $"n_total" * 99, $"bin")).as("b99"),
        max($"n_total").as("n_docs"))
      .selectExpr("source",
        "stack(3, 50L, b50, 90L, b90, 99L, b99) AS (q_pct, bin)", "n_docs")
      .select($"source", $"q_pct", ($"bin" * 100).as("est_lo_chars"), $"n_docs")
  }

  val qHistQuantileSrcSql: String =
    """WITH h AS (
      |  SELECT source, n_chars // 100 AS bin, count(*) AS c
      |  FROM documents GROUP BY 1, 2),
      |cum AS (
      |  SELECT source, bin,
      |    CAST(sum(c) OVER (PARTITION BY source ORDER BY bin ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |    CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n_total
      |  FROM h),
      |sel AS (
      |  SELECT source,
      |    min(CASE WHEN cum * 100 >= 50 * n_total THEN bin END) AS b50,
      |    min(CASE WHEN cum * 100 >= 90 * n_total THEN bin END) AS b90,
      |    min(CASE WHEN cum * 100 >= 99 * n_total THEN bin END) AS b99,
      |    max(n_total) AS n_docs
      |  FROM cum GROUP BY 1)
      |SELECT source, CAST(u.r.q_pct AS BIGINT) AS q_pct,
      |  CAST(u.r.b AS BIGINT) * 100 AS est_lo_chars, n_docs
      |FROM sel, unnest([{'q_pct': 50, 'b': b50}, {'q_pct': 90, 'b': b90},
      |                  {'q_pct': 99, 'b': b99}]) u(r)""".stripMargin

  /** Sessionization: a session breaks after a >30-min silence per user.
    * Second-granularity gap (floor-of-epoch on both engines) keeps the
    * boundary deterministic. Windows shuffle once on user_id; the
    * aggregation reuses that partitioning. */
  def qEvSession(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("prev_s", lag($"ts".cast("long"), 1).over(byUser))
      .withColumn("is_new",
        when($"prev_s".isNull || $"ts".cast("long") - $"prev_s" > 1800L, 1L).otherwise(0L))
      .withColumn("session_idx", sum($"is_new").over(run))
      .groupBy($"user_id", $"session_idx")
      .agg(min($"ts".cast("long")).as("session_start_s"),
           count(lit(1)).as("n_events"),
           sum(cents($"value")).as("total_value_c"))
  }

  val qEvSessionSql: String =
    """WITH ordered AS (
      |  SELECT user_id, event_id, ts, value,
      |    epoch_us(ts) // 1000000 AS sec,
      |    lag(epoch_us(ts) // 1000000) OVER w AS prev_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
      |flagged AS (
      |  SELECT *, CASE WHEN prev_s IS NULL OR sec - prev_s > 1800 THEN 1 ELSE 0 END AS is_new
      |  FROM ordered),
      |sessions AS (
      |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
      |  FROM flagged)
      |SELECT user_id, session_idx, min(sec) AS session_start_s,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_value_c
      |FROM sessions GROUP BY 1, 2""".stripMargin

  /** JSON payload extraction + aggregation (SURVEY §2.6 from_json surface). */
  def qEvJson(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
           sum($"k").as("sum_k"),
           max($"k").as("max_k"),
           countDistinct($"user_id").as("n_users"))
  }

  val qEvJsonSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
      |  count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY event_type""".stripMargin

  /** Event funnel: per user, did view precede click precede purchase
    * (first-timestamp ordering)? Conditional agg + self-measure without
    * self-joins — one shuffle on user_id. */
  def qEvFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val firsts = Tables.events(s, dir)
      .groupBy($"user_id")
      .agg(min(when($"event_type" === "view", $"ts")).as("t_view"),
           min(when($"event_type" === "click", $"ts")).as("t_click"),
           min(when($"event_type" === "purchase", $"ts")).as("t_purchase"))
    firsts.agg(
      count(lit(1)).as("n_users"),
      sum(when($"t_view".isNotNull, 1L).otherwise(0L)).as("n_view"),
      sum(when($"t_view" < $"t_click", 1L).otherwise(0L)).as("n_view_click"),
      sum(when($"t_view" < $"t_click" && $"t_click" < $"t_purchase", 1L).otherwise(0L))
        .as("n_full_funnel"))
  }

  /** CONVERSION LATENCY — how long each funnel transition takes, not
    * just whether it happens ([[qEvFunnel]] counts): per converting
    * user the first-view→first-click and first-click→first-purchase
    * gaps in floored epoch seconds, reduced to EXACT median and p90
    * order statistics via the value-histogram rank-selection pattern
    * (ranks (n+1) DIV 2 and (n·90+99) DIV 100, selection by value). The
    * product-latency number funnels are actually tuned on. Scale shape:
    * one user-keyed first-occurrence aggregate, two gap histograms
    * bounded by the value domain (seconds), 1-row output — no per-user
    * window anywhere. */
  def qEvFunnelLatency(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val firsts = Tables.events(s, dir)
      .groupBy($"user_id")
      .agg(min(when($"event_type" === "view", $"ts".cast("long"))).as("tv"),
           min(when($"event_type" === "click", $"ts".cast("long"))).as("tc"),
           min(when($"event_type" === "purchase", $"ts".cast("long"))).as("tp"))
    def stats(gap: org.apache.spark.sql.Column, pfx: String) = {
      val hist = firsts.filter(gap.isNotNull && gap >= 0L)
        .select(gap.as("g")).groupBy($"g").agg(count(lit(1)).as("cnt"))
        .withColumn("hi_rk", sum($"cnt").over(Window.orderBy($"g".asc)))
        .withColumn("lo_rk", $"hi_rk" - $"cnt" + 1L)
      hist.crossJoin(broadcast(hist.agg(sum($"cnt").as("n"))))
        .withColumn("r_med", expr("(n + 1) DIV 2"))
        .withColumn("r_p90", expr("(n * 90 + 99) DIV 100"))
        .agg(max($"n").as(s"n_$pfx"),
          max(when($"lo_rk" <= $"r_med" && $"r_med" <= $"hi_rk", $"g"))
            .as(s"med_${pfx}_s"),
          max(when($"lo_rk" <= $"r_p90" && $"r_p90" <= $"hi_rk", $"g"))
            .as(s"p90_${pfx}_s"))
    }
    stats($"tc" - $"tv", "vc").crossJoin(stats($"tp" - $"tc", "cp"))
  }

  val qEvFunnelLatencySql: String =
    """WITH firsts AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) // 1000000 END) AS tv,
      |    min(CASE WHEN event_type = 'click' THEN epoch_us(ts) // 1000000 END) AS tc,
      |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) // 1000000 END) AS tp
      |  FROM events GROUP BY user_id),
      |gv AS (SELECT tc - tv AS g FROM firsts
      |       WHERE tc IS NOT NULL AND tv IS NOT NULL AND tc - tv >= 0),
      |gp AS (SELECT tp - tc AS g FROM firsts
      |       WHERE tp IS NOT NULL AND tc IS NOT NULL AND tp - tc >= 0),
      |hv AS (
      |  SELECT g, count(*) AS cnt,
      |    CAST(sum(count(*)) OVER (ORDER BY g) AS BIGINT) AS hi_rk
      |  FROM gv GROUP BY g),
      |hp AS (
      |  SELECT g, count(*) AS cnt,
      |    CAST(sum(count(*)) OVER (ORDER BY g) AS BIGINT) AS hi_rk
      |  FROM gp GROUP BY g),
      |sv AS (
      |  SELECT max(n) AS n_vc,
      |    max(CASE WHEN hi_rk - cnt + 1 <= (n + 1) // 2 AND (n + 1) // 2 <= hi_rk
      |        THEN g END) AS med_vc_s,
      |    max(CASE WHEN hi_rk - cnt + 1 <= (n * 90 + 99) // 100
      |         AND (n * 90 + 99) // 100 <= hi_rk THEN g END) AS p90_vc_s
      |  FROM hv CROSS JOIN (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM hv)),
      |sp AS (
      |  SELECT max(n) AS n_cp,
      |    max(CASE WHEN hi_rk - cnt + 1 <= (n + 1) // 2 AND (n + 1) // 2 <= hi_rk
      |        THEN g END) AS med_cp_s,
      |    max(CASE WHEN hi_rk - cnt + 1 <= (n * 90 + 99) // 100
      |         AND (n * 90 + 99) // 100 <= hi_rk THEN g END) AS p90_cp_s
      |  FROM hp CROSS JOIN (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM hp))
      |SELECT n_vc, med_vc_s, p90_vc_s, n_cp, med_cp_s, p90_cp_s
      |FROM sv CROSS JOIN sp""".stripMargin

  val qEvFunnelSql: String =
    """WITH firsts AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
      |    min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
      |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      |  FROM events GROUP BY user_id)
      |SELECT count(*) AS n_users,
      |  CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
      |  CAST(sum(CASE WHEN t_view < t_click THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
      |  CAST(sum(CASE WHEN t_view < t_click AND t_click < t_purchase THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
      |FROM firsts""".stripMargin

  /** As-of join: each purchase matched to the user's most recent prior (or
    * simultaneous) view — graft.operators.AsOfJoin (union trick, one
    * shuffle) vs DuckDB's native ASOF JOIN as the oracle. Output uses
    * floored epoch seconds (engine-neutral timestamp precision). */
  def qEvAsof(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id", cents($"value").as("purchase_value_c"))
    // unique per (user_id, ts): keep the highest event_id
    val viewW = Window.partitionBy($"user_id", $"ts").orderBy($"view_id".desc)
    val views = ev.filter($"event_type" === "view")
      .select($"user_id", $"ts", $"event_id".as("view_id"))
      .withColumn("rn", row_number().over(viewW)).filter($"rn" === 1).drop("rn")
    graft.operators.AsOfJoin.joinAsOf(
        purchases, views, keys = Seq("user_id"),
        leftTs = "ts", rightTs = "ts", payload = Seq("view_id" -> "view_id"))
      .select($"user_id", $"event_id", $"ts".cast("long").as("purchase_s"),
        $"purchase_value_c",
        // -1 encodes "no prior view": non-null BIGINT end to end (the
        // operator's null semantics stay spec'd in AsOfJoinSpec)
        coalesce($"view_id", lit(-1L)).as("view_id"))
  }

  val qEvAsofSql: String =
    """WITH v AS (
      |  SELECT user_id, ts, event_id AS view_id FROM events
      |  WHERE event_type = 'view'
      |  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1),
      |p AS (
      |  SELECT user_id, ts, event_id, CAST(round(value * 100) AS BIGINT) AS purchase_value_c
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.user_id, p.event_id, epoch_us(p.ts) // 1000000 AS purchase_s,
      |  p.purchase_value_c, coalesce(v.view_id, -1) AS view_id
      |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts""".stripMargin

  /** Cohort retention: users bucketed by first-activity week (cohort),
    * counted per subsequent active week — the classic retention triangle,
    * all integer arithmetic (epoch-week buckets). */
  def qEvRetention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val weekly = Tables.events(s, dir)
      .select($"user_id", expr("CAST(ts AS LONG) div 604800").as("week"))
      .distinct()
    val cohorts = weekly.groupBy($"user_id").agg(min($"week").as("cohort_week"))
    weekly.join(cohorts, "user_id")
      .groupBy($"cohort_week", ($"week" - $"cohort_week").as("weeks_since"))
      .agg(countDistinct($"user_id").as("n_users"))
  }

  val qEvRetentionSql: String =
    """WITH weekly AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 1000000 // 604800 AS week FROM events),
      |cohorts AS (SELECT user_id, min(week) AS cohort_week FROM weekly GROUP BY 1)
      |SELECT c.cohort_week, w.week - c.cohort_week AS weeks_since,
      |  count(DISTINCT w.user_id) AS n_users
      |FROM weekly w JOIN cohorts c USING (user_id)
      |GROUP BY 1, 2""".stripMargin

  /** Hourly-volume anomaly detection per event type — 3-sigma outliers in
    * EXACT integer arithmetic: |n − μ| > 3σ multiplied through by N²
    * becomes (n·N − S)² > 9·(N·SS − S²) over raw moments
    * (N hours, S = Σn, SS = Σn²), so no float mean or variance ever
    * exists and the flag hash-gates cross-engine. Two shuffles (hourly
    * rollup, per-type moments) + a broadcast moments join — linear.
    * At web-scale counts, rescale n (DIV k) before the test or lift the
    * comparison to DECIMAL(38,0): the decision is invariant under common
    * rescaling up to rounding. */
  /** CHANGEPOINT (level-shift) detection per event type — exact binary
    * segmentation over the hourly series: for every candidate split
    * hour t, the gap between the mean hourly rate BEFORE (≤ t) and
    * AFTER (> t), from prefix sums, in exact integer x100; the reported
    * changepoint is the argmax gap (earliest hour on ties). The
    * monitoring primitive behind "did this stream's level shift, and
    * when" — deployment regressions, upstream outages, traffic
    * migrations. Scale shape: the corpus-scale work is ONE (event_type,
    * hour) aggregate; the cumulative window runs over the HOURLY series
    * (time-domain-bounded, the recognized histogram-under-window
    * pattern), and the argmax is a |event_type|-row rollup. */
  def qEvChangepoint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hourly = Tables.events(s, dir)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("hour_ts"), $"event_type", $"n")
    val w = Window.partitionBy($"event_type").orderBy($"hour_ts".asc)
    val cum = hourly
      .withColumn("cum", sum($"n").over(w))
      .withColumn("idx", row_number().over(w).cast("long"))
    val tot = hourly.groupBy($"event_type")
      .agg(count(lit(1)).as("nh"), sum($"n").as("tot"))
    val gaps = cum.join(tot, "event_type")
      .filter($"idx" < $"nh")
      // the filter already excludes idx == nh; the CASE only shields the
      // divisor from speculative evaluation under ANSI mode
      .select($"event_type", $"hour_ts", $"nh",
        abs(expr("(cum * 100L) DIV idx")
          - expr("((tot - cum) * 100L) DIV (CASE WHEN nh > idx THEN nh - idx ELSE 1L END)")).as("gap_x100"))
    gaps.groupBy($"event_type").agg(max($"gap_x100").as("max_gap_x100"))
      .join(gaps, Seq("event_type"))
      .filter($"gap_x100" === $"max_gap_x100")
      .groupBy($"event_type")
      .agg(max($"nh").as("n_hours"), max($"max_gap_x100").as("gap_x100"),
        min($"hour_ts").as("cp_hour"))
  }

  val qEvChangepointSql: String =
    """WITH hourly AS (
      |  SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts) AS hour_ts,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |cum AS (
      |  SELECT event_type, hour_ts, n,
      |    CAST(sum(n) OVER (PARTITION BY event_type ORDER BY hour_ts) AS BIGINT) AS cum,
      |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY hour_ts) AS BIGINT) AS idx
      |  FROM hourly),
      |tot AS (
      |  SELECT event_type, count(*) AS nh, CAST(sum(n) AS BIGINT) AS tot
      |  FROM hourly GROUP BY 1),
      |gaps AS (
      |  SELECT cum.event_type AS event_type, hour_ts, tot.nh,
      |    abs((cum * 100) // idx - ((tot - cum) * 100) // (nh - idx)) AS gap_x100
      |  FROM cum JOIN tot ON cum.event_type = tot.event_type
      |  WHERE idx < nh),
      |mx AS (SELECT event_type, max(gap_x100) AS max_gap FROM gaps GROUP BY 1)
      |SELECT gaps.event_type AS event_type, max(nh) AS n_hours,
      |  max(max_gap) AS gap_x100, min(hour_ts) AS cp_hour
      |FROM gaps JOIN mx ON gaps.event_type = mx.event_type
      |  AND gaps.gap_x100 = mx.max_gap
      |GROUP BY 1""".stripMargin

  /** ROLLING DISTINCT USERS from daily sketch merges — WAU-style 7-day
    * distinct counts where each day keeps only a K=256 KMV sketch of its
    * user-id hashes (built by the bounded
    * [[graft.functions.MinKDistinctAggregator]]) and a window's count is
    * estimated by merging seven daily sketches and re-trimming —
    * [[graft.queries.TextAnalysis.qKmvOverlap]]'s algebra on the time
    * axis. THE scale pattern for sliding distinct counts: exact rolling
    * distincts re-shuffle every event per window position, while sketch
    * state is |days|·K forever (and the merge relation |days|·7·K); the
    * exact daily distinct rides along for reference. Unsaturated days
    * (< K users) are exact by the estimator's fallback branch. */
  def qEvRollingUsers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.TextFunctions.hash60
    val K = 256
    val minK = new graft.functions.MinKDistinctAggregator(K).toColumn
    val daily = Tables.events(s, dir)
      .select(date_trunc("day", $"ts").as("day"),
        hash60($"user_id".cast("string")).as("h"))
      .as[(java.sql.Timestamp, Long)].groupByKey(_._1).mapValues(_._2)
      .agg(minK.name("ks")).toDF("day", "ks")
    val merged = daily.select($"day")
      .join(daily.select($"day".as("day2"), $"ks"),
        $"day2".between($"day" - expr("INTERVAL 6 DAYS"), $"day"))
      .select($"day", explode($"ks").as("h")).distinct()
      .withColumn("rk", row_number().over(
        Window.partitionBy($"day").orderBy($"h".asc)).cast("long"))
      .filter($"rk" <= K)
    val est = merged.groupBy($"day")
      .agg(max($"h").as("h_k"), count(lit(1)).as("k_eff"))
      .select($"day",
        when($"k_eff" < K, $"k_eff")
          .otherwise(round(lit(255.0) * lit(1.152921504606846976e18) /
            $"h_k".cast("double")).cast("long"))
          .cast("long").as("est_users_7d"))
    val exact1d = Tables.events(s, dir)
      .groupBy(date_trunc("day", $"ts").as("day"))
      .agg(countDistinct($"user_id").as("n_users_1d"))
    est.join(exact1d, "day").select($"day", $"n_users_1d", $"est_users_7d")
  }

  val qEvRollingUsersSql: String =
    """WITH h AS (
      |  SELECT date_trunc('day', ts) AS day,
      |    ('0x' || substr(md5(user_id::VARCHAR), 18, 15))::BIGINT AS h
      |  FROM events),
      |dh AS (SELECT DISTINCT day, h FROM h),
      |sk AS (
      |  SELECT day, h FROM (
      |    SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rk
      |    FROM dh) WHERE rk <= 256),
      |m AS (
      |  SELECT DISTINCT d.day AS day, s.h
      |  FROM (SELECT DISTINCT day FROM sk) d
      |    JOIN sk s ON s.day BETWEEN d.day - INTERVAL 6 DAY AND d.day),
      |mk AS (
      |  SELECT day, h FROM (
      |    SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rk
      |    FROM m) WHERE rk <= 256),
      |est AS (
      |  SELECT day,
      |    CAST(CASE WHEN count(*) < 256 THEN count(*)
      |      ELSE CAST(round(255.0 * 1.152921504606846976e18 / max(h)) AS BIGINT)
      |    END AS BIGINT) AS est_users_7d
      |  FROM mk GROUP BY 1),
      |ex AS (
      |  SELECT date_trunc('day', ts) AS day,
      |    count(DISTINCT user_id) AS n_users_1d
      |  FROM events GROUP BY 1)
      |SELECT est.day AS day, n_users_1d, est_users_7d
      |FROM est JOIN ex ON est.day = ex.day""".stripMargin

  /** ACTIVITY CONCENTRATION (Pareto audit) — what share of all events
    * the top-1% most active users generate, exactly: per-user counts
    * roll into an activity-value HISTOGRAM (cnt → how many users, how
    * many events), the top-down cumulative crosses the ⌈1%⌉-user target
    * at one value, and selection is by VALUE so ties join whole — the
    * deterministic rank-selection pattern of the quality family, on the
    * behavioral axis. This number decides partitioning strategy (a
    * heavy-tailed user axis needs salting before any user-keyed
    * shuffle) and is the abuse/bot smoke test. Scale shape: one
    * user-keyed aggregate (high-cardinality, no skew in the GROUPING —
    * the skew it MEASURES is downstream), a value-domain-bounded
    * histogram window, |1|-row output. */
  def qEvPareto(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perUser = Tables.events(s, dir)
      .groupBy($"user_id").agg(count(lit(1)).as("a"))
    val hist = perUser.groupBy($"a")
      .agg(count(lit(1)).as("n_users"), sum($"a").as("n_events"))
    val w = Window.orderBy($"a".desc)
    val cum = hist
      .withColumn("cum_users", sum($"n_users").over(w))
      .withColumn("cum_events", sum($"n_events").over(w))
    cum.crossJoin(broadcast(hist.agg(
        sum($"n_users").as("u_tot"), sum($"n_events").as("e_tot"))))
      .withColumn("k", expr("(u_tot + 99) DIV 100"))
      .agg(max($"u_tot").as("n_users"), max($"e_tot").as("n_events"),
        max($"k").as("k_target"),
        min(when($"cum_users" >= $"k", $"a")).as("v_th"),
        min(when($"cum_users" >= $"k", $"cum_users")).as("users_sel"),
        min(when($"cum_users" >= $"k", $"cum_events")).as("events_sel"))
      .withColumn("share_ppm", expr("(events_sel * 1000000L) DIV n_events"))
  }

  val qEvParetoSql: String =
    """WITH pu AS (SELECT user_id, count(*) AS a FROM events GROUP BY 1),
      |hist AS (
      |  SELECT a, count(*) AS n_users, CAST(sum(a) AS BIGINT) AS n_events
      |  FROM pu GROUP BY 1),
      |cum AS (
      |  SELECT a,
      |    CAST(sum(n_users) OVER (ORDER BY a DESC) AS BIGINT) AS cum_users,
      |    CAST(sum(n_events) OVER (ORDER BY a DESC) AS BIGINT) AS cum_events
      |  FROM hist),
      |t AS (
      |  SELECT CAST(sum(n_users) AS BIGINT) AS u_tot,
      |    CAST(sum(n_events) AS BIGINT) AS e_tot FROM hist)
      |SELECT max(u_tot) AS n_users, max(e_tot) AS n_events,
      |  max((u_tot + 99) // 100) AS k_target,
      |  min(CASE WHEN cum_users >= (u_tot + 99) // 100 THEN a END) AS v_th,
      |  min(CASE WHEN cum_users >= (u_tot + 99) // 100 THEN cum_users END) AS users_sel,
      |  min(CASE WHEN cum_users >= (u_tot + 99) // 100 THEN cum_events END) AS events_sel,
      |  (min(CASE WHEN cum_users >= (u_tot + 99) // 100 THEN cum_events END)
      |    * 1000000) // max(e_tot) AS share_ppm
      |FROM cum CROSS JOIN t""".stripMargin

  /** HOUR-OF-DAY seasonality profile — per event type: the peak hour
    * (UTC, earliest on ties) and how concentrated the daily cycle is
    * (peak hour's share of all events, exact ppm). The baseline-shape
    * report that anomaly/changepoint detection conditions on — and the
    * capacity-planning number (a 3× concentrated hourly peak sizes the
    * ingest fleet). Scale shape: one (event_type, hour-of-day) aggregate
    * — ≤ |types|·24 cells of state — and bounded re-aggregates; no
    * window at all. */
  def qEvSeasonality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hod = Tables.events(s, dir)
      .groupBy($"event_type", hour($"ts").cast("long").as("hod"))
      .agg(count(lit(1)).as("n"))
    val mx = hod.groupBy($"event_type")
      .agg(sum($"n").as("n_events"), max($"n").as("peak_n"))
    hod.join(mx, "event_type")
      .filter($"n" === $"peak_n")
      .groupBy($"event_type")
      .agg(max($"n_events").as("n_events"), min($"hod").as("peak_hod"),
        max(expr("(peak_n * 1000000L) DIV n_events")).as("peak_share_ppm"))
  }

  val qEvSeasonalitySql: String =
    """WITH hod AS (
      |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |mx AS (
      |  SELECT event_type, CAST(sum(n) AS BIGINT) AS n_events,
      |    CAST(max(n) AS BIGINT) AS peak_n
      |  FROM hod GROUP BY 1)
      |SELECT hod.event_type AS event_type, max(n_events) AS n_events,
      |  min(hod) AS peak_hod,
      |  max((peak_n * 1000000) // n_events) AS peak_share_ppm
      |FROM hod JOIN mx ON hod.event_type = mx.event_type
      |WHERE n = peak_n GROUP BY 1""".stripMargin

  def qEvAnomaly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hourly = Tables.events(s, dir)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("hour_ts"), $"event_type", $"n")
    val moments = hourlyMoments(s, dir)
    hourly.join(broadcast(moments), "event_type")
      .withColumn("dev", $"n" * $"nh" - $"sn")
      .withColumn("is_anomaly",
        ($"dev" * $"dev" > ($"nh" * $"ssn" - $"sn" * $"sn") * 9L).cast("long"))
      .select($"event_type", $"hour_ts", $"n", $"is_anomaly")
  }

  /** The per-type hourly moments as a WRITE-ONCE trained artifact
    * (round-15): |event_type| rows (count of hours, sum and sum-of-
    * squares of hourly counts), built once per (session, corpus) and
    * served materialized to both probers — the batch monitor and the
    * streaming twin, whose scaladoc already declared "the baseline is
    * trained offline, not recomputed per batch"; the unmemoized form
    * re-ran the two-level aggregation inside every micro-batch's
    * broadcast build. */
  private[graft] def hourlyMoments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Memo.sessionCached(s, dir, "anomaly_moments") {
      Tables.events(s, dir)
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("nh"), sum($"n").as("sn"),
             sum($"n" * $"n").as("ssn"))
    }
  }

  val qEvAnomalySql: String =
    """WITH hourly AS (
      |  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS hour_ts, event_type, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, count(*) AS nh, CAST(sum(n) AS BIGINT) AS sn,
      |    CAST(sum(n * n) AS BIGINT) AS ssn
      |  FROM hourly GROUP BY 1)
      |SELECT h.event_type, hour_ts, n,
      |  CAST(CASE WHEN (n * nh - sn) * (n * nh - sn) > 9 * (nh * ssn - sn * sn)
      |       THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
      |FROM hourly h JOIN m ON h.event_type = m.event_type""".stripMargin

  /** Time-series gap fill: the zero-filled hourly series per event type —
    * the densification step every downstream window/forecast op assumes
    * (a missing hour must be an explicit 0, not an absent row). Plan
    * shape: the raw events collapse to the hourly rollup FIRST (one
    * shuffle), the dense axis derives from the per-type [min, max] hour
    * bounds via `sequence` explode — its size is O(types × hours), a
    * function of calendar time, NOT of event volume, so it is unchanged
    * at 100× data. The bounded series side then left-joins the rollup. */
  def qEvGapfill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hourly = Tables.events(s, dir)
      .select($"event_type", expr("CAST(ts AS LONG) DIV 3600 * 3600").as("hour_s"))
      .groupBy($"event_type", $"hour_s")
      .agg(count(lit(1)).as("n"))
    val series = hourly.groupBy($"event_type")
      .agg(min($"hour_s").as("h0"), max($"hour_s").as("h1"))
      .select($"event_type", explode(sequence($"h0", $"h1", lit(3600L))).as("hour_s"))
    series.join(hourly, Seq("event_type", "hour_s"), "left")
      .select($"event_type", $"hour_s",
        coalesce($"n", lit(0L)).as("n"),
        $"n".isNull.cast("long").as("is_gap"))
  }

  val qEvGapfillSql: String =
    """WITH hourly AS (
      |  SELECT event_type, epoch_us(ts) // 1000000 // 3600 * 3600 AS hour_s, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT event_type, min(hour_s) AS h0, max(hour_s) AS h1 FROM hourly GROUP BY 1),
      |series AS (
      |  SELECT event_type, unnest(generate_series(h0, h1, 3600)) AS hour_s FROM b)
      |SELECT s.event_type, s.hour_s,
      |  CAST(coalesce(h.n, 0) AS BIGINT) AS n,
      |  CAST(CASE WHEN h.n IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap
      |FROM series s LEFT JOIN hourly h
      |  ON s.event_type = h.event_type AND s.hour_s = h.hour_s""".stripMargin

  /** SCD type-2 interval construction — the warehouse "history table"
    * build: each user's purchase stream defines a spend-tier dimension
    * (cents DIV 2500), consecutive same-tier rows collapse into ONE
    * validity interval (gaps-and-islands), and each interval carries
    * [valid_from_s, valid_to_s) with -1 marking the open current row.
    * Everything windows/aggregates on the user_id partition key, so the
    * whole build is ONE shuffle: lag → change flag → running-sum island
    * id → per-island rollup → lead for the closing timestamp. */
  def qEvScd2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"sec".asc, $"event_id".asc)
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // version tie-breaks the closing lead: two islands can share a
    // floored valid_from_s (same-second tier flip), and version is the
    // unique time-ordered island id on both engines
    val byFrom = Window.partitionBy($"user_id")
      .orderBy($"valid_from_s".asc, $"version".asc)
    Tables.events(s, dir)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts".cast("long").as("sec"),
        expr("CAST(round(value * 100) AS BIGINT) DIV 2500").as("tier"))
      .withColumn("prev_tier", lag($"tier", 1).over(byUser))
      .withColumn("is_change",
        when($"prev_tier".isNull || $"tier" =!= $"prev_tier", 1L).otherwise(0L))
      .withColumn("version", sum($"is_change").over(run))
      .groupBy($"user_id", $"version")
      .agg(min($"tier").as("tier"),
           min($"sec").as("valid_from_s"),
           count(lit(1)).as("n_events"))
      .withColumn("valid_to_s",
        coalesce(lead($"valid_from_s", 1).over(byFrom), lit(-1L)))
      .withColumn("is_current",
        ($"valid_to_s" === -1L).cast("long"))
      .select($"user_id", $"version", $"tier",
        $"valid_from_s", $"valid_to_s", $"n_events", $"is_current")
  }

  val qEvScd2Sql: String =
    """WITH p AS (
      |  SELECT user_id, event_id, epoch_us(ts) // 1000000 AS sec,
      |    CAST(round(value * 100) AS BIGINT) // 2500 AS tier
      |  FROM events WHERE event_type = 'purchase'),
      |flagged AS (
      |  SELECT *, CASE WHEN lag(tier) OVER w IS NULL
      |    OR tier <> lag(tier) OVER w THEN 1 ELSE 0 END AS is_change
      |  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY sec ASC, event_id ASC)),
      |runs AS (
      |  SELECT *, CAST(sum(is_change) OVER (PARTITION BY user_id
      |    ORDER BY sec ASC, event_id ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
      |  FROM flagged),
      |islands AS (
      |  SELECT user_id, version, min(tier) AS tier, min(sec) AS valid_from_s,
      |    count(*) AS n_events
      |  FROM runs GROUP BY 1, 2)
      |SELECT user_id, version, tier, valid_from_s,
      |  coalesce(lead(valid_from_s) OVER (PARTITION BY user_id
      |    ORDER BY valid_from_s ASC, version ASC), -1) AS valid_to_s,
      |  n_events,
      |  CAST(CASE WHEN lead(valid_from_s) OVER (PARTITION BY user_id
      |    ORDER BY valid_from_s ASC, version ASC) IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
      |FROM islands""".stripMargin

  /** Time-weighted average — the correct mean for irregularly-sampled
    * series (a value holds until the next observation; a plain avg
    * over-weights bursts): per user, Σ value·Δt over the observed span,
    * all in exact integers (cents × seconds; values are non-negative so
    * Spark's truncating DIV == DuckDB's floor //). ONE shuffle on the
    * user key (window and aggregation share the partitioning); users with
    * a degenerate zero-length span drop out on both engines. */
  def qEvTwa(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // order by the FLOORED second (the emitted grain) + event_id on BOTH
    // engines — ordering by raw ts here while emitting floored seconds
    // would let sub-second neighbors order differently cross-engine
    val byUser = Window.partitionBy($"user_id").orderBy($"sec".asc, $"event_id".asc)
    Tables.events(s, dir)
      .select($"user_id", $"event_id", $"ts".cast("long").as("sec"),
        cents($"value").as("vc"))
      .withColumn("next_s", lead($"sec", 1).over(byUser))
      .filter($"next_s".isNotNull)
      .withColumn("dt", $"next_s" - $"sec")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_intervals"),
           sum($"dt").as("span_s"),
           sum($"vc" * $"dt").as("vt_cs"))
      .filter($"span_s" > 0)
      .withColumn("twa_c", expr("vt_cs DIV span_s"))
  }

  val qEvTwaSql: String =
    """WITH o AS (
      |  SELECT user_id, event_id, epoch_us(ts) // 1000000 AS sec,
      |    CAST(round(value * 100) AS BIGINT) AS vc,
      |    lead(epoch_us(ts) // 1000000) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts) // 1000000 ASC, event_id ASC) AS next_s
      |  FROM events),
      |iv AS (SELECT user_id, vc, next_s - sec AS dt FROM o WHERE next_s IS NOT NULL)
      |SELECT user_id, count(*) AS n_intervals,
      |  CAST(sum(dt) AS BIGINT) AS span_s,
      |  CAST(sum(vc * dt) AS BIGINT) AS vt_cs,
      |  CAST(sum(vc * dt) AS BIGINT) // CAST(sum(dt) AS BIGINT) AS twa_c
      |FROM iv GROUP BY user_id
      |HAVING sum(dt) > 0""".stripMargin

  /** SLIDING (hopping) windows — 2-hour windows every 1 hour, the
    * overlapping-window shape Structured Streaming emits for
    * window(ts, "2 hours", "1 hour"): each event lands in exactly two
    * windows. The oracle reproduces Spark's epoch-aligned window
    * assignment arithmetically (starts h·3600 and (h−1)·3600). Map-side
    * 2× row expansion then one keyed aggregation — linear, and the
    * expansion factor is windows/slide, a constant. */
  def qEvSliding(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(window($"ts", "2 hours", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum(cents($"value")).as("total_value_c"))
      .select($"window.start".cast("long").as("win_start_s"),
        $"event_type", $"n", $"total_value_c")
  }

  val qEvSlidingSql: String =
    """WITH e AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc,
      |    epoch_us(ts) // 1000000 // 3600 AS h
      |  FROM events),
      |expanded AS (
      |  SELECT event_type, vc, unnest([h * 3600, (h - 1) * 3600]) AS win_start_s
      |  FROM e)
      |SELECT win_start_s, event_type, count(*) AS n,
      |  CAST(sum(vc) AS BIGINT) AS total_value_c
      |FROM expanded GROUP BY 1, 2""".stripMargin

  /** Dynamic-schema JSON payloads as a MAP — the §2.6 surface beyond
    * fixed-path extraction (q_ev_json): from_json to map<string,string>,
    * entry explode, per-key rollup. The shape for payloads whose key set
    * is NOT known at query-author time (the common case for event
    * property bags). Map-side explode (expansion = keys per payload) +
    * one keyed aggregation. */
  def qEvPropsMap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = from_json($"props",
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType))
    Tables.events(s, dir)
      .select(explode(m).as(Seq("k", "v")))
      .groupBy($"k")
      .agg(count(lit(1)).as("n"),
           countDistinct($"v").as("n_vals"),
           sum($"v".cast("long")).as("sum_v"),
           min($"v".cast("long")).as("min_v"),
           max($"v".cast("long")).as("max_v"))
  }

  val qEvPropsMapSql: String =
    """WITH kv AS (
      |  SELECT unnest(json_keys(props)) AS k, props FROM events),
      |vv AS (SELECT k, json_extract_string(props, '$.' || k) AS v FROM kv)
      |SELECT k, count(*) AS n, count(DISTINCT v) AS n_vals,
      |  CAST(sum(TRY_CAST(v AS BIGINT)) AS BIGINT) AS sum_v,
      |  CAST(min(TRY_CAST(v AS BIGINT)) AS BIGINT) AS min_v,
      |  CAST(max(TRY_CAST(v AS BIGINT)) AS BIGINT) AS max_v
      |FROM vv GROUP BY k""".stripMargin

  /** Trailing-hour burst detection via RANGE-frame windows — the frame
    * type the engine had not yet exercised: for every event, the count
    * and value-sum of the user's events in the trailing 3600 s (a
    * value-range frame over the epoch second, so same-second peers are
    * always included — deterministic without an ordering tie-break),
    * rolled up to each user's PEAK burst. One shuffle on user_id; the
    * window and the rollup share the partitioning. */
  def qEvRolling(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wr = Window.partitionBy($"user_id").orderBy($"sec")
      .rangeBetween(-3599L, Window.currentRow)
    Tables.events(s, dir)
      .select($"user_id", $"ts".cast("long").as("sec"), cents($"value").as("vc"))
      .withColumn("n_1h", count(lit(1)).over(wr))
      .withColumn("sum_1h_c", sum($"vc").over(wr))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
           max($"n_1h").as("peak_1h_n"),
           max($"sum_1h_c").as("peak_1h_value_c"))
  }

  val qEvRollingSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) // 1000000 AS sec,
      |    CAST(round(value * 100) AS BIGINT) AS vc
      |  FROM events),
      |r AS (
      |  SELECT user_id,
      |    count(*) OVER w AS n_1h,
      |    CAST(sum(vc) OVER w AS BIGINT) AS sum_1h_c
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY sec
      |    RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW))
      |SELECT user_id, count(*) AS n_events,
      |  CAST(max(n_1h) AS BIGINT) AS peak_1h_n,
      |  CAST(max(sum_1h_c) AS BIGINT) AS peak_1h_value_c
      |FROM r GROUP BY user_id""".stripMargin

  /** Event-type transition matrix — the sequence-mining primitive behind
    * next-action prediction and funnel discovery: adjacent event pairs
    * within a user's 30-minute session (the same session break as
    * [[qEvSession]]), counted into P(next | current) rows with exact
    * integer ppm normalization. One shuffle on user_id (lag + session
    * windows share the partitioning), then one keyed count; the matrix
    * is |event_types|² rows at any scale. */
  def qEvTransitions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val pairs = Tables.events(s, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("prev_type", lag($"event_type", 1).over(byUser))
      .withColumn("prev_s", lag($"ts".cast("long"), 1).over(byUser))
      .filter($"prev_type".isNotNull &&
        $"ts".cast("long") - $"prev_s" <= 1800L)
      .groupBy($"prev_type".as("from_type"), $"event_type".as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy($"from_type").agg(sum($"n").as("n_from"))
    pairs.join(totals, "from_type")
      .withColumn("p_ppm", expr("(n * 1000000L) DIV n_from"))
  }

  val qEvTransitionsSql: String =
    """WITH o AS (
      |  SELECT user_id, event_type, epoch_us(ts) // 1000000 AS sec,
      |    lag(event_type) OVER w AS prev_type,
      |    lag(epoch_us(ts) // 1000000) OVER w AS prev_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
      |p AS (
      |  SELECT prev_type AS from_type, event_type AS to_type, count(*) AS n
      |  FROM o WHERE prev_type IS NOT NULL AND sec - prev_s <= 1800
      |  GROUP BY 1, 2),
      |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from FROM p GROUP BY 1)
      |SELECT from_type, to_type, n, n_from, (n * 1000000) // n_from AS p_ppm
      |FROM p JOIN t USING (from_type)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ev_transitions" -> (qEvTransitions _),
    "q_ev_rolling"   -> (qEvRolling _),
    "q_ev_props_map" -> (qEvPropsMap _),
    "q_ev_sliding"   -> (qEvSliding _),
    "q_ev_twa"       -> (qEvTwa _),
    "q_ev_gapfill"   -> (qEvGapfill _),
    "q_ev_scd2"      -> (qEvScd2 _),
    "q_ev_anomaly"   -> (qEvAnomaly _),
    "q_ev_changepoint" -> (qEvChangepoint _),
    "q_ev_rolling_users" -> (qEvRollingUsers _),
    "q_ev_pareto"    -> (qEvPareto _),
    "q_ev_seasonality" -> (qEvSeasonality _),
    "q_ev_funnel_latency" -> (qEvFunnelLatency _),
    "q_ev_retention" -> (qEvRetention _),
    "q_ev_hourly"  -> (qEvHourly _),
    "q_hist_quantile" -> (qHistQuantile _),
    "q_hist_quantile_src" -> (qHistQuantileSrc _),
    "q_ev_session" -> (qEvSession _),
    "q_ev_json"    -> (qEvJson _),
    "q_ev_funnel"  -> (qEvFunnel _),
    "q_ev_asof"    -> (qEvAsof _),
  )

  def oracles: Map[String, String] = Map(
    "q_ev_transitions" -> qEvTransitionsSql,
    "q_ev_rolling"   -> qEvRollingSql,
    "q_ev_props_map" -> qEvPropsMapSql,
    "q_ev_sliding"   -> qEvSlidingSql,
    "q_ev_twa"       -> qEvTwaSql,
    "q_ev_gapfill"   -> qEvGapfillSql,
    "q_ev_scd2"      -> qEvScd2Sql,
    "q_ev_anomaly"   -> qEvAnomalySql,
    "q_ev_changepoint" -> qEvChangepointSql,
    "q_ev_rolling_users" -> qEvRollingUsersSql,
    "q_ev_pareto"    -> qEvParetoSql,
    "q_ev_seasonality" -> qEvSeasonalitySql,
    "q_ev_funnel_latency" -> qEvFunnelLatencySql,
    "q_ev_retention" -> qEvRetentionSql,
    "q_ev_hourly"  -> qEvHourlySql,
    "q_hist_quantile" -> qHistQuantileSql,
    "q_hist_quantile_src" -> qHistQuantileSrcSql,
    "q_ev_session" -> qEvSessionSql,
    "q_ev_json"    -> qEvJsonSql,
    "q_ev_funnel"  -> qEvFunnelSql,
    "q_ev_asof"    -> qEvAsofSql,
  )
}
