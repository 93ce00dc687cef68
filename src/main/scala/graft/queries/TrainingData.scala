package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions.tokens

/** Training-corpus assembly operators (SURVEY §7 north-star extensions —
  * the steps between "deduped documents" and "batches on the cluster"):
  * deterministic stratified sampling (the training mix), context-window
  * packing, PII scrubbing, composite quality filtering, and PMI
  * collocation mining. All are map-side per-row expressions or one
  * windowed pass — linear at 100 TB — and all gate outputs follow the
  * scaled-BIGINT convention (see Relational).
  */
object TrainingData {

  // Shared cross-engine 60-bit hash — ONE definition for batch, streaming,
  // and oracle sides (graft.functions.Hashing).
  private def h60Duck(x: String): String = graft.functions.Hashing.h60Duck(x)

  /** Deterministic stratified sampling — the training-mix primitive: each
    * source gets a sampling rate (percent), membership decided by a
    * content-stable hash, so the sample is reproducible across runs,
    * engines, and cluster sizes (no RNG, no per-partition state). */
  def qSampleStratified(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rate = (lit(20L) + (length($"source") * 13L) % 60L).as("rate_pct")
    Tables.documents(s, dir)
      .select($"doc_id", $"source", rate,
        graft.functions.Hashing.bucket("doc_id", 100).as("bucket"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_total"),
           sum(when($"bucket" < $"rate_pct", 1L).otherwise(0L)).as("n_kept"),
           sum(when($"bucket" < $"rate_pct", $"doc_id")).as("kept_id_sum"),
           first($"rate_pct").as("rate_pct"))
  }

  val qSampleStratifiedSql: String =
    s"""WITH hashed AS (
       |  SELECT doc_id, source,
       |    20 + (length(source) * 13) % 60 AS rate_pct,
       |    ${h60Duck("doc_id")} % 100 AS bucket
       |  FROM documents)
       |SELECT source, count(*) AS n_total,
       |  CAST(sum(CASE WHEN bucket < rate_pct THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN bucket < rate_pct THEN doc_id END) AS BIGINT) AS kept_id_sum,
       |  CAST(min(rate_pct) AS BIGINT) AS rate_pct
       |FROM hashed GROUP BY source""".stripMargin

  /** Deterministic exact-N per-source sample — the "take exactly 5 docs
    * per source, reproducibly" primitive (fixed-size eval/holdout carving,
    * spot-check drawing). Rank within source by a content-stable hash and
    * keep rank <= N: no RNG, engine-identical, stable under corpus
    * growth *of other sources*. Scale shape: Spark 4 rewrites the
    * row_number-then-filter into WindowGroupLimit — per-partition bounded
    * top-N heaps BEFORE the source shuffle (plan-asserted in
    * TrainingOpsSpec), so a skewed source never implies a full sort. */
  def qSampleTopn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"h", $"doc_id")
    Tables.documents(s, dir)
      .select($"source", $"doc_id", md5($"doc_id".cast("string")).as("h"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 5)
      .select($"source", $"doc_id", $"rk")
  }

  val qSampleTopnSql: String =
    """SELECT source, doc_id, rk FROM (
      |  SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
      |  FROM documents)
      |WHERE rk <= 5""".stripMargin

  /** Per-source value HISTOGRAM with cumulative rank spans — the shared
    * distributed-order-statistics core behind [[qQualityDeciles]] and
    * [[qQualityWinsor]]. Input: (source, v) rows at corpus scale. Output:
    * one row per DISTINCT (source, v) carrying `cnt` and the 1-based rank
    * interval [lo_rk, hi_rk] that value occupies in the per-source
    * ascending ordering.
    *
    * Scale shape: the only corpus-scale operation is the (source, v)
    * group-by — map-side partial aggregation, shuffle keyed on BOTH
    * columns (no low-cardinality skew). The cumulative window that
    * follows is partitioned by source but runs over the HISTOGRAM, whose
    * per-source row count is |distinct values| — bounded by the value
    * domain, independent of corpus row count. At 100 TB a per-source
    * task sorts at most |domain| rows (thousands for lengths / ppm
    * scores), never the corpus slice itself. This is the value-histogram
    * rank-selection pattern; PlanHygieneSpec's unbounded-window rule
    * recognizes it by the histogram aggregate under the window. */
  private val scoredCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), LazyDf]()

  /** Memoized (source, nt, score) relation — the lexical-diversity score
    * each selection operator ranks by. A real pipeline scores the corpus
    * ONCE and then selects many ways (deciles, calibrated top-k, MAD
    * outliers, KS drift, token budgets), so the engine does too: one
    * tokenize+scan pass per (session, sf-dir), shared by all five
    * consumers (same holder + dead-session-sweep pattern as the dedup
    * family's shingle cache). */
  private[graft] def scoredDocs(s: SparkSession, dir: String): DataFrame = {
    scoredCache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    scoredCache.computeIfAbsent((s, dir), _ => new LazyDf(() => {
      import s.implicits._
      val toks = tokens($"text")
      Memo.materialize(Tables.documents(s, dir)
        .select($"source",
          size(toks).cast("long").as("nt"),
          size(array_distinct(toks)).cast("long").as("nd"))
        .filter($"nt" > 0)
        .select($"source", $"nt", expr("(nd * 1000000L) DIV nt").as("score")))
    })).df
  }

  private def rankSpans(d: DataFrame, valueCol: String): DataFrame = {
    import d.sparkSession.implicits._
    d.groupBy($"source", col(valueCol)).agg(count(lit(1)).as("cnt"))
      .withColumn("hi_rk", sum($"cnt").over(
        Window.partitionBy($"source").orderBy(col(valueCol).asc)))
      .withColumn("lo_rk", $"hi_rk" - $"cnt" + 1L)
  }

  /** TEMPORAL leak-free split — the time-axis complement to the
    * cluster-aware [[qSplitLeakfree]]: events split 80/10/10 at exact
    * rank-selected SECOND cutoffs (t80 = the value at rank
    * (n*8) DIV 10 of the ascending second ordering, t90 likewise), so
    * train never contains an observation later than any val/test
    * observation — the property a forecasting/recsys eval needs and a
    * random split silently destroys. Cutoff selection uses the
    * [[rankSpans]] value-histogram (the cumulative window runs over
    * distinct SECONDS — bounded by calendar time, never event volume);
    * assignment is one map-side comparison. Output: one row per split
    * with its exact boundaries, plus ordered-boundary flags computed
    * FROM the data (train_max < val_min, val_max < test_min) so the
    * no-leak property gates as data, not as a code comment. */
  def qSplitTemporal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val secs = graft.Tables.events(s, dir)
      .select(lit("all").as("source"), expr("cast(ts as bigint)").as("v"))
    val spans = rankSpans(secs, "v")
    val cuts = spans.join(
        spans.groupBy($"source").agg(sum($"cnt").as("n")), "source")
      .withColumn("k80", expr("(n * 8) DIV 10"))
      .withColumn("k90", expr("(n * 9) DIV 10"))
      .groupBy($"source")
      .agg(max(when($"lo_rk" <= $"k80" && $"k80" <= $"hi_rk", $"v")).as("t80"),
           max(when($"lo_rk" <= $"k90" && $"k90" <= $"hi_rk", $"v")).as("t90"))
    val assigned = secs.join(cuts, "source")
      .withColumn("split",
        when($"v" <= $"t80", "train").when($"v" <= $"t90", "val").otherwise("test"))
    val per = assigned.groupBy($"split")
      .agg(count(lit(1)).as("n_events"), min($"v").as("min_s"), max($"v").as("max_s"))
    // boundary flags from the per-split aggregate itself (3-row relation)
    val b = per.agg(
      max(when($"split" === "train", $"max_s")).as("train_max"),
      max(when($"split" === "val", $"min_s")).as("val_min"),
      max(when($"split" === "val", $"max_s")).as("val_max"),
      max(when($"split" === "test", $"min_s")).as("test_min"))
    // when() mirrors the oracle's CASE: a NULL comparison (empty val or
    // test split under heavy second-level ties) renders 0, not NULL
    per.crossJoin(b)
      .select($"split", $"n_events", $"min_s", $"max_s",
        when($"train_max" < $"val_min", 1L).otherwise(0L).as("train_before_val"),
        when($"val_max" < $"test_min", 1L).otherwise(0L).as("val_before_test"))
  }

  val qSplitTemporalSql: String =
    """WITH d AS (SELECT epoch_us(ts) // 1000000 AS v FROM events),
      |ranked AS (
      |  SELECT v, row_number() OVER (ORDER BY v ASC) AS rk,
      |    count(*) OVER () AS n
      |  FROM d),
      |cuts AS (
      |  SELECT max(CASE WHEN rk = (n * 8) // 10 THEN v END) AS t80,
      |         max(CASE WHEN rk = (n * 9) // 10 THEN v END) AS t90
      |  FROM ranked),
      |assigned AS (
      |  SELECT v, CASE WHEN v <= t80 THEN 'train'
      |                 WHEN v <= t90 THEN 'val'
      |                 ELSE 'test' END AS split
      |  FROM d, cuts),
      |per AS (
      |  SELECT split, count(*) AS n_events,
      |    CAST(min(v) AS BIGINT) AS min_s, CAST(max(v) AS BIGINT) AS max_s
      |  FROM assigned GROUP BY split),
      |b AS (
      |  SELECT max(CASE WHEN split = 'train' THEN max_s END) AS train_max,
      |         max(CASE WHEN split = 'val' THEN min_s END) AS val_min,
      |         max(CASE WHEN split = 'val' THEN max_s END) AS val_max,
      |         max(CASE WHEN split = 'test' THEN min_s END) AS test_min
      |  FROM per)
      |SELECT split, n_events, min_s, max_s,
      |  CAST(CASE WHEN train_max < val_min THEN 1 ELSE 0 END AS BIGINT) AS train_before_val,
      |  CAST(CASE WHEN val_max < test_min THEN 1 ELSE 0 END AS BIGINT) AS val_before_test
      |FROM per, b""".stripMargin

  /** Curriculum binning: per-source quality DECILES over the lexical-
    * diversity score (distinct-token ratio in exact ppm, tie-broken by
    * doc_id so ntile is engine-deterministic). The curriculum/mixing
    * primitive: train schedules draw from bins in difficulty order, and
    * per-source binning keeps every domain represented in every bin.
    *
    * Distributed form (round-6): NO per-row ntile window — that sorts an
    * entire source in one task at 100 TB. Instead the ntile output is
    * reconstructed exactly from the [[rankSpans]] value histogram:
    * ntile(10) over n rows assigns q+1 rows (q = n DIV 10) to the first
    * r = n % 10 buckets and q to the rest, so each decile is a fixed
    * rank interval [start+1, start+sz]; its row count is sz by
    * construction and its min/max score are the values whose rank spans
    * overlap the interval (ordering by score first means the doc_id
    * tie-break permutes only equal scores — the score multiset at any
    * rank interval is unique). The decile-boundary relation is
    * 10·|sources| rows joined to the histogram on source — AQE
    * broadcasts it; nothing unbounded is pinned. */
  def qQualityDeciles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = scoredDocs(s, dir).select($"source", $"score")
    val spans = rankSpans(scored, "score")
    val deciles = spans.groupBy($"source").agg(sum($"cnt").as("n"))
      .select($"source", $"n", explode(sequence(lit(1L), lit(10L))).as("decile"))
      .withColumn("sz", expr("n DIV 10 + CASE WHEN decile <= n % 10 THEN 1 ELSE 0 END"))
      .filter($"sz" > 0L)
      .withColumn("min_rk", expr("(decile - 1) * (n DIV 10) + least(decile - 1, n % 10) + 1"))
      .withColumn("max_rk", $"min_rk" + $"sz" - 1L)
    spans.join(deciles, Seq("source"))
      .filter($"lo_rk" <= $"max_rk" && $"hi_rk" >= $"min_rk")
      .groupBy($"source", $"decile")
      .agg(max($"sz").as("n_docs"),
           min($"score").as("min_score"),
           max($"score").as("max_score"))
  }

  val qQualityDecilesSql: String =
    """WITH m AS (
      |  SELECT source, doc_id,
      |    len(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '')) AS nt,
      |    len(list_distinct(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> ''))) AS nd
      |  FROM documents),
      |scored AS (
      |  SELECT source, doc_id, (nd * 1000000) // nt AS score FROM m WHERE nt > 0),
      |binned AS (
      |  SELECT source, score,
      |    ntile(10) OVER (PARTITION BY source ORDER BY score, doc_id) AS decile
      |  FROM scored)
      |SELECT source, CAST(decile AS BIGINT) AS decile, count(*) AS n_docs,
      |  CAST(min(score) AS BIGINT) AS min_score,
      |  CAST(max(score) AS BIGINT) AS max_score
      |FROM binned GROUP BY source, decile""".stripMargin

  /** CALIBRATED quality selection — per-source percentile thresholding:
    * each source keeps its own top-30% by the lexical-diversity score,
    * so a uniformly "easier" source cannot crowd out the others the way
    * a single global threshold would (the per-source calibration step
    * real quality filters apply before mixing). The selection is EXACT
    * order statistics from the [[rankSpans]] value histogram: the
    * threshold score is the value whose rank span contains rank
    * n − ⌈0.3n⌉ + 1, and the selected count is everything at or above
    * it (ties keep the operator deterministic: selection is by VALUE, so
    * n_selected ≥ the ⌈0.3n⌉ target exactly when the threshold value is
    * tied across the boundary). Scale shape: identical to
    * [[qQualityWinsor]] — one (source, value) aggregate, a histogram-
    * bounded cumulative window, and source-bounded joins; the corpus is
    * scanned once and nothing unbounded is sorted in one task. */
  def qQualityCalibrated(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = scoredDocs(s, dir).select($"source", $"score")
    val spans = rankSpans(scored, "score")
    spans.join(spans.groupBy($"source").agg(sum($"cnt").as("n")), "source")
      .withColumn("k", expr("(n * 30 + 99) DIV 100"))
      .withColumn("r", expr("n - k + 1"))
      .groupBy($"source")
      .agg(max($"n").as("n_docs"), max($"k").as("k_target"),
        max(when($"lo_rk" <= $"r" && $"r" <= $"hi_rk", $"score")).as("v_th"),
        max(when($"lo_rk" <= $"r" && $"r" <= $"hi_rk", $"n" - $"lo_rk" + 1L))
          .as("n_selected"))
  }

  val qQualityCalibratedSql: String =
    """WITH m AS (
      |  SELECT source,
      |    len(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '')) AS nt,
      |    len(list_distinct(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> ''))) AS nd
      |  FROM documents),
      |scored AS (
      |  SELECT source, (nd * 1000000) // nt AS score FROM m WHERE nt > 0),
      |n AS (SELECT source, count(*) AS n FROM scored GROUP BY 1),
      |rk AS (
      |  SELECT source, score,
      |    row_number() OVER (PARTITION BY source ORDER BY score) AS rk
      |  FROM scored),
      |th AS (
      |  SELECT rk.source AS source, max(n.n) AS n_docs,
      |    max((n.n * 30 + 99) // 100) AS k_target,
      |    max(CASE WHEN rk = n.n - ((n.n * 30 + 99) // 100) + 1
      |        THEN score END) AS v_th
      |  FROM rk JOIN n USING (source) GROUP BY 1),
      |sel AS (
      |  SELECT s.source, count(*) AS n_selected
      |  FROM scored s JOIN th ON s.source = th.source AND s.score >= th.v_th
      |  GROUP BY 1)
      |SELECT th.source, n_docs, k_target, v_th,
      |  CAST(n_selected AS BIGINT) AS n_selected
      |FROM th JOIN sel ON th.source = sel.source""".stripMargin

  /** DATA-CONSTRAINED mix planning — the UNDER-supply complement to
    * [[qMixPlan]] (which downsamples over-supplied sources): when a
    * source holds fewer tokens than its equal-share budget, the planner
    * REPEATS it — the multi-epoch decision of data-constrained scaling
    * (Muennighoff et al. 2023 find ~4 epochs of repeated data near-free,
    * so the repeat factor is capped at 4×). Per source: exact integer
    * epochs ×100 ((achieved·100) DIV supply), achieved tokens
    * min(budget, 4·supply), and the shortfall the cap leaves unfilled.
    * Scale shape: one corpus token-count aggregate; everything after is
    * |sources| rows against a broadcast 1-row total. */
  def qMixEpochs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perSource = Tables.documents(s, dir)
      .select($"source", size(tokens($"text")).cast("long").as("nt"))
      .groupBy($"source")
      .agg(sum($"nt").as("src_tokens"), count(lit(1)).as("n_docs"))
    val totals = perSource.agg(
      sum($"src_tokens").as("total_tokens"), count(lit(1)).as("n_sources"))
    perSource.crossJoin(broadcast(totals))
      .withColumn("budget_tokens", expr("total_tokens DIV n_sources"))
      .withColumn("achieved_tokens",
        least($"budget_tokens", $"src_tokens" * 4L))
      .withColumn("epochs_x100",
        expr("(achieved_tokens * 100L) DIV src_tokens"))
      .withColumn("shortfall_tokens",
        greatest(lit(0L), expr("budget_tokens - achieved_tokens")))
      .select($"source", $"n_docs", $"src_tokens", $"budget_tokens",
        $"achieved_tokens", $"epochs_x100", $"shortfall_tokens")
  }

  val qMixEpochsSql: String =
    """WITH per_source AS (
      |  SELECT source,
      |    CAST(sum(len(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> ''))) AS BIGINT) AS src_tokens,
      |    count(*) AS n_docs
      |  FROM documents GROUP BY source),
      |t AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS total_tokens,
      |             count(*) AS n_sources FROM per_source)
      |SELECT source, n_docs, src_tokens,
      |  total_tokens // n_sources AS budget_tokens,
      |  least(total_tokens // n_sources, src_tokens * 4) AS achieved_tokens,
      |  (least(total_tokens // n_sources, src_tokens * 4) * 100)
      |    // src_tokens AS epochs_x100,
      |  greatest(0, total_tokens // n_sources
      |    - least(total_tokens // n_sources, src_tokens * 4)) AS shortfall_tokens
      |FROM per_source CROSS JOIN t""".stripMargin

  /** TEMPERATURE-scaled mixing — the multilingual sampling rule
    * (p_i ∝ supply^α, α = 0.5): up-weights small sources and damps the
    * head so one giant corpus cannot drown the mix, the standard
    * compromise between proportional and uniform sampling. Weights are
    * EXACT integer square roots: for x ≤ 2^52, floor(sqrt(double x)) is
    * provably exact (the true root's distance to the next integer,
    * ~1/(2·sqrt(x)), dwarfs a correctly-rounded double's half-ulp), so
    * both engines produce identical BIGINTs with no boundary cell.
    * Scale shape: one corpus token-count aggregate; everything after is
    * |sources| rows against a broadcast 1-row weight total. */
  def qMixTemperature(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perSource = Tables.documents(s, dir)
      .select($"source", size(tokens($"text")).cast("long").as("nt"))
      .groupBy($"source")
      .agg(sum($"nt").as("src_tokens"), count(lit(1)).as("n_docs"))
      .withColumn("w", floor(sqrt($"src_tokens".cast("double"))).cast("long"))
    val totals = perSource.agg(
      sum($"w").as("w_tot"), sum($"src_tokens").as("total_tokens"))
    perSource.crossJoin(broadcast(totals))
      .withColumn("rate_ppm", expr("(w * 1000000L) DIV w_tot"))
      .withColumn("tokens_drawn", expr("(total_tokens * rate_ppm) DIV 1000000L"))
      .select($"source", $"n_docs", $"src_tokens", $"w", $"rate_ppm",
        $"tokens_drawn")
  }

  val qMixTemperatureSql: String =
    """WITH per_source AS (
      |  SELECT source,
      |    CAST(sum(len(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> ''))) AS BIGINT) AS src_tokens,
      |    count(*) AS n_docs
      |  FROM documents GROUP BY source),
      |w AS (
      |  SELECT source, n_docs, src_tokens,
      |    CAST(floor(sqrt(CAST(src_tokens AS DOUBLE))) AS BIGINT) AS w
      |  FROM per_source),
      |t AS (SELECT CAST(sum(w) AS BIGINT) AS w_tot,
      |             CAST(sum(src_tokens) AS BIGINT) AS total_tokens FROM w)
      |SELECT source, n_docs, src_tokens, w,
      |  (w * 1000000) // w_tot AS rate_ppm,
      |  (total_tokens * ((w * 1000000) // w_tot)) // 1000000 AS tokens_drawn
      |FROM w CROSS JOIN t""".stripMargin

  /** ROBUST per-source outlier scoring — median / MAD instead of
    * mean / stddev, so a heavy-tailed score distribution (boilerplate
    * floods, template spam) cannot drag its own threshold: a doc is
    * flagged when its absolute deviation from the source median exceeds
    * 5× the median absolute deviation. Both medians are EXACT lower
    * medians (rank (n+1) DIV 2) resolved from [[rankSpans]] value
    * histograms — all integer, no float quantile estimate. Scale shape:
    * two corpus passes ((source, score) then (source, dev) histograms),
    * each a map-side-combined aggregate; the cumulative windows run over
    * the HISTOGRAMS (value-domain-bounded, recognized by
    * PlanHygieneSpec's unbounded-window rule); median/MAD relations are
    * |sources| rows — AQE broadcasts them into the flagging join. */
  def qQualityMad(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = scoredDocs(s, dir).select($"source", $"score")
    val sp1 = rankSpans(scored, "score")
    val med = sp1.join(sp1.groupBy($"source").agg(sum($"cnt").as("n")), "source")
      .withColumn("r", expr("(n + 1) DIV 2"))
      .groupBy($"source")
      .agg(max($"n").as("n_docs"),
        max(when($"lo_rk" <= $"r" && $"r" <= $"hi_rk", $"score")).as("med"))
    val dev = scored.join(med.select($"source", $"med"), "source")
      .select($"source", abs($"score" - $"med").as("dev"))
    val sp2 = rankSpans(dev, "dev")
    val mad = sp2.join(sp2.groupBy($"source").agg(sum($"cnt").as("n")), "source")
      .withColumn("r", expr("(n + 1) DIV 2"))
      .groupBy($"source")
      .agg(max(when($"lo_rk" <= $"r" && $"r" <= $"hi_rk", $"dev")).as("mad"))
    dev.join(mad, "source").join(med, "source")
      .groupBy($"source")
      .agg(max($"n_docs").as("n_docs"), max($"med").as("med"),
        max($"mad").as("mad"),
        sum(when($"dev" > $"mad" * 5L, 1L).otherwise(0L)).as("n_out"),
        max($"dev").as("max_dev"))
  }

  val qQualityMadSql: String =
    """WITH m AS (
      |  SELECT source,
      |    len(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '')) AS nt,
      |    len(list_distinct(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> ''))) AS nd
      |  FROM documents),
      |scored AS (
      |  SELECT source, (nd * 1000000) // nt AS score FROM m WHERE nt > 0),
      |n AS (SELECT source, count(*) AS n FROM scored GROUP BY 1),
      |rk AS (
      |  SELECT source, score,
      |    row_number() OVER (PARTITION BY source ORDER BY score) AS rk
      |  FROM scored),
      |med AS (
      |  SELECT rk.source AS source, max(n.n) AS n_docs,
      |    max(CASE WHEN rk = (n.n + 1) // 2 THEN score END) AS med
      |  FROM rk JOIN n USING (source) GROUP BY 1),
      |dev AS (
      |  SELECT s.source, abs(s.score - med.med) AS dev
      |  FROM scored s JOIN med USING (source)),
      |rk2 AS (
      |  SELECT source, dev,
      |    row_number() OVER (PARTITION BY source ORDER BY dev) AS rk
      |  FROM dev),
      |mad AS (
      |  SELECT rk2.source AS source,
      |    max(CASE WHEN rk = (n.n + 1) // 2 THEN dev END) AS mad
      |  FROM rk2 JOIN n USING (source) GROUP BY 1)
      |SELECT dev.source AS source, max(med.n_docs) AS n_docs,
      |  max(med.med) AS med, max(mad.mad) AS mad,
      |  CAST(sum(CASE WHEN dev > mad.mad * 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_out,
      |  max(dev) AS max_dev
      |FROM dev JOIN mad ON dev.source = mad.source
      |  JOIN med ON dev.source = med.source
      |GROUP BY 1""".stripMargin

  /** CONTEXT-WINDOW CHUNKING — the RAG / pretraining-packing primitive:
    * each document is split into 64-token windows with stride 48
    * (16-token overlap so no boundary-spanning fact is lost), and the
    * operator MATERIALIZES the chunk relation — `explode(sequence(0,
    * nc−1))` — rather than computing counts by formula, because
    * downstream consumers (embedding, packing, indexing) consume the
    * chunks themselves. A doc with nt ≤ 64 is one chunk; otherwise
    * nc = 1 + ⌈(nt−64)/48⌉ and the last chunk ends exactly at nt
    * (start ≥ nt−64 by construction, so every chunk is non-empty and
    * ≤ 64 tokens). Per-source report: chunk counts, emitted-vs-input
    * token cost (`overlap_ppm` — the storage price of the overlap).
    * Scale shape: embarrassingly parallel row-local explode (~nt/48
    * rows per doc, bounded fan-out), two map-side-combined aggregates,
    * one |sources|-row join; no window, no shuffle wider than the
    * (source) rollup. */
  def qChunkRag(s: SparkSession, dir: String): DataFrame =
    chunkRagCols(Tables.documents(s, dir))

  /** Shared batch/streaming core of [[qChunkRag]]: ONE aggregation —
    * doc-level stats ride the chunk rows (counted only on chunk 0) so
    * the whole report is a single groupBy with no doc/chunk join. That
    * shape is what makes the streaming twin legal (one streaming
    * aggregation, complete mode) and saves the batch plan a shuffle. */
  private[graft] def chunkRagCols(docs: DataFrame): DataFrame = {
    val d = docs
      .select(col("source"), col("doc_id"),
        size(tokens(col("text"))).cast("long").as("nt"))
      .filter(col("nt") > 0)
      .withColumn("nc",
        expr("CASE WHEN nt <= 64 THEN 1L ELSE 1L + (nt - 64 + 47) DIV 48 END"))
    d.select(col("source"), col("nt"), col("nc"),
        explode(sequence(lit(0L), col("nc") - 1L)).as("i"))
      .select(col("source"), col("nt"), col("nc"), col("i"),
        (least(col("i") * 48L + 64L, col("nt")) - col("i") * 48L).as("len"))
      .groupBy(col("source"))
      .agg(sum(when(col("i") === 0L, 1L).otherwise(0L)).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        max(col("nc")).as("max_chunks"),
        sum(when(col("i") === 0L, col("nt")).otherwise(0L)).as("toks_in"),
        sum(col("len")).as("toks_emitted"))
      .select(col("source"), col("n_docs"), col("n_chunks"),
        col("max_chunks"), col("toks_in"), col("toks_emitted"),
        expr("((toks_emitted - toks_in) * 1000000L) DIV toks_in").as("overlap_ppm"))
  }

  val qChunkRagSql: String =
    """WITH m AS (
      |  SELECT source, doc_id,
      |    len(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '')) AS nt
      |  FROM documents),
      |d AS (
      |  SELECT source, doc_id, nt,
      |    CASE WHEN nt <= 64 THEN 1 ELSE 1 + (nt - 64 + 47) // 48 END AS nc
      |  FROM m WHERE nt > 0),
      |ch AS (
      |  SELECT source, least(i * 48 + 64, nt) - i * 48 AS len
      |  FROM (SELECT source, nt, unnest(range(0, nc)) AS i FROM d)),
      |pd AS (
      |  SELECT source, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS toks_in,
      |    CAST(sum(nc) AS BIGINT) AS n_chunks,
      |    CAST(max(nc) AS BIGINT) AS max_chunks
      |  FROM d GROUP BY 1),
      |em AS (
      |  SELECT source, CAST(sum(len) AS BIGINT) AS toks_emitted FROM ch GROUP BY 1)
      |SELECT pd.source AS source, n_docs, n_chunks, max_chunks, toks_in,
      |  toks_emitted,
      |  ((toks_emitted - toks_in) * 1000000) // toks_in AS overlap_ppm
      |FROM pd JOIN em ON pd.source = em.source""".stripMargin

  /** TOKEN-BUDGET quality selection — the selection real pretraining
    * mixes execute: per source, take documents in descending
    * lexical-diversity order until 30% of the source's TOKEN MASS is
    * filled (token-budgeted, not count-budgeted like
    * [[qQualityCalibrated]] — a source of short docs needs many more
    * docs to fill the same budget). Resolved exactly from the (source,
    * score) histogram carrying both doc counts AND token mass: the
    * cumulative-from-the-top relation crosses the budget at one row
    * (cum strictly increases), and min/max over the crossing rows
    * recover that row's (threshold value, docs taken, tokens taken) —
    * selection is by VALUE, ties included whole, deterministic on both
    * engines. Scale shape: one corpus pass; windows run over the
    * histogram (value-domain-bounded, the recognized rank-selection
    * pattern); output is |sources| rows. */
  def qTokBudget(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = scoredDocs(s, dir)
    val hist = scored.groupBy($"source", $"score")
      .agg(count(lit(1)).as("cnt"), sum($"nt").as("mass"))
    val w = Window.partitionBy($"source").orderBy($"score".desc)
    val cum = hist
      .withColumn("cum_cnt", sum($"cnt").over(w))
      .withColumn("cum_mass", sum($"mass").over(w))
    cum.join(cum.groupBy($"source")
        .agg(sum($"cnt").as("n_docs"), sum($"mass").as("src_tokens")), "source")
      .withColumn("budget_tokens", expr("(src_tokens * 30) DIV 100"))
      .groupBy($"source")
      .agg(max($"n_docs").as("n_docs"), max($"src_tokens").as("src_tokens"),
        max($"budget_tokens").as("budget_tokens"),
        max(when($"cum_mass" >= $"budget_tokens", $"score")).as("v_th"),
        min(when($"cum_mass" >= $"budget_tokens", $"cum_cnt")).as("n_selected"),
        min(when($"cum_mass" >= $"budget_tokens", $"cum_mass")).as("tokens_selected"))
  }

  val qTokBudgetSql: String =
    """WITH m AS (
      |  SELECT source,
      |    len(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '')) AS nt,
      |    len(list_distinct(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> ''))) AS nd
      |  FROM documents),
      |scored AS (
      |  SELECT source, nt, (nd * 1000000) // nt AS score FROM m WHERE nt > 0),
      |hist AS (
      |  SELECT source, score, count(*) AS cnt, CAST(sum(nt) AS BIGINT) AS mass
      |  FROM scored GROUP BY 1, 2),
      |cum AS (
      |  SELECT source, score, cnt, mass,
      |    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY score DESC) AS BIGINT) AS cum_cnt,
      |    CAST(sum(mass) OVER (PARTITION BY source ORDER BY score DESC) AS BIGINT) AS cum_mass
      |  FROM hist),
      |tot AS (
      |  SELECT source, CAST(sum(cnt) AS BIGINT) AS n_docs,
      |    CAST(sum(mass) AS BIGINT) AS src_tokens
      |  FROM hist GROUP BY 1)
      |SELECT cum.source AS source, max(n_docs) AS n_docs,
      |  max(src_tokens) AS src_tokens,
      |  max((src_tokens * 30) // 100) AS budget_tokens,
      |  max(CASE WHEN cum_mass >= (src_tokens * 30) // 100 THEN score END) AS v_th,
      |  min(CASE WHEN cum_mass >= (src_tokens * 30) // 100 THEN cum_cnt END) AS n_selected,
      |  min(CASE WHEN cum_mass >= (src_tokens * 30) // 100 THEN cum_mass END) AS tokens_selected
      |FROM cum JOIN tot ON cum.source = tot.source
      |GROUP BY 1""".stripMargin

  /** PER-SOURCE DISTRIBUTION DRIFT vs the corpus — an exact discretized
    * Kolmogorov–Smirnov distance: the lexical-diversity score (ppm) is
    * bucketed onto a FIXED 1001-cell grid (score DIV 1000), and the KS
    * statistic is the max gap between the source's and the corpus's
    * cumulative fractions across the grid, in exact integer ppm. The
    * detector behind "this source's quality profile doesn't look like
    * the rest of the mix" — scale-free and threshold-free, with the
    * argmax bucket reported so the drift is locatable. Scale shape: ONE
    * corpus pass — a (source, bucket) count aggregate whose state is
    * ≤ |sources|·1001 cells; the grid cross join, cumulative windows
    * (fixed 1001 rows per partition by construction), and the final max
    * are all corpus-size-independent. The grid window is whitelisted in
    * PlanHygieneSpec's unbounded-window rule with that justification. */
  def qQualityKs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hist = scoredDocs(s, dir)
      .select($"source", expr("score DIV 1000").as("b"))
      .groupBy($"source", $"b").agg(count(lit(1)).as("cnt"))
    val grid = hist.select($"source").distinct()
      .select($"source", explode(sequence(lit(0L), lit(1000L))).as("b"))
    val cumS = grid.join(hist, Seq("source", "b"), "left")
      .withColumn("c", coalesce($"cnt", lit(0L)))
      .withColumn("cum_s", sum($"c").over(
        Window.partitionBy($"source").orderBy($"b".asc)))
      .select($"source", $"b", $"cum_s")
    val histG = hist.groupBy($"b").agg(sum($"cnt").as("cnt"))
    val cumG = grid.select($"b").distinct()
      .join(histG, Seq("b"), "left")
      .withColumn("c", coalesce($"cnt", lit(0L)))
      .withColumn("cum_g", sum($"c").over(Window.orderBy($"b".asc)))
      .select($"b", $"cum_g")
    val n = hist.groupBy($"source").agg(sum($"cnt").as("n_docs"))
    val nG = hist.agg(sum($"cnt").as("n_tot"))
    val gaps = cumS.join(cumG, "b").join(n, "source").crossJoin(broadcast(nG))
      .select($"source", $"b", $"n_docs",
        abs(expr("(cum_s * 1000000L) DIV n_docs")
          - expr("(cum_g * 1000000L) DIV n_tot")).as("gap_ppm"))
    gaps.groupBy($"source").agg(max($"gap_ppm").as("ks_ppm"))
      .join(gaps, Seq("source"))
      .filter($"gap_ppm" === $"ks_ppm")
      .groupBy($"source")
      .agg(max($"n_docs").as("n_docs"), max($"ks_ppm").as("ks_ppm"),
        min($"b").as("ks_bucket"))
  }

  val qQualityKsSql: String =
    """WITH m AS (
      |  SELECT source,
      |    len(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '')) AS nt,
      |    len(list_distinct(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> ''))) AS nd
      |  FROM documents),
      |hist AS (
      |  SELECT source, ((nd * 1000000) // nt) // 1000 AS b, count(*) AS cnt
      |  FROM m WHERE nt > 0 GROUP BY 1, 2),
      |grid AS (
      |  SELECT source, unnest(range(0, 1001)) AS b
      |  FROM (SELECT DISTINCT source FROM hist)),
      |cum_s AS (
      |  SELECT g.source, g.b,
      |    sum(coalesce(h.cnt, 0)) OVER (PARTITION BY g.source ORDER BY g.b) AS cum_s
      |  FROM grid g LEFT JOIN hist h ON g.source = h.source AND g.b = h.b),
      |cum_g AS (
      |  SELECT b, sum(c) OVER (ORDER BY b) AS cum_g
      |  FROM (
      |    SELECT g.b, sum(coalesce(h.cnt, 0)) AS c
      |    FROM (SELECT DISTINCT b FROM grid) g
      |      LEFT JOIN hist h ON g.b = h.b GROUP BY 1)),
      |n AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_docs FROM hist GROUP BY 1),
      |ng AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_tot FROM hist),
      |gaps AS (
      |  SELECT s.source, s.b, n.n_docs,
      |    abs((CAST(s.cum_s AS BIGINT) * 1000000) // n.n_docs
      |      - (CAST(g.cum_g AS BIGINT) * 1000000) // ng.n_tot) AS gap_ppm
      |  FROM cum_s s JOIN cum_g g ON s.b = g.b
      |    JOIN n ON s.source = n.source CROSS JOIN ng),
      |mx AS (SELECT source, max(gap_ppm) AS ks_ppm FROM gaps GROUP BY 1)
      |SELECT gaps.source AS source, max(gaps.n_docs) AS n_docs,
      |  max(mx.ks_ppm) AS ks_ppm, min(gaps.b) AS ks_bucket
      |FROM gaps JOIN mx ON gaps.source = mx.source AND gaps.gap_ppm = mx.ks_ppm
      |GROUP BY 1""".stripMargin

  /** LANGUAGE-PARITY audit of the quality filter — pass rates sliced by
    * the labeled language, with the spread across languages surfaced:
    * rule-based quality filters tuned on one language quietly destroy
    * others (stopword ratios, punctuation norms, token-length priors
    * all shift by language), and this is the report that catches it
    * BEFORE the mix is trained on. One row per lang: docs, exact ppm
    * pass rate, and the global min/max rate for contrast (a parity gap
    * > 2× is a filter bug, not a data property). Scale shape: one
    * qualityMetrics pass joined to the doc→lang map on the id; |langs|
    * rows after; the global extrema are a 1-row broadcast. */
  def qQualityLangparity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byLang = qualityMetrics(s, dir)
      .join(Tables.documents(s, dir).select($"doc_id", $"lang"), "doc_id")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"q_pass".cast("long")).as("n_pass"))
      .withColumn("pass_ppm", expr("(n_pass * 1000000L) DIV n_docs"))
    byLang.crossJoin(broadcast(byLang.agg(
        min($"pass_ppm").as("min_ppm"), max($"pass_ppm").as("max_ppm"))))
      .select($"lang", $"n_docs", $"n_pass", $"pass_ppm",
        $"min_ppm", $"max_ppm")
  }

  val qQualityLangparitySql: String =
    "WITH " + qualityMetricsCte + """,
      |bl AS (
      |  SELECT d.lang, count(*) AS n_docs,
      |    CAST(sum(CASE WHEN q_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
      |  FROM mq JOIN documents d ON mq.doc_id = d.doc_id
      |  GROUP BY 1),
      |p AS (
      |  SELECT lang, n_docs, n_pass,
      |    (n_pass * 1000000) // n_docs AS pass_ppm
      |  FROM bl),
      |t AS (SELECT min(pass_ppm) AS min_ppm, max(pass_ppm) AS max_ppm FROM p)
      |SELECT lang, n_docs, n_pass, pass_ppm, min_ppm, max_ppm
      |FROM p CROSS JOIN t""".stripMargin

  /** The corpus card — one row per source joining the library's own
    * per-source signals: exact-dup stats ([[Dedup.qDedupExact]]), quality
    * pass rate ([[qQualityFilter]]), and vocabulary richness
    * ([[TextAnalysis.qTextVocab]]). Exists to prove the operators COMPOSE
    * as library functions (the oracle composes the same three SQL
    * constants verbatim as sub-CTEs), and because a per-source health
    * report is the first artifact a curation run publishes. Three
    * source-keyed aggregates joined on the same key — co-partitioned,
    * no extra exchange beyond the three upstream shuffles. */
  def qCorpusReport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dedup = graft.queries.Dedup.qDedupExact(s, dir)
    val qual = qQualityFilter(s, dir).select($"source", $"n_pass", $"pass_ppm")
    val vocab = graft.queries.TextAnalysis.qTextVocab(s, dir)
      .select($"source", $"n_tokens", $"n_types", $"ttr_ppm")
    dedup.join(qual, "source").join(vocab, "source")
      .withColumn("dup_ppm", expr("(n_dups * 1000000L) DIV n_docs"))
      .select($"source", $"n_docs", $"n_unique", $"dup_ppm",
        $"n_pass", $"pass_ppm", $"n_tokens", $"n_types", $"ttr_ppm")
  }

  def qCorpusReportSql: String =
    s"""WITH d AS (SELECT * FROM (${graft.queries.Dedup.qDedupExactSql}) dd),
       |q AS (SELECT * FROM ($qQualityFilterSql) qq),
       |v AS (SELECT * FROM (${graft.queries.TextAnalysis.qTextVocabSql}) vv)
       |SELECT d.source, d.n_docs, d.n_unique,
       |  (d.n_dups * 1000000) // d.n_docs AS dup_ppm,
       |  q.n_pass, q.pass_ppm, v.n_tokens, v.n_types, v.ttr_ppm
       |FROM d JOIN q ON d.source = q.source JOIN v ON d.source = v.source""".stripMargin

  /** The END-TO-END curation pipeline as ONE query — the funnel a corpus
    * actually runs: quality gate (the C4-flavored composite rules) →
    * near-dup removal (keep each cluster's canonical doc) →
    * eval-set DECONTAMINATION (round 10: the majority-shingle-overlap
    * removal flag of q_decontaminate, completing the canonical
    * quality→dedup→decontam→sample→pack stage order) → deterministic
    * 50% hash sample → context-window packing manifest. Output is the
    * per-source assembly report (counts surviving each stage, token
    * volume, bin count) — the corpus manifest a training run consumes.
    * Every stage is a per-row flag over ONE pass of the documents table
    * (the near-dup removal set and the contaminated set join in from
    * the already-memoized/gated relations), so the funnel costs one
    * scan + one source-keyed aggregate beyond the shared pipelines.
    * Oracle composes the cluster-closure SQL and the decontamination
    * SQL in derived tables (DuckDB allows WITH RECURSIVE there) with
    * the same per-doc flags. */
  def qPipelineCurate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = qualityMetrics(s, dir)
      .withColumn("tok_est", expr("n_chars DIV 4") + 1L)
      .withColumn("bucket", graft.functions.Hashing.bucket("doc_id", 100))
    val removed = graft.queries.Dedup.qDedupKeep(s, dir)
      .select($"removed_doc".as("doc_id"), lit(1L).as("rm"))
    val cont = graft.queries.Dedup.qDecontaminate(s, dir)
      .filter($"contaminated" === 1L)
      .select($"doc_id", lit(1L).as("ct"))
    m.join(removed, Seq("doc_id"), "left")
      .join(cont, Seq("doc_id"), "left")
      .withColumn("kept_dedup", $"q_pass" && $"rm".isNull)
      .withColumn("kept_clean", $"kept_dedup" && $"ct".isNull)
      .withColumn("sampled", $"kept_clean" && $"bucket" < 50)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_input"),
           sum($"q_pass".cast("long")).as("n_quality"),
           sum($"kept_dedup".cast("long")).as("n_dedup"),
           sum($"kept_clean".cast("long")).as("n_decontam"),
           sum($"sampled".cast("long")).as("n_sampled"),
           coalesce(sum(when($"sampled", $"tok_est")), lit(0L)).as("tok_total"))
      .withColumn("n_bins", expr("(tok_total + 8191L) DIV 8192"))
  }

  def qPipelineCurateSql: String =
    s"""WITH rm AS (
       |  SELECT doc_id FROM (
       |    SELECT * FROM (${graft.queries.Dedup.qDedupClusterSql}) cc) c
       |  WHERE doc_id <> cluster),
       |ct AS (
       |  SELECT doc_id FROM (${graft.queries.Dedup.qDecontaminateSql}) dc
       |  WHERE contaminated = 1),
       |$qualityMetricsCte,
       |f AS (
       |  SELECT mq.*, n_chars // 4 + 1 AS tok_est,
       |    ${h60Duck("mq.doc_id")} % 100 AS bucket,
       |    rm.doc_id IS NOT NULL AS is_removed,
       |    ct.doc_id IS NOT NULL AS is_cont
       |  FROM mq LEFT JOIN rm ON mq.doc_id = rm.doc_id
       |           LEFT JOIN ct ON mq.doc_id = ct.doc_id),
       |g AS (
       |  SELECT source, count(*) AS n_input,
       |    CAST(sum(CASE WHEN q_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       |    CAST(sum(CASE WHEN q_pass AND NOT is_removed THEN 1 ELSE 0 END) AS BIGINT) AS n_dedup,
       |    CAST(sum(CASE WHEN q_pass AND NOT is_removed AND NOT is_cont THEN 1 ELSE 0 END) AS BIGINT) AS n_decontam,
       |    CAST(sum(CASE WHEN q_pass AND NOT is_removed AND NOT is_cont AND bucket < 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       |    CAST(coalesce(sum(CASE WHEN q_pass AND NOT is_removed AND NOT is_cont AND bucket < 50 THEN tok_est END), 0) AS BIGINT) AS tok_total
       |  FROM f GROUP BY source)
       |SELECT source, n_input, n_quality, n_dedup, n_decontam, n_sampled, tok_total,
       |  (tok_total + 8191) // 8192 AS n_bins
       |FROM g""".stripMargin

  /** Context-window packing: contiguous-fill documents (ordered by doc_id
    * within source) into 8192-token bins by running token count — the
    * sequence-packing step of pretraining batch assembly. One window pass
    * per source partition; bins are deterministic and engine-identical
    * because the running sum is integer. Documents spanning a boundary
    * belong to the bin their cumulative end lands in (contiguous fill,
    * not first-fit).
    *
    * NOTE: this window form is the executable SPEC; the gated q_pack_bins
    * entry runs [[packBinsDistributed]] — the two-pass prefix-sum form
    * that parallelizes a dominant source across tasks — against the same
    * oracle, so the 100 TB code path is what the driver hash-checks. */
  def qPackBins(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"source").orderBy($"doc_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, dir)
      .select($"source", $"doc_id", (expr("n_chars DIV 4") + 1L).as("tok_est"))
      .withColumn("running", sum($"tok_est").over(w))
      .withColumn("bin", expr("(running - 1) DIV 8192"))
      .groupBy($"source", $"bin")
      .agg(count(lit(1)).as("n_docs"), sum($"tok_est").as("bin_tokens"))
  }

  val qPackBinsSql: String =
    """WITH est AS (
      |  SELECT source, doc_id, n_chars // 4 + 1 AS tok_est FROM documents),
      |packed AS (
      |  SELECT source, doc_id, tok_est,
      |    (CAST(sum(tok_est) OVER (PARTITION BY source ORDER BY doc_id ASC
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - 1) // 8192 AS bin
      |  FROM est)
      |SELECT source, bin, count(*) AS n_docs,
      |  CAST(sum(tok_est) AS BIGINT) AS bin_tokens
      |FROM packed GROUP BY source, bin""".stripMargin

  /** Distributed packing (the 100 TB form of [[qPackBins]]): a window
    * partitioned only by source serializes a dominant source onto one
    * task, so this is the classic two-pass parallel prefix sum instead —
    * (1) range-partition by (source, doc_id) and compute each partition's
    * per-source token subtotal, (2) broadcast the driver-small exclusive
    * offsets (#partitions x #sources rows), (3) a second map pass adds
    * local running sums to the offsets. Exactly equals the window
    * formulation (spec-proven); every stage is map-side or
    * range-partitioned. */
  def packBinsDistributed(s: SparkSession, dir: String,
                          binTokens: Long = 8192, partitions: Int = 8): DataFrame = {
    import s.implicits._
    // materialize the range partitioning ONCE: RangePartitioner samples
    // its bounds per physical plan, so without pinning, the subtotal pass
    // and the packing pass could see different pid assignments. persist
    // (not checkpoint) so the pinned blocks are RELEASED on return —
    // the result below is materialized before unpersist.
    val withPid = Tables.documents(s, dir)
      .select($"source", $"doc_id", (expr("n_chars DIV 4") + 1L).as("tok_est"))
      .repartitionByRange(partitions, $"source", $"doc_id")
      .sortWithinPartitions($"source", $"doc_id")
      .withColumn("pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: per (pid, source) subtotal — driver-small by construction
    val subtotals = withPid.groupBy($"pid", $"source")
      .agg(sum($"tok_est").as("sub"))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    // exclusive prefix offset per (pid, source): subtotals of earlier pids
    val offsets = subtotals.keys.map { case (pid, src) =>
      (pid, src) -> subtotals.collect {
        case ((p, s2), v) if s2 == src && p < pid => v
      }.sum
    }.toMap
    val bOffsets = s.sparkContext.broadcast(offsets)
    try {
      // pass 2: local running sum + broadcast offset (rows are sorted by
      // (source, doc_id) within each range partition)
      withPid.as[(String, Long, Long, Int)]
        .mapPartitions { rows =>
          val off = bOffsets.value
          var curSrc: String = null
          var running = 0L
          rows.map { case (src, id, tok, pid) =>
            if (src != curSrc) { curSrc = src; running = off.getOrElse((pid, src), 0L) }
            running += tok
            (src, id, tok, (running - 1) / binTokens)
          }
        }
        .toDF("source", "doc_id", "tok_est", "bin")
        .groupBy($"source", $"bin")
        .agg(count(lit(1)).as("n_docs"), sum($"tok_est").as("bin_tokens"))
        .localCheckpoint(true) // bins-scale tiny; frees the big input below
    } finally {
      withPid.unpersist()
      bOffsets.destroy()
    }
  }

  /** PII scrubbing: count and redact emails / phone numbers / IPv4s.
    * The synthetic corpus carries no PII, so each doc is deterministically
    * augmented with derived contact strings first — the scrub then
    * provably fires on every row and the oracle hashes the redacted
    * output. Patterns are RE2-safe (no lookahead) so both engines match
    * identically. */
  def qPiiScrub(s: SparkSession, dir: String): DataFrame =
    piiScrubCols(Tables.documents(s, dir))

  /** Shared batch/streaming core of [[qPiiScrub]]: pure per-row regex
    * work, so the streaming twin runs the same columns unchanged in
    * append mode — redaction-at-ingest. */
  private[graft] def piiScrubCols(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val emailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phonePat = "\\b555-[0-9]{3,7}\\b"
    val ipPat = "\\b10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    // phone suffix zero-padded to 4 digits: "555-" + 1-2 digits would not
    // match [0-9]{3,7} and the "provably fires on every row" claim would
    // be false for doc_id % 1000 < 100
    val aug = concat($"text",
      lit(" contact user"), $"doc_id", lit("@mail.example"),
      lit(" tel 555-"), lpad(pmod($"doc_id", lit(1000L)).cast("string"), 4, "0"),
      lit(" ip 10."), pmod($"doc_id", lit(256L)), lit(".0.1"))
    val scrubbed = regexp_replace(
      regexp_replace(
        regexp_replace(aug, emailPat, "<EMAIL>"),
        phonePat, "<PHONE>"),
      ipPat, "<IP>")
    docs
      .select($"doc_id",
        size(regexp_extract_all(aug, lit(emailPat), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(aug, lit(phonePat), lit(0))).cast("long").as("n_phones"),
        size(regexp_extract_all(aug, lit(ipPat), lit(0))).cast("long").as("n_ips"),
        md5(scrubbed).as("scrubbed_md5"))
  }

  val qPiiScrubSql: String =
    """WITH aug AS (
      |  SELECT doc_id,
      |    text || ' contact user' || doc_id || '@mail.example'
      |         || ' tel 555-' || lpad((doc_id % 1000)::VARCHAR, 4, '0')
      |         || ' ip 10.' || (doc_id % 256) || '.0.1' AS t
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(t, '\b555-[0-9]{3,7}\b')) AS BIGINT) AS n_phones,
      |  CAST(len(regexp_extract_all(t, '\b10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
      |  md5(regexp_replace(regexp_replace(regexp_replace(t,
      |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
      |    '\b555-[0-9]{3,7}\b', '<PHONE>', 'g'),
      |    '\b10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g')) AS scrubbed_md5
      |FROM aug""".stripMargin

  /** Composite quality filter (C4-flavored rules over integer metrics):
    * token-count bounds, punctuation ratio cap, type-token-ratio floor.
    * Emits the per-source pass rate — the knob a corpus curator tunes. */
  /** THE per-doc quality rule — single definition consumed by both
    * qQualityFilter (the per-source aggregate) and qPipelineCurate (the
    * funnel's first stage), so a threshold tweak can never silently
    * diverge between the two. Mirrored once on the SQL side
    * ([[qualityMetricsCte]]). */
  private[graft] def qualityMetrics(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = tokens($"text")
    Tables.documents(s, dir)
      .select($"doc_id", $"source", $"n_chars",
        size(toks).cast("long").as("nt"),
        size(array_distinct(toks)).cast("long").as("nd"),
        length(regexp_replace($"text", "[a-z0-9 ]", "")).cast("long").as("np"),
        length($"text").cast("long").as("nc"))
      .withColumn("q_pass",
        $"nt" >= 10 && $"nt" <= 5000 &&
        $"np" * 1000000L <= $"nc" * 300000L &&
        $"nd" * 1000000L >= $"nt" * 300000L)
  }

  def qQualityFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    qualityMetrics(s, dir)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
           sum($"q_pass".cast("long")).as("n_pass"))
      .withColumn("pass_ppm", expr("(n_pass * 1000000L) DIV n_docs"))
  }

  /** SQL twin of [[qualityMetrics]] — plain (non-interpolated) literal so
    * regex backslashes stay single. */
  // lazy: referenced by oracle constants declared EARLIER in the file
  // (Scala vals initialize in declaration order — a plain val here left
  // q_quality_langparity's SQL with "WITH null,")
  private[graft] lazy val qualityMetricsCte: String =
    """m AS (
      |  SELECT doc_id, source, n_chars,
      |    len(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '')) AS nt,
      |    len(list_distinct(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> ''))) AS nd,
      |    length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS np,
      |    length(text) AS nc
      |  FROM documents),
      |mq AS (
      |  SELECT m.*,
      |    (nt >= 10 AND nt <= 5000 AND np * 1000000 <= nc * 300000
      |     AND nd * 1000000 >= nt * 300000) AS q_pass
      |  FROM m)""".stripMargin

  val qQualityFilterSql: String =
    "WITH " + qualityMetricsCte + "\n" +
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN q_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
      |  (CAST(sum(CASE WHEN q_pass THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
      |    // count(*) AS pass_ppm
      |FROM mq GROUP BY source""".stripMargin

  /** PMI collocations: top-20 co-occurring token pairs (integer-ordered,
    * like qTextCooc) scored by pointwise mutual information — the
    * phrase-mining statistic. Row membership and order are integer-exact;
    * the PMI value is micro-unit fixed point over an exact rational, so
    * both engines' ln() ulps are absorbed by the rounding.
    *
    * Derives from the SHARED support-pruned pair pipeline
    * ([[TokenPairs.top20]]) — one pair join feeds both this and qTextCooc,
    * and the corpus size folds in as a broadcast 1-row aggregate instead
    * of a docs.count() driver action. */
  def qTextPmi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TokenPairs.top20(s, dir)
      .select($"tok_a", $"tok_b", $"n_ab", $"c_a", $"c_b",
        round(log($"n_docs_total".cast("double") * $"n_ab" / ($"c_a" * $"c_b")) * 1e6)
          .cast("long").as("pmi_u"))
  }

  val qTextPmiSql: String =
    """WITH dt AS (
      |  SELECT DISTINCT doc_id, unnest(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '')) AS tok
      |  FROM documents),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |tc AS (SELECT tok, count(*) AS c FROM dt GROUP BY tok),
      |pairs AS (
      |  SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_ab
      |  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
      |  GROUP BY 1, 2 ORDER BY n_ab DESC, tok_a ASC, tok_b ASC LIMIT 20)
      |SELECT tok_a, tok_b, n_ab, x.c AS c_a, y.c AS c_b,
      |  CAST(round(ln(CAST(n.n_docs AS DOUBLE) * n_ab / (x.c * y.c)) * 1e6) AS BIGINT) AS pmi_u
      |FROM pairs JOIN tc x ON x.tok = tok_a JOIN tc y ON y.tok = tok_b
      |CROSS JOIN n""".stripMargin

  /** Bigram language-model scoring — the classic statistical quality
    * signal: train bigram/unigram counts on the corpus itself, then score
    * each document's mean per-bigram log-probability ln(c12/c1). Each
    * bigram's log-prob is rounded to micro-units BEFORE summation, so the
    * per-doc total is an exact integer on both engines (float sums are
    * order-dependent; integer sums are not). Two shuffles (bigram count,
    * doc re-aggregation) — both key-partitioned, linear at scale. */
  /** (doc_id, bg) — one row per bigram OCCURRENCE (duplicates kept) of any
    * (doc_id, text, …) relation; stateless per-row explode, so it runs
    * unchanged on a stream (StreamingEtl.lmScoreStream). */
  private[graft] def bigramsOf(docs: DataFrame): DataFrame =
    // single-pass native n-gram extraction (round-15, guide §4) — the
    // previous tokens → slice/zip_with/concat_ws chain walked an
    // interpreted lambda per token; the HOF form stays the executable
    // spec ([[bigramsOfHof]], equality property-checked). < 2 tokens →
    // empty array → explode emits no rows, matching the old filter.
    docs.select(col("doc_id"),
      explode(org.apache.spark.sql.graft.NativeExprs.tokenNgrams(col("text"), 2)).as("bg"))

  /** HOF executable spec of [[bigramsOf]] (the pre-round-15 form). */
  private[graft] def bigramsOfHof(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(
        zip_with(slice(col("t"), lit(1), size(col("t")) - 1),
                 slice(col("t"), lit(2), size(col("t")) - 1),
          (a, b) => concat_ws(" ", a, b))).as("bg"))
  }

  /** (doc_id, bg) — shared by the LM trainer ([[qBigramLm]]) and the
    * LM-coverage scorer ([[qLmScore]]). MEMOIZED + MATERIALIZED per
    * (session, sf-dir): qBigramLm alone reads this relation in THREE
    * subtrees of one plan (bigram counts, unigram counts, scoring), and
    * a real pipeline extracts n-grams once and fans out — same holder
    * pattern and dead-session sweep as Dedup's caches. */
  private final class LazyDf(compute: () => DataFrame) {
    lazy val df: DataFrame = compute()
  }
  private val bigramsCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), LazyDf]()
  private[graft] def docBigrams(s: SparkSession, dir: String): DataFrame = {
    bigramsCache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    bigramsCache.computeIfAbsent((s, dir), _ => new LazyDf(() =>
      Memo.materialize(bigramsOf(Tables.documents(s, dir))))).df
  }

  def qBigramLm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docBigrams = this.docBigrams(s, dir)
    val bgCount = docBigrams.groupBy($"bg").agg(count(lit(1)).as("c12"))
    val w1Count = docBigrams
      .select($"doc_id", split($"bg", " ").getItem(0).as("w1"))
      .groupBy($"w1").agg(count(lit(1)).as("c1"))
    // negative log-likelihood (>= 0): keeps the mean's integer division
    // on positive values, where Spark DIV (truncate) == DuckDB // (floor)
    docBigrams
      .join(bgCount, "bg")
      .withColumn("w1", split($"bg", " ").getItem(0))
      .join(w1Count, "w1")
      .withColumn("nll_u", round(log($"c1".cast("double") / $"c12") * 1e6).cast("long"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"nll_u").as("nll_sum_u"))
      .withColumn("mean_nll_u", expr("nll_sum_u DIV n_bigrams"))
  }

  val qBigramLmSql: String =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '') AS toks
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS bg
      |  FROM t WHERE len(toks) >= 2),
      |bgc AS (SELECT bg, count(*) AS c12 FROM bg GROUP BY bg),
      |w1c AS (SELECT string_split(bg, ' ')[1] AS w1, count(*) AS c1 FROM bg GROUP BY 1),
      |scored AS (
      |  SELECT doc_id,
      |    CAST(round(ln(CAST(c1 AS DOUBLE) / c12) * 1e6) AS BIGINT) AS nll_u
      |  FROM bg
      |  JOIN bgc USING (bg)
      |  JOIN w1c ON w1c.w1 = string_split(bg.bg, ' ')[1])
      |SELECT doc_id, count(*) AS n_bigrams,
      |  CAST(sum(nll_u) AS BIGINT) AS nll_sum_u,
      |  CAST(sum(nll_u) AS BIGINT) // count(*) AS mean_nll_u
      |FROM scored GROUP BY doc_id""".stripMargin

  /** LM-coverage quality score — the "model-based filtering" step of a
    * curation pipeline with the corpus's own top-500 bigram table as the
    * (deterministic) language model: a doc whose bigrams rarely appear in
    * the model's head is flagged low-coverage (boilerplate, non-language,
    * OCR noise). The model is a FIXED-size artifact (top-500 by count,
    * tie-broken by bigram text) so it broadcasts at any corpus size; the
    * scoring join is then map-side against the broadcast set — the per-doc
    * aggregation is the only shuffle. Coverage is exact integer ppm. */
  def qLmScore(s: SparkSession, dir: String): DataFrame =
    lmScoreAgainstIndex(docBigrams(s, dir), lmIndex(s, dir))

  /** The trained LM artifact as a WRITE-ONCE index (round-15): built once
    * per (session, corpus) and served materialized to every prober — the
    * batch scorer and the streaming twin — instead of re-running the
    * full bigram aggregation + top-k inside each probing plan (for the
    * stream gate that re-run sat INSIDE every micro-batch's broadcast
    * build; guide §2.4/§5: don't recompute what a static side can hold). */
  private[graft] def lmIndex(s: SparkSession, dir: String): DataFrame =
    Memo.sessionCached(s, dir, "lm_top500")(lmTop500(docBigrams(s, dir)))

  /** The fixed-size LM artifact: top-500 bigrams by count (ties →
    * bigram text) with a constant in_lm marker — broadcastable at any
    * corpus size. */
  private[graft] def lmTop500(bg: DataFrame): DataFrame =
    bg.groupBy(col("bg")).agg(count(lit(1)).as("c12"))
      .orderBy(col("c12").desc, col("bg").asc).limit(500)
      .select(col("bg"), lit(1L).as("in_lm"))

  /** Score (doc_id, bg) rows against a broadcast LM index — shared
    * verbatim by the batch operator and StreamingEtl.lmScoreStream, so
    * the stream == batch equality is structural. */
  private[graft] def lmScoreAgainstIndex(bg: DataFrame, top: DataFrame): DataFrame =
    bg.join(broadcast(top), Seq("bg"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
           sum(coalesce(col("in_lm"), lit(0L))).as("n_hits"))
      .withColumn("lm_cov_ppm", expr("(n_hits * 1000000L) DIV n_bigrams"))

  val qLmScoreSql: String =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '') AS toks
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS bg
      |  FROM t WHERE len(toks) >= 2),
      |top AS (
      |  SELECT bg, 1 AS in_lm FROM (
      |    SELECT bg, count(*) AS c12 FROM bg GROUP BY bg
      |    ORDER BY c12 DESC, bg ASC LIMIT 500))
      |SELECT doc_id, count(*) AS n_bigrams,
      |  CAST(sum(coalesce(in_lm, 0)) AS BIGINT) AS n_hits,
      |  (CAST(sum(coalesce(in_lm, 0)) AS BIGINT) * 1000000) // count(*) AS lm_cov_ppm
      |FROM bg LEFT JOIN top USING (bg)
      |GROUP BY doc_id""".stripMargin

  /** Weighted deterministic sampling — keep probability proportional to a
    * per-doc weight (here: document length, capped), decided by the shared
    * content-stable 60-bit hash against a basis-point threshold. The
    * quality/length-weighted variant of [[qSampleStratified]]: no RNG, no
    * per-partition state, identical membership on any cluster size or
    * engine. Weights are exact integers (bp = min(9500, n_chars/2)). */
  def qSampleWeighted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", $"source", $"n_chars",
        least(lit(9500L), expr("n_chars DIV 2")).as("w_bp"),
        graft.functions.Hashing.bucket("doc_id", 10000).as("bucket"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_total"),
           sum(when($"bucket" < $"w_bp", 1L).otherwise(0L)).as("n_kept"),
           // .otherwise(0): a source whose every doc misses the threshold
           // yields 0, not NULL (NULL would render float64 at the gate)
           sum(when($"bucket" < $"w_bp", $"doc_id").otherwise(0L)).as("kept_id_sum"),
           sum($"w_bp").as("sum_w_bp"))
  }

  val qSampleWeightedSql: String =
    s"""WITH hashed AS (
       |  SELECT doc_id, source, n_chars,
       |    least(9500, n_chars // 2) AS w_bp,
       |    ${h60Duck("doc_id")} % 10000 AS bucket
       |  FROM documents)
       |SELECT source, count(*) AS n_total,
       |  CAST(sum(CASE WHEN bucket < w_bp THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN bucket < w_bp THEN doc_id ELSE 0 END) AS BIGINT) AS kept_id_sum,
       |  CAST(sum(w_bp) AS BIGINT) AS sum_w_bp
       |FROM hashed GROUP BY source""".stripMargin

  /** Hashed-linear-classifier scoring — the "apply the trained quality
    * classifier to every document" step (the C4/CCNet-style model-based
    * filter) with the REAL production plumbing: features are hashed
    * tokens (no vocabulary lookup — the weight of a token is derived
    * arithmetically from the shared 60-bit hash, the hashing-trick
    * feature map), scoring is a per-row fold over the token array, and
    * the keep decision is the score's sign. The weight table here is a
    * deterministic stand-in ((h mod 1001) − 500, i.e. uniform in
    * [−500, 500]) so the gate can hash-check the machinery on both
    * engines; swapping in trained weights changes one expression.
    * Fully map-side (zero shuffle — the per-doc output IS the result). */
  def qClfScore(s: SparkSession, dir: String): DataFrame =
    clfScoreCols(Tables.documents(s, dir))

  /** The scoring columns on any (doc_id, source, text, …) relation —
    * stateless per-row expressions, so the SAME code scores an unbounded
    * stream (StreamingEtl.clfScoreStream; stream == batch spec'd). */
  private[graft] def clfScoreCols(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val w = (tk: org.apache.spark.sql.Column) =>
      graft.functions.TextFunctions.hash60(tk) % 1001L - 500L
    docs
      .select(col("doc_id"), col("source"), toks.as("t"))
      .filter(size(col("t")) > 0)
      .select(col("doc_id"), col("source"),
        size(col("t")).cast("long").as("n_tokens"),
        aggregate(col("t"), lit(0L), (acc, tk) => acc + w(tk)).as("score_sum"))
      .withColumn("clf_u", expr("(score_sum * 1000000L) DIV (n_tokens * 500L)"))
      .withColumn("keep", (col("score_sum") > 0).cast("long"))
  }

  val qClfScoreSql: String =
    """WITH t AS (
      |  SELECT doc_id, source,
      |    list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '') AS toks
      |  FROM documents)
      |SELECT doc_id, source, len(toks)::BIGINT AS n_tokens,
      |  CAST(list_sum(list_transform(toks,
      |    x -> ('0x' || substr(md5(x), 18, 15))::BIGINT % 1001 - 500)) AS BIGINT) AS score_sum,
      |  CAST(list_sum(list_transform(toks,
      |    x -> ('0x' || substr(md5(x), 18, 15))::BIGINT % 1001 - 500)) AS BIGINT)
      |    * 1000000 // (len(toks) * 500) AS clf_u,
      |  CAST(CASE WHEN CAST(list_sum(list_transform(toks,
      |    x -> ('0x' || substr(md5(x), 18, 15))::BIGINT % 1001 - 500)) AS BIGINT) > 0
      |    THEN 1 ELSE 0 END AS BIGINT) AS keep
      |FROM t WHERE len(toks) > 0""".stripMargin

  /** Domain-mixing plan — the sampling-rate table a training run consumes:
    * given per-source token counts and an equal-share token budget, the
    * per-source keep rate (capped at 1), expected kept tokens, and the
    * deficit a low-resource source leaves unfilled. All exact integer
    * arithmetic: rate_ppm = min(1e6, budget·1e6 DIV tokens). One
    * aggregate over the token-count scan + a broadcast 1-row total —
    * the plan output is |sources| rows at any corpus size. */
  def qMixPlan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perSource = Tables.documents(s, dir)
      .select($"source", size(tokens($"text")).cast("long").as("nt"))
      .groupBy($"source")
      .agg(sum($"nt").as("src_tokens"), count(lit(1)).as("n_docs"))
    val totals = perSource.agg(
      sum($"src_tokens").as("total_tokens"),
      count(lit(1)).as("n_sources"))
    perSource.crossJoin(broadcast(totals))
      .withColumn("budget_tokens", expr("total_tokens DIV n_sources"))
      .withColumn("rate_ppm",
        least(lit(1000000L), expr("(budget_tokens * 1000000L) DIV src_tokens")))
      .withColumn("expected_tokens", expr("(src_tokens * rate_ppm) DIV 1000000L"))
      .withColumn("deficit_tokens",
        greatest(lit(0L), expr("budget_tokens - expected_tokens")))
      .select($"source", $"n_docs", $"src_tokens", $"budget_tokens",
        $"rate_ppm", $"expected_tokens", $"deficit_tokens")
  }

  val qMixPlanSql: String =
    """WITH per_source AS (
      |  SELECT source,
      |    CAST(sum(len(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> ''))) AS BIGINT) AS src_tokens,
      |    count(*) AS n_docs
      |  FROM documents GROUP BY source),
      |t AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS total_tokens,
      |             count(*) AS n_sources FROM per_source),
      |p AS (
      |  SELECT source, n_docs, src_tokens,
      |    total_tokens // n_sources AS budget_tokens,
      |    least(1000000, ((total_tokens // n_sources) * 1000000) // src_tokens) AS rate_ppm
      |  FROM per_source CROSS JOIN t)
      |SELECT source, n_docs, src_tokens, budget_tokens, rate_ppm,
      |  (src_tokens * rate_ppm) // 1000000 AS expected_tokens,
      |  greatest(0, budget_tokens - (src_tokens * rate_ppm) // 1000000) AS deficit_tokens
      |FROM p""".stripMargin

  /** Shard manifest — the last step of the assembly pipeline (curate →
    * pack → SHARD → publish): every document deterministically assigned
    * to one of 64 shards by the shared content-stable hash (reproducible
    * on any cluster size, no RNG, no coordination), with the per-shard
    * balance audit a publisher checks before shipping: doc count, token
    * mass, id range, and the shard's deviation from the mean token load
    * in exact ppm. Map-side assignment + ONE keyed aggregation; the
    * manifest is 64 rows at any corpus size. */
  def qShardManifest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val Shards = 64
    val perShard = Tables.documents(s, dir)
      .select($"doc_id", size(tokens($"text")).cast("long").as("nt"),
        graft.functions.Hashing.bucket("doc_id", Shards).as("shard"))
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"nt").as("n_tokens"),
           min($"doc_id").as("min_doc"), max($"doc_id").as("max_doc"))
    val mean = perShard.agg(
      sum($"n_tokens").as("total_tokens"), count(lit(1)).as("n_shards"))
    perShard.crossJoin(broadcast(mean))
      .withColumn("mean_tokens", expr("total_tokens DIV n_shards"))
      .withColumn("dev_ppm",
        expr("(abs(n_tokens - mean_tokens) * 1000000L) DIV mean_tokens"))
      .select($"shard", $"n_docs", $"n_tokens", $"min_doc", $"max_doc",
        $"mean_tokens", $"dev_ppm")
  }

  val qShardManifestSql: String =
    s"""WITH assigned AS (
       |  SELECT doc_id,
       |    len(list_filter(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '), x -> x <> '')) AS nt,
       |    ${h60Duck("doc_id")} % 64 AS shard
       |  FROM documents),
       |per_shard AS (
       |  SELECT shard, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens,
       |    min(doc_id) AS min_doc, max(doc_id) AS max_doc
       |  FROM assigned GROUP BY shard),
       |m AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |             count(*) AS n_shards FROM per_shard)
       |SELECT shard, n_docs, n_tokens, min_doc, max_doc,
       |  total_tokens // n_shards AS mean_tokens,
       |  (abs(n_tokens - total_tokens // n_shards) * 1000000)
       |    // (total_tokens // n_shards) AS dev_ppm
       |FROM per_shard CROSS JOIN m""".stripMargin

  /** WINSORIZED per-source length statistics — the robust-stats pass a
    * quality dashboard runs before trusting any mean: a handful of
    * pathological documents (empty stubs, concatenated dumps) can move a
    * raw mean arbitrarily, so lengths are clipped to the exact
    * rank-based [p05, p95] before averaging. Percentiles as pure integer
    * rank arithmetic — the p-th bound is the value at row ⌈p·n⌉ of the
    * per-source length ordering, computed as (n·k+99) DIV 100, so both
    * engines agree exactly (no float percentile semantics involved, no
    * interpolation).
    *
    * Distributed form (round-6): the value at rank k is looked up in the
    * [[rankSpans]] value histogram (the row whose [lo_rk, hi_rk] span
    * contains k) — no per-row row_number window, so no single-task sort
    * of a whole source. The bounds relation is |sources| rows and joins
    * back unhinted (AQE broadcasts it adaptively). */
  def qQualityWinsor(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.documents(s, dir)
      .select($"source", $"n_chars".cast("long").as("v"))
    val spans = rankSpans(d, "v")
    val withN = spans.join(
      spans.groupBy($"source").agg(sum($"cnt").as("n")), "source")
      .withColumn("k05", expr("(n * 5 + 99) DIV 100"))
      .withColumn("k95", expr("(n * 95 + 99) DIV 100"))
    val bounds = withN.groupBy($"source")
      .agg(max(when($"lo_rk" <= $"k05" && $"k05" <= $"hi_rk", $"v")).as("lo"),
           max(when($"lo_rk" <= $"k95" && $"k95" <= $"hi_rk", $"v")).as("hi"))
    d.join(bounds, "source")
      .withColumn("cv", least(greatest($"v", $"lo"), $"hi"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
           max($"lo").as("p05"), max($"hi").as("p95"),
           expr("(sum(v) * 100) DIV count(1)").as("mean_c"),
           expr("(sum(cv) * 100) DIV count(1)").as("wmean_c"),
           sum(($"v" < $"lo").cast("long")).as("n_clip_lo"),
           sum(($"v" > $"hi").cast("long")).as("n_clip_hi"))
  }

  val qQualityWinsorSql: String =
    """WITH d AS (SELECT source, CAST(n_chars AS BIGINT) AS v FROM documents),
      |ranked AS (
      |  SELECT source, v,
      |    row_number() OVER (PARTITION BY source ORDER BY v ASC) AS rk,
      |    count(*) OVER (PARTITION BY source) AS n
      |  FROM d),
      |bounds AS (
      |  SELECT source,
      |    max(CASE WHEN rk = (n * 5 + 99) // 100 THEN v END) AS lo,
      |    max(CASE WHEN rk = (n * 95 + 99) // 100 THEN v END) AS hi
      |  FROM ranked GROUP BY source)
      |SELECT d.source, count(*) AS n_docs,
      |  CAST(max(lo) AS BIGINT) AS p05, CAST(max(hi) AS BIGINT) AS p95,
      |  CAST((sum(v) * 100) // count(*) AS BIGINT) AS mean_c,
      |  CAST((sum(least(greatest(v, lo), hi)) * 100) // count(*) AS BIGINT) AS wmean_c,
      |  CAST(sum(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
      |  CAST(sum(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi
      |FROM d JOIN bounds USING (source)
      |GROUP BY d.source""".stripMargin

  /** Corpus SNAPSHOT DIFF — the data-versioning audit between two
    * releases of the same corpus: per source, how many documents were
    * added, removed, changed (same id, different content hash), or
    * untouched. The two snapshots are deterministic views of the test
    * corpus (yesterday = ids with doc_id % 7 != 0, and every % 11 == 0
    * doc carries an older text revision), so the full-outer
    * reconciliation, both null-fill sides, and the hash comparison are
    * all genuinely exercised. Plan: one full outer join on the id (both
    * sides hash-partitioned once), md5 compare in-row, one aggregate —
    * linear, the diff report is |sources| rows at any scale. */
  def qCorpusDiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select($"doc_id", $"source", $"text")
    // retired docs (ids the new snapshot no longer carries) keep the
    // n_removed branch genuinely exercised, not vacuously zero; they live
    // in the NEGATIVE id namespace (-(id+1), injective for any id >= 0)
    // so the convention cannot collide with real doc_ids at any corpus
    // size — a fixed additive offset would break past that many docs
    val old = docs.filter($"doc_id" % 7 =!= 0)
      .select($"doc_id", $"source",
        md5(when($"doc_id" % 11 === 0, concat($"text", lit(" [rev0]")))
          .otherwise($"text")).as("h"))
      .unionByName(docs.filter($"doc_id" % 13 === 0)
        .select((-($"doc_id" + 1L)).as("doc_id"), $"source",
          md5($"text").as("h")))
    val nw = docs.select($"doc_id", $"source", md5($"text").as("h"))
    old.as("a").join(nw.as("b"), Seq("doc_id"), "full_outer")
      .select(
        coalesce($"a.source", $"b.source").as("source"),
        $"a.h".as("h_old"), $"b.h".as("h_new"))
      .groupBy($"source")
      .agg(sum(($"h_old".isNull && $"h_new".isNotNull).cast("long")).as("n_added"),
           sum(($"h_old".isNotNull && $"h_new".isNull).cast("long")).as("n_removed"),
           sum(($"h_old".isNotNull && $"h_new".isNotNull &&
                $"h_old" =!= $"h_new").cast("long")).as("n_changed"),
           sum(($"h_old" === $"h_new").cast("long")).as("n_unchanged"))
  }

  val qCorpusDiffSql: String =
    """WITH old AS (
      |  SELECT doc_id, source,
      |    md5(CASE WHEN doc_id % 11 = 0 THEN text || ' [rev0]' ELSE text END) AS h
      |  FROM documents WHERE doc_id % 7 <> 0
      |  UNION ALL
      |  SELECT -(doc_id + 1), source, md5(text) AS h
      |  FROM documents WHERE doc_id % 13 = 0),
      |nw AS (SELECT doc_id, source, md5(text) AS h FROM documents),
      |j AS (
      |  SELECT coalesce(a.source, b.source) AS source, a.h AS h_old, b.h AS h_new
      |  FROM old a FULL OUTER JOIN nw b USING (doc_id))
      |SELECT source,
      |  CAST(sum(CASE WHEN h_old IS NULL AND h_new IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
      |  CAST(sum(CASE WHEN h_old IS NOT NULL AND h_new IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
      |  CAST(sum(CASE WHEN h_old IS NOT NULL AND h_new IS NOT NULL AND h_old <> h_new THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
      |  CAST(sum(CASE WHEN h_old = h_new THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
      |FROM j GROUP BY source""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_corpus_diff"       -> (qCorpusDiff _),
    "q_quality_winsor"    -> (qQualityWinsor _),
    "q_split_temporal"    -> (qSplitTemporal _),
    "q_quality_calibrated" -> (qQualityCalibrated _),
    "q_quality_mad"       -> (qQualityMad _),
    "q_quality_ks"        -> (qQualityKs _),
    "q_quality_langparity" -> (qQualityLangparity _),
    "q_tok_budget"        -> (qTokBudget _),
    "q_chunk_rag"         -> (qChunkRag _),
    "q_shard_manifest"    -> (qShardManifest _),
    "q_mix_plan"          -> (qMixPlan _),
    "q_mix_epochs"        -> (qMixEpochs _),
    "q_mix_temperature"   -> (qMixTemperature _),
    "q_clf_score"         -> (qClfScore _),
    "q_lm_score"          -> (qLmScore _),
    "q_sample_weighted"   -> (qSampleWeighted _),
    "q_bigram_lm"         -> (qBigramLm _),
    "q_sample_stratified" -> (qSampleStratified _),
    "q_sample_topn"       -> (qSampleTopn _),
    "q_quality_deciles"   -> (qQualityDeciles _),
    "q_corpus_report"     -> (qCorpusReport _),
    "q_pipeline_curate"   -> (qPipelineCurate _),
    "q_pack_bins"         -> ((s: SparkSession, dir: String) => packBinsDistributed(s, dir)),
    "q_pii_scrub"         -> (qPiiScrub _),
    "q_quality_filter"    -> (qQualityFilter _),
    "q_text_pmi"          -> (qTextPmi _),
  )

  def oracles: Map[String, String] = Map(
    "q_corpus_diff"       -> qCorpusDiffSql,
    "q_quality_winsor"    -> qQualityWinsorSql,
    "q_split_temporal"    -> qSplitTemporalSql,
    "q_quality_calibrated" -> qQualityCalibratedSql,
    "q_quality_mad"       -> qQualityMadSql,
    "q_quality_ks"        -> qQualityKsSql,
    "q_quality_langparity" -> qQualityLangparitySql,
    "q_tok_budget"        -> qTokBudgetSql,
    "q_chunk_rag"         -> qChunkRagSql,
    "q_clf_score"         -> qClfScoreSql,
    "q_mix_plan"          -> qMixPlanSql,
    "q_mix_epochs"        -> qMixEpochsSql,
    "q_mix_temperature"   -> qMixTemperatureSql,
    "q_shard_manifest"    -> qShardManifestSql,
    "q_lm_score"          -> qLmScoreSql,
    "q_sample_weighted"   -> qSampleWeightedSql,
    "q_bigram_lm"         -> qBigramLmSql,
    "q_sample_stratified" -> qSampleStratifiedSql,
    "q_sample_topn"       -> qSampleTopnSql,
    "q_quality_deciles"   -> qQualityDecilesSql,
    "q_corpus_report"     -> qCorpusReportSql,
    "q_pipeline_curate"   -> qPipelineCurateSql,
    "q_pack_bins"         -> qPackBinsSql,
    "q_pii_scrub"         -> qPiiScrubSql,
    "q_quality_filter"    -> qQualityFilterSql,
    "q_text_pmi"          -> qTextPmiSql,
  )
}
