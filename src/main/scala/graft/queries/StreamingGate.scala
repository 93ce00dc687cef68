package graft.queries

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StreamingEtl

/** Driver-GATED stream==batch twins (round-7).
  *
  * The 15 stream==batch parity proofs in StreamingSpec exist only as
  * ScalaTest assertions; these two entries run actual Structured
  * Streaming plans under the DuckDB oracle gate, so CORRECTNESS — not
  * just the suite — certifies that a streaming core computes the same
  * answer as the batch operator on the same data:
  *
  *  - `q_stream_pii`: the stateless redaction-at-ingest core
  *    ([[StreamingEtl.piiScrubStream]]) in APPEND mode — every arriving
  *    row emits exactly once, so the result must equal the batch
  *    `q_pii_scrub` row-for-row and the two entries share ONE oracle SQL.
  *  - `q_stream_linededup`: the stateful line-dedup-at-ingest core
  *    ([[StreamingEtl.lineDedupStream]]) — a real streaming AGGREGATION
  *    (chunk rollup per document) probing the write-once chunk-history
  *    lake table stream-static, run in COMPLETE mode so the final state
  *    is the whole answer; it must equal batch `q_dedup_lines_incr`
  *    and shares its oracle SQL.
  *
  * Mechanics: the fixture parquet is read as a bounded FILE STREAM
  * (explicit schema — streaming sources don't infer) and driven to
  * completion with `Trigger.AvailableNow` into a memory sink
  * ([[StreamingEtl.runToMemory]]) — the same catch-up semantics a
  * production job uses to drain a backlog. The memory sink is a
  * driver-bounded TEST/gate surface (these results are ≤ |documents|
  * rows); the production sink is
  * [[StreamingEtl.runToPartitionedParquet]]. Checkpoints are fresh per
  * invocation (a reused checkpoint would replay nothing and emit an
  * empty table); memory table names are sequenced so repeated bench
  * sweeps never collide with an active query.
  */
object StreamingGate {
  private val runSeq = new AtomicInteger(0)

  /** Fixture parquet as a bounded file stream with the batch schema.
    * events-style normalization is the CALLER's job (document twins need
    * none — FixtureCanarySpec; event twins use [[eventsStream]]). */
  private def parquetStream(s: SparkSession, dir: String, table: String): DataFrame = {
    // without nanosAsLong the schema probe itself throws on a
    // TIMESTAMP(NANOS) fixture, before eventsStream's LongType branch
    // can run (mirrors Tables.events' drift handling). The timezone pin
    // must ride along: newSession() clones do NOT inherit runtime conf
    // sets, and eventsStream's NTZ->TIMESTAMP cast is only
    // value-preserving under UTC (same edge Tables.events closes for
    // batch sessions not built via GraftSession).
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val schema = s.read.parquet(s"$dir/$table.parquet").schema
    // FileStreamSource wants a directory (or a glob whose base is one);
    // the fixture is one file per table, so address it as a
    // single-match glob — [t] matches only the literal file, and the
    // stream's base path resolves to `dir`.
    //
    // graft.stream.maxFilesPerTrigger (JVM system property, TEST-ONLY):
    // forces multi-micro-batch drains when the fixture table is a
    // directory of several part files. StreamStaticWriteOnceSpec uses it
    // to prove the write-once stream-static contract — decode counts
    // must not grow with batch count (the r14 12.46x bug class). The
    // property (not session conf) because the per-gate newSession()
    // clones do not inherit runtime conf sets. Every gated plan here is
    // batch-count-invariant (no watermark; append dedup keys emit once),
    // so the knob changes scheduling, never results.
    val r = s.readStream.schema(schema)
    sys.props.get("graft.stream.maxFilesPerTrigger")
      .foldLeft(r)((b, n) => b.option("maxFilesPerTrigger", n))
      .parquet(s"$dir/$table.parque[t]")
  }

  /** The events fixture as a stream with `ts` normalized to session-tz
    * TIMESTAMP — the streaming mirror of Tables.events' drift handling
    * (watermarks reject TIMESTAMP_NTZ, the round-6 failure mode). */
  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = parquetStream(s, dir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }

  /** Session CLONE with stream-volume-sized shuffle partitions — the
    * qStreamJoin right-sizing generalized to every STATEFUL gate: each
    * stateful operator creates one state store per shuffle partition
    * and pays a per-micro-batch commit on each, so partition count
    * should track stream volume (a production job sets
    * spark.sql.shuffle.partitions per workload). The clone shares the
    * SparkContext but keeps the conf change out of the shared session.
    * Runtime-conf drift handling (nanosAsLong, timezone) re-applies in
    * parquetStream/eventsStream against whichever session reads. */
  private def streamSession(s: SparkSession, partitions: Int = 8): SparkSession = {
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    s2
  }

  /** Drive `df` to completion over the available input and hand back the
    * materialized result table. */
  private def runGate(df: DataFrame, tag: String, mode: String): DataFrame = {
    val s = df.sparkSession
    val name = s"gate_${tag}_${runSeq.incrementAndGet()}"
    val cp = Files.createTempDirectory(s"graft_cp_$tag").toString
    StreamingEtl.runToMemory(df, name, cp, mode)
    s.table(name)
  }

  /** Stateless PII scrub at ingest, gated: stream == batch == oracle. */
  def qStreamPii(s: SparkSession, dir: String): DataFrame =
    runGate(StreamingEtl.piiScrubStream(parquetStream(s, dir, "documents")),
      "pii", "append")

  /** Stateful line-dedup at ingest, gated: the arriving slice (the shared
    * doc_id % 5 == 0 incremental convention) probes the persisted chunk
    * history; final aggregation state == batch == oracle. */
  def qStreamLineDedup(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    // static sides build on the PARENT session: the memoized relations
    // (persisted lake tables, shingle checkpoints) are cached per
    // session, so building them in the per-invocation clone would
    // rebuild them every run — the clone owns only the stream
    val hist = Dedup.persistedChunkHistory(s0, dir)
    val docs = parquetStream(s, dir, "documents")
      .filter(Dedup.isNewDoc(col("doc_id")))
      .select(col("doc_id"), col("text"))
    runGate(StreamingEtl.lineDedupStream(docs, hist), "linededup", "complete")
  }

  /** Minhash dedup-at-ingest, gated — the heaviest streaming core under
    * the oracle: arriving documents compute signatures statelessly,
    * probe the write-once bucketed band index stream-static, dedup
    * candidate pairs in stream state, and verify exactly against the
    * historical shingle store; emitted (new_doc, hist_doc, jaccard_ppm)
    * matches == batch == oracle. */
  def qStreamIncrDedup(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    val docs = parquetStream(s, dir, "documents")
      .filter(Dedup.isNewDoc(col("doc_id")))
      .select(col("doc_id"), col("text"))
    // static index/history on the parent session (see qStreamLineDedup)
    runGate(StreamingEtl.incrementalDedupStream(docs,
      Dedup.persistedBandIndex(s0, dir),
      Dedup.historicalShingles(s0, dir)), "incrdedup", "append")
  }

  /** STREAM-STREAM event-time interval join, gated — the §2.7 surface no
    * stream-static twin exercises: each view event joins every click by
    * the same user within the following 30 minutes, both sides
    * watermarked (1 h) so at scale the join state is evicted once the
    * watermark passes the interval bound — bounded memory on unbounded
    * streams. Inner join in append mode emits each matched pair exactly
    * once; with AvailableNow over the fixture the result must equal the
    * batch interval self-join, and the oracle states exactly that in
    * SQL. Gap is exact floored-epoch-seconds arithmetic on both
    * engines. */
  def qStreamJoin(s: SparkSession, dir: String): DataFrame = {
    // A stateful stream-stream join creates one state store per SIDE per
    // shuffle partition (4 partitions = 8 stores here) and pays a
    // per-micro-batch commit on each — so the join runs at HALF the
    // other gates' partition count because its store count doubles
    // (measured round 8: 4 partitions ≈ 13% faster than 8 for the join,
    // while the single-store gates regress below 8 — they are
    // compute-bound, not commit-bound).
    val s2 = streamSession(s, partitions = 4)
    val views = eventsStream(s2, dir)
      .filter(col("event_type") === "view")
      .withWatermark("ts", "1 hour")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("v_ts"))
    val clicks = eventsStream(s2, dir)
      .filter(col("event_type") === "click")
      .withWatermark("ts", "1 hour")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val joined = views.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("v_ts") &&
        col("c_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("view_id"), col("click_id"), col("user_id"),
        expr("cast(v_ts as bigint)").as("view_s"),
        expr("cast(c_ts as bigint)").as("click_s"),
        expr("cast(c_ts as bigint) - cast(v_ts as bigint)").as("gap_s"))
    runGate(joined, "join", "append")
  }

  val qStreamJoinSql: String =
    """SELECT a.event_id AS view_id, b.event_id AS click_id, a.user_id,
      |  epoch_us(a.ts) // 1000000 AS view_s,
      |  epoch_us(b.ts) // 1000000 AS click_s,
      |  epoch_us(b.ts) // 1000000 - epoch_us(a.ts) // 1000000 AS gap_s
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      | AND a.event_type = 'view' AND b.event_type = 'click'
      | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE""".stripMargin

  /** Decontamination-at-ingest, gated — the family's 100 TB shape run as
    * a REAL stream: the eval side collapses batch-side to its exact
    * distinct shingles plus the fixed ~1 MB bloom sketch; every arriving
    * train shingle probes the sketch as a compiled per-row predicate
    * BEFORE any shuffle, only bloom survivors reach the stream-static
    * exact-verify join (false positives die there, false negatives don't
    * exist), and the per-doc rollup runs in complete mode. Output ==
    * batch q_decontaminate == its oracle, verbatim. */
  def qStreamDecontam(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    // static sides on the PARENT session via the persisted eval index +
    // cached bloom (see qStreamLineDedup): the eval suite is indexed
    // once, not re-shingled per invocation
    val evalSh = Dedup.evalShingleSet(s0, dir)
    val bloom = Dedup.evalBloom(s0, dir).orNull
    val docs = parquetStream(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    runGate(StreamingEtl.decontaminateStream(docs, evalSh, bloom),
      "decontam", "complete")
  }

  /** Native SESSION-WINDOW aggregation on a stream, gated — the stateful
    * class none of the other twins cover: `session_window(ts, 30 min)`
    * merges per-user events whose gap is under the threshold into one
    * growing window, state closing as the watermark passes. Complete
    * mode emits the final session set. NOTE the oracle states
    * session_window's OWN boundary semantics (an event exactly `gap`
    * after the previous one starts a NEW session — `diff_us >=
    * 1_800_000_000`), which differs from the batch `q_ev_session`
    * lag-based operator at the exact-boundary tick (`diff > 1800`
    * merges there); the two operators are deliberately both present,
    * each gated against its own exact semantics. The gap compare is in
    * FULL MICROSECONDS — session_window merges on the un-floored
    * timestamp, so a floored-seconds oracle would split a 1,799.3 s gap
    * whose second diff rounds to 1800 (real at sf0.1: user 511); only
    * the OUTPUT column floors to seconds. Values roll up in exact
    * cents. */
  def qStreamSessions(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    val ev = eventsStream(s, dir).withWatermark("ts", "1 hour")
    val agg = ev
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cast(round(value * 100) as long)")).as("total_value_c"))
      .select(expr("cast(session_window.start as bigint)").as("session_start_s"),
        col("user_id"), col("n_events"), col("total_value_c"))
    runGate(agg, "sessions", "complete")
  }

  val qStreamSessionsSql: String =
    """WITH ordered AS (
      |  SELECT user_id, event_id, value,
      |    epoch_us(ts) AS us,
      |    lag(epoch_us(ts)) OVER w AS prev_us
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
      |flagged AS (
      |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000
      |                 THEN 1 ELSE 0 END AS is_new
      |  FROM ordered),
      |sessions AS (
      |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id
      |    ORDER BY us ASC, event_id ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
      |  FROM flagged)
      |SELECT min(us) // 1000000 AS session_start_s, user_id, count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_value_c
      |FROM sessions GROUP BY user_id, session_idx""".stripMargin

  /** TUMBLING event-time window aggregation on a stream, gated — the
    * single most common streaming shape (watermarked `window(ts, 1h)`
    * groupBy), which until now only stream==batch specs covered. State
    * per key is one (window, event_type) accumulator and the watermark
    * closes windows an hour behind the max event time, so state is
    * O(active windows), not O(events). Complete mode emits the final
    * window set over the drained fixture. The oracle is q_ev_hourly's
    * bucketing MINUS the `countDistinct(user_id)` column — distinct
    * aggregates are unsupported inside a streaming aggregation (Spark
    * would need per-key distinct state; the engine's streaming path for
    * that metric is the KMV sketch, see q_ev_rolling_users), so the twin
    * gates the supported surface and names its own oracle. */
  def qStreamHourly(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    val ev = eventsStream(s, dir).withWatermark("ts", "1 hour")
    val agg = ev
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(value * 100) as long)")).as("total_value_c"))
      .select(col("window.start").as("hour_ts"), col("event_type"),
        col("n"), col("total_value_c"))
    runGate(agg, "hourly", "complete")
  }

  val qStreamHourlySql: String =
    """SELECT time_bucket(INTERVAL 1 HOUR, ts) AS hour_ts, event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_value_c
      |FROM events GROUP BY 1, 2""".stripMargin

  /** SLIDING (hopping) windowed aggregation, gated — the overlapping-
    * window core ([[StreamingEtl.slidingCounts]]: 2-hour windows every
    * hour, each event in exactly two) run as a real watermarked stream
    * in complete mode; the per-event window fan-out happens MAP-SIDE
    * before the keyed aggregation, so state is O(windows x types), not
    * O(events). Shares q_ev_sliding's oracle verbatim (the oracle
    * reproduces Spark's epoch-aligned window assignment
    * arithmetically). */
  def qStreamSliding(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    val agg = StreamingEtl.slidingCounts(eventsStream(s, dir))
      .select(col("window_start").cast("long").as("win_start_s"),
        col("event_type"), col("n"), col("total_value_c"))
    runGate(agg, "sliding", "complete")
  }

  /** HASH-DETERMINISTIC SAMPLING at ingest, gated — the stateless
    * training-mix core ([[StreamingEtl.sampleStream]]): membership
    * depends only on the key's md5 bucket, never on arrival order,
    * batch boundaries, or executor count, so the streamed sample must
    * equal the batch predicate row-for-row. The 60-bit hash is the
    * engine's single cross-engine definition (graft.functions.Hashing);
    * the oracle restates it in DuckDB. */
  def qStreamSample(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    runGate(StreamingEtl.sampleStream(eventsStream(s, dir), "event_id", 37)
      .select(col("event_id"), col("user_id"), col("event_type")),
      "sample", "append")
  }

  val qStreamSampleSql: String =
    s"""SELECT event_id, user_id, event_type FROM events
       |WHERE ${graft.functions.Hashing.h60Duck("event_id")} % 100 < 37""".stripMargin

  /** STREAMING EXACT DEDUP by key, gated — the idempotence core
    * ([[StreamingEtl.dedupStream]]: dropDuplicatesWithinWatermark, the
    * fix for the reference's duplicate-competência appends) with the
    * result projected to the DEDUP KEYS, the deterministic part of
    * first-wins semantics (which row of a key group survives depends on
    * arrival order; the surviving KEY SET does not). State is bounded
    * by the watermark; append mode emits each key once. Oracle:
    * SELECT DISTINCT. */
  def qStreamDedup(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    runGate(StreamingEtl.dedupStream(eventsStream(s, dir), Seq("user_id", "event_type"))
      .select(col("user_id"), col("event_type")), "dedup", "append")
  }

  val qStreamDedupSql: String =
    "SELECT DISTINCT user_id, event_type FROM events"

  /** MULTIMODAL DECODE AT INGEST, gated — the PNG encode→decode→feature
    * core ([[Multimodal.pngFeatures]]: full codec path, all five
    * scanline filters on the hash path, parsed-header dims in the
    * output) run STATELESS on a document stream in append mode: every
    * arriving row decodes once and emits once, the arrival-time form
    * of a multimodal feature-extraction pipeline (no state, no
    * shuffle — pure per-row compute that scales with executor count).
    * Shares q_mm_png's oracle verbatim. */
  def qStreamPng(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    runGate(Multimodal.pngFeatures(
      parquetStream(s, dir, "documents").select(col("doc_id"), col("text"))),
      "png", "append")
  }

  /** The AUDIO twin of [[qStreamPng]] (round-11): the RIFF/WAVE PCM
    * encode→decode→feature core ([[Multimodal.wavFeatures]] — chunk
    * walk, fmt validation, de-interleaved per-channel zero crossings)
    * stateless on the document stream, append mode — audio decode at
    * ingest. Shares q_mm_wav's oracle verbatim. */
  def qStreamWav(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    runGate(Multimodal.wavFeatures(
      parquetStream(s, dir, "documents").select(col("doc_id"), col("text"))),
      "wav", "append")
  }

  /** The VIDEO-CONTAINER twin of [[qStreamPng]] (round-11): the ISO
    * BMFF encode→parse→feature core ([[Multimodal.mp4Features]] — box
    * walk, sample tables, bounds-checked frame extraction) stateless
    * on the document stream, append mode — container inspection at
    * ingest, the arrival-time form of a video curation pipeline's
    * metadata pass. Shares q_mm_mp4's oracle verbatim. */
  def qStreamMp4(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    runGate(Multimodal.mp4Features(
      parquetStream(s, dir, "documents").select(col("doc_id"), col("text"))),
      "mp4", "append")
  }

  /** MIXED-MODALITY ROUTING AT INGEST (round-11): the modality router
    * ([[Multimodal.routeFeatures]] — magic-byte sniff over a mixed
    * binary column, dispatch into the right one of five real codecs)
    * stateless on the document stream, append mode. This is the
    * arrival-time shape of a real multimodal lake's first pass: one
    * stream, five formats interleaved, each row routed and decoded
    * without a side-channel label. Shares q_mm_route's md5-arithmetic
    * oracle verbatim. */
  def qStreamRoute(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    runGate(Multimodal.routeFeatures(
      parquetStream(s, dir, "documents").select(col("doc_id"), col("text"))),
      "route", "append")
  }

  /** The JPEG twin of [[qStreamPng]] (round-11): the baseline-DCT
    * encode→decode→feature core ([[Multimodal.jpegFeatures]] — marker
    * walk, Huffman entropy decode, per-doc restart intervals, IDCT)
    * stateless on the document stream, append mode. Shares q_mm_jpeg's
    * oracle verbatim. */
  def qStreamJpeg(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    runGate(Multimodal.jpegFeatures(
      parquetStream(s, dir, "documents").select(col("doc_id"), col("text"))),
      "jpeg", "append")
  }

  /** STREAMING SKETCH MAINTENANCE, gated — the histogram-quantile
    * sketch ([[Events.qHistQuantile]]) kept up to date ON the stream:
    * per-bin counts as a streaming aggregation whose state is exactly
    * the sketch (O(|bins|) rows in the state store at any stream
    * volume — the mergeability that makes the batch histogram a sketch
    * is the same property that bounds the streaming state). Complete
    * mode emits the maintained bin table; quantile RESOLUTION stays a
    * downstream O(|bins|) step over the emitted sketch, exactly as in
    * ScaleOpsSpec's merge-law formulation. No watermark needed: the
    * aggregation key is a value-domain bin, not event time. Oracle is
    * the batch histogram. */
  def qStreamQuantile(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    val agg = parquetStream(s, dir, "events")
      .select(expr("CAST(round(value * 100) AS LONG) DIV 100").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("c"))
    runGate(agg, "quantile", "complete")
  }

  val qStreamQuantileSql: String =
    """SELECT CAST(round(value * 100) AS BIGINT) // 100 AS bin, count(*) AS c
      |FROM events GROUP BY 1""".stripMargin

  /** CUSTOM-STATE streaming sessionization, gated — the
    * flatMapGroupsWithState API class (arbitrary state payload +
    * event-time timeouts, [[StreamingEtl.sessionizeStream]]), which was
    * spec-only until round 8. Append semantics: a session emits exactly
    * once, either when a later in-batch event passes the 1800 s gap
    * (strict `>`, floored epoch seconds — the lambda's own arithmetic)
    * or when the event-time watermark (max event time − 1 h) REACHES
    * lastEvent + gap + 1 s (inclusive — the engine arms its timer 1 ms
    * early because FlatMapGroupsWithStateExec's eviction comparison is
    * strict; StreamingSpec pins the boundary) and the timeout fires in
    * the engine's final no-data batch. Over the single-file fixture glob that closed set is
    * DETERMINISTIC: every non-final session per user, plus each final
    * session whose end + 1801 ≤ max_ts − 3600 (verified: 9,399 + 129 =
    * 9,528 of 9,549 total at sf0.01) — and the oracle states exactly
    * that in SQL, so the gate hash-checks the custom-state operator
    * cross-engine including its timeout boundary. Values roll up in
    * exact cents (integer-valued doubles, |sum| ≪ 2^53, cast LONG on
    * emit). */
  def qStreamFmgws(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    val ev = eventsStream(s, dir)
      .withColumn("value", expr("cast(round(value * 100) as double)"))
    val closed = StreamingEtl.sessionizeStream(ev)
    runGate(closed.toDF()
      .select(col("userId").as("user_id"),
        col("sessionStartS").as("session_start_s"),
        col("nEvents").as("n_events"),
        col("totalValue").cast("long").as("total_value_c")),
      "fmgws", "append")
  }

  val qStreamFmgwsSql: String =
    """WITH ordered AS (
      |  SELECT user_id, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS v_c,
      |    epoch_us(ts) // 1000000 AS sec
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN prev IS NULL OR sec - prev > 1800
      |                 THEN 1 ELSE 0 END AS is_new
      |  FROM (SELECT *, lag(sec) OVER w AS prev FROM ordered
      |        WINDOW w AS (PARTITION BY user_id ORDER BY sec ASC, event_id ASC))),
      |sessions AS (
      |  SELECT user_id, session_idx,
      |    min(sec) AS start_s, max(sec) AS end_s,
      |    count(*) AS n_events, CAST(sum(v_c) AS BIGINT) AS total_value_c
      |  FROM (SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id
      |          ORDER BY sec ASC, event_id ASC
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
      |        FROM flagged)
      |  GROUP BY user_id, session_idx),
      |closed AS (
      |  SELECT *, max(session_idx) OVER (PARTITION BY user_id) AS last_idx,
      |    (SELECT max(sec) - 3600 FROM ordered) AS wm_s
      |  FROM sessions)
      |SELECT user_id, start_s AS session_start_s, n_events, total_value_c
      |FROM closed
      |WHERE session_idx < last_idx OR end_s + 1801 <= wm_s""".stripMargin

  /** STREAMING VECTOR SERVING, gated — IVF retrieval for queries
    * arriving on a stream against the write-once static index
    * ([[StreamingEtl.annServeStream]], the serving twin of q_ann_ivf).
    * Queries = the isQuery slice of the embeddings fixture as a file
    * stream; the bounded centroid set (≤40 by construction) rides the
    * plan as a literal — probe selection is a per-row HOF, no join, no
    * shuffle; the inverted lists join stream-static on c_id (bucketed
    * at scale — co-partitioned); ranking is ONE streaming aggregation
    * whose state is the bounded TopKAggregator (O(k) rows per in-flight
    * query — PlanHygieneSpec asserts no unbounded collect enters the
    * stream plan). Update mode: each query is one stream row, so its
    * candidates complete within its arrival micro-batch and its top-k
    * emits exactly once. Shares q_ann_ivf's oracle VERBATIM. */
  def qStreamAnn(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    // static sides on the PARENT session (centroid/list relations are
    // memoized per session — see qStreamLineDedup's note)
    val cents = Similarity.centroidArray(s0, dir)
    // write-once serving index (Similarity.ivfIndex, round-15):
    // memoized + materialized — the inline build re-ran the assignment
    // cross join + argmax inside every micro-batch
    val lists = Similarity.ivfIndex(s0, dir)
    val q = parquetStream(s, dir, "embeddings")
      .filter(Similarity.isQuery(col("vec_id")))
      .select(col("vec_id").as("q_id"),
        transform(col("embedding"), x => x.cast("double")).as("qv"))
    runGate(StreamingEtl.annServeStream(q, cents, lists), "ann", "update")
  }

  /** STREAMING ANOMALY FLAGGING, gated — the online form of the batch
    * q_ev_anomaly monitor ([[StreamingEtl.anomalyStream]]): arriving
    * events join the offline-trained per-type moments (static,
    * broadcast) BEFORE the windowed aggregation, constants ride the
    * group key, and the integer 3-sigma flag is a post-aggregation
    * projection. Complete mode over the catch-up stream == batch ==
    * oracle (shares q_ev_anomaly's SQL verbatim). */
  def qStreamAnomaly(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    // offline-trained moments as the memoized WRITE-ONCE artifact
    // (Events.hourlyMoments, round-15): built once on the parent
    // session and served materialized — the unmemoized inline build
    // re-ran the two-level events aggregation inside every
    // micro-batch's broadcast build
    runGate(StreamingEtl.anomalyStream(eventsStream(s, dir),
      Events.hourlyMoments(s0, dir)), "anomaly", "complete")
  }

  /** STREAMING INCREMENTAL EMBEDDING DEDUP, gated — arriving vectors
    * (the vec_id % 5 == 0 incremental convention) flagged against the
    * historical corpus's multi-assigned IVF cell index at ingest
    * ([[StreamingEtl.embedDedupStream]]). Static sides — the
    * history-trained centroid set (collected to a sqrt(n)-bounded plan
    * literal, the ANN-serving pattern) and the multi-assigned inverted
    * lists — build on the parent session; the probe is a stateless
    * per-row HOF, candidates join stream-static on c_id and verify
    * map-side, and only the SURVIVORS pay stateful pair-dedup (state
    * at output scale, never candidate scale). Append mode ==
    * batch == q_dedup_embed_incr's oracle VERBATIM. */
  def qStreamEmbedDedup(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    val (c1, lists) = Dedup.embedIncrStatic(s0, dir)
    import s0.implicits._
    val cents = c1.select(col("c_id"), col("cd"))
      .as[(Long, Seq[Double])].collect().toSeq
    runGate(StreamingEtl.embedDedupStream(incrVecStream(s, dir), cents, lists),
      "embeddedup", "append")
  }

  /** Arriving-vector stream shared by both incremental embedding-dedup
    * gates: the %5==0 slice PLUS the injected history clones
    * (VERDICT-r12 #3; Dedup.EmbedIncrInjectMod) — one pass over the
    * stream emits 0..1 rows per input: a %5==0 row as itself, a
    * matching history row as its re-keyed clone, so the stream source
    * carries exactly the batch/oracle relation and the sf0.01 gates
    * are never vacuous. */
  private def incrVecStream(s: SparkSession, dir: String): DataFrame =
    parquetStream(s, dir, "embeddings")
      .select(explode(
        when(col("vec_id") % 5 === 0,
          array(struct(col("vec_id"), col("embedding"))))
        .when(col("vec_id") % 5 =!= 0 &&
              col("vec_id") % Dedup.EmbedIncrInjectMod === 1,
          array(struct((col("vec_id") * 5 + Dedup.EmbedIncrInjectBase).as("vec_id"),
            col("embedding"))))
        .otherwise(array())).as("r"))
      .select(col("r.vec_id").as("vec_id"), col("r.embedding").as("embedding"))

  /** STREAMING incremental embedding dedup through the HIERARCHICAL
    * index, gated ([[StreamingEtl.embedDedupHierStream]] — the
    * streaming-ingest scale path whose per-arrival cost stays FLAT as
    * history grows): the stream collects ONLY the sqrt(k)-bounded
    * level-1 group centroids; fine cells arrive via w1 stream-static
    * joins of packed per-group arrays; the top-nprobe cut is one
    * stateless HOF; candidates join the constant-cell-size lists and
    * verify map-side; survivors pay output-scale pair-dedup. Append
    * mode == batch == q_dedup_embed_incr_hier's oracle VERBATIM. */
  def qStreamEmbedDedupHier(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    val (l1, gcells, lists) = Dedup.embedIncrHierStatic(s0, dir)
    import s0.implicits._
    val groups = l1.select(col("g_id"), col("gd"))
      .as[(Long, Seq[Double])].collect().toSeq
    // packed per-group cell arrays — the static side of the stage-2
    // joins (g rows, each ~m·gsz cells); order inside each array is
    // irrelevant: the HOF cut totally orders by (cos desc, c_id asc)
    val gcp = gcells.groupBy(col("g_id"))
      .agg(collect_list(struct(col("c_id"), col("cd"))).as("cells"))
    runGate(StreamingEtl.embedDedupHierStream(incrVecStream(s, dir), groups, gcp, lists),
      "embeddedup_hier", "append")
  }

  /** STREAMING AUDIO NEAR-DUP AT INGEST, gated (round-13, the audio
    * tier's streaming twin — VERDICT-r12 #4): arriving documents
    * (doc_id % 5 == 0 plus the injected history clones, the
    * [[qStreamEmbedDedup]] source pattern) encode→decode→fingerprint
    * STATELESSLY per row ([[Multimodal.wavFingerprints]] — the same
    * core as the batch gate), explode into 16-bit bands, and join the
    * STATIC band index of the historical slice (built once on the
    * parent session — the write-once index a curation pipeline keeps
    * warm); only band-collided candidates pay the exact bit_count
    * verify, and only verified survivors pay stateful pair-dedup
    * (state at output scale, never candidate scale). Append mode ==
    * the brute cross-slice oracle. */
  def qStreamWavDedup(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    // session-memoized write-once index (round-15): "the write-once
    // index a curation pipeline keeps warm" was materialized per
    // invocation but still re-DECODED the history per invocation;
    // Memo.sessionCached makes the warm-index contract real across
    // probes, like the minhash band index / novelty history / embedding
    // lists already are. StreamStaticWriteOnceSpec still holds: the
    // first build fingerprints history exactly once.
    val histBands = Memo.sessionCached(s0, dir, "wavdedup_hist")(
      Multimodal.bands64(Multimodal.wavFingerprints(
        graft.Tables.documents(s0, dir)
          .filter(col("doc_id") % 5 =!= 0)
          .select(col("doc_id"), col("text")))))
      .withColumnRenamed("doc_id", "hist_doc")
      .withColumnRenamed("lo", "lo_h").withColumnRenamed("hi", "hi_h")
    val arriving = parquetStream(s, dir, "documents")
      .select(explode(
        when(col("doc_id") % 5 === 0,
          array(struct(col("doc_id"), col("text"))))
        .when(col("doc_id") % 5 =!= 0 && col("doc_id") % 151 === 3,
          array(struct((col("doc_id") * 5 + 3000000L).as("doc_id"), col("text"))))
        .otherwise(array())).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"))
    val newBands = Multimodal.bands64(Multimodal.wavFingerprints(arriving))
      .withColumnRenamed("doc_id", "new_doc")
      .withColumnRenamed("lo", "lo_n").withColumnRenamed("hi", "hi_n")
    val pairs = newBands.join(histBands, Seq("band", "chunk"))
      .withColumn("hamming",
        expr("CAST(bit_count(lo_n ^ lo_h) + bit_count(hi_n ^ hi_h) AS LONG)"))
      .filter(col("hamming") <= 3)
      .select(col("new_doc"), col("hist_doc"), col("hamming"))
      .dropDuplicates("new_doc", "hist_doc")
    runGate(pairs, "wavdedup", "append")
  }

  val qStreamWavDedupSql: String =
    """WITH base AS (
      |  SELECT doc_id, text, CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS arriving
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id * 5 + 3000000, text, 1 FROM documents
      |  WHERE doc_id % 5 <> 0 AND doc_id % 151 = 3),
      |px AS (
      |  SELECT doc_id, arriving, i,
      |    ('0x' || substr(md5(text || CAST(i // 16 AS VARCHAR)), 2 * (i % 16) + 1, 2))::BIGINT * 257 - 32768 AS s
      |  FROM base, range(0, 64) r(i)),
      |e AS (SELECT doc_id, arriving, i, s * s AS e FROM px),
      |d AS (
      |  SELECT doc_id, arriving, i, e,
      |    COALESCE(lead(e) OVER (PARTITION BY doc_id ORDER BY i),
      |             first_value(e) OVER (PARTITION BY doc_id ORDER BY i)) AS en
      |  FROM e),
      |h AS (
      |  SELECT doc_id, arriving,
      |    CAST(sum(CASE WHEN en > e AND i < 32 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS lo,
      |    CAST(sum(CASE WHEN en > e AND i >= 32 THEN (1::BIGINT << (i - 32)) ELSE 0 END) AS BIGINT) AS hi
      |  FROM d GROUP BY 1, 2)
      |SELECT n.doc_id AS new_doc, hh.doc_id AS hist_doc,
      |  CAST(bit_count(xor(n.lo, hh.lo)) + bit_count(xor(n.hi, hh.hi)) AS BIGINT) AS hamming
      |FROM h n JOIN h hh
      |  ON n.arriving = 1 AND hh.arriving = 0
      | AND bit_count(xor(n.lo, hh.lo)) + bit_count(xor(n.hi, hh.hi)) <= 3""".stripMargin

  /** STREAMING VIDEO NEAR-DUP AT INGEST, gated (round-13, the video
    * tier's streaming twin — completing the modality set next to
    * [[qStreamWavDedup]]): arriving documents (doc_id % 5 == 0 plus
    * injected history clones) encode→parse→fingerprint STATELESSLY per
    * row ([[Multimodal.mp4Fingerprints]] — the same per-frame-aHash
    * core as the batch gate, through the real ISO BMFF parse), explode
    * into the per-frame 16-bit bands, and join the STATIC band index
    * of the historical slice; only band-collided candidates pay the
    * exact bit_count verify, and only verified survivors pay stateful
    * pair-dedup (state at output scale). The clone re-key is the batch
    * gate's own +4000001 shift — nonzero mod 2, 3, 4 and 5, so EVERY
    * container knob (timescale %2, frameDelta/free %3, dims %4, mdat
    * form %5) flips for every clone while the frame bytes stay
    * text-derived — container invariance proven on the stream too
    * (round 14: the previous *5+4000000 re-key was ≡ id mod 2 and
    * mod 4, leaving the timescale and dims knobs unexercised).
    * CONTAINER-ONLY tier (the per-frame hash reads raw demuxed payload
    * bytes) — [[qStreamMjpegDedup]] / q_mm_mjpeg_dedup is the
    * decoded-PIXEL sibling that survives conformant re-encodes.
    * Append mode == the brute cross-slice oracle. */
  def qStreamMp4Dedup(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    // session-memoized write-once index (round-15; see qStreamWavDedup)
    val histBands = Memo.sessionCached(s0, dir, "mp4dedup_hist")(
      Multimodal.bands64(Multimodal.mp4Fingerprints(
        graft.Tables.documents(s0, dir)
          .filter(col("doc_id") % 5 =!= 0)
          .select(col("doc_id"), col("text")))))
      .withColumnRenamed("doc_id", "hist_doc")
      .withColumnRenamed("lo", "lo_h").withColumnRenamed("hi", "hi_h")
    val arriving = parquetStream(s, dir, "documents")
      .select(explode(
        when(col("doc_id") % 5 === 0,
          array(struct(col("doc_id"), col("text"))))
        .when(col("doc_id") % 5 =!= 0 && col("doc_id") % 151 === 7,
          array(struct((col("doc_id") + 4000001L).as("doc_id"), col("text"))))
        .otherwise(array())).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"))
    val newBands = Multimodal.bands64(Multimodal.mp4Fingerprints(arriving))
      .withColumnRenamed("doc_id", "new_doc")
      .withColumnRenamed("lo", "lo_n").withColumnRenamed("hi", "hi_n")
    val pairs = newBands.join(histBands, Seq("band", "chunk"))
      .withColumn("hamming",
        expr("CAST(bit_count(lo_n ^ lo_h) + bit_count(hi_n ^ hi_h) AS LONG)"))
      .filter(col("hamming") <= 3)
      .select(col("new_doc"), col("hist_doc"), col("hamming"))
      .dropDuplicates("new_doc", "hist_doc")
    runGate(pairs, "mp4dedup", "append")
  }

  val qStreamMp4DedupSql: String =
    """WITH base AS (
      |  SELECT doc_id, text, CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS arriving
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id + 4000001, text, 1 FROM documents
      |  WHERE doc_id % 5 <> 0 AND doc_id % 151 = 7),
      |px AS (
      |  SELECT doc_id, arriving, i,
      |    ('0x' || substr(md5(text || CAST(i // 16 AS VARCHAR)), 2 * (i % 16) + 1, 2))::BIGINT AS v,
      |    CASE WHEN i < 8 THEN 0 WHEN i < 24 THEN 1 WHEN i < 48 THEN 2 ELSE 3 END AS f
      |  FROM base, range(0, 64) r(i)),
      |mn AS (SELECT doc_id, f, CAST(sum(v) // count(*) AS BIGINT) AS mean FROM px GROUP BY 1, 2),
      |fb AS (
      |  SELECT f, b,
      |    CASE f WHEN 0 THEN 0 WHEN 1 THEN 8 WHEN 2 THEN 24 ELSE 48 END
      |      + (b * (CASE f WHEN 0 THEN 8 WHEN 1 THEN 16 WHEN 2 THEN 24 ELSE 16 END)) // 16 AS idx
      |  FROM range(0, 4) rf(f), range(0, 16) rb(b)),
      |h AS (
      |  SELECT px.doc_id, max(px.arriving) AS arriving,
      |    CAST(sum(CASE WHEN px.v >= mn.mean AND fb.f * 16 + fb.b < 32
      |      THEN (1::BIGINT << (fb.f * 16 + fb.b)) ELSE 0 END) AS BIGINT) AS lo,
      |    CAST(sum(CASE WHEN px.v >= mn.mean AND fb.f * 16 + fb.b >= 32
      |      THEN (1::BIGINT << (fb.f * 16 + fb.b - 32)) ELSE 0 END) AS BIGINT) AS hi
      |  FROM fb JOIN px ON px.i = fb.idx AND px.f = fb.f
      |       JOIN mn ON mn.doc_id = px.doc_id AND mn.f = fb.f
      |  GROUP BY 1)
      |SELECT n.doc_id AS new_doc, hh.doc_id AS hist_doc,
      |  CAST(bit_count(xor(n.lo, hh.lo)) + bit_count(xor(n.hi, hh.hi)) AS BIGINT) AS hamming
      |FROM h n JOIN h hh
      |  ON n.arriving = 1 AND hh.arriving = 0
      | AND bit_count(xor(n.lo, hh.lo)) + bit_count(xor(n.hi, hh.hi)) <= 3""".stripMargin

  /** STREAMING DECODED-DOMAIN VIDEO NEAR-DUP AT INGEST, gated (round
    * 14 — [[graft.queries.Multimodal.qMmMjpegDedup]]'s streaming twin,
    * keeping the decoded-pixel video tier's per-modality pair like the
    * container tier's [[qStreamMp4Dedup]]): arriving documents
    * encode→demux→JPEG-decode→fingerprint STATELESSLY per row
    * ([[Multimodal.mjpegFingerprints]] — both codec layers decoded in
    * the stream path), explode into per-frame 16-bit bands, and join
    * the STATIC band index of the historical slice; only band-collided
    * candidates pay the exact bit_count verify, and only verified
    * survivors pay stateful pair-dedup (state at output scale). Clone
    * re-key +4000001 — flips every container knob AND the JPEG
    * restart-interval knob (all of %2/%3/%4/%5 change). Append mode ==
    * the brute cross-slice oracle. */
  def qStreamMjpegDedup(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    // The static side MUST be materialized (here and in the wav/mp4
    // twins): a stream-static join re-evaluates an unmaterialized
    // static plan EVERY micro-batch, so the whole history re-decoded
    // per batch — cheap for wav/mp4 envelopes (r13 measured 1.27x at
    // 100x unmaterialized), but this tier's full T.81 entropy decode
    // measured 12.46x wall at the 100x decade before this checkpoint
    // made the scaladoc's "built once" contract real (re-measured
    // 1.51x after, identical pair rows at both scales).
    val histBands = Memo.sessionCached(s0, dir, "mjpegdedup_hist")(
      Multimodal.bands64(Multimodal.mjpegFingerprints(
        graft.Tables.documents(s0, dir)
          .filter(col("doc_id") % 5 =!= 0)
          .select(col("doc_id"), col("text")))))
      .withColumnRenamed("doc_id", "hist_doc")
      .withColumnRenamed("lo", "lo_h").withColumnRenamed("hi", "hi_h")
    val arriving = parquetStream(s, dir, "documents")
      .select(explode(
        when(col("doc_id") % 5 === 0,
          array(struct(col("doc_id"), col("text"))))
        .when(col("doc_id") % 5 =!= 0 && col("doc_id") % 151 === 7,
          array(struct((col("doc_id") + 4000001L).as("doc_id"), col("text"))))
        .otherwise(array())).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"))
    val newBands = Multimodal.bands64(Multimodal.mjpegFingerprints(arriving))
      .withColumnRenamed("doc_id", "new_doc")
      .withColumnRenamed("lo", "lo_n").withColumnRenamed("hi", "hi_n")
    val pairs = newBands.join(histBands, Seq("band", "chunk"))
      .withColumn("hamming",
        expr("CAST(bit_count(lo_n ^ lo_h) + bit_count(hi_n ^ hi_h) AS LONG)"))
      .filter(col("hamming") <= 3)
      .select(col("new_doc"), col("hist_doc"), col("hamming"))
      .dropDuplicates("new_doc", "hist_doc")
    runGate(pairs, "mjpegdedup", "append")
  }

  val qStreamMjpegDedupSql: String =
    """WITH base AS (
      |  SELECT doc_id, text, CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS arriving
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id + 4000001, text, 1 FROM documents
      |  WHERE doc_id % 5 <> 0 AND doc_id % 151 = 7),
      |px AS (
      |  SELECT doc_id, arriving, i,
      |    ('0x' || substr(md5(text || CAST(i // 16 AS VARCHAR)), 2 * (i % 16) + 1, 2))::BIGINT AS v,
      |    i // 16 AS f
      |  FROM base, range(0, 64) r(i)),
      |mn AS (SELECT doc_id, f, CAST(sum(v) // 16 AS BIGINT) AS mean FROM px GROUP BY 1, 2),
      |h AS (
      |  SELECT px.doc_id, px.arriving,
      |    CAST(sum(CASE WHEN px.v >= mn.mean AND px.i < 32 THEN (1::BIGINT << px.i) ELSE 0 END) AS BIGINT) AS lo,
      |    CAST(sum(CASE WHEN px.v >= mn.mean AND px.i >= 32 THEN (1::BIGINT << (px.i - 32)) ELSE 0 END) AS BIGINT) AS hi
      |  FROM px JOIN mn ON mn.doc_id = px.doc_id AND mn.f = px.f
      |  GROUP BY 1, 2)
      |SELECT n.doc_id AS new_doc, hh.doc_id AS hist_doc,
      |  CAST(bit_count(xor(n.lo, hh.lo)) + bit_count(xor(n.hi, hh.hi)) AS BIGINT) AS hamming
      |FROM h n JOIN h hh
      |  ON n.arriving = 1 AND hh.arriving = 0
      | AND bit_count(xor(n.lo, hh.lo)) + bit_count(xor(n.hi, hh.hi)) <= 3""".stripMargin

  /** STREAMING CONTEXT-WINDOW PACKER, gated — the second custom-state
    * (flatMapGroupsWithState) gate next to q_stream_fmgws: per-source
    * running token count carried in state, each arriving document
    * assigned its 8192-token bin on arrival
    * ([[StreamingEtl.packStream]]; same arrival contract as the batch
    * prefix-sum packer — per-source doc_id order, which the
    * single-file catch-up stream satisfies). The oracle states the bin
    * assignment as a per-source running-sum window — cross-engine
    * hash-checks the stateful fold's arithmetic per document, where
    * q_pack_bins gates the downstream aggregate. */
  def qStreamPack(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    val docs = parquetStream(s, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"))
    runGate(StreamingEtl.packStream(docs).toDF()
        .select(col("source"), col("docId").as("doc_id"),
          col("tokEst").as("tok_est"), col("bin")),
      "pack", "append")
  }

  val qStreamPackSql: String =
    """WITH d AS (
      |  SELECT source, doc_id, n_chars // 4 + 1 AS tok_est FROM documents)
      |SELECT source, doc_id, tok_est,
      |  (CAST(sum(tok_est) OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) - 1)
      |    // 8192 AS bin
      |FROM d""".stripMargin

  /** STREAMING VERBATIM scoring, gated — cross-doc duplication fraction
    * at ingest ([[StreamingEtl.verbatimScoreStream]]): arriving
    * documents explode into shingles statelessly, join stream-static
    * against the batch-built shingle document-frequency index, and
    * roll up per doc in ONE complete-mode aggregation. Over the full
    * corpus vs its own index the result equals batch q_dedup_verbatim
    * — the oracle is shared verbatim. */
  def qStreamVerbatim(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    // write-once df index (Dedup.verbatimIndex, round-15): memoized +
    // materialized on the parent session — the inline build re-ran the
    // corpus-wide groupBy inside every micro-batch
    val idx = Dedup.verbatimIndex(s0, dir)
    val docs = parquetStream(s, dir, "documents").select(col("doc_id"), col("text"))
    runGate(StreamingEtl.verbatimScoreStream(docs, idx), "verbatim", "complete")
  }

  /** STREAMING LM-COVERAGE scoring, gated — language-model filtering at
    * serving time ([[StreamingEtl.lmScoreStream]]): arriving documents
    * explode into bigrams statelessly and join stream-static against
    * the batch-trained FIXED-size top-500 bigram LM (broadcastable at
    * any corpus size); per-doc rollup is the single complete-mode
    * aggregation. Shares q_lm_score's oracle verbatim. */
  def qStreamLm(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    // write-once trained LM (TrainingData.lmIndex, round-15): memoized +
    // materialized on the parent session — the inline build re-ran the
    // full bigram aggregation + top-k inside every micro-batch's
    // broadcast build
    val lm = TrainingData.lmIndex(s0, dir)
    val docs = parquetStream(s, dir, "documents").select(col("doc_id"), col("text"))
    runGate(StreamingEtl.lmScoreStream(docs, lm), "lm", "complete")
  }

  /** STREAMING NOVELTY at ingest, gated — the memorization-risk gate
    * ([[StreamingEtl.noveltyStream]]): the arriving slice (doc_id % 5
    * == 0, the shared incremental convention) scores against the
    * write-once HISTORICAL distinct-shingle lake table (bucketed by
    * the probe key — zero exchanges on the history side), one
    * complete-mode aggregation. Shares q_text_novelty_incr's oracle
    * verbatim. */
  def qStreamNovelty(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    val hist = TextAnalysis.persistedShingleHistory(s0, dir)
    val docs = parquetStream(s, dir, "documents")
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text"))
    runGate(StreamingEtl.noveltyStream(docs, hist), "novelty", "complete")
  }

  /** STREAMING CLASSIFIER SCORING, gated — model-based filtering at
    * ingest ([[StreamingEtl.clfScoreStream]]): the hashing-trick linear
    * model is a pure per-row fold over the token array (weights derive
    * from the token hash — no vocabulary state, no shuffle, no
    * watermark), so the batch operator's expressions run UNCHANGED on
    * the stream in append mode. Per-document filtering decisions at
    * ingest latency; shares q_clf_score's oracle verbatim. */
  def qStreamClf(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    runGate(StreamingEtl.clfScoreStream(parquetStream(s, dir, "documents")),
      "clf", "append")
  }

  /** STREAMING REPETITION METRICS, gated — Gopher-rule within-doc
    * repetition at ingest ([[StreamingEtl.repetitionStream]]): the
    * per-row HOF formulation touches only the row's own token array
    * (stateless append map), emitting the same columns as the batch
    * explode/groupBy form — the gate hash-checks that equivalence
    * cross-engine, not just the StreamingSpec parity. Shares
    * q_text_repetition's oracle verbatim. */
  def qStreamRepetition(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    runGate(StreamingEtl.repetitionStream(parquetStream(s, dir, "documents")),
      "repetition", "append")
  }

  /** STREAMING CONTEXT-WINDOW CHUNKING, gated — at-ingest chunk cost
    * reporting ([[StreamingEtl.chunkStream]]): stateless bounded row
    * fan-out into 64/48 chunk rows, ONE complete-mode aggregation.
    * Shares q_chunk_rag's oracle verbatim. */
  def qStreamChunks(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    runGate(StreamingEtl.chunkStream(parquetStream(s, dir, "documents")),
      "chunks", "complete")
  }

  /** STREAMING SCRIPT-MIX audit, gated — at-ingest encoding-regression
    * monitoring ([[StreamingEtl.scriptmixStream]]): stateless per-row
    * class strips, ONE complete-mode aggregation. Shares
    * q_text_scriptmix's oracle verbatim. */
  def qStreamScriptmix(s0: SparkSession, dir: String): DataFrame = {
    val s = streamSession(s0)
    runGate(StreamingEtl.scriptmixStream(parquetStream(s, dir, "documents")),
      "scriptmix", "complete")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_embeddedup" -> (qStreamEmbedDedup _),
    "q_stream_embeddedup_hier" -> (qStreamEmbedDedupHier _),
    "q_stream_wavdedup" -> (qStreamWavDedup _),
    "q_stream_mp4dedup" -> (qStreamMp4Dedup _),
    "q_stream_mjpegdedup" -> (qStreamMjpegDedup _),
    "q_stream_clf"       -> (qStreamClf _),
    "q_stream_repetition" -> (qStreamRepetition _),
    "q_stream_verbatim"  -> (qStreamVerbatim _),
    "q_stream_pack"      -> (qStreamPack _),
    "q_stream_lm"        -> (qStreamLm _),
    "q_stream_novelty"   -> (qStreamNovelty _),
    "q_stream_chunks"    -> (qStreamChunks _),
    "q_stream_scriptmix" -> (qStreamScriptmix _),
    "q_stream_ann"       -> (qStreamAnn _),
    "q_stream_anomaly"   -> (qStreamAnomaly _),
    "q_stream_fmgws"     -> (qStreamFmgws _),
    "q_stream_quantile"  -> (qStreamQuantile _),
    "q_stream_hourly"    -> (qStreamHourly _),
    "q_stream_sliding"   -> (qStreamSliding _),
    "q_stream_sample"    -> (qStreamSample _),
    "q_stream_dedup"     -> (qStreamDedup _),
    "q_stream_png"       -> (qStreamPng _),
    "q_stream_jpeg"      -> (qStreamJpeg _),
    "q_stream_wav"       -> (qStreamWav _),
    "q_stream_mp4"       -> (qStreamMp4 _),
    "q_stream_route"     -> (qStreamRoute _),
    "q_stream_sessions"  -> (qStreamSessions _),
    "q_stream_decontam"  -> (qStreamDecontam _),
    "q_stream_pii"       -> (qStreamPii _),
    "q_stream_linededup" -> (qStreamLineDedup _),
    "q_stream_incrdedup" -> (qStreamIncrDedup _),
    "q_stream_join"      -> (qStreamJoin _))

  /** The twins assert stream==batch by construction: each shares its
    * oracle VERBATIM with the batch operator it mirrors. */
  def oracles: Map[String, String] = Map(
    "q_stream_embeddedup" -> Dedup.qDedupEmbedIncrSql,
    "q_stream_embeddedup_hier" -> Dedup.qDedupEmbedIncrHierSql,
    "q_stream_wavdedup" -> qStreamWavDedupSql,
    "q_stream_mp4dedup" -> qStreamMp4DedupSql,
    "q_stream_mjpegdedup" -> qStreamMjpegDedupSql,
    "q_stream_clf"       -> TrainingData.qClfScoreSql,
    "q_stream_repetition" -> TextAnalysis.qTextRepetitionSql,
    "q_stream_verbatim"  -> Dedup.qDedupVerbatimSql,
    "q_stream_pack"      -> qStreamPackSql,
    "q_stream_lm"        -> TrainingData.qLmScoreSql,
    "q_stream_novelty"   -> TextAnalysis.qTextNoveltyIncrSql,
    "q_stream_chunks"    -> TrainingData.qChunkRagSql,
    "q_stream_scriptmix" -> TextAnalysis.qTextScriptmixSql,
    "q_stream_ann"       -> Similarity.qAnnIvfSql,
    "q_stream_anomaly"   -> Events.qEvAnomalySql,
    "q_stream_fmgws"     -> qStreamFmgwsSql,
    "q_stream_quantile"  -> qStreamQuantileSql,
    "q_stream_hourly"    -> qStreamHourlySql,
    "q_stream_sliding"   -> Events.qEvSlidingSql,
    "q_stream_sample"    -> qStreamSampleSql,
    "q_stream_dedup"     -> qStreamDedupSql,
    "q_stream_png"       -> Multimodal.qMmPngSql,
    "q_stream_jpeg"      -> Multimodal.qMmJpegSql,
    "q_stream_wav"       -> Multimodal.qMmWavSql,
    "q_stream_mp4"       -> Multimodal.qMmMp4Sql,
    "q_stream_route"     -> Multimodal.qMmRouteSql,
    "q_stream_sessions"  -> qStreamSessionsSql,
    "q_stream_decontam"  -> Dedup.qDecontaminateSql,
    "q_stream_pii"       -> TrainingData.qPiiScrubSql,
    "q_stream_linededup" -> Dedup.qDedupLinesIncrSql,
    "q_stream_incrdedup" -> Dedup.qDedupIncrementalSql,
    "q_stream_join"      -> qStreamJoinSql)
}
