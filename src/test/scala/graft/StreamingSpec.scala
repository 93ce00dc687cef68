package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingEtl

/** Structured Streaming semantics (SURVEY §2.7): catch-up file streams,
  * watermark-windowed aggregation, streaming dedup, session windows, and
  * the idempotent partition-overwrite sink that fixes the reference's
  * duplicate-append behavior. */
class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val tmp = Files.createTempDirectory("graft_stream").toFile.getPath

  /** events at sf0.001 as a 4-file JSON input dir (multiple micro-batches). */
  private lazy val inputDir: String = {
    val dir = s"$tmp/input"
    Tables.events(spark, sf)
      .withColumn("part", (col("event_id") % 4).cast("int"))
      .repartition(4, col("part"))
      .drop("part")
      .write.json(dir)
    dir
  }

  private def eventsSchema = Tables.events(spark, sf).schema

  private def streamDf() = {
    // JSON round-trip stringifies timestamps; re-pin the schema.
    val schema = org.apache.spark.sql.types.StructType(
      eventsSchema.map(f => f.copy()))
    StreamingEtl.jsonStream(spark, inputDir, schema, maxFilesPerTrigger = Some(1))
  }

  test("per-row text cleanup runs unchanged on a document stream (stream == batch)") {
    val docsDir = s"$tmp/docs_input"
    Tables.documents(spark, sf).select("doc_id", "text").write.json(docsDir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema).json(docsDir)
    StreamingEtl.runToMemory(
      graft.queries.TextAnalysis.textCleanCols(stream), "tclean", s"$tmp/cp_tclean",
      outputMode = "append") // stateless map: append, not complete
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "clean_md5", "len_raw", "len_clean").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val streamed = key(spark.table("tclean"))
    val batch = key(graft.queries.TextAnalysis.textCleanCols(
      Tables.documents(spark, sf).select("doc_id", "text")))
    assert(streamed == batch)
  }

  /** documents (doc_id, text) as a JSON input dir, shared by the text
    * stream == batch tests. */
  private lazy val docsInputDir: String = {
    val dir = s"$tmp/docs_text_input"
    Tables.documents(spark, sf).select("doc_id", "text").write.json(dir)
    dir
  }

  private def docsStream() = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(docsInputDir)
  }

  test("verbatim scoring on a document stream equals the batch operator (stream == batch)") {
    val index = graft.queries.Dedup.shingleDfIndex(
      graft.queries.Dedup.explodedShingles(spark, sf))
    StreamingEtl.runToMemory(
      StreamingEtl.verbatimScoreStream(docsStream(), index),
      "verbatim", s"$tmp/cp_verbatim") // streaming agg: complete mode
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_shingles", "n_shared", "shared_ppm").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val streamed = key(spark.table("verbatim"))
    val batch = key(SparkEntry.queries("q_dedup_verbatim")(spark, sf))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("classifier scoring on a document stream equals the batch operator (stream == batch)") {
    val dir = s"$tmp/docs_clf_input"
    Tables.documents(spark, sf).select("doc_id", "source", "text").write.json(dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(dir)
    StreamingEtl.runToMemory(
      StreamingEtl.clfScoreStream(stream),
      "clfscore", s"$tmp/cp_clfscore", outputMode = "append") // stateless per-row
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_tokens", "score_sum", "clf_u", "keep").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val streamed = key(spark.table("clfscore"))
    val batch = key(SparkEntry.queries("q_clf_score")(spark, sf))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("context chunking on a document stream equals the batch operator (stream == batch)") {
    val dir = s"$tmp/docs_chunk_input"
    Tables.documents(spark, sf).select("doc_id", "source", "text").write.json(dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(dir)
    StreamingEtl.runToMemory(
      StreamingEtl.chunkStream(stream),
      "chunkrag", s"$tmp/cp_chunkrag") // streaming agg: complete mode
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("source", "n_docs", "n_chunks", "max_chunks", "toks_in",
          "toks_emitted", "overlap_ppm").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    val streamed = key(spark.table("chunkrag"))
    val batch = key(SparkEntry.queries("q_chunk_rag")(spark, sf))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("PII redaction on a document stream equals the batch operator (stream == batch)") {
    StreamingEtl.runToMemory(
      StreamingEtl.piiScrubStream(docsStream()),
      "piiscrub", s"$tmp/cp_piiscrub", outputMode = "append") // stateless per-row
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_emails", "n_phones", "n_ips", "scrubbed_md5").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4))).toSet
    val streamed = key(spark.table("piiscrub"))
    val batch = key(SparkEntry.queries("q_pii_scrub")(spark, sf))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("script-mix audit on a document stream equals the batch operator (stream == batch)") {
    val dir = s"$tmp/docs_scriptmix_input"
    Tables.documents(spark, sf).select("doc_id", "source", "text").write.json(dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(dir)
    StreamingEtl.runToMemory(
      StreamingEtl.scriptmixStream(stream),
      "scriptmix", s"$tmp/cp_scriptmix") // streaming agg: complete mode
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("source", "n_docs", "n_chars", "other_ppm", "n_mixed", "n_nonlatin")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
    val streamed = key(spark.table("scriptmix"))
    val batch = key(SparkEntry.queries("q_text_scriptmix")(spark, sf))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("LM-coverage scoring on a document stream equals the batch operator (stream == batch)") {
    val lm = graft.queries.TrainingData.lmTop500(
      graft.queries.TrainingData.bigramsOf(Tables.documents(spark, sf)))
    StreamingEtl.runToMemory(
      StreamingEtl.lmScoreStream(docsStream(), lm),
      "lmscore", s"$tmp/cp_lmscore") // streaming agg: complete mode
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_bigrams", "n_hits", "lm_cov_ppm").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val streamed = key(spark.table("lmscore"))
    val batch = key(SparkEntry.queries("q_lm_score")(spark, sf))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming decontamination equals the batch operator (bloom + verify, stream == batch)") {
    import graft.functions.TextFunctions.shingleSet
    import org.apache.spark.sql.graft.NativeExprs
    val dir = s"$tmp/docs_decon_input"
    Tables.documents(spark, sf).select("doc_id", "source", "text").write.json(dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(dir)
    // eval side (static): exact distinct shingles + the fixed-size sketch
    val evalSh = Tables.documents(spark, sf)
      .filter(col("source") === "src0")
      .select(explode(shingleSet(col("text"))).as("sng")).distinct()
    val bloom = evalSh
      .agg(NativeExprs.bloomFilterAgg(xxhash64(col("sng")), 1000000L, 8000000L))
      .head.getAs[Array[Byte]](0)
    StreamingEtl.runToMemory(
      StreamingEtl.decontaminateStream(stream, evalSh, bloom),
      "decon", s"$tmp/cp_decon") // streaming agg: complete mode
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_shingles", "n_eval_hits", "contaminated").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val streamed = key(spark.table("decon"))
    val batch = key(SparkEntry.queries("q_decontaminate")(spark, sf))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("per-row repetition metrics on a stream equal the batch shuffle form") {
    StreamingEtl.runToMemory(
      StreamingEtl.repetitionStream(docsStream()), "repetition",
      s"$tmp/cp_repetition", outputMode = "append") // stateless map
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_tokens", "top_tok_count", "rep_tokens",
          "rep_ppm", "top_bigram_count").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
    val streamed = key(spark.table("repetition"))
    val batch = key(SparkEntry.queries("q_text_repetition")(spark, sf))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming ANN serving over the static IVF index equals the batch operator") {
    import graft.queries.Similarity
    val dir = s"$tmp/ann_queries"
    Similarity.vectors(spark, sf)
      .filter(Similarity.isQuery(col("vec_id")))
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
      .write.json(dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("q_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("qv",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))))
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(dir)
    StreamingEtl.runToMemory(
      StreamingEtl.annServeStream(stream,
        Similarity.centroidArray(spark, sf),
        Similarity.ivfLists(spark, sf)),
      "ann_serve", s"$tmp/cp_ann", outputMode = "update")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "neighbor_id", "cos_ppb", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // each query is ONE stream row, so its candidates complete within a
    // single micro-batch and update mode emits its top-k exactly once —
    // the raw emissions must equal the batch operator verbatim
    val streamed = key(spark.table("ann_serve"))
    val batch = key(SparkEntry.queries("q_ann_ivf")(spark, sf))
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming incremental dedup against the historical index equals the batch operator") {
    val dir = s"$tmp/docs_incr_input"
    Tables.documents(spark, sf).filter(col("doc_id") % 5 === 0)
      .select("doc_id", "text").write.json(dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(dir)
    StreamingEtl.runToMemory(
      StreamingEtl.incrementalDedupStream(stream,
        // the PERSISTED index (written once, read back from the bucketed
        // lake table) — the streaming twin serves from the same
        // write-once state the batch operator proves against
        graft.queries.Dedup.persistedBandIndex(spark, sf),
        graft.queries.Dedup.historicalShingles(spark, sf)),
      "incr", s"$tmp/cp_incr", outputMode = "append")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("new_doc", "hist_doc", "jaccard_ppm").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = key(spark.table("incr"))
    val batch = key(SparkEntry.queries("q_dedup_incremental")(spark, sf))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming novelty at ingest against the historical shingle set equals the batch operator") {
    val dir = s"$tmp/docs_novelty_input"
    Tables.documents(spark, sf).filter(col("doc_id") % 5 === 0)
      .select("doc_id", "text").write.json(dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(dir)
    // the stream probes the same write-once lake table as the batch
    // operator — novelty-at-ingest serves from the reloaded history
    val hist = graft.queries.TextAnalysis.persistedShingleHistory(spark, sf)
    StreamingEtl.runToMemory(
      StreamingEtl.noveltyStream(stream, hist),
      "novelty", s"$tmp/cp_novelty")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_shingles", "n_novel", "novelty_ppm").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val streamed = key(spark.table("novelty"))
    val batch = key(SparkEntry.queries("q_text_novelty_incr")(spark, sf))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming line-dedup at ingest against the chunk history equals the batch operator") {
    val dir = s"$tmp/docs_linededup_input"
    Tables.documents(spark, sf).filter(col("doc_id") % 5 === 0)
      .select("doc_id", "text").write.json(dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(dir)
    // the stream probes the same write-once lake table as the batch operator
    val hist = graft.queries.Dedup.persistedChunkHistory(spark, sf)
    StreamingEtl.runToMemory(
      StreamingEtl.lineDedupStream(stream, hist),
      "linededup", s"$tmp/cp_linededup")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_chunks", "n_seen", "seen_ppm", "clean_h").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
        .toSet
    val streamed = key(spark.table("linededup"))
    val batch = key(SparkEntry.queries("q_dedup_lines_incr")(spark, sf))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming anomaly flags against historical moments equal the batch operator") {
    // historical baseline: per-type moments computed batch-side
    val moments = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("nh"), sum(col("n")).as("sn"),
        sum(col("n") * col("n")).as("ssn"))
    StreamingEtl.runToMemory(
      StreamingEtl.anomalyStream(streamDf(), moments),
      "anomaly", s"$tmp/cp_anomaly")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("event_type", "hour_ts", "n", "is_anomaly").collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getLong(3))).toSet
    val streamed = key(spark.table("anomaly"))
    val batch = key(SparkEntry.queries("q_ev_anomaly")(spark, sf))
    assert(streamed == batch)
    assert(streamed.exists(_._4 == 1L) && streamed.exists(_._4 == 0L))
  }

  test("windowed counts over the stream equal the batch aggregation") {
    StreamingEtl.runToMemory(
      StreamingEtl.windowedCounts(streamDf()), "wc", s"$tmp/cp_wc")
    val streamed = spark.table("wc")
      .select("window_start", "event_type", "n").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("event_type"), col("n")).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("sliding windowed counts over the stream equal the batch aggregation") {
    StreamingEtl.runToMemory(
      StreamingEtl.slidingCounts(streamDf()), "swc", s"$tmp/cp_swc")
    val streamed = spark.table("swc")
      .select("window_start", "event_type", "n").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("event_type"), col("n")).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
    // every tumbling hour appears in two overlapping windows
    assert(streamed.nonEmpty)
  }

  test("hash-deterministic sampling on a stream equals the batch sample exactly") {
    StreamingEtl.runToMemory(
      StreamingEtl.sampleStream(streamDf(), "event_id", 37).select(col("event_id")),
      "sampled", s"$tmp/cp_sample", outputMode = "append")
    val streamed = spark.table("sampled").collect().map(_.getLong(0)).toSet
    val batch = StreamingEtl.sampleStream(Tables.events(spark, sf), "event_id", 37)
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    assert(streamed == batch)
    // a real sample, not all-or-nothing
    val total = Tables.events(spark, sf).count()
    assert(streamed.nonEmpty && streamed.size < total)
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    val dup = s"$tmp/input_dup"
    val base = spark.read.json(inputDir)
    base.union(base.limit(200)).coalesce(2).write.json(dup) // 200 dup rows
    val schema = base.schema
    val stream = spark.readStream.schema(schema).json(dup)
      .withColumn("ts", col("ts").cast("timestamp"))
    StreamingEtl.runToMemory(
      StreamingEtl.dedupStream(stream, Seq("event_id")).groupBy().count(),
      "dedup_count", s"$tmp/cp_dedup")
    val n = spark.table("dedup_count").collect()(0).getLong(0)
    assert(n == Tables.events(spark, sf).count())
  }

  test("session_window agg in batch matches the lag-based sessionization") {
    val sw = StreamingEtl.sessionAgg(Tables.events(spark, sf))
    val lag = SparkEntry.queries("q_ev_session")(spark, sf)
    // same number of sessions and same per-user session counts
    assert(sw.count() == lag.count())
    val a = sw.groupBy("user_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = lag.groupBy("user_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("mapGroupsWithState running totals converge to the batch aggregation") {
    StreamingEtl.runToMemory(
      StreamingEtl.runningUserTotals(streamDf()), "running", s"$tmp/cp_run",
      outputMode = "update")
    // update mode emits one row per user per micro-batch: keep the last
    val finalRows = spark.table("running")
      .groupBy(col("user_id")).agg(max(col("n_events")).as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(finalRows == batch)
  }

  test("stream-stream interval join: inclusive [v_ts, v_ts+30min] bounds pinned to the microsecond") {
    // Same class of check as the fmgws boundary test: the gate's oracle
    // states b.ts IN [a.ts, a.ts + 30 min] inclusive — pin that the
    // ENGINE's stream-stream join agrees at both endpoints with
    // microsecond precision (clicks at exactly +30:00.000000 included,
    // +30:00.000001 excluded, 1 µs before the view excluded).
    val dir = s"$tmp/join_boundary"
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    def row(id: Long, typ: String, at: java.time.Instant) =
      (id, 1L, typ, java.sql.Timestamp.from(at))
    import spark.implicits._
    Seq(
      row(1L, "view", t0),
      row(2L, "click", t0),                                   // gap 0: in
      row(3L, "click", t0.plusSeconds(1800)),                 // boundary: in
      row(4L, "click", t0.plusSeconds(1800).plusNanos(1000)), // +1 µs: out
      row(5L, "click", t0.minusNanos(1000)))                  // before view: out
      .toDF("event_id", "user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.queries.StreamingGate.qStreamJoin(spark, dir)
    val got = out.select("click_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L),
      s"interval-join boundary drifted: matched clicks $got, expected {2, 3}")
  }

  test("fmgws event-time timeout fires exactly at the oracle's <= boundary") {
    // Pins the engine/oracle boundary agreement the q_stream_fmgws gate
    // relies on: the oracle emits a final session iff
    // end_s + gap + 1 <= wm_s (wm = max event time - 1 h). Three
    // single-event users straddle that boundary by exactly one second:
    //   u1: end + 1801 == wm_s      (ON the boundary — the case the
    //       sf fixtures happen not to contain)
    //   u2: end + 1801 == wm_s - 1  (inside: must emit)
    //   u3: end + 1801 == wm_s + 1  (outside: must not emit)
    // u99 carries the max event that sets the watermark. Spark's
    // FlatMapGroupsWithStateExec evicts state with
    // timeoutTimestamp < watermark (STRICT), so sessionizeStream sets
    // the timer one ms early to realize the oracle's inclusive <=.
    val m = 1700000000L // max event sec
    val wmS = m - 3600
    val dir = s"$tmp/fmgws_boundary"
    new java.io.File(dir).mkdirs()
    def line(uid: Long, sec: Long): String =
      s"""{"user_id":$uid,"ts":"${java.time.Instant.ofEpochSecond(sec)}","value":1.0}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/f0.json"),
      Seq(line(1L, wmS - 1801), line(2L, wmS - 1802), line(3L, wmS - 1800),
          line(99L, m)).mkString("\n").getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))
    val stream = StreamingEtl.jsonStream(spark, dir, schema)
    StreamingEtl.runToMemory(
      StreamingEtl.sessionizeStream(stream).toDF(),
      "fmgws_boundary", s"$tmp/cp_fmgws_boundary", outputMode = "append")
    val emitted = spark.table("fmgws_boundary")
      .select("userId").collect().map(_.getLong(0)).toSet
    // oracle predicate over the same fixture: end_s + 1801 <= wm_s
    val oracle = Map(1L -> (wmS - 1801), 2L -> (wmS - 1802), 3L -> (wmS - 1800), 99L -> m)
      .filter { case (_, end) => end + 1801 <= wmS }.keySet
    assert(oracle == Set(1L, 2L))
    assert(emitted == oracle,
      s"stream emitted $emitted but oracle closes $oracle — timeout boundary drifted")
  }

  test("flatMapGroupsWithState sessions match the batch sessionization (closed subset)") {
    // time-ordered arrival (the operator's contract): 4 files = 4
    // consecutive time ranges, like monthly competência files
    val ordered = s"$tmp/input_ordered"
    val lines = Tables.events(spark, sf).orderBy(col("ts"), col("event_id"))
      .toJSON.collect()
    val chunk = (lines.length + 3) / 4
    new java.io.File(ordered).mkdirs()
    lines.grouped(chunk).zipWithIndex.foreach { case (ls, i) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$ordered/f$i.json"),
        ls.mkString("\n").getBytes("UTF-8"))
    }
    val schema = org.apache.spark.sql.types.StructType(eventsSchema.map(f => f.copy()))
    val stream = StreamingEtl.jsonStream(spark, ordered, schema, maxFilesPerTrigger = Some(1))
    StreamingEtl.runToMemory(
      StreamingEtl.sessionizeStream(stream).toDF(),
      "fs_sessions", s"$tmp/cp_fs", outputMode = "append")
    val streamed = spark.table("fs_sessions")
      .select("userId", "sessionStartS", "nEvents").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = SparkEntry.queries("q_ev_session")(spark, sf)
      .select("user_id", "session_start_s", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty, "no sessions closed")
    val unmatched = streamed -- batch
    assert(unmatched.isEmpty, s"streamed sessions not in batch: ${unmatched.take(3)}")
  }

  test("streaming packer bins equal the batch packing aggregation") {
    // id-ordered shards (the packer's arrival contract)
    val dir = s"$tmp/docs_ordered"
    val lines = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id")).toJSON.collect()
    val chunk = (lines.length + 3) / 4
    new java.io.File(dir).mkdirs()
    lines.grouped(chunk).zipWithIndex.foreach { case (ls, i) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/d$i.json"),
        ls.mkString("\n").getBytes("UTF-8"))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(dir)
    StreamingEtl.runToMemory(
      StreamingEtl.packStream(stream).toDF(), "packed", s"$tmp/cp_pack",
      outputMode = "append")
    val streamed = spark.table("packed")
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokEst")).as("bin_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = SparkEntry.queries("q_pack_bins")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch)
  }

  test("progress listener accumulates input rows across micro-batches") {
    val rec = new StreamingEtl.ProgressRecorder
    spark.streams.addListener(rec)
    try {
      StreamingEtl.runToMemory(
        StreamingEtl.windowedCounts(streamDf()), "wc_prog", s"$tmp/cp_prog")
      // listener delivery is async: poll until the events settle
      val expected = Tables.events(spark, sf).count()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (rec.totalRows < expected && System.nanoTime() < deadline)
        Thread.sleep(100)
      // AvailableNow + maxFilesPerTrigger=1 -> at least one batch per file
      assert(rec.numBatches >= 3)
      assert(rec.totalRows == expected)
    } finally spark.streams.removeListener(rec)
  }

  test("stratified sampling by key approximates requested fractions") {
    val ev = Tables.events(spark, sf)
    val fractions = Map("view" -> 0.5, "click" -> 0.1, "purchase" -> 1.0)
    val sampled = ev.stat.sampleBy("event_type", fractions, seed = 42L)
    val got = sampled.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    fractions.foreach { case (k, f) =>
      val ratio = got.getOrElse(k, 0L).toDouble / base(k)
      assert(math.abs(ratio - f) < 0.15, s"$k: got $ratio want $f")
    }
    assert(!got.contains("error") && !got.contains("signup"))
    // deterministic under a fixed seed
    assert(ev.stat.sampleBy("event_type", fractions, 42L).count() == sampled.count())
  }

  test("S4 fetch honors file:// and the byte cap") {
    import graft.sources.HttpFetch
    val f = java.nio.file.Files.createTempFile("graft_fetch", ".bin")
    java.nio.file.Files.write(f, Array.fill(1024)(7.toByte))
    val got = HttpFetch.fetchBytes(f.toUri.toString)
    assert(got.length == 1024 && got.forall(_ == 7))
    assertThrows[IllegalArgumentException](
      HttpFetch.fetchBytes(f.toUri.toString,
        HttpFetch.FetchLimits(maxBytes = 100)))
    assertThrows[IllegalArgumentException](
      HttpFetch.fetchBytes("ftp://nope/x.zip"))
  }

  test("partitioned parquet sink is idempotent on re-run (dynamic overwrite)") {
    val out = s"$tmp/lake"
    val agg = StreamingEtl.windowedCounts(streamDf())
      .withColumn("day", to_date(col("window_start")))
    StreamingEtl.runToPartitionedParquet(agg, out, s"$tmp/cp_lake1", Seq("day"))
    val n1 = spark.read.parquet(out).count()
    // re-run from a fresh checkpoint: same months re-processed -> overwritten,
    // not appended (the reference's duplicate-append gap, service.ts:33)
    StreamingEtl.runToPartitionedParquet(agg, out, s"$tmp/cp_lake2", Seq("day"))
    val n2 = spark.read.parquet(out).count()
    assert(n1 == n2)
  }

  test("probeCells orders a NaN cosine (zero centroid) like Double.compare — batch-probe parity") {
    // A zero centroid makes every cosine against it NaN. The batch twin's
    // TopKAggregator ranks scores with java.lang.Double.compare, where NaN
    // is LARGEST — so under desc ordering the zero cell sorts FIRST. The
    // streaming comparator must agree (round-9 ADVICE: without explicit
    // isnan branches, NaN read as a score-TIE and fell to the cid
    // tiebreak, ordering differently when cids straddle the others').
    import spark.implicits._
    val dim = 4
    val cents: Seq[(Long, Seq[Double])] = Seq(
      (10L, Seq(1.0, 0.0, 0.0, 0.0)),
      (20L, Seq.fill(dim)(0.0)), // zero centroid -> NaN cosine
      (30L, Seq(0.0, 1.0, 0.0, 0.0)))
    val vecs = Seq((1L, Seq(1.0, 0.5, 0.0, 0.0)), (2L, Seq(0.1, 1.0, 0.0, 0.0)))
    val got = vecs.toDF("vec_id", "v")
      .select(col("vec_id"), StreamingEtl.probeCells(col("v"), cents, 2).as("p"))
      .as[(Long, Seq[Long])].collect().toMap
    // expected order via Double.compare on the exact same cosines
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = vecs.map { case (id, v) =>
      id -> cents.map { case (cid, c) => (cos(v, c), cid) }
        .sortWith { case ((ca, ia), (cb, ib)) =>
          val c = java.lang.Double.compare(ca, cb)
          if (c != 0) c > 0 else ia < ib // desc score, asc cid
        }.take(2).map(_._2)
    }.toMap
    assert(got == expected)
    // the NaN cell must actually be in front (guards against a vacuous pass)
    assert(expected.values.forall(_.head == 20L))
  }
}
