package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** CHECKPOINT-RECOVERY proof for the stateful streaming cores (round-8,
  * verdict item 5): the exactly-once claim was previously tested only
  * under clean single AvailableNow runs. Here each core is STOPPED
  * MID-RUN — after at least one committed micro-batch, with most of the
  * input still unread and (typically) a batch in flight that the stop
  * aborts — then restarted from the same checkpoint, and the final
  * result must equal the uninterrupted batch answer on the same data:
  *
  *  - state restore: sessions merged from pre-kill batches live only in
  *    the checkpointed state store, so a wrong/lost state rebuild shows
  *    up as split or missing sessions;
  *  - source replay: file-source offsets recover so the aborted batch
  *    re-reads exactly the unprocessed files — nothing skipped;
  *  - sink idempotence: the parquet sink's metadata log commits each
  *    batch atomically, so the aborted batch's partial files (if any)
  *    are invisible to readers and replay cannot double-write.
  *
  * Both tests assert the kill was REAL (first run consumed >0 and < all
  * input rows) so the recovery path is never vacuously green.
  */
class StreamingRecoverySpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val tmp = Files.createTempDirectory("graft_recovery").toFile.getPath

  /** events fixture as a 12-file JSON dir: with maxFilesPerTrigger=1 a
    * run is 12 micro-batches — plenty of room to kill between commits.
    * repartitionByRange (not hash repartition) so the 12 distinct part
    * values can't collide into fewer partitions — the 12-file premise
    * is guaranteed, not approximate, and the kill window can't collapse
    * on a fast machine. */
  private lazy val inputDir: String = {
    val dir = s"$tmp/input"
    Tables.events(spark, sf)
      .withColumn("part", (col("event_id") % 12).cast("int"))
      .repartitionByRange(12, col("part"))
      .drop("part")
      .write.json(dir)
    val n = new java.io.File(dir).listFiles.count(_.getName.endsWith(".json"))
    assert(n == 12, s"fixture wrote $n json files, expected 12")
    dir
  }

  private lazy val schema = Tables.events(spark, sf).schema
  private lazy val totalRows = Tables.events(spark, sf).count()

  /** The SAME rows both engines see (JSON round-trip pins precision). */
  private def batchEvents: DataFrame = spark.read.schema(schema).json(inputDir)

  private def streamEvents: DataFrame =
    streaming.StreamingEtl.jsonStream(spark, inputDir, schema,
      maxFilesPerTrigger = Some(1))

  /** Wait until `q` has committed at least `minBatches` micro-batches
    * with input, then stop it (aborting any in-flight batch). Returns
    * rows consumed by committed batches. */
  private def killAfterBatches(q: StreamingQuery, minBatches: Int): Long = {
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    def committedWithInput = q.recentProgress.count(_.numInputRows > 0)
    while (committedWithInput < minBatches && q.isActive) {
      assert(System.nanoTime() < deadline, "no committed batch within 120s")
      Thread.sleep(25)
    }
    q.stop()
    q.awaitTermination()
    q.recentProgress.map(_.numInputRows).sum
  }

  private def asSet(df: DataFrame): Set[Row] = df.collect().toSet

  // The event_id%12 file split makes every micro-batch span the fixture's
  // whole month, so a production-sized watermark would (correctly) drop
  // late rows and evict join/session state between batches — semantics
  // the gates own (q_stream_sessions/q_stream_join drain in-order).
  // THIS spec isolates CHECKPOINT RECOVERY, so the watermark is set past
  // the fixture's range: nothing is ever late, state never evicts, and
  // any stream-vs-batch diff can only come from lost/duplicated state or
  // offsets across the kill.
  private val wm = "90 days"

  test("session-window aggregation recovers state from the checkpoint after a mid-run kill") {
    // q_stream_sessions' core: watermarked session_window merge per user.
    def sessionAgg(ev: DataFrame): DataFrame = ev
      .withWatermark("ts", wm)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cast(round(value * 100) as long)")).as("total_value_c"))
      .select(expr("cast(session_window.start as bigint)").as("session_start_s"),
        col("user_id"), col("n_events"), col("total_value_c"))

    val cp = s"$tmp/cp_sessions"
    // Run 1: 1-second trigger cadence so the kill lands deterministically
    // after ~2 commits with ~10 files still unread.
    val q1 = sessionAgg(streamEvents).writeStream
      .format("memory").queryName("recovery_sessions_1")
      .outputMode("complete").option("checkpointLocation", cp)
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    val consumed = killAfterBatches(q1, minBatches = 2)
    assert(consumed > 0, "kill was too early: no input committed")
    assert(consumed < totalRows,
      s"kill was too late: all $totalRows rows consumed — recovery untested")

    // Run 2: restart from the SAME checkpoint, drain the rest. Complete
    // mode re-emits the full restored-plus-new state into a fresh table.
    val q2 = sessionAgg(streamEvents).writeStream
      .format("memory").queryName("recovery_sessions_2")
      .outputMode("complete").option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q2.awaitTermination()

    val expected = asSet(sessionAgg(batchEvents))
    val got = asSet(spark.table("recovery_sessions_2"))
    assert(got == expected,
      s"recovered result diverges: missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("JDBC sink: epoch-guard upsert survives a mid-run kill without double-insert") {
    // The reference's real sink is a database (PostgreSQL loader); a
    // plain append-mode JDBC foreachBatch double-inserts any batch that
    // committed to the DB but not to the checkpoint before a crash.
    // Sinks.jdbcUpsertBatch closes that window (epoch guard + staged
    // atomic swap). Kill mid-run, restart from the same checkpoint,
    // assert the final table equals the batch answer exactly — row
    // count catches duplicates, the set compare catches losses.
    val dbDir = Files.createTempDirectory("graft_derby_eo").toString
    val url = s"jdbc:derby:$dbDir/db;create=true"
    val cp = s"$tmp/cp_jdbc"
    def projected(ev: DataFrame): DataFrame = ev.select(
      col("event_id"), col("user_id"), col("event_type"),
      expr("cast(ts as bigint)").as("ts_s"),
      expr("cast(round(value * 100) as long)").as("value_c"))

    val q1 = streaming.StreamingEtl.runToJdbc(
      projected(streamEvents), url, "EVENTS_EO", cp,
      trigger = Trigger.ProcessingTime("1 second"))
    val consumed = killAfterBatches(q1, minBatches = 2)
    assert(consumed > 0, "kill was too early: no input committed")
    assert(consumed < totalRows,
      s"kill was too late: all $totalRows rows consumed — recovery untested")

    val q2 = streaming.StreamingEtl.runToJdbc(
      projected(streamEvents), url, "EVENTS_EO", cp)
    q2.awaitTermination()

    val result = sources.Sinks.readJdbc(spark, url, "EVENTS_EO")
    val expected = projected(batchEvents)
      .select(projected(batchEvents).columns.map(c => col(c).cast("string").as(c)): _*)
    assert(result.count() == totalRows,
      s"row count ${result.count()} != $totalRows (duplicate or lost batch)")
    assert(asSet(result.select("event_id", "user_id", "event_type", "ts_s", "value_c"))
      == asSet(expected), "recovered JDBC table diverges from batch input")
    // the epoch guard recorded every committed batch exactly once
    val epochs = sources.Sinks.readJdbc(spark, url, "EVENTS_EO_EPOCHS")
    assert(epochs.count() == epochs.select("BATCH_ID").distinct().count())
    assert(epochs.count() >= 2, "fewer than 2 committed epochs — vacuous")
  }

  test("stream-stream interval join recovers offsets and dedups the aborted batch (parquet sink)") {
    // q_stream_join's core: view->click interval join, both sides
    // watermarked; the parquet sink's metadata log carries exactly-once
    // across the kill (the memory sink is not fault-tolerant, so the
    // recovery form is the production file sink).
    // interval widened to 7 days so the sf0.001 expected set is dense
    // enough (30 min yields ~2 pairs) for the compare to have teeth
    def joined(ev: DataFrame): DataFrame = {
      val views = ev.filter(col("event_type") === "view")
        .withWatermark("ts", wm)
        .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("v_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .withWatermark("ts", wm)
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ts").as("c_ts"))
      views.join(clicks,
        col("user_id") === col("c_user") &&
          col("c_ts") >= col("v_ts") &&
          col("c_ts") <= col("v_ts") + expr("INTERVAL 7 DAYS"))
        .select(col("view_id"), col("click_id"), col("user_id"),
          expr("cast(v_ts as bigint)").as("view_s"),
          expr("cast(c_ts as bigint)").as("click_s"),
          expr("cast(c_ts as bigint) - cast(v_ts as bigint)").as("gap_s"))
    }
    def joinedStream(): DataFrame = joined(streamEvents)

    val cp = s"$tmp/cp_join"
    val out = s"$tmp/out_join"
    val q1 = joinedStream().writeStream
      .format("parquet").option("path", out)
      .outputMode("append").option("checkpointLocation", cp)
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    // Both sides stream the same 12-file dir, so each side commits ≥2
    // batches before the kill; most files remain for the restart.
    val consumed = killAfterBatches(q1, minBatches = 2)
    assert(consumed > 0, "kill was too early: no input committed")
    assert(consumed < 2 * totalRows,
      "kill was too late: both sides fully consumed — recovery untested")

    val q2 = joinedStream().writeStream
      .format("parquet").option("path", out)
      .outputMode("append").option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q2.awaitTermination()

    // Reading the sink path goes through its _spark_metadata log, so any
    // files from the aborted batch are invisible — this read IS the
    // exactly-once assertion, duplicates would fail the set compare
    // (and the row-count compare catches exact-duplicate rows).
    val result = spark.read.parquet(out)
    val expected = joined(batchEvents)
    assert(expected.count() > 0, "vacuous: batch join matched nothing")
    assert(result.count() == expected.count(),
      s"row count ${result.count()} != batch ${expected.count()} (duplicate or lost emits)")
    assert(asSet(result) == asSet(expected), "recovered join diverges from batch join")
  }
}
