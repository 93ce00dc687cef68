package graft

import scala.collection.mutable
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Ad-hoc per-micro-batch timing decomposition for the streaming gates
  * (dev tool, not driver contract — the optimization-round counterpart of
  * [[PerfProbe]]). For each named gate it runs the REAL registry entry
  * (warm-up + timed runs) and prints, per run, the engine's own
  * durationMs breakdown summed across micro-batches:
  * batches / triggerExecution / queryPlanning / getBatch / addBatch /
  * walCommit / commitOffsets / stateStore commit — so "where does a
  * 2-second stream gate spend its execution time at sf0.1" is a
  * measurement, not a guess (guide §1: measure first).
  */
object StreamPerfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q_stream_lm", "q_stream_verbatim", "q_stream_anomaly",
        "q_stream_ann", "q_stream_repetition", "q_stream_dedup")
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // one listener on the shared context sees every gate's clone session
    final case class Acc(var batches: Int = 0,
        var rows: Long = 0L,
        val durs: mutable.Map[String, Long] = mutable.Map.empty)
    val byQuery = new mutable.HashMap[java.util.UUID, Acc]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        byQuery.synchronized { byQuery(e.id) = Acc() }
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        byQuery.synchronized {
          val a = byQuery.getOrElseUpdate(e.progress.id, Acc())
          a.batches += 1
          a.rows += e.progress.numInputRows
          e.progress.durationMs.forEach { (k, v) =>
            a.durs(k) = a.durs.getOrElse(k, 0L) + v.longValue()
          }
        }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // warm-up (JIT, codegen, memoized static sides — same as Bench)
      fn(spark, dir).count()
      (1 to 2).foreach { r =>
        byQuery.synchronized(byQuery.clear())
        val s0 = graft.streaming.StreamMeter.setupNanos
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        val setup = (graft.streaming.StreamMeter.setupNanos - s0) / 1e9
        val accs = byQuery.synchronized(byQuery.values.toSeq)
        val batches = accs.map(_.batches).sum
        val durs = accs.flatMap(_.durs).groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2).sum }
        val keys = Seq("triggerExecution", "queryPlanning", "getBatch",
          "addBatch", "walCommit", "commitOffsets")
        val detail = keys.map(k => f"$k=${durs.getOrElse(k, 0L)}%d").mkString(" ")
        println(f"[sprobe] $n%-26s run$r wall=$wall%6.2f s setup=$setup%5.2f s " +
          f"batches=$batches%d $detail")
      }
    }
    spark.stop()
  }
}
