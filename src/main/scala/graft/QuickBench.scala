package graft

/** Ad-hoc same-JVM A/B timing of named registry queries (dev tool, not
  * driver contract — round 16). Mirrors Bench methodology exactly (one
  * warm-up pass, then N timed `.count()` reps per query) so a touched
  * query's delta can be read against the committed anchor without paying
  * a full 240-query sweep per iteration.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.QuickBench <dir> <q1> <q2> ...
  */
object QuickBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = GraftSession.local()
    // warm-up: JIT + codegen + parquet footers + session-cached indexes
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, dir).count()
      catch { case _: Throwable => () }
    }
    val reps = sys.env.getOrElse("SPARK_GRAFT_QB_REPS", "3").toInt
    val acc = scala.collection.mutable.Map[String, List[Double]]()
    (1 to reps).foreach { r =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        val ok = try { SparkEntry.queries(n)(spark, dir).count(); true }
                 catch { case _: Throwable => false }
        val sec = (System.nanoTime() - t0) / 1e9
        if (ok) acc(n) = sec :: acc.getOrElse(n, Nil)
        println(f"[qb] run$r $n%-26s $sec%8.3f s ok=$ok")
      }
    }
    names.foreach { n =>
      val xs = acc.getOrElse(n, Nil).sorted
      if (xs.nonEmpty)
        println(f"[qb] p50  $n%-26s ${xs(xs.length / 2)}%8.3f s  (min ${xs.head}%.3f max ${xs.last}%.3f)")
    }
    spark.stop()
  }
}
