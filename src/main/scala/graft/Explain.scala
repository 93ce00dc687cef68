package graft

/** Dump formatted physical plans for plan-quality review (dev tool):
  * checks that filters/pruning reach the parquet scans, dims broadcast,
  * and codegen spans cover the hot operators. */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q6_filter_sum", "q3_join_topk", "q5_star_join", "q_dedup_jaccard", "q_ann_brute")
    val spark = GraftSession.builder("8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
