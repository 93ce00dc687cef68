package graft

import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for the dedup hot path (dev tool, not driver contract). */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("16").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.functions.TextFunctions._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = Tables.documents(spark, dir)
    time("docs count")(docs.count())
    val sh = docs.select($"doc_id", shingleSet($"text").as("sh"))
      .filter(size($"sh") > 0)
    time("shingle sets")(sh.count())
    time("shingle sets again")(sh.count())
    val inv = sh.select($"doc_id", explode($"sh").as("s"))
    time("inverted index")(inv.count())
    val inter = inv.as("a").join(inv.as("b"), $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("i"))
    time("pair intersections")(inter.count())
    time("full q_dedup_jaccard")(SparkEntry.queries("q_dedup_jaccard")(spark, dir).count())
    time("minhash sigs")(sh.select($"doc_id", minhashSig($"sh").as("sig")).count())
    time("full q_dedup_minhash")(SparkEntry.queries("q_dedup_minhash")(spark, dir).count())
    time("simhash sigs")(sh.select($"doc_id", simhash60($"sh").as("sim")).count())
    time("full q_dedup_simhash")(SparkEntry.queries("q_dedup_simhash")(spark, dir).count())
    time("full q_dedup_embed")(SparkEntry.queries("q_dedup_embed")(spark, dir).count())
    time("full q_ann_ivf")(SparkEntry.queries("q_ann_ivf")(spark, dir).count())
    time("full q_ann_kmeans")(SparkEntry.queries("q_ann_kmeans")(spark, dir).count())
    time("q_ann_kmeans again")(SparkEntry.queries("q_ann_kmeans")(spark, dir).count())
    spark.stop()
  }
}
