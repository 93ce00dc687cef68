package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] = Seq(
    (graft.queries.Relational.queries, graft.queries.Relational.oracles),
    (graft.queries.Dedup.queries, graft.queries.Dedup.oracles),
    (graft.queries.Similarity.queries, graft.queries.Similarity.oracles),
    (graft.queries.Pq.queries, graft.queries.Pq.oracles),
    (graft.queries.TextAnalysis.queries, graft.queries.TextAnalysis.oracles),
    (graft.queries.TrainingData.queries, graft.queries.TrainingData.oracles),
    (graft.queries.Events.queries, graft.queries.Events.oracles),
    (graft.queries.Etl.queries, graft.queries.Etl.oracles),
    (graft.queries.Multimodal.queries, graft.queries.Multimodal.oracles),
    (graft.queries.StreamingGate.queries, graft.queries.StreamingGate.oracles),
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q5StarJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
