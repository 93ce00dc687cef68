package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimum-label propagation connected components over an edge list —
  * the clustering step of near-duplicate deduplication (pairs → clusters →
  * one canonical document per cluster).
  *
  * Each iteration is ONE shuffle: the neighbor-join + min-aggregate also
  * carries the previous label (neighbor rows contribute Long.MaxValue to a
  * parallel min, so min(old) == the old label), and the convergence check
  * is a cheap scan-reduce over the already-materialized iteration result —
  * no second join, no pipeline replay. The loop runs to fixpoint, bounded
  * by component diameter; near-dup clusters are tiny, so 2-4 iterations in
  * practice. Deterministic: every vertex converges to the minimum vertex
  * id reachable from it.
  *
  * Lineage is truncated each pass: by default with an eager
  * localCheckpoint (executor-local, fine for local mode); pass
  * `checkpointDir` to use reliable HDFS/object-store checkpoints on a real
  * cluster, where executor loss would otherwise kill a long lineage.
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame (u, v), undirected semantics.
    * @param checkpointDir reliable checkpoint location (cluster use);
    *        None = eager localCheckpoint (single-node/test use).
    * @return (id, cluster) — cluster = min reachable vertex id. */
  def run(edges: DataFrame, maxIter: Int = 20,
          checkpointDir: Option[String] = None): DataFrame = {
    val spark = edges.sparkSession
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    def materialize(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true) else df.localCheckpoint(true)

    val u = edges.columns(0)
    val v = edges.columns(1)
    // materialize once: every iteration re-reads the edge list, and its
    // upstream (e.g. a similarity-join pipeline) must not replay per pass
    val sym = materialize(
      edges.select(col(u).as("src"), col(v).as("dst"))
        .union(edges.select(col(v).as("src"), col(u).as("dst"))))

    var labels = materialize(
      sym.select(col("src").as("id")).distinct()
        .withColumn("cluster", col("id")))

    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val viaNeighbor = sym
        .join(labels.withColumnRenamed("id", "dst_id"), col("dst") === col("dst_id"))
        .select(col("src").as("id"), col("cluster"),
          lit(Long.MaxValue).as("old")) // neutral for min(old)
      // one shuffle: min(new label) and min(old)=previous label together
      val next = materialize(
        labels.withColumn("old", col("cluster"))
          .unionByName(viaNeighbor)
          .groupBy("id")
          .agg(min("cluster").as("cluster"), min("old").as("old")))
      // convergence check: scan-reduce over the materialized result (no
      // join, no replay — the expensive pass above ran exactly once)
      changed = next.filter(col("cluster") < col("old")).count()
      labels = next.drop("old")
      iter += 1
    }
    labels
  }
}
