package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimum-label propagation connected components over an edge list —
  * the clustering step of near-duplicate deduplication (pairs → clusters →
  * one canonical document per cluster).
  *
  * Each iteration is one distributed join + min-aggregate; the loop runs
  * until a fixpoint (no label changed), bounded by the component diameter —
  * near-dup clusters are tiny, so 2-4 iterations in practice. Lineage is
  * truncated with an eager localCheckpoint per iteration (on a cluster,
  * use a reliable checkpoint dir instead). Deterministic: every vertex
  * converges to the minimum vertex id reachable from it.
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame (u, v), undirected semantics.
    * @return (id, cluster) — cluster = min reachable vertex id. */
  def run(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val u = edges.columns(0)
    val v = edges.columns(1)
    // materialize once: every iteration re-reads the edge list, and its
    // upstream (e.g. a similarity-join pipeline) must not replay per pass
    val sym = edges.select(col(u).as("src"), col(v).as("dst"))
      .union(edges.select(col(v).as("src"), col(u).as("dst")))
      .localCheckpoint(true)

    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id"))
      .localCheckpoint(true)

    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val viaNeighbor = sym
        .join(labels.withColumnRenamed("id", "dst_id"), col("dst") === col("dst_id"))
        .select(col("src").as("id"), col("cluster"))
      val next = labels.select("id", "cluster").union(viaNeighbor)
        .groupBy("id").agg(min("cluster").as("cluster"))
        .localCheckpoint(true)
      changed = next.withColumnRenamed("cluster", "next_cluster")
        .join(labels, "id")
        .filter(col("next_cluster") =!= col("cluster"))
        .count()
      labels = next
      iter += 1
    }
    labels
  }
}
