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
          checkpointDir: Option[String] = None): DataFrame =
    runWithIters(edges, maxIter, checkpointDir)._1

  /** [[run]] plus the number of propagation iterations executed. */
  def runWithIters(edges: DataFrame, maxIter: Int = 20,
                   checkpointDir: Option[String] = None): (DataFrame, Int) = {
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
    (labels, iter)
  }

  /** Alternating large-star/small-star connected components (Kiveris et
    * al., "Connected Components in MapReduce and Beyond", SoCC'14 —
    * public algorithm): converges in O(log n) rounds regardless of
    * component DIAMETER, where min-label propagation ([[run]]) needs one
    * iteration per hop. Near-dup clusters are tiny-diameter so min-label
    * wins there (1 shuffle/iter vs ~4 here); this variant is the right
    * tool for adversarial chain-shaped graphs (linked lists of pairwise
    * near-dups, reference chains), where label propagation degenerates to
    * O(n) rounds.
    *
    *  - large-star(u): m = min({u} ∪ Γ(u)); emit (v, m) for v ∈ Γ(u), v > u.
    *  - small-star(u): over edges directed larger→smaller, m = min({u} ∪
    *    Γ(u)); emit (v, m) for v ∈ Γ(u), v ≠ m, plus (u, m).
    *
    * Each operator is one window shuffle + one distinct; the loop runs to
    * an EXACT fixpoint (symmetric-difference count — not a checksum), and
    * at fixpoint the edges form stars (v, min-of-component).
    * @return ((id, cluster), rounds) — same contract as [[runWithIters]]. */
  def runAlternating(edges: DataFrame, maxIter: Int = 25,
                     checkpointDir: Option[String] = None): (DataFrame, Int) = {
    val spark = edges.sparkSession
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    def materialize(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true) else df.localCheckpoint(true)
    import org.apache.spark.sql.expressions.Window

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
        .filter(col("u") =!= col("v"))
      val w = Window.partitionBy("u")
      sym.withColumn("m", least(min(col("v")).over(w), col("u")))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      val d = e.select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v")).distinct()
      val w = Window.partitionBy("u")
      val withM = d.withColumn("m", min(col("v")).over(w))
      withM.filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(withM.select(col("u"), col("m").as("v")))
        .distinct()
    }

    val u0 = edges.columns(0)
    val v0 = edges.columns(1)
    var e = materialize(
      edges.select(col(u0).as("u"), col(v0).as("v"))
        .filter(col("u") =!= col("v")).distinct())
    // isolated self-pairs (u,u) in the input would be dropped; callers pass
    // edge lists from pair joins, which never contain them
    var rounds = 0
    var stable = false
    while (!stable && rounds < maxIter) {
      val next = materialize(smallStar(largeStar(e)))
      // exact fixpoint: both one-sided set differences empty
      stable = next.exceptAll(e).isEmpty && e.exceptAll(next).isEmpty
      e = next
      rounds += 1
    }
    // star edges (v, m): every non-center points at its component min;
    // centers label themselves
    val labels = e.select(col("u").as("id"), col("v").as("cluster"))
      .union(e.select(col("v").as("id"), col("v").as("cluster")))
      .distinct()
    (labels, rounds)
  }
}
