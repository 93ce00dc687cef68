package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an undirected edge list — the
  * graph-analytics companion to [[ConnectedComponents]] (cluster shape) and
  * the PageRank family (centrality): triangle participation measures local
  * cohesion, the signal behind clustering coefficients and dense-near-dup
  * community detection.
  *
  * Scale design (the compact-forward / degree-orientation algorithm,
  * public literature: Latapy 2008): orient every undirected edge from its
  * (degree, id)-smaller endpoint to the larger. The orientation is acyclic
  * and every triangle has exactly one "apex" node with both out-edges, so
  *  - each triangle is found exactly ONCE (no /6 correction, no double
  *    counting), and
  *  - the wedge join's fan-out per node is its OUT-degree, which the
  *    orientation bounds by O(sqrt(E)) for any graph — the wedge volume is
  *    O(E^1.5) worst-case instead of Σ deg² (a single hub node no longer
  *    produces deg² wedges).
  * Plan shape: two key-partitioned self-joins (wedge build on the middle
  * node, closure check on the (apex, far) pair) + one explode/groupBy for
  * per-node counts — all shuffle-on-key, no window, no driver state.
  */
object Triangles {

  /** Per-node triangle participation counts. Input: any two-column edge
    * DataFrame (one row per undirected edge); self-loops are dropped and
    * duplicate / reversed rows canonicalized away. Output: (id,
    * n_triangles) for every node in at least one triangle. */
  def perNode(edges: DataFrame): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    val cols = edges.columns
    val und = edges.select(col(cols(0)).as("x"), col(cols(1)).as("y"))
      .filter($"x" =!= $"y")
      .select(least($"x", $"y").as("a"), greatest($"x", $"y").as("b"))
      .distinct()
    val deg = und.select($"a".as("id")).union(und.select($"b".as("id")))
      .groupBy($"id").agg(count(lit(1)).as("deg"))
    val oriented = und
      .join(deg.select($"id".as("a"), $"deg".as("da")), Seq("a"))
      .join(deg.select($"id".as("b"), $"deg".as("db")), Seq("b"))
      .select(
        when($"da" < $"db" || ($"da" === $"db" && $"a" < $"b"), $"a").otherwise($"b").as("u"),
        when($"da" < $"db" || ($"da" === $"db" && $"a" < $"b"), $"b").otherwise($"a").as("v"))
    val wedges = oriented.as("e1").join(oriented.as("e2"), col("e1.v") === col("e2.u"))
      .select(col("e1.u").as("p"), col("e1.v").as("q"), col("e2.v").as("r"))
    val tris = wedges.join(oriented.as("e3"),
        $"p" === col("e3.u") && $"r" === col("e3.v"), "left_semi")
    tris.select(explode(array($"p", $"q", $"r")).as("id"))
      .groupBy($"id").agg(count(lit(1)).as("n_triangles"))
  }

  /** All-orderings brute force over collected edges (SPEC BASELINE ONLY —
    * O(n³) driver-side; the executable oracle that [[perNode]] is exact
    * on randomized graphs). */
  private[graft] def bruteCounts(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
      (a, b, c) = (nodes(i), nodes(j), nodes(k))
      if und((a, b)) && und((b, c)) && und((a, c))
    } { counts(a) += 1; counts(b) += 1; counts(c) += 1 }
    counts.toMap
  }
}
