package graft.queries

import org.apache.spark.sql.DataFrame

/** Eager materialization for the session-memoized relations (shingles,
  * pair graph, rarity ranks, bigrams, clusters, pagerank, TokenPairs).
  *
  * Default: `localCheckpoint(true)` — executor-local blocks, the right
  * lifecycle for local mode and bench sweeps, but NOT fault-tolerant on
  * a real cluster: a lost executor invalidates the truncated lineage and
  * every consumer of the cached relation fails with it.
  *
  * Production knob: call `spark.sparkContext.setCheckpointDir(...)` and
  * set `spark.graft.reliableCheckpoint=true` in the session conf to
  * switch every memoized relation to a reliable (DFS-backed) checkpoint
  * — same eager semantics, survives executor loss. One switch, one
  * place, so the bench path and the cluster path cannot drift.
  */
object Memo {
  def materialize(df: DataFrame): DataFrame = {
    val reliable = df.sparkSession.conf
      .getOption("spark.graft.reliableCheckpoint").contains("true")
    if (reliable) df.checkpoint(true) else df.localCheckpoint(true)
  }
}
