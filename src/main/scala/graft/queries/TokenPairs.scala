package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions.tokens

/** Shared top-20 co-occurring token-pair pipeline — the common core of
  * qTextCooc (pair counts) and qTextPmi (PMI scores over the same pairs).
  *
  * Two problems with the naive form (explode distinct tokens, self-join on
  * doc_id, count) at 100 TB:
  *
  *  1. It is O(Σ dᵢ²) in per-doc distinct-token count dᵢ — a single
  *     5k-distinct-token document emits 12.5M pair rows before aggregation.
  *  2. Both consumers used to run the identical pipeline twice.
  *
  * Fix 1 — SUPPORT PRUNING with a provable bound. For any pair,
  * n_ab <= min(df_a, df_b) (a pair can only co-occur in docs containing
  * both tokens). So if we can exhibit 20 actual pairs with count >= S,
  * the global 20th-best count T20 >= S, and every global-top-20 pair has
  * both tokens' df >= n_ab >= T20 >= S: restricting the pair join to
  * tokens with df >= S loses nothing (including count-ties at the
  * boundary — ALL pairs with n_ab >= T20 survive, so the deterministic
  * (n desc, tok_a, tok_b) tie-break sees the same candidates). The seed S
  * comes from a cheap pair join restricted to the SeedV most frequent
  * tokens; when that seed yields fewer than 20 pairs (tiny corpora),
  * S falls back to 1 = no pruning, still exact. Pruning is BY TOKEN, so
  * surviving pairs keep their full exact counts.
  *
  * Fix 2 — the result is memoized per (session, sf-dir) and
  * localCheckpointed, like Dedup.clusters: one pipeline run feeds both
  * gated queries. The checkpointed result is 20 rows.
  *
  * The corpus size (for PMI) rides along as a broadcast 1-row aggregate
  * (crossJoin), not a docs.count() driver action — the documents scan is
  * paid once, inside the one pipeline.
  */
object TokenPairs {

  private val SeedV = 50

  private final class LazyPairs(compute: () => DataFrame) {
    lazy val df: DataFrame = compute()
  }
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), LazyPairs]()

  /** (tok_a, tok_b, n_ab, c_a, c_b, n_docs_total): the global top-20 token
    * pairs by co-occurring-doc count (order (n_ab desc, tok_a, tok_b)),
    * with each token's document frequency and the corpus size attached.
    * Memoized + materialized per (session, dir). */
  def top20(s: SparkSession, dir: String): DataFrame = {
    cache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    cache.computeIfAbsent((s, dir), _ => new LazyPairs(() =>
      Memo.materialize(prunedTop20(s, dir)))).df
  }

  /** The pruned pipeline (un-memoized; see object doc for the proof). */
  def prunedTop20(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val nDocs = docs.agg(count(lit(1)).as("n_docs_total"))
    val dt = docs.select($"doc_id", explode(array_distinct(tokens($"text"))).as("tok"))
    val dfreq = dt.groupBy($"tok").agg(count(lit(1)).as("df"))

    // Seed threshold: actual pair counts among the SeedV most frequent
    // tokens (driver-free — collapses to a broadcast 1-row relation).
    val topV = dfreq.orderBy($"df".desc, $"tok".asc).limit(SeedV).select($"tok")
    val dtV = dt.join(broadcast(topV), "tok").select($"doc_id", $"tok")
    val support = dtV.as("a").join(dtV.as("b"),
        $"a.doc_id" === $"b.doc_id" && $"a.tok" < $"b.tok")
      .groupBy($"a.tok", $"b.tok").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc).limit(20)
      .agg(count(lit(1)).as("seed_pairs"), min($"n").as("seed_min"))
      .select(when($"seed_pairs" >= 20, $"seed_min").otherwise(lit(1L)).as("support"))

    // Token-level prune: df < support can't reach a top-20 pair.
    val dtPruned = dt.join(dfreq, "tok")
      .crossJoin(broadcast(support))
      .filter($"df" >= $"support")
      .select($"doc_id", $"tok")

    val pairs = dtPruned.as("a").join(dtPruned.as("b"),
        $"a.doc_id" === $"b.doc_id" && $"a.tok" < $"b.tok")
      .groupBy($"a.tok".as("tok_a"), $"b.tok".as("tok_b"))
      .agg(count(lit(1)).as("n_ab"))
      .orderBy($"n_ab".desc, $"tok_a".asc, $"tok_b".asc)
      .limit(20)

    pairs
      .join(dfreq.select($"tok".as("tok_a"), $"df".as("c_a")), "tok_a")
      .join(dfreq.select($"tok".as("tok_b"), $"df".as("c_b")), "tok_b")
      .crossJoin(broadcast(nDocs))
      .select($"tok_a", $"tok_b", $"n_ab", $"c_a", $"c_b", $"n_docs_total")
  }

  /** Unpruned all-pairs baseline — the executable spec that the support
    * prefilter is exact (TrainingOpsSpec compares the two). */
  def baselineTop20(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val nDocs = docs.agg(count(lit(1)).as("n_docs_total"))
    val dt = docs.select($"doc_id", explode(array_distinct(tokens($"text"))).as("tok"))
    val dfreq = dt.groupBy($"tok").agg(count(lit(1)).as("df"))
    val pairs = dt.as("a").join(dt.as("b"),
        $"a.doc_id" === $"b.doc_id" && $"a.tok" < $"b.tok")
      .groupBy($"a.tok".as("tok_a"), $"b.tok".as("tok_b"))
      .agg(count(lit(1)).as("n_ab"))
      .orderBy($"n_ab".desc, $"tok_a".asc, $"tok_b".asc)
      .limit(20)
    pairs
      .join(dfreq.select($"tok".as("tok_a"), $"df".as("c_a")), "tok_a")
      .join(dfreq.select($"tok".as("tok_b"), $"df".as("c_b")), "tok_b")
      .crossJoin(broadcast(nDocs))
      .select($"tok_a", $"tok_b", $"n_ab", $"c_a", $"c_b", $"n_docs_total")
  }
}
