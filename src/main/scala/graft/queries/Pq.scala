package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011 — public method): split each vector into
  * S subvectors, train an independent codebook per subspace, encode every
  * vector as S small centroid ids. Memory per vector drops from
  * dims x 4 bytes to S bytes, and approximate distances are computed from
  * a per-query lookup table (ADC) — the standard billion-vector ANN
  * compression.
  *
  * Two surfaces:
  *  - [[qPqCodebook]] (GATED): one codebook-training round per subspace in
  *    EXACT INTEGER space — vectors quantize to BIGINT, assignment is
  *    integer squared-L2 argmin (no floats anywhere, so no cross-engine
  *    ulp risk at all), output is each (subspace, centroid)'s population
  *    and exact distance/assignment checksums.
  *  - [[pqTopK]] (library): full PQ-ADC retrieval — encode the corpus,
  *    build the query's S x centroids lookup table, approximate distances
  *    by code lookup, exact re-rank of the best candidates. Recall
  *    spec-checked against exact brute force.
  *
  * Scale shape: training joins are (corpus x centroids-per-subspace) with
  * broadcast centroids and map-side argmin (groupBy partial agg) — linear
  * in the corpus; retrieval shuffles only (vec_id, s, code) triples and
  * the ADC join hits the broadcast LUT, so the heavy side never carries
  * raw vectors.
  */
object Pq {

  private val SubSpaces = 8
  private val SubDim = 8 // 64 dims / 8 subspaces
  private val CentStep = 50 // centroid seed: vec_id % CentStep == 0
  private val TopK = 10

  /** (vec_id, s, sv): integer subvectors, one row per (vector, subspace). */
  private def subvectors(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .select($"vec_id",
        transform($"embedding", x => round(x.cast("double") * 1e7).cast("long")).as("vq"))
      .repartition($"vec_id") // scoring parallelism; see Similarity.vectors
      .select($"vec_id", posexplode(
        transform(sequence(lit(0), lit(SubSpaces - 1)),
          i => slice($"vq", i * SubDim + 1, lit(SubDim)))))
      .withColumnRenamed("pos", "s").withColumnRenamed("col", "sv")
  }

  /** Exact integer squared L2 between two BIGINT arrays — native codegen
    * expression (one compiled loop per row); [[il2Hof]] is the executable
    * HOF spec it replaces. */
  private def il2(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.NativeExprs.arrayLongSqL2(a, b)

  /** HOF spec twin of [[il2]] (TrainingOpsSpec checks equality). */
  private[graft] def il2Hof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, d) => acc + d)

  private[graft] def il2Native(a: Column, b: Column): Column = il2(a, b)

  /** Assign every (vector, subspace) to its nearest subspace centroid by
    * integer squared L2 (ties → lowest c_id; min(struct) = (dist asc,
    * c_id asc), the natural deterministic order — no float anywhere).
    * Returns (vec_id, s, c_id, d). */
  private def assignSub(sub: DataFrame, cents: DataFrame): DataFrame = {
    import sub.sparkSession.implicits._
    sub.join(broadcast(cents), "s")
      .select($"vec_id", $"s", $"c_id", il2($"sv", $"cv").as("d"))
      .groupBy($"vec_id", $"s")
      .agg(min(struct($"d", $"c_id")).as("best"))
      .select($"vec_id", $"s", $"best.c_id".as("c_id"), $"best.d".as("d"))
  }

  /** GATED: per-(subspace, centroid) codebook statistics after one exact
    * integer assignment round — population, total squared distortion, and
    * the assigned-id checksum. The full cross-engine check of PQ's
    * training core (subvector split + integer L2 argmin). */
  def qPqCodebook(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sub = subvectors(s, dir)
    val cents = sub.filter($"vec_id" % CentStep === 0)
      .select($"s", $"vec_id".as("c_id"), $"sv".as("cv"))
    assignSub(sub, cents)
      .groupBy($"s", $"c_id")
      .agg(count(lit(1)).as("n_assigned"),
           sum($"d").as("distortion"),
           sum($"vec_id").as("assigned_id_sum"))
  }

  val qPqCodebookSql: String =
    s"""WITH v AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT)) AS vq
       |  FROM embeddings),
       |sub AS (
       |  SELECT vec_id, i AS s, vq[i * $SubDim + 1 : i * $SubDim + $SubDim] AS sv
       |  FROM v, range(0, $SubSpaces) r(i)),
       |cents AS (
       |  SELECT s, vec_id AS c_id, sv AS cv FROM sub WHERE vec_id % $CentStep = 0),
       |dist AS (
       |  SELECT sub.vec_id, sub.s, cents.c_id,
       |    CAST(list_sum(list_transform(range(1, ${SubDim + 1}),
       |      j -> (sv[j] - cv[j]) * (sv[j] - cv[j]))) AS BIGINT) AS d
       |  FROM sub JOIN cents ON cents.s = sub.s),
       |assign AS (
       |  SELECT vec_id, s, c_id, d FROM (
       |    SELECT vec_id, s, c_id, d,
       |      row_number() OVER (PARTITION BY vec_id, s ORDER BY d ASC, c_id ASC) AS rn
       |    FROM dist) WHERE rn = 1)
       |SELECT s, c_id, count(*) AS n_assigned,
       |  CAST(sum(d) AS BIGINT) AS distortion,
       |  CAST(sum(vec_id) AS BIGINT) AS assigned_id_sum
       |FROM assign GROUP BY s, c_id""".stripMargin

  /** Library PQ-ADC retrieval: encode the corpus once (S codes per
    * vector), then for each query build the S x centroids distance lookup
    * table and score every vector by summing its codes' table entries —
    * the classic asymmetric distance computation. The scored stream
    * carries only (vec_id, code) pairs; raw vectors are touched again only
    * for the exact re-rank of the rerank-pool best candidates. Recall vs
    * exact brute force is spec-checked (PlanHygiene exempt: broadcast
    * 1-row/LUT cross joins are bounded). */
  def pqTopK(s: SparkSession, dir: String, k: Int = TopK,
             rerankPool: Int = 50): DataFrame = {
    import s.implicits._
    val sub = subvectors(s, dir)
    val cents = sub.filter($"vec_id" % CentStep === 0)
      .select($"s", $"vec_id".as("c_id"), $"sv".as("cv"))
    // corpus codes: S small ids per vector
    val codes = assignSub(sub, cents).select($"vec_id", $"s", $"c_id")
    // queries (bounded set, as in Similarity): their raw subvectors
    val qsub = sub.filter($"vec_id" % 100 === 0 && $"vec_id" < 1000)
      .select($"vec_id".as("q_id"), $"s", $"sv".as("qv"))
    // ADC lookup table: distance from each query subvector to every
    // subspace centroid — (queries x S x centroids) rows, broadcastable
    val lut = qsub.join(broadcast(cents), "s")
      .select($"q_id", $"s", $"c_id", il2($"qv", $"cv").as("ld"))
    // approximate distance: sum of the S looked-up entries per vector
    val approx = codes.join(broadcast(lut), Seq("s", "c_id"))
      .filter($"vec_id" =!= $"q_id")
      .groupBy($"q_id", $"vec_id")
      .agg(sum($"ld").as("adist"), count(lit(1)).as("n_sub"))
      .filter($"n_sub" === SubSpaces) // all subspaces looked up
    // candidate pool by approximate distance, then exact re-rank
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy($"adist".asc, $"vec_id".asc)
    val pool = approx.withColumn("pr", row_number().over(pw))
      .filter($"pr" <= rerankPool)
      .select($"q_id", $"vec_id")
    val v = Tables.embeddings(s, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy($"cos_sim".desc, $"neighbor_id".asc)
    pool
      .join(broadcast(v.select($"vec_id".as("q_id"), $"v".as("qv"))), "q_id")
      .join(v.select($"vec_id", $"v"), "vec_id")
      .select($"q_id", $"vec_id".as("neighbor_id"),
        graft.functions.TextFunctions.cosine($"qv", $"v").as("cos_sim"))
      .withColumn("rank", row_number().over(rw).cast("long"))
      .filter($"rank" <= k)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pq_codebook" -> (qPqCodebook _))

  def oracles: Map[String, String] = Map(
    "q_pq_codebook" -> qPqCodebookSql)
}
