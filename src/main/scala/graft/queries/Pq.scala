package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import org.apache.spark.sql.graft.ArgExtremum.argminStruct

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
  // Centroid seed: vec_id % CentStep == 0 AND vec_id < CentBound — the
  // bound (shared with Similarity.isCentroid) caps every subspace codebook
  // at CentBound/CentStep = 20 centroids no matter how large the corpus
  // grows; a pure-modulo seed would make the broadcast codebook O(n).
  private val CentStep = 50
  private def isSeed(c: Column): Column = Similarity.isCentroid(c, CentStep)
  private val seedSql = Similarity.centSeedSql(CentStep)
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
    * integer squared L2 (ties → lowest c_id: argmin (dist asc, c_id asc),
    * the natural deterministic order — no float anywhere). Round-16: the
    * argmin is the hash-aggregable ArgExtremumStruct instead of
    * min(struct(d, c_id)) — identical winner (integer comparisons), but
    * the struct form planned Sort + SortAggregate over the (corpus x
    * centroids-per-subspace) candidate stream; the declarative form plans
    * HashAggregate with map-side partials and no Sort (VERDICT-r15 #1).
    * Returns (vec_id, s, c_id, d). */
  private def assignSub(sub: DataFrame, cents: DataFrame): DataFrame = {
    import sub.sparkSession.implicits._
    sub.join(broadcast(cents), "s")
      .select($"vec_id", $"s", $"c_id", il2($"sv", $"cv").as("d"))
      .groupBy($"vec_id", $"s")
      .agg(argminStruct($"d", $"c_id", "d", "c_id").as("best"))
      .select($"vec_id", $"s", $"best.c_id".as("c_id"), $"best.d".as("d"))
  }

  /** GATED: per-(subspace, centroid) codebook statistics after one exact
    * integer assignment round — population, total squared distortion, and
    * the assigned-id checksum. The full cross-engine check of PQ's
    * training core (subvector split + integer L2 argmin). */
  def qPqCodebook(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sub = subvectors(s, dir)
    val cents = sub.filter(isSeed($"vec_id"))
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
       |  SELECT s, vec_id AS c_id, sv AS cv FROM sub WHERE $seedSql),
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

  /** GATED PQ-ADC retrieval — the approximate SERVING stage of
    * [[pqTopK]] under the oracle: corpus encoded once (argmin codes per
    * subspace), per-query LUT of integer squared-L2 to every subspace
    * centroid, approximate distance = Σ_s lut[s, code_s], exact integer
    * top-k per query by (adist asc, vec_id asc). Everything up to (not
    * including) the float re-rank is pure BIGINT arithmetic, so the ADC
    * scan itself hash-gates cross-engine — the PQ family's last
    * spec-only stage promoted to the gate. The scored stream carries
    * only (vec_id, s, code): raw vectors never shuffle. LUT is
    * |queries| x S x |cents| rows (bounded: the query set is ≤10 by the
    * isSeed-style cap and the codebook is capped at 20/subspace), so
    * the broadcast is O(1) in the corpus. */
  def qAnnPqAdc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sub = subvectors(s, dir)
    val cents = sub.filter(isSeed($"vec_id"))
      .select($"s", $"vec_id".as("c_id"), $"sv".as("cv"))
    val codes = assignSub(sub, cents).select($"vec_id", $"s", $"c_id")
    val qsub = sub.filter($"vec_id" % 100 === 0 && $"vec_id" < 1000)
      .select($"vec_id".as("q_id"), $"s", $"sv".as("qv"))
    val lut = qsub.join(broadcast(cents), "s")
      .select($"q_id", $"s", $"c_id", il2($"qv", $"cv").as("ld"))
    val approx = codes.join(broadcast(lut), Seq("s", "c_id"))
      .filter($"vec_id" =!= $"q_id")
      .groupBy($"q_id", $"vec_id")
      .agg(sum($"ld").as("adist"), count(lit(1)).as("n_sub"))
      .filter($"n_sub" === SubSpaces)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy($"adist".asc, $"vec_id".asc)
    approx.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= TopK)
      .select($"q_id", $"vec_id".as("neighbor_id"), $"adist", $"rank")
  }

  val qAnnPqAdcSql: String =
    s"""WITH v AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT)) AS vq
       |  FROM embeddings),
       |sub AS (
       |  SELECT vec_id, i AS s, vq[i * $SubDim + 1 : i * $SubDim + $SubDim] AS sv
       |  FROM v, range(0, $SubSpaces) r(i)),
       |cents AS (
       |  SELECT s, vec_id AS c_id, sv AS cv FROM sub WHERE $seedSql),
       |dist AS (
       |  SELECT sub.vec_id, sub.s, cents.c_id,
       |    CAST(list_sum(list_transform(range(1, ${SubDim + 1}),
       |      j -> (sv[j] - cv[j]) * (sv[j] - cv[j]))) AS BIGINT) AS d
       |  FROM sub JOIN cents ON cents.s = sub.s),
       |codes AS (
       |  SELECT vec_id, s, c_id FROM (
       |    SELECT vec_id, s, c_id,
       |      row_number() OVER (PARTITION BY vec_id, s ORDER BY d ASC, c_id ASC) AS rn
       |    FROM dist) WHERE rn = 1),
       |qsub AS (
       |  SELECT vec_id AS q_id, s, sv AS qv FROM sub
       |  WHERE vec_id % 100 = 0 AND vec_id < 1000),
       |lut AS (
       |  SELECT q_id, qsub.s, cents.c_id,
       |    CAST(list_sum(list_transform(range(1, ${SubDim + 1}),
       |      j -> (qv[j] - cv[j]) * (qv[j] - cv[j]))) AS BIGINT) AS ld
       |  FROM qsub JOIN cents ON cents.s = qsub.s),
       |approx AS (
       |  SELECT lut.q_id, c.vec_id, CAST(sum(ld) AS BIGINT) AS adist,
       |    count(*) AS n_sub
       |  FROM codes c JOIN lut ON c.s = lut.s AND c.c_id = lut.c_id
       |  WHERE c.vec_id <> lut.q_id
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT q_id, vec_id, adist,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adist ASC, vec_id ASC) AS rank
       |  FROM approx WHERE n_sub = $SubSpaces)
       |SELECT q_id, vec_id AS neighbor_id, adist, CAST(rank AS BIGINT) AS rank
       |FROM ranked WHERE rank <= $TopK""".stripMargin

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
    val cents = sub.filter(isSeed($"vec_id"))
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

  /** IVF-PQ codebook chain (the FAISS-default billion-scale index shape,
    * Jégou et al. §IV): a trained coarse quantizer splits the corpus into
    * inverted lists, and PQ encodes each vector's RESIDUAL (vq - coarse
    * centroid) — residuals are far more compressible than raw vectors.
    * Everything stays exact: coarse training is one integer Lloyd round
    * (the q_ann_kmeans machinery), residuals are integer subtraction, and
    * residual-PQ assignment is integer squared-L2 argmin. Gated output:
    * per (subspace, residual-code) population, total distortion, and
    * assignment checksum — the full train-assign-encode chain is
    * cross-engine hash-checked. */
  def qIvfPqCodebook(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val v = Similarity.withDoubles(
      Tables.embeddings(s, dir)
        .select($"vec_id",
          transform($"embedding", x => round(x.cast("double") * 1e7).cast("long")).as("vq"))
        .repartition($"vec_id"),
      "vq", "vd")
    val c0 = Similarity.withDoubles(
      Similarity.centroidSeeds(v, 25, vecCol = "vq", outCol = "cq"), "cq", "cd")
    // one integer Lloyd round -> trained coarse centroids; assign lists
    val c1 = Similarity.withDoubles(
      Similarity.recenterInt(Similarity.assignInt(v, c0)).localCheckpoint(true), "cq", "cd")
    val lists = Similarity.assignInt(v, c1) // (vec_id, vq, vd, c_id)
    // integer residuals vs the assigned coarse centroid
    val resid = lists.join(broadcast(c1.select($"c_id", $"cq")), "c_id")
      .select($"vec_id", zip_with($"vq", $"cq", (x, y) => x - y).as("rq"))
    // residual subvectors + residual-PQ codebooks (seeded like qPqCodebook)
    val sub = resid.select($"vec_id", posexplode(
        transform(sequence(lit(0), lit(SubSpaces - 1)),
          i => slice($"rq", i * SubDim + 1, lit(SubDim)))))
      .withColumnRenamed("pos", "s").withColumnRenamed("col", "sv")
    val cents = sub.filter(isSeed($"vec_id"))
      .select($"s", $"vec_id".as("c_id"), $"sv".as("cv"))
    assignSub(sub, cents)
      .groupBy($"s", $"c_id")
      .agg(count(lit(1)).as("n_assigned"),
           sum($"d").as("distortion"),
           sum($"vec_id").as("assigned_id_sum"))
  }

  val qIvfPqCodebookSql: String = {
    // coarse round reuses the q_ann_kmeans CTE pattern (cosine argmax +
    // integer-mean recenter), then residual-PQ mirrors qPqCodebookSql
    s"""WITH v AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT)) AS vq
       |  FROM embeddings),
       |c0 AS (SELECT vec_id AS c_id, vq AS cq FROM v WHERE ${Similarity.centSeedSql(25)}),
       |a1 AS (
       |  SELECT vec_id, vq, c_id FROM (
       |    SELECT v.vec_id, v.vq, c0.c_id,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY list_cosine_similarity(v.vq::DOUBLE[], c0.cq::DOUBLE[]) DESC,
       |                 c0.c_id ASC) AS rn
       |    FROM v CROSS JOIN c0) WHERE rn = 1),
       |c1 AS (
       |  SELECT c_id, list(s // n ORDER BY i) AS cq FROM (
       |    SELECT c_id, i, CAST(sum(vq[i]) AS BIGINT) AS s, count(*) AS n
       |    FROM a1, range(1, 65) r(i) GROUP BY 1, 2) GROUP BY c_id),
       |lists AS (
       |  SELECT vec_id, vq, c_id FROM (
       |    SELECT v.vec_id, v.vq, c1.c_id,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY list_cosine_similarity(v.vq::DOUBLE[], c1.cq::DOUBLE[]) DESC,
       |                 c1.c_id ASC) AS rn
       |    FROM v CROSS JOIN c1) WHERE rn = 1),
       |resid AS (
       |  SELECT lists.vec_id,
       |    list_transform(range(1, 65), j -> vq[j] - cq[j]) AS rq
       |  FROM lists JOIN c1 USING (c_id)),
       |sub AS (
       |  SELECT vec_id, i AS s, rq[i * $SubDim + 1 : i * $SubDim + $SubDim] AS sv
       |  FROM resid, range(0, $SubSpaces) r(i)),
       |cents AS (
       |  SELECT s, vec_id AS c_id, sv AS cv FROM sub WHERE $seedSql),
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
  }

  /** Library IVF-PQ retrieval — the complete FAISS-default query path:
    * queries probe their nprobe nearest coarse lists, candidates are ONLY
    * the vectors in those lists (nprobe/n_cents of the corpus — the IVF
    * promise), scored by ADC over their residual PQ codes against a
    * per-(query, probed-list) lookup table, then the best pool re-ranks
    * exactly. The scored stream carries (vec_id, coarse, s, code) —
    * never raw vectors; the LUT is queries x nprobe x S x codes rows,
    * broadcast. Recall spec-checked against exact brute force. */
  def ivfPqTopK(s: SparkSession, dir: String, k: Int = TopK,
                nprobe: Int = 3, rerankPool: Int = 50): DataFrame = {
    import s.implicits._
    val v = Similarity.withDoubles(
      Tables.embeddings(s, dir)
        .select($"vec_id",
          transform($"embedding", x => round(x.cast("double") * 1e7).cast("long")).as("vq"))
        .repartition($"vec_id"),
      "vq", "vd")
    val c0 = Similarity.withDoubles(
      Similarity.centroidSeeds(v, 25, vecCol = "vq", outCol = "cq"), "cq", "cd")
    val c1 = Similarity.withDoubles(
      Similarity.recenterInt(Similarity.assignInt(v, c0)).localCheckpoint(true), "cq", "cd")
    val lists = Similarity.assignInt(v, c1) // (vec_id, vq, vd, c_id)
    // residual PQ codes, keeping the coarse list id on every code row
    val resid = lists.join(broadcast(c1.select($"c_id", $"cq")), "c_id")
      .select($"vec_id", $"c_id".as("coarse"), zip_with($"vq", $"cq", (x, y) => x - y).as("rq"))
    val sub = resid.select($"vec_id", $"coarse", posexplode(
        transform(sequence(lit(0), lit(SubSpaces - 1)),
          i => slice($"rq", i * SubDim + 1, lit(SubDim)))))
      .withColumnRenamed("pos", "s").withColumnRenamed("col", "sv")
    val cents = sub.filter(isSeed($"vec_id"))
      .select($"s", $"vec_id".as("pq_id"), $"sv".as("cv"))
    val codes = sub.join(broadcast(cents), "s")
      .select($"vec_id", $"coarse", $"s", $"pq_id", il2($"sv", $"cv").as("d"))
      .groupBy($"vec_id", $"coarse", $"s")
      .agg(argminStruct($"d", $"pq_id", "d", "pq_id").as("best"))
      .select($"vec_id", $"coarse", $"s", $"best.pq_id".as("code"))
    // queries: probe nprobe nearest coarse lists, residual per probed list
    val q = v.filter($"vec_id" % 100 === 0 && $"vec_id" < 1000)
      .select($"vec_id".as("q_id"), $"vq".as("qq"), $"vd".as("qd"))
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy($"p_cos".desc, $"c_id".asc)
    val probes = q.crossJoin(broadcast(c1))
      .select($"q_id", $"qq", $"c_id", cosineD($"qd", $"cd").as("p_cos"), $"cq")
      .withColumn("pr", row_number().over(pw)).filter($"pr" <= nprobe)
      .select($"q_id", $"c_id".as("coarse"), zip_with($"qq", $"cq", (x, y) => x - y).as("qrq"))
    // ADC lookup table per (query, probed list, subspace, code)
    val qsub = probes.select($"q_id", $"coarse", posexplode(
        transform(sequence(lit(0), lit(SubSpaces - 1)),
          i => slice($"qrq", i * SubDim + 1, lit(SubDim)))))
      .withColumnRenamed("pos", "s").withColumnRenamed("col", "qsv")
    val lut = qsub.join(broadcast(cents), "s")
      .select($"q_id", $"coarse", $"s", $"pq_id".as("code"), il2($"qsv", $"cv").as("ld"))
    // candidates = code rows of probed lists only; approx dist = Σ lut
    val approx = codes.join(broadcast(lut), Seq("coarse", "s", "code"))
      .filter($"vec_id" =!= $"q_id")
      .groupBy($"q_id", $"vec_id")
      .agg(sum($"ld").as("adist"), count(lit(1)).as("n_sub"))
      .filter($"n_sub" === SubSpaces)
    val poolW = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy($"adist".asc, $"vec_id".asc)
    val pool = approx.withColumn("pr", row_number().over(poolW))
      .filter($"pr" <= rerankPool)
      .select($"q_id", $"vec_id")
    val raw = Tables.embeddings(s, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy($"cos_sim".desc, $"neighbor_id".asc)
    pool
      .join(broadcast(raw.select($"vec_id".as("q_id"), $"v".as("qv"))), "q_id")
      .join(raw.select($"vec_id", $"v"), "vec_id")
      .select($"q_id", $"vec_id".as("neighbor_id"),
        graft.functions.TextFunctions.cosine($"qv", $"v").as("cos_sim"))
      .withColumn("rank", row_number().over(rw).cast("long"))
      .filter($"rank" <= k)
  }

  private def cosineD(a: Column, b: Column): Column =
    graft.functions.TextFunctions.cosine(a, b)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pq_codebook"    -> (qPqCodebook _),
    "q_ivfpq_codebook" -> (qIvfPqCodebook _),
    "q_ann_pq_adc"     -> (qAnnPqAdc _))

  def oracles: Map[String, String] = Map(
    "q_pq_codebook"    -> qPqCodebookSql,
    "q_ivfpq_codebook" -> qIvfPqCodebookSql,
    "q_ann_pq_adc"     -> qAnnPqAdcSql)
}
