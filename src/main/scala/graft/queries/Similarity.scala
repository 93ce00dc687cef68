package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions.cosine
import org.apache.spark.sql.graft.ArgExtremum.argmaxStruct

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (SURVEY §7 north-star extensions; absent from the reference).
  *
  * Two paths:
  *  - brute: exact cosine top-k. The query set is broadcast, the corpus
  *    streams map-side, and only (n_queries x n_vectors) scored rows reach
  *    the per-query top-k — at cluster scale this is the "scoring is
  *    embarrassingly parallel, k is small" pattern.
  *  - ivf: two-level IVF — a deterministic centroid subset acts as the
  *    coarse quantizer; every vector is assigned to its nearest centroid
  *    (inverted lists), queries probe the nprobe nearest lists and re-rank
  *    exactly within them. The probe join hits only ~nprobe/n_centroids of
  *    the corpus, which is what survives a 100x scale-up.
  */
object Similarity {

  private val TopK = 10
  private val NProbe = 3

  /** Fixed-SIZE query workload shared by every ANN path: the modulo picks
    * spread-out ids, the absolute bound caps the set at <= 10 queries no
    * matter how large the corpus grows. A pure-modulo set ("1% of vec_ids")
    * scales WITH the corpus — collected+broadcast in the brute path that
    * would be 10M driver-side vectors at a billion rows; with the bound,
    * driver memory is O(10 x dims) at any scale. */
  private[graft] def isQuery(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c % 100 === 0 && c < 1000
  private val isQuerySql = "vec_id % 100 = 0 AND vec_id < 1000"

  /** Fixed-SIZE centroid seeding, same shape as [[isQuery]]: the modulo
    * spreads the seeds, the absolute bound caps the set at step/CentBound
    * centroids (40 at step 25, 20 at step 50) no matter how large the
    * corpus grows. A pure-modulo seed ("every 25th vector") scales WITH
    * the corpus — the broadcast quantizer becomes O(n) memory and the
    * assignment cross join O(n²/step) work at 100x. With the bound,
    * quantizer cardinality is corpus-independent (PlanHygieneSpec asserts
    * this) and the assignment stays O(n x k). */
  private[graft] val CentBound = 1000L
  private[graft] def isCentroid(c: org.apache.spark.sql.Column, step: Int): org.apache.spark.sql.Column =
    c % step === 0 && c < CentBound
  private[graft] def centSeedSql(step: Int): String =
    s"vec_id % $step = 0 AND vec_id < $CentBound"

  /** The (c_id, cv) seed set for a corpus (vec_id, <vecCol>) — bounded
    * cardinality by construction; shared by IVF / k-means / PQ coarse. */
  private[graft] def centroidSeeds(v: DataFrame, step: Int,
                                   vecCol: String = "v", outCol: String = "cv"): DataFrame = {
    import v.sparkSession.implicits._
    v.filter(isCentroid($"vec_id", step))
      .select($"vec_id".as("c_id"), col(vecCol).as(outCol))
  }

  /** vec_id, v(double[]) — cast once so all math is float64 like the oracle.
    * Hash-repartitioned by vec_id up front: a small embeddings file
    * collapses to one input split, which would serialize every scoring
    * cross join onto a single task; partitioning by the vector key spreads
    * the scoring AND makes every later groupBy(vec_id) argmax shuffle-free
    * (the aggregation requirement is already satisfied). One narrow
    * row-width shuffle, paid once per query. */
  private[graft] def vectors(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .repartition($"vec_id")
  }

  /** Exact cosine top-10 for queries (vec_id % 100 == 0), self excluded.
    * GATED FORM = the map-side partial-top-k ([[bruteTopKPartial]]): each
    * partition keeps bounded per-query heaps so the shuffle carries
    * O(queries x k x partitions) rows, not O(queries x corpus) — the plan
    * that survives a billion-vector corpus. The window-over-all-scores
    * formulation ([[bruteTopKWindow]]) stays as the spec-checked baseline.
    * Output cosine is ppb fixed-point (gate convention: no raw doubles). */
  def qAnnBrute(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    bruteTopKPartial(s, dir)
      .select($"q_id", $"neighbor_id",
        round($"cos_sim" * 1e9).cast("long").as("cos_ppb"), $"rank")
  }

  val qAnnBruteSql: String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM v WHERE $isQuerySql),
       |scored AS (
       |  SELECT q_id, vec_id AS neighbor_id, list_cosine_similarity(qv, v) AS cos_sim,
       |         row_number() OVER (PARTITION BY q_id
       |           ORDER BY list_cosine_similarity(qv, v) DESC, vec_id ASC) AS rank
       |  FROM q JOIN v ON vec_id <> q_id)
       |SELECT q_id, neighbor_id, CAST(round(cos_sim * 1e9) AS BIGINT) AS cos_ppb,
       |       CAST(rank AS BIGINT) AS rank
       |FROM scored WHERE rank <= $TopK""".stripMargin

  /** IVF top-10: bounded centroid seed (isCentroid step 25, ≤40 at any
    * corpus size); assign → probe → re-rank. */
  def qAnnIvf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val v = vectors(s, dir)
    val cents = centroidSeeds(v, 25)
    val lists = ivfIndex(s, dir)

    // Queries probe their NProbe nearest centroids.
    val q = v.filter(isQuery($"vec_id")).select($"vec_id".as("q_id"), $"v".as("qv"))
    val pw = Window.partitionBy($"q_id").orderBy($"p_cos".desc, $"c_id".asc)
    val probes = q.crossJoin(broadcast(cents))
      .select($"q_id", $"qv", $"c_id", cosine($"qv", $"cv").as("p_cos"))
      .withColumn("pr", row_number().over(pw))
      .filter($"pr" <= NProbe)
      .select($"q_id", $"qv", $"c_id")

    // Exact re-rank within the probed lists only.
    val rw = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"neighbor_id".asc)
    // broadcast the PROBES side (round-15, guide §3.1): the query
    // workload is bounded by construction (isQuery: <=10 queries at any
    // corpus, x nprobe rows), while the lists side is the corpus — the
    // previous sort-merge join shuffled AND sorted the whole corpus on a
    // ~25-value key (skew-prone, parallelism-capped); the broadcast
    // probe join leaves the lists unshuffled entirely (plan diff:
    // SortMergeJoin + 2 Exchange + 2 Sort -> BroadcastHashJoin)
    broadcast(probes).join(lists, Seq("c_id"))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("neighbor_id"), cosine($"qv", $"v").as("cos_sim"))
      .withColumn("rank", row_number().over(rw).cast("long"))
      .filter($"rank" <= TopK)
      .select($"q_id", $"neighbor_id",
        round($"cos_sim" * 1e9).cast("long").as("cos_ppb"), $"rank")
  }

  /** The IVF inverted lists — nearest centroid per vector (ties → lowest
    * c_id). Hash-aggregate argmax (same winner as the row_number window;
    * see assignInt): partial aggregation collapses the cross product
    * map-side. Only (vec_id, score-struct) flows through the argmax; the
    * raw vector rejoins by vec_id afterwards (co-partitioned — no extra
    * exchange, and the agg buffer never carries vectors). Exposed for the
    * streaming serving path (StreamingEtl.annServeStream), where this is
    * the write-once static index side. */
  private[graft] def ivfLists(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val v = vectors(s, dir)
    val cents = centroidSeeds(v, 25)
    v.select($"vec_id", $"v").crossJoin(broadcast(cents))
      .select($"vec_id", $"c_id", cosine($"v", $"cv").as("c_cos"))
      .groupBy($"vec_id")
      .agg(argmaxStruct($"c_cos", -$"c_id", "c_cos", "neg_id").as("best"))
      .select($"vec_id", (-$"best.neg_id").as("c_id"))
      .join(v, Seq("vec_id"))
      .select($"vec_id", $"v", $"c_id")
  }

  /** [[ivfLists]] as the WRITE-ONCE serving index (round-15): built once
    * per (session, corpus) and served materialized to every prober —
    * the batch IVF retrieval and the streaming serving twin, whose
    * scaladoc already declared a "write-once static index"; the
    * unmemoized form re-ran the full assignment cross join + argmax
    * inside every probing plan (for the stream, inside every
    * micro-batch). */
  private[graft] def ivfIndex(s: SparkSession, dir: String): DataFrame =
    Memo.sessionCached(s, dir, "ivf_lists")(ivfLists(s, dir))

  /** The bounded centroid set as a driver-side array (≤40 entries at any
    * corpus size by construction) — the literal the streaming serving
    * path embeds per row. */
  private[graft] def centroidArray(s: SparkSession, dir: String): Seq[(Long, Seq[Double])] = {
    import s.implicits._
    centroidSeeds(vectors(s, dir), 25).as[(Long, Seq[Double])].collect().toSeq
  }

  val qAnnIvfSql: String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c AS (SELECT vec_id AS c_id, v AS cv FROM v WHERE ${centSeedSql(25)}),
       |assign AS (
       |  SELECT vec_id, v, c_id, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY list_cosine_similarity(v, cv) DESC, c_id ASC) AS rn
       |  FROM v CROSS JOIN c),
       |lists AS (SELECT vec_id, v, c_id FROM assign WHERE rn = 1),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM v WHERE $isQuerySql),
       |probes AS (
       |  SELECT q_id, qv, c_id, row_number() OVER (PARTITION BY q_id
       |    ORDER BY list_cosine_similarity(qv, cv) DESC, c_id ASC) AS pr
       |  FROM q CROSS JOIN c),
       |cand AS (
       |  SELECT p.q_id, p.qv, l.vec_id, l.v
       |  FROM (SELECT q_id, qv, c_id FROM probes WHERE pr <= $NProbe) p
       |  JOIN lists l ON l.c_id = p.c_id AND l.vec_id <> p.q_id),
       |scored AS (
       |  SELECT q_id, vec_id AS neighbor_id, list_cosine_similarity(qv, v) AS cos_sim,
       |         row_number() OVER (PARTITION BY q_id
       |           ORDER BY list_cosine_similarity(qv, v) DESC, vec_id ASC) AS rank
       |  FROM cand)
       |SELECT q_id, neighbor_id, CAST(round(cos_sim * 1e9) AS BIGINT) AS cos_ppb,
       |       CAST(rank AS BIGINT) AS rank
       |FROM scored WHERE rank <= $TopK""".stripMargin

  /** Window-over-all-scores brute force (BASELINE ONLY — O(q x n) scored
    * rows through one window; a scale-killer as an entry point, kept as
    * the executable spec that [[bruteTopKPartial]] is exact). */
  def bruteTopKWindow(s: SparkSession, dir: String, k: Int = TopK): DataFrame = {
    import s.implicits._
    val v = vectors(s, dir)
    val q = v.filter(isQuery($"vec_id")).select($"vec_id".as("q_id"), $"v".as("qv"))
    val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"neighbor_id".asc)
    v.join(broadcast(q), $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("neighbor_id"), cosine($"qv", $"v").as("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
  }

  /** Brute-force top-k with map-side partial reduction (GATED form):
    * each partition keeps a bounded per-query heap, so the shuffle is
    * O(queries x k x partitions) instead of O(queries x corpus) scored
    * rows — the form that survives a billion-vector corpus. Exact; spec
    * proves equality with the window formulation. */
  def bruteTopKPartial(s: SparkSession, dir: String, k: Int = TopK): DataFrame = {
    import s.implicits._
    val v = vectors(s, dir)
    val queries = v.filter(isQuery($"vec_id"))
      .select($"vec_id".as("q_id"), $"v".as("qv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val bq = s.sparkContext.broadcast(queries)

    val partial = v.select($"vec_id", $"v").as[(Long, Seq[Double])]
      .mapPartitions { rows =>
        val qs = bq.value
        // per-query bounded min-heaps of (cos, neighborId)
        val heaps = qs.map(_ => new scala.collection.mutable.PriorityQueue[(Double, Long)]()(
          Ordering.by[(Double, Long), (Double, Long)](t => (-t._1, t._2))))
        rows.foreach { case (id, vec) =>
          val arr = vec.toArray
          var qi = 0
          while (qi < qs.length) {
            val (qid, qv) = qs(qi)
            if (qid != id) {
              var dot = 0.0; var na = 0.0; var nb = 0.0
              var j = 0
              while (j < arr.length) {
                dot += arr(j) * qv(j); na += arr(j) * arr(j); nb += qv(j) * qv(j)
                j += 1
              }
              val cos = dot / math.sqrt(na * nb)
              val h = heaps(qi)
              h.enqueue((cos, id))
              if (h.size > k) h.dequeue() // drops the current worst
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (cos, id) => (qs(qi)._1, id, cos) }
        }
      }
    val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"neighbor_id".asc)
    partial.toDF("q_id", "neighbor_id", "cos_sim")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
  }

  /** Spherical k-means coarse quantizer: seeded deterministic init
    * (every step-th vector), then `iters` Lloyd rounds — assignment by
    * cosine (broadcast centroids, map-side), re-centering with the typed
    * elementwise [[graft.functions.VectorMeanAggregator]]: algebraic, so
    * map-side partials shuffle one dim-length buffer per (partition,
    * centroid) instead of exploding dim rows per vector. Two shuffles per
    * round (assignment window + centroid agg); centroid count is
    * corpus-independent by construction ([[isCentroid]] seed — at most
    * CentBound/step centroids at any scale). The posexplode →
    * per-dimension avg formulation remains as the spec cross-check. */
  def kmeansCentroids(v: DataFrame, step: Int = 25, iters: Int = 3): DataFrame = {
    import v.sparkSession.implicits._
    var cents = centroidSeeds(v, step)
    val meanAgg = new graft.functions.VectorMeanAggregator().toColumn
    (1 to iters).foreach { _ =>
      // hash-aggregate argmax (same winner as a row_number window; see
      // assignInt): map-side partials collapse the cross product. Only
      // (vec_id, score) width flows through the argmax; vectors rejoin
      // by vec_id (co-partitioned — no extra exchange).
      val assigned = v.select($"vec_id", $"v").crossJoin(broadcast(cents))
        .select($"vec_id", $"c_id", cosine($"v", $"cv").as("c_cos"))
        .groupBy($"vec_id")
        .agg(argmaxStruct($"c_cos", -$"c_id", "c_cos", "neg_id").as("best"))
        .select($"vec_id", (-$"best.neg_id").as("c_id"))
        .join(v, Seq("vec_id"))
        .select($"c_id", $"v")
      cents = assigned.as[(Long, Seq[Double])]
        .groupByKey(_._1).mapValues(_._2)
        .agg(meanAgg.name("cv"))
        .toDF("c_id", "cv")
        .localCheckpoint(true)
    }
    cents
  }

  /** Spec-only re-centering baseline: posexplode → per-dimension avg →
    * re-assemble (what kmeansCentroids used before the typed aggregator). */
  def centroidMeansExploded(assigned: DataFrame): DataFrame = {
    import assigned.sparkSession.implicits._
    assigned
      .select($"c_id", posexplode($"v"))
      .groupBy($"c_id", $"pos").agg(avg($"col").as("m"))
      .groupBy($"c_id")
      .agg(array_sort(collect_list(struct($"pos", $"m"))).as("dims"))
      .select($"c_id", expr("transform(dims, d -> d.m)").as("cv"))
  }

  /** IVF with a trained (k-means) quantizer instead of the raw id-subset
    * quantizer of [[qAnnIvf]] — tighter lists, higher recall at the same
    * nprobe. Library path; recall spec'd against brute force. */
  def kmeansIvfTopK(s: SparkSession, dir: String, k: Int = TopK,
                    nprobe: Int = NProbe): DataFrame = {
    import s.implicits._
    val v = vectors(s, dir)
    val cents = kmeansCentroids(v)
    val lists = v.select($"vec_id", $"v").crossJoin(broadcast(cents))
      .select($"vec_id", $"c_id", cosine($"v", $"cv").as("c_cos"))
      .groupBy($"vec_id")
      .agg(argmaxStruct($"c_cos", -$"c_id", "c_cos", "neg_id").as("best"))
      .select($"vec_id", (-$"best.neg_id").as("c_id"))
      .join(v, Seq("vec_id"))
      .select($"vec_id", $"v", $"c_id")
    val q = v.filter(isQuery($"vec_id")).select($"vec_id".as("q_id"), $"v".as("qv"))
    val pw = Window.partitionBy($"q_id").orderBy($"p_cos".desc, $"c_id".asc)
    val probes = q.crossJoin(broadcast(cents))
      .select($"q_id", $"qv", $"c_id", cosine($"qv", $"cv").as("p_cos"))
      .withColumn("pr", row_number().over(pw)).filter($"pr" <= nprobe)
      .select($"q_id", $"qv", $"c_id")
    val rw = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"neighbor_id".asc)
    // broadcast the PROBES side (round-15, guide §3.1): the query
    // workload is bounded by construction (isQuery: <=10 queries at any
    // corpus, x nprobe rows), while the lists side is the corpus — the
    // previous sort-merge join shuffled AND sorted the whole corpus on a
    // ~25-value key (skew-prone, parallelism-capped); the broadcast
    // probe join leaves the lists unshuffled entirely (plan diff:
    // SortMergeJoin + 2 Exchange + 2 Sort -> BroadcastHashJoin)
    broadcast(probes).join(lists, Seq("c_id"))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("neighbor_id"), cosine($"qv", $"v").as("cos_sim"))
      .withColumn("rank", row_number().over(rw).cast("long"))
      .filter($"rank" <= k)
  }

  /** LSH-bucketed ANN top-k (library path, spec-validated): queries probe
    * their hyperplane band buckets, candidates re-rank exactly. Recall
    * depends on band geometry rather than centroid quality — the right
    * trade when the corpus has no cluster structure. Not oracle-gated
    * (the signature is not SQL-expressible); TrainingOpsSpec measures
    * recall against qAnnBrute. */
  def annLshTopK(s: SparkSession, dir: String, k: Int = TopK): DataFrame = {
    import s.implicits._
    val v = vectors(s, dir)
    val banded = v.select($"vec_id",
        posexplode(org.apache.spark.sql.graft.NativeExprs
          .cosineBandKeys($"v", bands = 128, rowsPerBand = 8)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
    val qb = banded.filter(isQuery($"vec_id"))
      .select($"vec_id".as("q_id"), $"band", $"bkey")
    val cand = qb.join(banded, Seq("band", "bkey"))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("neighbor_id"))
      .distinct()
    val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"neighbor_id".asc)
    cand
      .join(broadcast(v.select($"vec_id".as("q_id"), $"v".as("qv"))), "q_id")
      .join(v.select($"vec_id".as("neighbor_id"), $"v"), "neighbor_id")
      .select($"q_id", $"neighbor_id", cosine($"qv", $"v").as("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
  }

  /** One Lloyd round in exact integer space, oracle-gated: vectors are
    * quantized to BIGINT (round(x*1e7) — exact from float32), assignment
    * is cosine-argmax over the quantized vectors (identical doubles on
    * both engines), and the re-centered centroid is per-dimension integer
    * mean (BIGINT sum DIV count — order-independent, engine-exact). The
    * output is each centroid's population and the checksum of its
    * re-centered integer coordinates, so the assign + re-center machinery
    * of k-means is hash-checked cross-engine; the float multi-round
    * quantizer stays the library/recall path. */
  def qKmeansRound(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // round-16 (VERDICT-r15 #1): the assignment is the shared [[assignInt]]
    // argmax aggregate, not a row_number window — the window form exchanged
    // AND sorted the whole 25x cross product WITH the vq arrays on board
    // (~25 x |v| x 64-long rows through one shuffle); assignInt partially
    // aggregates the score stream map-side, exchanges v once (narrow), and
    // the hash argmax replaces the sort. Same winner by construction
    // (row_number (c_cos desc, c_id asc) == argmax (c_cos, -c_id) — the
    // assignInt/assignIntWindow property test), so the declared output is
    // unchanged (oracle-verified).
    val v = withDoubles(
      Tables.embeddings(s, dir)
        .select($"vec_id",
          transform($"embedding", x => round(x.cast("double") * 1e7).cast("long")).as("vq"))
        .repartition($"vec_id"), // see vectors(): scoring parallelism + shuffle-free argmax
      "vq", "vd")
    val cents = withDoubles(centroidSeeds(v, 25, vecCol = "vq", outCol = "cq"), "cq", "cd")
    val assigned = assignInt(v, cents).select($"c_id", $"vq")
    assigned
      .select($"c_id", posexplode($"vq"))
      .groupBy($"c_id", $"pos")
      .agg(sum($"col").as("s"), count(lit(1)).as("n"))
      .groupBy($"c_id")
      .agg(first($"n").as("n_assigned"),
           sum(expr("s DIV n")).as("centroid_checksum"))
  }

  val qKmeansRoundSql: String =
    """WITH v AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT)) AS vq
      |  FROM embeddings),
      |c AS (SELECT vec_id AS c_id, vq AS cq FROM v WHERE vec_id % 25 = 0 AND vec_id < 1000),
      |assign AS (
      |  SELECT vec_id, vq, c_id,
      |    row_number() OVER (PARTITION BY vec_id
      |      ORDER BY list_cosine_similarity(vq::DOUBLE[], cq::DOUBLE[]) DESC, c_id ASC) AS rn
      |  FROM v CROSS JOIN c),
      |a AS (SELECT c_id, vq FROM assign WHERE rn = 1),
      |dims AS (
      |  SELECT c_id, i, CAST(sum(vq[i]) AS BIGINT) AS s, count(*) AS n
      |  FROM a, range(1, 65) r(i) GROUP BY 1, 2)
      |SELECT c_id, CAST(min(n) AS BIGINT) AS n_assigned,
      |  CAST(sum(s // n) AS BIGINT) AS centroid_checksum
      |FROM dims GROUP BY c_id""".stripMargin

  /** Argmax-assign integer vectors (vec_id, vq) to integer centroids
    * (c_id, cq) by cosine over the double-cast values — ties to lowest
    * c_id, identical on both engines. Implemented as a hash aggregate
    * (max of (cos, -c_id) struct), NOT a window: with broadcast centroids
    * every candidate row for a vector sits in the vector's own partition,
    * so partial aggregation reduces the (vectors x centroids) blow-up back
    * to one row per vector BEFORE the shuffle — the window form shuffles
    * and sorts the entire cross product. Same winner as
    * row_number() OVER (ORDER BY cos DESC, c_id ASC): max struct
    * comparison is (cos asc, -c_id asc) = (cos desc, c_id asc) inverted. */
  private[graft] def assignInt(v: DataFrame, cents: DataFrame): DataFrame = {
    import v.sparkSession.implicits._
    // v carries (vec_id, vq, vd) and cents (c_id, cq, cd): the double
    // views are cast ONCE per row (withDoubles), not re-materialized per
    // (vector, centroid) pair — the naive toD-inside-cosine form allocates
    // two fresh arrays for every cross-join row. The argmax aggregate
    // carries only (vec_id, score-struct) width — vectors rejoin by
    // vec_id afterwards; both sides are hash-partitioned on vec_id, so
    // the rejoin adds no exchange and the agg buffer never holds vectors.
    v.select($"vec_id", $"vd").crossJoin(broadcast(cents.select($"c_id", $"cd")))
      .select($"vec_id", $"c_id", cosine($"vd", $"cd").as("c_cos"))
      .groupBy($"vec_id")
      .agg(argmaxStruct($"c_cos", -$"c_id", "c_cos", "neg_id").as("best"))
      .select($"vec_id", (-$"best.neg_id").as("c_id"))
      .join(v, Seq("vec_id"))
      .select($"vec_id", $"vq", $"vd", $"c_id")
  }

  /** Attach the once-per-row double view of an integer vector column. */
  private[graft] def withDoubles(df: DataFrame, intCol: String, dCol: String): DataFrame =
    df.withColumn(dCol, transform(col(intCol), x => x.cast("double")))

  /** Window-formulation spec twin of [[assignInt]] (executable baseline
    * for the argmax-equivalence test). */
  private[graft] def assignIntWindow(v: DataFrame, cents: DataFrame): DataFrame = {
    import v.sparkSession.implicits._
    val toD = (c: org.apache.spark.sql.Column) => transform(c, x => x.cast("double"))
    val aw = Window.partitionBy($"vec_id").orderBy($"c_cos".desc, $"c_id".asc)
    v.crossJoin(broadcast(cents))
      .select($"vec_id", $"vq", $"c_id", cosine(toD($"vq"), toD($"cq")).as("c_cos"))
      .withColumn("rn", row_number().over(aw)).filter($"rn" === 1)
      .select($"vec_id", $"vq", $"c_id")
  }

  /** Re-center assigned integer vectors: per-dimension BIGINT mean
    * (sum DIV count — order-independent, engine-exact) via the typed
    * algebraic [[graft.functions.LongVectorMeanAggregator]] — map-side
    * partials shuffle one dim-length buffer per (partition, centroid)
    * instead of exploding dim rows per vector. Long `/` truncates toward
    * zero exactly like Spark DIV and DuckDB //. */
  private[graft] def recenterInt(assigned: DataFrame): DataFrame = {
    import assigned.sparkSession.implicits._
    val agg = new graft.functions.LongVectorMeanAggregator().toColumn
    assigned.select($"c_id", $"vq").as[(Long, Seq[Long])]
      .groupByKey(_._1).mapValues(_._2)
      .agg(agg.name("cq"))
      .toDF("c_id", "cq")
  }

  /** posexplode spec twin of [[recenterInt]] (executable baseline for the
    * integer-mean equivalence test — mirrors the oracle's dims CTE). */
  private[graft] def recenterIntExploded(assigned: DataFrame): DataFrame = {
    import assigned.sparkSession.implicits._
    assigned.select($"c_id", posexplode($"vq"))
      .groupBy($"c_id", $"pos")
      .agg(sum($"col").as("s"), count(lit(1)).as("n"))
      .groupBy($"c_id")
      .agg(array_sort(collect_list(struct($"pos", expr("s DIV n").as("m")))).as("dims"))
      .select($"c_id", expr("transform(dims, d -> d.m)").as("cq"))
  }

  /** Gated k-means-IVF entry — FULLY hash-gated since round 3: the whole
    * pipeline (2 unrolled Lloyd rounds + final inverted lists + probe +
    * exact re-rank) runs in exact integer space. Vectors quantize to
    * BIGINT (round(x*1e7), exact from float32); every Lloyd re-centering
    * is a per-dimension integer mean (sum DIV count — order-independent,
    * and Spark DIV == DuckDB // : both truncate toward zero, negatives
    * included); assignments/probes/re-rank use cosine over the
    * integer-valued doubles, identical bits on both engines. The float
    * Lloyd trainer ([[kmeansCentroids]] with the typed
    * VectorMeanAggregator) stays the library path — algebraic map-side
    * partials, recall-spec'd against brute force — while this entry is
    * the cross-engine-checkable twin of the same machinery. */
  def qAnnKmeans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val v = withDoubles(
      Tables.embeddings(s, dir)
        .select($"vec_id",
          transform($"embedding", x => round(x.cast("double") * 1e7).cast("long")).as("vq"))
        .repartition($"vec_id"), // see vectors(): scoring parallelism + shuffle-free argmax
      "vq", "vd")
    val c0 = withDoubles(centroidSeeds(v, 25, vecCol = "vq", outCol = "cq"), "cq", "cd")
    // two unrolled integer Lloyd rounds, then final inverted lists.
    // localCheckpoint per round: each centroid set is broadcast-consumed
    // by LATER rounds (c2 twice — lists + probes), and without truncation
    // every broadcast exchange re-executes the entire upstream training
    // lineage; the checkpointed sets are centroid-count tiny.
    val c1 = withDoubles(recenterInt(assignInt(v, c0)).localCheckpoint(true), "cq", "cd")
    val c2 = withDoubles(recenterInt(assignInt(v, c1)).localCheckpoint(true), "cq", "cd")
    val lists = assignInt(v, c2)
    val q = v.filter(isQuery($"vec_id")).select($"vec_id".as("q_id"), $"vd".as("qd"))
    val pw = Window.partitionBy($"q_id").orderBy($"p_cos".desc, $"c_id".asc)
    val probes = q.crossJoin(broadcast(c2.select($"c_id", $"cd")))
      .select($"q_id", $"qd", $"c_id", cosine($"qd", $"cd").as("p_cos"))
      .withColumn("pr", row_number().over(pw)).filter($"pr" <= NProbe)
      .select($"q_id", $"qd", $"c_id")
    val rw = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"neighbor_id".asc)
    // broadcast the PROBES side (round-15, guide §3.1): the query
    // workload is bounded by construction (isQuery: <=10 queries at any
    // corpus, x nprobe rows), while the lists side is the corpus — the
    // previous sort-merge join shuffled AND sorted the whole corpus on a
    // ~25-value key (skew-prone, parallelism-capped); the broadcast
    // probe join leaves the lists unshuffled entirely (plan diff:
    // SortMergeJoin + 2 Exchange + 2 Sort -> BroadcastHashJoin)
    broadcast(probes).join(lists, Seq("c_id"))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("neighbor_id"),
        cosine($"qd", $"vd").as("cos_sim"))
      .withColumn("rank", row_number().over(rw).cast("long"))
      .filter($"rank" <= TopK)
      .select($"q_id", $"neighbor_id",
        round($"cos_sim" * 1e9).cast("long").as("cos_ppb"), $"rank")
  }

  val qAnnKmeansSql: String = {
    // one argmax-assign CTE body, instantiated per round (DuckDB has no
    // iteration — the rounds unroll as chained CTEs)
    def assign(cents: String): String =
      s"""  SELECT vec_id, vq, c_id FROM (
         |    SELECT v.vec_id, v.vq, $cents.c_id,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY list_cosine_similarity(v.vq::DOUBLE[], $cents.cq::DOUBLE[]) DESC,
         |                 $cents.c_id ASC) AS rn
         |    FROM v CROSS JOIN $cents) WHERE rn = 1""".stripMargin
    def recenter(assigned: String): String =
      s"""  SELECT c_id, list(s // n ORDER BY i) AS cq FROM (
         |    SELECT c_id, i, CAST(sum(vq[i]) AS BIGINT) AS s, count(*) AS n
         |    FROM $assigned, range(1, 65) r(i) GROUP BY 1, 2) GROUP BY c_id""".stripMargin
    s"""WITH v AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT)) AS vq
       |  FROM embeddings),
       |c0 AS (SELECT vec_id AS c_id, vq AS cq FROM v WHERE ${centSeedSql(25)}),
       |a1 AS (
       |${assign("c0")}),
       |c1 AS (
       |${recenter("a1")}),
       |a2 AS (
       |${assign("c1")}),
       |c2 AS (
       |${recenter("a2")}),
       |lists AS (
       |${assign("c2")}),
       |q AS (SELECT vec_id AS q_id, vq AS qv FROM v WHERE $isQuerySql),
       |probes AS (
       |  SELECT q_id, qv, c_id FROM (
       |    SELECT q.q_id, q.qv, c2.c_id,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY list_cosine_similarity(q.qv::DOUBLE[], c2.cq::DOUBLE[]) DESC,
       |                 c2.c_id ASC) AS pr
       |    FROM q CROSS JOIN c2) WHERE pr <= $NProbe),
       |cand AS (
       |  SELECT p.q_id, p.qv, l.vec_id, l.vq
       |  FROM probes p JOIN lists l ON l.c_id = p.c_id AND l.vec_id <> p.q_id),
       |scored AS (
       |  SELECT q_id, vec_id AS neighbor_id,
       |    list_cosine_similarity(qv::DOUBLE[], vq::DOUBLE[]) AS cos_sim,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY list_cosine_similarity(qv::DOUBLE[], vq::DOUBLE[]) DESC, vec_id ASC) AS rank
       |  FROM cand)
       |SELECT q_id, neighbor_id, CAST(round(cos_sim * 1e9) AS BIGINT) AS cos_ppb,
       |  CAST(rank AS BIGINT) AS rank
       |FROM scored WHERE rank <= $TopK""".stripMargin
  }

  /** The VECTOR corpus card — per-label embedding health stats in exact
    * integer space (the same x1e7 quantization as the integer Lloyd
    * rounds): vector count, min/max/sum of the integer squared norm.
    * Catches the failure modes vector pipelines actually hit (zero or
    * exploded norms from a bad encoder run, label-conditional norm
    * drift) before any index is built. One narrow scan + one label
    * aggregate — linear; the per-row HOF runs once per vector, not in
    * any hot loop. */
  def qEmbedStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .select($"label".cast("long").as("label"),
        expr("""aggregate(
          |  transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e7) AS LONG)),
          |  0L, (a, q) -> a + q * q)""".stripMargin).as("sq"))
      .groupBy($"label")
      .agg(count(lit(1)).as("n_vecs"),
           min($"sq").as("min_sq"), max($"sq").as("max_sq"),
           sum($"sq").as("sum_sq"))
  }

  val qEmbedStatsSql: String =
    """WITH q AS (
      |  SELECT CAST(label AS BIGINT) AS label,
      |    list_sum(list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT)
      |           * CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT))) AS sq
      |  FROM embeddings)
      |SELECT label, count(*) AS n_vecs,
      |  CAST(min(sq) AS BIGINT) AS min_sq, CAST(max(sq) AS BIGINT) AS max_sq,
      |  CAST(sum(sq) AS BIGINT) AS sum_sq
      |FROM q GROUP BY label""".stripMargin

  /** In-engine index-quality evaluation — recall@10 of the IVF index
    * against exact brute force, per query: the measurement loop of ANN
    * tuning (nprobe/centroid sweeps) expressed as a QUERY, so index
    * quality is monitored by the same engine (and the same oracle gate)
    * as the retrieval itself. Both inputs are already-gated operators;
    * the oracle composes their SQL verbatim as sub-CTEs. Set arithmetic
    * only — no float reaches the output. */
  def qAnnRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val brute = qAnnBrute(s, dir).select($"q_id", $"neighbor_id")
    val ivf = qAnnIvf(s, dir).select($"q_id", $"neighbor_id")
    brute.join(ivf, Seq("q_id", "neighbor_id"), "left_semi")
      .groupBy($"q_id").agg(count(lit(1)).as("n_hit"))
      .join(brute.groupBy($"q_id").agg(count(lit(1)).as("n_true")), Seq("q_id"), "right")
      .select($"q_id", coalesce($"n_hit", lit(0L)).as("n_hit"), $"n_true")
      .withColumn("recall_ppm", expr("(n_hit * 1000000L) DIV n_true"))
  }

  val qAnnRecallSql: String =
    s"""WITH brute AS (SELECT * FROM ($qAnnBruteSql) b),
       |ivf AS (SELECT * FROM ($qAnnIvfSql) i)
       |SELECT brute.q_id,
       |  CAST(sum(CASE WHEN ivf.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       |  count(*) AS n_true,
       |  (CAST(sum(CASE WHEN ivf.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
       |    // count(*) AS recall_ppm
       |FROM brute LEFT JOIN ivf
       |  ON brute.q_id = ivf.q_id AND brute.neighbor_id = ivf.neighbor_id
       |GROUP BY brute.q_id""".stripMargin

  /** Range (radius) similarity search — the OTHER retrieval primitive
    * next to top-k: ALL neighbors with cosine >= 0.1 for each query.
    * Plan shape: the bounded query set broadcasts, every partition scores
    * and filters its own vectors map-side, and NOTHING shuffles — the
    * output is exactly the matches (no window, no heap, no exchange;
    * PlanHygieneSpec asserts the zero-shuffle plan). The threshold is
    * applied to the ROUNDED ppb integer on both engines, so the boundary
    * row can never disagree cross-engine. */
  def qAnnRange(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // deliberately NOT vectors(s, dir): that helper pre-repartitions for
    // later groupBy(vec_id) stages, but range search has no aggregation —
    // scan parallelism comes from file splits (plentiful at any real
    // corpus size), and the plan stays shuffle-free end to end
    val v = Tables.embeddings(s, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val q = v.filter(isQuery($"vec_id")).select($"vec_id".as("q_id"), $"v".as("qv"))
    v.join(broadcast(q), $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("neighbor_id"),
        round(cosine($"qv", $"v") * 1e9).cast("long").as("cos_ppb"))
      .filter($"cos_ppb" >= RangeThreshPpb)
  }

  private val RangeThreshPpb = 100000000L // cosine >= 0.1 in ppb fixed-point

  val qAnnRangeSql: String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM v WHERE $isQuerySql)
       |SELECT q_id, vec_id AS neighbor_id,
       |  CAST(round(list_cosine_similarity(qv, v) * 1e9) AS BIGINT) AS cos_ppb
       |FROM q JOIN v ON vec_id <> q_id
       |WHERE CAST(round(list_cosine_similarity(qv, v) * 1e9) AS BIGINT) >= $RangeThreshPpb""".stripMargin

  /** Label-centroid separation audit — the class-geometry companion to
    * [[qEmbedStats]]: per label, the exact-integer centroid (the same
    * x1e7 quantization and sum-DIV-count per-dimension mean as the
    * integer Lloyd rounds, via the algebraic LongVectorMeanAggregator),
    * then the integer squared-L2 distance between every label pair —
    * collapsed classes (dist ~ 0) or an exploded encoder run show up
    * before any index is built. The centroid relation is label-count
    * tiny at any corpus size, so the pair join is a broadcast
    * nested-loop over ≤ |labels|² rows — bounded by construction. */
  def qEmbedCentroids(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vq = Tables.embeddings(s, dir)
      .select($"label".cast("long").as("label"),
        transform($"embedding", x => round(x.cast("double") * 1e7).cast("long")).as("vq"))
    val agg = new graft.functions.LongVectorMeanAggregator().toColumn
    val cents = vq.as[(Long, Seq[Long])]
      .groupByKey(_._1).mapValues(_._2)
      .agg(agg.name("cq")).toDF("label", "cq")
      .join(vq.groupBy($"label").agg(count(lit(1)).as("n_vecs")), "label")
      .localCheckpoint(true) // label-count tiny; consumed twice below
    cents.as("a").join(broadcast(cents.as("b")), $"a.label" < $"b.label")
      .select($"a.label".as("label_a"), $"b.label".as("label_b"),
        $"a.n_vecs".as("n_a"), $"b.n_vecs".as("n_b"),
        aggregate(zip_with($"a.cq", $"b.cq", (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, d) => acc + d).as("dist_sq"))
  }

  val qEmbedCentroidsSql: String =
    """WITH vq AS (
      |  SELECT CAST(label AS BIGINT) AS label,
      |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT)) AS vq
      |  FROM embeddings),
      |cent AS (
      |  SELECT label, list(s // n ORDER BY i) AS cq, CAST(min(n) AS BIGINT) AS n_vecs FROM (
      |    SELECT label, i, CAST(sum(vq[i]) AS BIGINT) AS s, count(*) AS n
      |    FROM vq, range(1, 65) r(i) GROUP BY 1, 2) GROUP BY label)
      |SELECT a.label AS label_a, b.label AS label_b,
      |  a.n_vecs AS n_a, b.n_vecs AS n_b,
      |  CAST(list_sum(list_transform(range(1, 65),
      |    i -> (a.cq[i] - b.cq[i]) * (a.cq[i] - b.cq[i]))) AS BIGINT) AS dist_sq
      |FROM cent a JOIN cent b ON a.label < b.label""".stripMargin

  /** INT8 SCALAR QUANTIZATION (SQ8) audit — the third leg of the vector
    * compression family (IVF partitions, PQ subspace codebooks, SQ8
    * per-dimension affine codes): per dimension, the [min, max] affine
    * range and the exact reconstruction-error profile of the 255-level
    * code every serving stack uses to cut vector memory 4×. All
    * arithmetic after the shared fixed-point step (round(x·1e7) AS LONG,
    * same as q_embed_stats) is integer — code = round-half-up via
    * (510·Δ + w) DIV 2w, reconstruction via (q·w·2 + 255) DIV 510 — so
    * both engines agree bit-for-bit with no float aggregation order
    * anywhere. Plan: one posexplode scan → dims-bounded min/max
    * aggregate → unhinted join back (AQE broadcasts the |dims|-row
    * bounds) → one aggregate; output is |dims| rows at any corpus size. */
  def qEmbedQuant(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val xq = Tables.embeddings(s, dir)
      .select(posexplode(expr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e7) AS LONG))")))
      .toDF("dim", "xq")
      .select($"dim".cast("long").as("dim"), $"xq")
    val bounds = xq.groupBy($"dim").agg(min($"xq").as("lo"), max($"xq").as("hi"))
    xq.join(bounds, "dim")
      .withColumn("q", when($"hi" === $"lo", lit(0L))
        .otherwise(expr("((xq - lo) * 510 + (hi - lo)) DIV ((hi - lo) * 2)")))
      .withColumn("r", $"lo" + when($"hi" === $"lo", lit(0L))
        .otherwise(expr("(q * (hi - lo) * 2 + 255) DIV 510")))
      .withColumn("err", abs($"xq" - $"r"))
      .groupBy($"dim")
      .agg(count(lit(1)).as("n"),
           max($"lo").as("lo_e7"), max($"hi").as("hi_e7"),
           expr("sum(err) DIV count(1)").as("mean_err_e7"),
           max($"err").as("max_err_e7"))
  }

  val qEmbedQuantSql: String =
    """WITH xe AS (
      |  SELECT unnest([{'d': i - 1, 'x': embedding[i]} for i in range(1, len(embedding) + 1)]) AS u
      |  FROM embeddings),
      |xq AS (
      |  SELECT CAST(u.d AS BIGINT) AS dim,
      |    CAST(round(CAST(u.x AS DOUBLE) * 1e7) AS BIGINT) AS xq
      |  FROM xe),
      |b AS (SELECT dim, min(xq) AS lo, max(xq) AS hi FROM xq GROUP BY 1),
      |qz AS (
      |  SELECT dim, xq, lo, hi,
      |    CASE WHEN hi = lo THEN 0
      |      ELSE ((xq - lo) * 510 + (hi - lo)) // ((hi - lo) * 2) END AS q
      |  FROM xq JOIN b USING (dim)),
      |rr AS (
      |  SELECT dim, xq, lo, hi,
      |    lo + CASE WHEN hi = lo THEN 0
      |      ELSE (q * (hi - lo) * 2 + 255) // 510 END AS r
      |  FROM qz)
      |SELECT dim, count(*) AS n,
      |  CAST(max(lo) AS BIGINT) AS lo_e7, CAST(max(hi) AS BIGINT) AS hi_e7,
      |  CAST(sum(abs(xq - r)) // count(*) AS BIGINT) AS mean_err_e7,
      |  CAST(max(abs(xq - r)) AS BIGINT) AS max_err_e7
      |FROM rr GROUP BY dim""".stripMargin

  /** Per-source embedding-centroid DRIFT between corpus snapshots — the
    * embedding-space counterpart of the unigram drift monitor
    * (TextAnalysis.qTextDrift): for each source, the squared L2 distance
    * between the OLD snapshot's centroid (vec_id % 7 != 0, the corpus-diff
    * retention convention) and the CURRENT one, in exact fixed-point
    * integers — vectors quantize to BIGINT (round(x*1e7), exact from
    * float32), each centroid coordinate is a BIGINT mean (sum DIV count,
    * order-independent), and the distance is a sum of BIGINT squares, so
    * the result hash-gates cross-engine with zero float anywhere. A
    * centroid that moves between snapshots means the source's content
    * distribution shifted — the retrain / re-mix trigger of embedding-
    * space corpus monitoring. Scale shape: one id-partitioned join to
    * attach source, one posexplode (x dims), ONE (source, dim) aggregate
    * with map-side partials (state = |sources| x dims, corpus-
    * independent), then a source-bounded rollup. Sources absent from the
    * old snapshot are excluded (their old centroid is undefined). */
  def qEmbedDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val v = Tables.embeddings(s, dir)
      .select($"vec_id",
        transform($"embedding", x => round(x.cast("double") * 1e7).cast("long")).as("vq"))
    val src = Tables.documents(s, dir).select($"doc_id".as("vec_id"), $"source")
    val dims = v.join(src, "vec_id")
      .select($"source", $"vec_id", posexplode($"vq").as(Seq("d", "x")))
    dims.groupBy($"source", $"d")
      .agg(sum(when($"vec_id" % 7 =!= 0, $"x").otherwise(0L)).as("sx_old"),
        sum(when($"vec_id" % 7 =!= 0, 1L).otherwise(0L)).as("n_old"),
        sum($"x").as("sx_new"), count(lit(1)).as("n_new"))
      .filter($"n_old" > 0)
      .select($"source", $"n_old", $"n_new",
        expr("sx_old DIV n_old").as("c_old"), expr("sx_new DIV n_new").as("c_new"))
      .groupBy($"source")
      .agg(max($"n_old").as("n_old"), max($"n_new").as("n_new"),
        sum(($"c_old" - $"c_new") * ($"c_old" - $"c_new")).as("drift_sq"))
  }

  val qEmbedDriftSql: String =
    """WITH v AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT)) AS vq
      |  FROM embeddings),
      |sv AS (
      |  SELECT d.source, v.vec_id, v.vq
      |  FROM v JOIN documents d ON d.doc_id = v.vec_id),
      |dims AS (
      |  SELECT source, vec_id, r.c.d AS d, r.c.x AS x
      |  FROM sv, unnest([{'d': i - 1, 'x': vq[i]} for i in range(1, len(vq) + 1)]) r(c)),
      |cent AS (
      |  SELECT source, d,
      |    CAST(sum(CASE WHEN vec_id % 7 <> 0 THEN x ELSE 0 END) AS BIGINT) AS sx_old,
      |    CAST(sum(CASE WHEN vec_id % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
      |    CAST(sum(x) AS BIGINT) AS sx_new, count(*) AS n_new
      |  FROM dims GROUP BY 1, 2),
      |cc AS (
      |  SELECT source, n_old, n_new, sx_old // n_old AS c_old, sx_new // n_new AS c_new
      |  FROM cent WHERE n_old > 0)
      |SELECT source, max(n_old) AS n_old, max(n_new) AS n_new,
      |  CAST(sum((c_old - c_new) * (c_old - c_new)) AS BIGINT) AS drift_sq
      |FROM cc GROUP BY source""".stripMargin

  /** Embedding-space OUTLIER detection per source — the quality filter
    * that catches mislabeled, boilerplate, or encoder-degenerate docs a
    * text heuristic can't see: each vector's squared L2 distance from
    * ITS OWN source centroid, flagged when it exceeds 2x the source's
    * mean squared distance (scale-free, so the threshold needs no
    * per-corpus tuning). All exact fixed-point BIGINT (round(x*1e7)
    * quantization, BIGINT centroid means, integer squared distances) —
    * hash-gates cross-engine with zero float. Scale shape: the
    * (source, dim) centroid aggregate has corpus-independent state; the
    * per-vector distance rides a join against that tiny relation (AQE
    * broadcasts it); per-vector rollup keys on (source, vec_id); the
    * mean join and outlier count are source-bounded. Two passes over
    * the exploded dims, no unbounded window, no pinned broadcast. */
  def qEmbedOutliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val v = Tables.embeddings(s, dir)
      .select($"vec_id",
        transform($"embedding", x => round(x.cast("double") * 1e7).cast("long")).as("vq"))
    val src = Tables.documents(s, dir).select($"doc_id".as("vec_id"), $"source")
    val dims = v.join(src, "vec_id")
      .select($"source", $"vec_id", posexplode($"vq").as(Seq("d", "x")))
    val cent = dims.groupBy($"source", $"d")
      .agg(expr("sum(x) DIV count(1)").as("c"))
    val d2 = dims.join(cent, Seq("source", "d"))
      .groupBy($"source", $"vec_id")
      .agg(sum(($"x" - $"c") * ($"x" - $"c")).as("d2"))
    val stats = d2.groupBy($"source")
      .agg(count(lit(1)).as("n_vecs"),
        expr("sum(d2) DIV count(1)").as("mean_d2"), max($"d2").as("max_d2"))
    d2.join(stats, "source")
      .groupBy($"source")
      .agg(max($"n_vecs").as("n_vecs"), max($"mean_d2").as("mean_d2"),
        max($"max_d2").as("max_d2"),
        sum(when($"d2" > $"mean_d2" * 2L, 1L).otherwise(0L)).as("n_out"))
  }

  val qEmbedOutliersSql: String =
    """WITH v AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT)) AS vq
      |  FROM embeddings),
      |sv AS (
      |  SELECT d.source, v.vec_id, v.vq
      |  FROM v JOIN documents d ON d.doc_id = v.vec_id),
      |dims AS (
      |  SELECT source, vec_id, r.c.d AS d, r.c.x AS x
      |  FROM sv, unnest([{'d': i - 1, 'x': vq[i]} for i in range(1, len(vq) + 1)]) r(c)),
      |cent AS (
      |  SELECT source, d, CAST(sum(x) AS BIGINT) // count(*) AS c
      |  FROM dims GROUP BY 1, 2),
      |d2 AS (
      |  SELECT dims.source AS source, vec_id,
      |    CAST(sum((x - c) * (x - c)) AS BIGINT) AS d2
      |  FROM dims JOIN cent ON dims.source = cent.source AND dims.d = cent.d
      |  GROUP BY 1, 2),
      |st AS (
      |  SELECT source, count(*) AS n_vecs,
      |    CAST(sum(d2) AS BIGINT) // count(*) AS mean_d2, max(d2) AS max_d2
      |  FROM d2 GROUP BY 1)
      |SELECT d2.source AS source, max(n_vecs) AS n_vecs, max(mean_d2) AS mean_d2,
      |  max(max_d2) AS max_d2,
      |  CAST(sum(CASE WHEN d2 > mean_d2 * 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_out
      |FROM d2 JOIN st ON d2.source = st.source
      |GROUP BY 1""".stripMargin

  /** FILTER-SEPARATION audit — does the rule-based quality filter
    * correspond to a real direction in embedding space? Per source: the
    * exact integer squared-L2 distance between the PASS-doc centroid and
    * the FAIL-doc centroid (same round(x·1e7) fixed-point as the rest of
    * the embedding family). A near-zero separation says the lexical
    * rules are invisible to the encoder (filtering is arbitrary in
    * semantic space); a large one validates the rule set — the check a
    * pipeline runs before trusting EITHER signal as a training filter.
    * Scale shape: the (source, pass, dim) centroid aggregate has
    * corpus-independent state; the doc flag join keys on the id; the
    * separation join is (source, dim)-bounded. */
  def qEmbedSep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // round-16 (guide §5): the flag relation is consumed TWICE below
    // (dims + counts) and qualityMetrics is a full per-doc tokenize +
    // distinct + regex pass — materialize the narrow (vec_id, source,
    // q_pass) rows once instead of running the metrics pipeline twice.
    val flag = Memo.materialize(
      graft.queries.TrainingData.qualityMetrics(s, dir)
        .select($"doc_id".as("vec_id"), $"source", $"q_pass"))
    val v = Tables.embeddings(s, dir).select($"vec_id",
      transform($"embedding", x => round(x.cast("double") * 1e7).cast("long")).as("vq"))
    val dims = v.join(flag, "vec_id")
      .select($"source", $"q_pass", posexplode($"vq").as(Seq("d", "x")))
    val cent = dims.groupBy($"source", $"q_pass", $"d")
      .agg(expr("sum(x) DIV count(1)").as("c"))
    val counts = flag.join(v.select($"vec_id"), "vec_id")
      .groupBy($"source").agg(
        sum(when($"q_pass", 1L).otherwise(0L)).as("n_pass"),
        sum(when(!$"q_pass", 1L).otherwise(0L)).as("n_fail"))
    cent.filter($"q_pass" === true).select($"source", $"d", $"c".as("cp"))
      .join(cent.filter($"q_pass" === false)
        .select($"source", $"d", $"c".as("cf")), Seq("source", "d"))
      .groupBy($"source")
      .agg(sum(($"cp" - $"cf") * ($"cp" - $"cf")).as("sep_sq"))
      .join(counts, "source")
      .select($"source", $"n_pass", $"n_fail", $"sep_sq")
  }

  val qEmbedSepSql: String =
    "WITH " + graft.queries.TrainingData.qualityMetricsCte + """,
      |v AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT)) AS vq
      |  FROM embeddings),
      |sv AS (
      |  SELECT mq.source, mq.q_pass, v.vq
      |  FROM v JOIN mq ON mq.doc_id = v.vec_id),
      |dims AS (
      |  SELECT source, q_pass, r.c.d AS d, r.c.x AS x
      |  FROM sv, unnest([{'d': i - 1, 'x': vq[i]} for i in range(1, len(vq) + 1)]) r(c)),
      |cent AS (
      |  SELECT source, q_pass, d, CAST(sum(x) AS BIGINT) // count(*) AS c
      |  FROM dims GROUP BY 1, 2, 3),
      |cnt AS (
      |  SELECT mq.source,
      |    CAST(sum(CASE WHEN q_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
      |    CAST(sum(CASE WHEN q_pass THEN 0 ELSE 1 END) AS BIGINT) AS n_fail
      |  FROM mq JOIN v ON mq.doc_id = v.vec_id GROUP BY 1),
      |sep AS (
      |  SELECT p.source, CAST(sum((p.c - f.c) * (p.c - f.c)) AS BIGINT) AS sep_sq
      |  FROM cent p JOIN cent f
      |    ON p.source = f.source AND p.d = f.d AND p.q_pass AND NOT f.q_pass
      |  GROUP BY 1)
      |SELECT sep.source AS source, n_pass, n_fail, sep_sq
      |FROM sep JOIN cnt ON sep.source = cnt.source""".stripMargin

  /** Matryoshka-style DIMENSION ENERGY SPECTRUM — per label, the share
    * of total squared mass carried by each leading-prefix slice (16/32/48
    * of 64 dims), the measurement that decides how far an embedding can
    * be truncated (or a PQ codebook shortened) before retrieval quality
    * falls off. Exact-integer quantization like [[qEmbedStats]], but at
    * x -> round(x*1e5) as LONG (NOT the family's x1e7): the per-vector
    * sum of 64 squared quanta must stay under LONG range before the ppm
    * x1e6 step, and 1e5 leaves ~4 decimal digits of headroom where 1e7
    * would overflow. Pure integer arithmetic after that, so no float
    * reaches the gate. Output is |labels| x 3 rows at any corpus size;
    * one aggregation, no join. */
  def qEmbedEnergy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // energy share is computed per VECTOR as a bounded <=1e6 ppm, then
    // averaged — label-level sums of q^2 (~5e16 at sf0.1) would overflow
    // LONG the moment the ppm step multiplies them by 1e6
    val per = Tables.embeddings(s, dir)
      .select($"label".cast("long").as("label"),
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e5) AS LONG))").as("qv"))
      .select($"label",
        expr("aggregate(qv, 0L, (a, q) -> a + q * q)").as("tot"),
        expr("aggregate(slice(qv, 1, 16), 0L, (a, q) -> a + q * q)").as("p16"),
        expr("aggregate(slice(qv, 1, 32), 0L, (a, q) -> a + q * q)").as("p32"),
        expr("aggregate(slice(qv, 1, 48), 0L, (a, q) -> a + q * q)").as("p48"))
      .selectExpr("label", "stack(3, 16L, p16, 32L, p32, 48L, p48) AS (d, psq)", "tot")
      .select($"label", $"d", expr("(psq * 1000000L) DIV tot").as("vec_ppm"))
    per.groupBy($"label", $"d")
      .agg(count(lit(1)).as("n_vecs"), sum($"vec_ppm").as("sum_ppm"))
      .select($"label", $"d", $"n_vecs",
        expr("sum_ppm DIV n_vecs").as("mean_energy_ppm"))
  }

  val qEmbedEnergySql: String =
    """WITH q AS (
      |  SELECT CAST(label AS BIGINT) AS label,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1e5) AS BIGINT)) AS qv
      |  FROM embeddings),
      |p AS (
      |  SELECT label,
      |    list_sum([x * x for x in qv]) AS tot,
      |    list_sum([x * x for x in qv[1:16]]) AS p16,
      |    list_sum([x * x for x in qv[1:32]]) AS p32,
      |    list_sum([x * x for x in qv[1:48]]) AS p48
      |  FROM q),
      |v AS (
      |  SELECT label, u.r.d AS d,
      |    (CAST(u.r.s AS BIGINT) * 1000000) // CAST(tot AS BIGINT) AS vec_ppm
      |  FROM p, unnest([{'d': 16, 's': p16}, {'d': 32, 's': p32},
      |                  {'d': 48, 's': p48}]) u(r))
      |SELECT label, d, count(*) AS n_vecs,
      |  CAST(sum(vec_ppm) AS BIGINT) // count(*) AS mean_energy_ppm
      |FROM v GROUP BY label, d""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_energy" -> (qEmbedEnergy _),
    "q_embed_drift"  -> (qEmbedDrift _),
    "q_embed_outliers" -> (qEmbedOutliers _),
    "q_embed_sep"    -> (qEmbedSep _),
    "q_embed_quant"  -> (qEmbedQuant _),
    "q_embed_centroids" -> (qEmbedCentroids _),
    "q_ann_range"    -> (qAnnRange _),
    "q_ann_recall"   -> (qAnnRecall _),
    "q_embed_stats"  -> (qEmbedStats _),
    "q_ann_brute"    -> (qAnnBrute _),
    "q_ann_ivf"      -> (qAnnIvf _),
    "q_ann_kmeans"   -> (qAnnKmeans _),
    "q_kmeans_round" -> (qKmeansRound _),
  )

  def oracles: Map[String, String] = Map(
    "q_embed_energy" -> qEmbedEnergySql,
    "q_embed_drift"  -> qEmbedDriftSql,
    "q_embed_outliers" -> qEmbedOutliersSql,
    "q_embed_sep"    -> qEmbedSepSql,
    "q_embed_quant"  -> qEmbedQuantSql,
    "q_embed_centroids" -> qEmbedCentroidsSql,
    "q_ann_range"    -> qAnnRangeSql,
    "q_ann_recall"   -> qAnnRecallSql,
    "q_embed_stats"  -> qEmbedStatsSql,
    "q_ann_brute"    -> qAnnBruteSql,
    "q_ann_ivf"      -> qAnnIvfSql,
    "q_ann_kmeans"   -> qAnnKmeansSql, // fully gated since round 3 (integer Lloyd)
    "q_kmeans_round" -> qKmeansRoundSql,
  )
}
