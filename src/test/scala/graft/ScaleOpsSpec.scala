package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Scale-path mechanics: salted skew joins, bucketed co-located joins,
  * approximate distinct, decoder robustness. */
class ScaleOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("IVF-bucketed embedding near-dup: recall floor vs the exact pair set at sf0.1") {
    // The sub-quadratic path for moderate-threshold embedding dedup
    // (round-9): q_dedup_embed_lsh is gated hash-exact vs the FULL exact
    // pair oracle, so its output IS the exact cos>=0.5 pair set — recall
    // of the IVF candidates is measured against it. Floor 0.9 leaves
    // headroom only for x1e7-quantization boundary flips (IVF verifies
    // on quantized integers, LSH on raw doubles); measured 14/14 at
    // nprobe=6 on the current fixture.
    val sfDir = "/root/testdata/sf0.1"
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(queries.Dedup.qDedupEmbedLsh(spark, sfDir))
    val ivf = pairs(queries.Dedup.qDedupEmbedIvf(spark, sfDir))
    assert(exact.nonEmpty, "vacuous: no exact near-dup pairs at sf0.1")
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall $recall < 0.9 (${(ivf & exact).size}/${exact.size})")
    // precision: an IVF pair absent from the exact set can only be a
    // quantization-boundary artifact, which must sit within 200 ppb of
    // the 0.5 threshold
    val extras = queries.Dedup.qDedupEmbedIvf(spark, sfDir)
      .select("vec_a", "vec_b", "cos_ppb").collect()
      .filter(r => !exact.contains((r.getLong(0), r.getLong(1))))
    assert(extras.forall(r => math.abs(r.getLong(2) - 500000000L) <= 200),
      s"non-boundary false positive: ${extras.take(3).mkString(",")}")
  }

  test("hierarchical router equals the flat router when every group is probed") {
    // At fixture scale the level-1 geometry SATURATES: k = ceil(n/C) fine
    // cells group into g = ceil(k / ceil(sqrt(k))) <= IvfHierProbeGroups
    // groups, so stage 2 scores every fine centroid and the two-level
    // probe assignment must EQUAL the flat one — pair-set equality here
    // pins the whole hier chain (seed ranking, centroid-level Lloyd
    // round, group map, two-stage top-k) to the flat semantics it
    // specializes. The non-saturated regime is exercised by the synthetic
    // corpus test below and the audit-corpus recall floor
    // (Dedup.IvfHierFullRecallFloorPpm, asserted by ScaleUpBench recall).
    val sfDir = "/root/testdata/sf0.1"
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_a", "vec_b", "cos_ppb").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val flat = pairs(queries.Dedup.qDedupEmbedIvf(spark, sfDir))
    val hier = pairs(queries.Dedup.qDedupEmbedHier(spark, sfDir))
    assert(flat.nonEmpty, "vacuous: no flat IVF pairs at sf0.1")
    assert(hier == flat,
      s"hier != flat in the saturated regime: only-hier=${(hier -- flat).take(3)}, " +
        s"only-flat=${(flat -- hier).take(3)}")
  }

  test("hierarchical router finds every planted clone pair past the saturation point") {
    // A corpus where the hierarchy BITES at w1 = 4 (k = ceil(n/C) = 32
    // fine cells, gsz = 6, g = 6 > 4 probed groups — stage 2 scores at
    // most 24 of 32 cells per vector; the knob is pinned below the
    // shipped width so the NON-saturated routing path stays covered on
    // a corpus cheap enough for CI): 6000 deterministic pseudo-random
    // vectors plus 40 planted clones (vec 1000000+j copies vec 13j). A
    // clone and its original carry IDENTICAL vectors, so they probe
    // identically and share their home cell — every planted pair MUST
    // survive two-level routing; losing one is a routing bug, not
    // geometry. Also pins the probe-width contract: <= nprobe cells per
    // vector.
    val dir = "/tmp/graft_hier_spec"
    val n = 6000
    import spark.implicits._
    val base = spark.range(0, n).select($"id".as("vec_id"),
      transform(sequence(lit(1), lit(64)), d =>
        (pmod(hash($"id" * 64 + d), lit(2000)) - 1000).cast("float") / 1000f)
        .as("embedding"))
    val clones = base.filter($"vec_id" % 13 === 0 && $"vec_id" < 520)
      .select(($"vec_id" / 13 + 1000000).cast("long").as("vec_id"), $"embedding")
    new java.io.File(dir).mkdirs()
    base.unionByName(clones).coalesce(2)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val probes = queries.Dedup.hierProbes(spark, dir, w1 = 4)
    val maxProbes = probes.groupBy("vec_id").count().agg(max("count")).collect()(0).getLong(0)
    assert(maxProbes <= queries.Dedup.IvfDedupNProbe,
      s"a vector probes $maxProbes cells > nprobe")
    val found = queries.Dedup.qDedupEmbedHier(spark, dir, w1 = 4)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 520 by 13).map(j => (j.toLong, j / 13 + 1000000L)).toSet
    assert((planted -- found).isEmpty,
      s"hier routing lost planted clone pairs: ${(planted -- found).take(5)}")
  }

  test("incremental embedding dedup recovers every straddling exact pair at sf0.1") {
    // Non-vacuity + recall for q_dedup_embed_incr: the exact cos>=0.5
    // pair set (== the gated q_dedup_embed_lsh output) restricted to
    // pairs straddling the %5 split must ALL be found by the
    // incremental operator — that's what the multi-assigned (m=4)
    // index buys over single-assignment (which measured 2/5 here).
    val sfDir = "/root/testdata/sf0.1"
    val exactStraddle = queries.Dedup.qDedupEmbedLsh(spark, sfDir)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a % 5 == 0) != (b % 5 == 0) }
      .map { case (a, b) => if (a % 5 == 0) (a, b) else (b, a) }.toSet
    val incr = queries.Dedup.qDedupEmbedIncr(spark, sfDir)
      .select("new_vec", "hist_vec").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactStraddle.nonEmpty, "vacuous: no straddling exact pairs at sf0.1")
    assert((exactStraddle -- incr).isEmpty,
      s"incremental dedup missed straddling pairs: ${exactStraddle -- incr}")
  }

  test("hierarchical incremental dedup recovers every straddling exact pair at sf0.1") {
    // The two-level router's twin of the flat-incremental assertion
    // above: at sf0.1 every group is probed (k = ceil(1600/192) = 9
    // constant-size cells, g = 3 disjoint groups <= w1 = 8), so the
    // per-group top-t cut sees every group and a recall loss here
    // would be an INDEX bug (seed ranking, Lloyd round, m_i=4 lists,
    // per-group cut), not a routing approximation. Also pins the
    // <= w1·t probe-width contract.
    val sfDir = "/root/testdata/sf0.1"
    val exactStraddle = queries.Dedup.qDedupEmbedLsh(spark, sfDir)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a % 5 == 0) != (b % 5 == 0) }
      .map { case (a, b) => if (a % 5 == 0) (a, b) else (b, a) }.toSet
    val probes = queries.Dedup.embedIncrHierProbes(spark, sfDir)
    val maxProbes = probes.groupBy("new_vec").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxProbes <= queries.Dedup.IvfIncrHierProbeGroups *
        queries.Dedup.IvfIncrHierCellsPerGroup,
      s"an arriving vector probes $maxProbes cells > w1*t")
    val incr = queries.Dedup.qDedupEmbedIncrHier(spark, sfDir)
      .select("new_vec", "hist_vec").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactStraddle.nonEmpty, "vacuous: no straddling exact pairs at sf0.1")
    assert((exactStraddle -- incr).isEmpty,
      s"hier incremental dedup missed straddling pairs: ${exactStraddle -- incr}")
  }

  test("hierarchical incremental dedup finds planted cross-slice clones past saturation") {
    // A corpus where the level-1 routing BITES for the incremental
    // index: n = 7500 vectors, history slice = 6000 (%5 != 0) -> k =
    // ceil(6000/192) = 32 constant-size cells, gsz = 6, g = 6 > w1 = 4
    // probed groups — stage 2 sees at most 24 of 32 cells per arriving
    // vector. 40 planted clones copy HISTORY vectors (vec_id % 5 != 0)
    // into the arriving slice (clone ids are multiples of 5): identical
    // vectors probe identically and share their home cell/group, so
    // every planted cross-slice pair MUST survive two-level routing —
    // losing one is a routing bug, not geometry.
    val dir = "/tmp/graft_incr_hier_spec"
    val n = 7500
    import spark.implicits._
    val base = spark.range(0, n).select($"id".as("vec_id"),
      transform(sequence(lit(1), lit(64)), d =>
        (pmod(hash($"id" * 64 + d), lit(2000)) - 1000).cast("float") / 1000f)
        .as("embedding"))
    // originals: history ids 13j+1 (never %5==0 for j<...: pick ids
    // coprime with 5 by filtering); clones re-keyed to multiples of 5
    val origs = base.filter($"vec_id" % 13 === 1 && $"vec_id" % 5 =!= 0
        && $"vec_id" < 700)
    val clones = origs.select(($"vec_id" * 5 + 2000000).cast("long").as("vec_id"),
      $"embedding")
    new java.io.File(dir).mkdirs()
    base.unionByName(clones).coalesce(2)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val planted = origs.select("vec_id").collect()
      .map(_.getLong(0)).map(j => (j * 5 + 2000000, j)).toSet
    assert(planted.size >= 30, s"fixture degenerated: ${planted.size} planted clones")
    val found = queries.Dedup.qDedupEmbedIncrHier(spark, dir, w1 = 4)
      .select("new_vec", "hist_vec").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((planted -- found).isEmpty,
      s"hier incremental routing lost planted clone pairs: ${(planted -- found).take(5)}")
  }

  test("salted join result equals the plain equi-join") {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority")
    val lineitem = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"), col("l_linenumber"))
    val plain = lineitem.join(orders, Seq("o_orderkey"))
    val salted = Skew.saltedJoin(lineitem, orders, "o_orderkey", salt = 8,
      probeSaltBy = Seq("o_orderkey", "l_linenumber"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    Seq("orders_b", "lineitem_b").foreach { t =>
      val d = new java.io.File(s"/tmp/graft_warehouse/$t")
      if (d.exists()) org.apache.commons.io.FileUtils.deleteDirectory(d)
    }
    Tables.orders(spark, sf).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b")
    Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity")).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_b")
    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b").hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
    val plan = joined.queryExecution.executedPlan.toString
    val shufflesBeforeJoin = "Exchange hashpartitioning".r.findAllIn(plan).length
    // bucketed-on-key scan-merge-join: only the final groupBy may exchange
    assert(shufflesBeforeJoin <= 1, s"unexpected shuffles:\n$plan")
    assert(joined.count() == 5)
  }

  test("training-data ops keep minimal shuffle counts (plan shape at scale)") {
    // stratified sampling: hash + bucket are map-side; ONE shuffle (groupBy source)
    val sample = SparkEntry.queries("q_sample_stratified")(spark, sf)
    val samplePlan = sample.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(samplePlan).length <= 1, samplePlan)

    // packing: window partitioned by source; the (source, bin) groupBy is
    // satisfied by the same partitioning — ONE shuffle total
    val pack = SparkEntry.queries("q_pack_bins")(spark, sf)
    val packPlan = pack.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(packPlan).length <= 1, packPlan)

    // PII scrub: pure per-row expressions — ZERO shuffles
    val pii = SparkEntry.queries("q_pii_scrub")(spark, sf)
    val piiPlan = pii.queryExecution.executedPlan.toString
    assert(!piiPlan.contains("Exchange hashpartitioning"), piiPlan)

    // sampling rates: kept fraction tracks rate_pct (hash uniformity)
    val rows = sample.collect()
    rows.foreach { r =>
      val total = r.getAs[Long]("n_total")
      val kept = r.getAs[Long]("n_kept")
      val rate = r.getAs[Long]("rate_pct")
      if (total >= 20)
        assert(math.abs(kept.toDouble / total - rate / 100.0) < 0.35,
          s"source ${r.getAs[String]("source")}: kept $kept/$total at rate $rate%")
    }
  }

  test("distributed prefix-sum packing equals the window formulation exactly") {
    val window = SparkEntry.queries("q_pack_bins")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val dist = graft.queries.TrainingData.packBinsDistributed(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(dist == window)
    // and with a partition count that forces sources to span partitions
    val dist13 = graft.queries.TrainingData.packBinsDistributed(spark, sf, partitions = 13)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(dist13 == window)
  }

  test("histogram-quantile sketch obeys the merge law (per-shard + sum == direct)") {
    // the property that makes q_hist_quantile a SKETCH: per-shard bin
    // histograms merge by ADDITION, and quantile selection over the
    // merged histogram equals selection over the corpus histogram —
    // i.e. 1000 executors can each build O(|bins|) state and the driver
    // (or a second aggregate) resolves the merged result exactly.
    val direct = SparkEntry.queries("q_hist_quantile")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ev = Tables.events(spark, sf)
      .select(expr("CAST(round(value * 100) AS LONG) DIV 100").as("bin"),
        expr("event_id % 4").as("shard"))
    val perShard = ev.groupBy(col("shard"), col("bin")).agg(count(lit(1)).as("c"))
    val merged = perShard.groupBy(col("bin")).agg(sum(col("c")).as("c"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bin").asc)
      .rowsBetween(Long.MinValue, 0)
    val tot = merged.agg(sum(col("c")).as("n_total"))
    val resolved = merged.withColumn("cum", sum(col("c")).over(w))
      .crossJoin(broadcast(tot))
      .agg(
        min(when(col("cum") * 100 >= col("n_total") * 50, col("bin"))).as("b50"),
        min(when(col("cum") * 100 >= col("n_total") * 90, col("bin"))).as("b90"),
        min(when(col("cum") * 100 >= col("n_total") * 99, col("bin"))).as("b99"),
        max(col("n_total")).as("n_total"))
      .selectExpr("stack(3, 50L, b50, 90L, b90, 99L, b99) AS (q_pct, bin)", "n_total")
      .selectExpr("q_pct", "bin * 100 AS est_lo_c", "n_total")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(resolved == direct && direct.size == 3)
  }

  test("approx_count_distinct tracks exact distinct (3-sigma of default rsd)") {
    val exact = Tables.lineitem(spark, sf)
      .agg(countDistinct(col("l_orderkey"))).collect()(0).getLong(0)
    val approx = Tables.lineitem(spark, sf)
      .agg(approx_count_distinct(col("l_orderkey"))).collect()(0).getLong(0)
    // default rsd = 5% is a standard deviation, not a bound — allow 3 sigma
    assert(math.abs(approx - exact).toDouble / exact < 0.15)
  }

  test("partition pruning: competencia filter prunes the lake scan") {
    import graft.sources.Sinks
    val out = java.nio.file.Files.createTempDirectory("graft_prune").toFile.getPath + "/lake"
    val df = Tables.orders(spark, sf)
      .withColumn("tipo_arquivo", lit("RD"))
      .withColumn("uf", substring(col("o_orderpriority"), 1, 1))
      .withColumn("competencia",
        concat(lit("25"), lpad(month(col("o_orderdate")).cast("string"), 2, "0")))
    Sinks.writeLake(df, out)
    val pruned = spark.read.parquet(out).filter(col("competencia") === "2503")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("competencia") && !plan.contains("PushedFilters: [IsNotNull(competencia)"),
      s"partition filter not pruned:\n$plan")
    val expect = df.filter(col("competencia") === "2503").count()
    assert(pruned.count() == expect && expect > 0)
  }

  test("adaptive jaccard picks the df-bounded plan on stop-shingle corpora") {
    import graft.queries.Dedup
    import spark.implicits._
    // uniform corpus: shingles mostly unique -> short posting lists ->
    // the plain inverted index is the right (and chosen) plan
    val uniform = (0L until 200L).map { i =>
      (i, Seq(s"u$i a b", s"u$i b c", s"u$i c d", s"u$i d e", s"u$i e f"))
    }.toDF("doc_id", "sh")
    assert(Dedup.jaccardPlanChoice(uniform) == "plain")

    // stop-shingle corpus: one shingle in every doc -> the plain plan's
    // candidate volume is n(n-1)/2 = 79800 pairs over n*5 = 2000 postings,
    // past the 32-pairs-per-posting crossover -> prefix-filter chosen
    val n = 400L
    val skewed = (0L until n).map { i =>
      (i, Seq("the of and", s"u$i a b", s"u$i b c", s"u$i c d", s"u$i d e"))
    }.toDF("doc_id", "sh")
    assert(Dedup.jaccardPlanChoice(skewed) == "prefix")

    // the df-bound in action: the stop-shingle (max df) sorts LAST in
    // every doc's rarity-first order, outside the prefix, so it produces
    // ZERO candidates — vs n(n-1)/2 for the plain plan
    val (postings, plainCand) = Dedup.jaccardPlanStats(skewed)
    assert(plainCand >= n * (n - 1) / 2)
    val prefCand = Dedup.prefixCandidates(skewed).count()
    assert(prefCand == 0, s"stop-shingle leaked into prefix candidates: $prefCand")
    assert(postings == n * 5)

    // and both plans agree (exactness of the prefix theorem) on a corpus
    // that HAS true near-dup pairs
    val dup = (0L until 50L).flatMap { i =>
      val base = Seq(s"x$i a b", s"x$i b c", s"x$i c d", s"x$i d e", s"x$i e f")
      Seq((i, base), (i + 1000L, base :+ "tail g h"))
    }.toDF("doc_id", "sh")
    val plain = Dedup.jaccardPairsPlain(dup).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pref = Dedup.jaccardPairsPrefix(dup).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(plain == pref && plain.size == 50)
  }

  test("directional containment prefix filter: bounded candidates, exact result") {
    import graft.queries.Dedup
    import spark.implicits._
    // stop-shingle corpus (same shape as the jaccard test): the max-df
    // shingle sorts LAST in rarity order, outside every contained-side
    // prefix, so it generates ZERO candidates — the symmetric
    // sized-intersection relation would shuffle n(n-1)/2 pairs here
    val n = 400L
    val skewed = (0L until n).map { i =>
      (i, Seq("the of and", s"u$i a b", s"u$i b c", s"u$i c d", s"u$i d e"))
    }.toDF("doc_id", "sh")
    assert(Dedup.containPrefixCandidates(skewed).count() == 0,
      "stop-shingle leaked into containment prefix candidates")

    // corpus with TRUE containment pairs that symmetric jaccard misses:
    // a 5-shingle doc quoted whole inside a 15-shingle doc has
    // jaccard = 5/15 < 0.6 but containment = 1.0
    val dup = (0L until 30L).flatMap { i =>
      val core = (0 until 5).map(j => s"x$i c$j")
      Seq((i, core), (i + 1000L, core ++ (0 until 10).map(j => s"t$i u$j")))
    }.toDF("doc_id", "sh")
    // brute-force directional containment as the equivalence oracle
    val inv = dup.select($"doc_id", explode($"sh").as("s"))
    val sizes = dup.select($"doc_id", size($"sh").cast("long").as("n"))
    val brute = inv.as("a").join(inv.as("b"),
        $"a.s" === $"b.s" && $"a.doc_id" =!= $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("i"))
      .join(sizes.select($"doc_id".as("doc_a"), $"n".as("n_a")), "doc_a")
      .filter($"i" * 10 >= $"n_a" * 9)
      .select($"doc_a", $"doc_b", $"n_a", $"i")
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val pref = asSet(Dedup.containPairsPrefix(dup)
      .select($"doc_a", $"doc_b", $"n_a", $"i"))
    assert(pref == asSet(brute) && pref.size == 30,
      s"directional prefix containment diverged (${pref.size} pairs)")
  }

  test("directional containment prefix == brute force on randomized corpora") {
    import graft.queries.Dedup
    import spark.implicits._
    // deterministic LCG so the corpus (and any failure) reproduces
    var seed = 0x5DEECE66DL
    def nxt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    for (round <- 1 to 3) {
      val vocab = (0 until 30).map(i => s"w$i")
      val docs = (0L until 60L).map { id =>
        val n = 2 + nxt(8)
        // duplicates collapse: shingle SETS, like the real relation
        (id, (0 until n).map(_ => vocab(nxt(vocab.size))).distinct)
      }.filter(_._2.nonEmpty)
      val df = docs.toDF("doc_id", "sh")
      // brute-force directional containment in plain Scala
      val m = docs.toMap
      val expect = (for {
        (a, sa) <- docs; (b, sb) <- docs if a != b
        i = sa.toSet.intersect(sb.toSet).size if i * 10 >= sa.size * 9
      } yield (a, b, sa.size.toLong, i.toLong)).toSet
      val got = Dedup.containPairsPrefix(df).select($"doc_a", $"doc_b", $"n_a", $"i")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == expect, s"round $round: ${got.size} vs expected ${expect.size}")
    }
  }

  test("verbatim span alignment == pure-Scala LCS-of-trigrams oracle") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // corpora with shared blocks at different offsets, repeats, and noise
    val texts = Seq(
      1L -> "a b c d e f g h i j",
      2L -> "x y a b c d e f q r s t",        // shared block, shifted
      3L -> "a b a b a b c d",                // internal repeats
      4L -> "p q r a b a b a b c d z",        // repeats shared at offset
      5L -> "m n o p q",                      // disjoint from 1
      6L -> "d e f g h i j k l m")            // suffix/prefix overlap with 1
    val pairs = Seq((1L, 2L), (3L, 4L), (1L, 6L), (1L, 5L)).toDF("doc_a", "doc_b")
    def grams(t: String): Seq[String] = {
      val w = t.split(" ").toSeq
      w.sliding(3).map(_.mkString(" ")).toSeq
    }
    def longestSpan(a: String, b: String): Long = {
      val (ga, gb) = (grams(a), grams(b))
      var best = 0
      for (i <- ga.indices; j <- gb.indices) {
        var k = 0
        while (i + k < ga.size && j + k < gb.size && ga(i + k) == gb(j + k)) k += 1
        best = math.max(best, k)
      }
      best + 2 // r shared trigrams = r+2 shared tokens
    }
    val tm = texts.toMap
    val expect = Seq((1L, 2L), (3L, 4L), (1L, 6L))
      .map { case (a, b) => (a, b, longestSpan(tm(a), tm(b))) }.toSet
    // run the operator's alignment stage over these fixed pairs/texts
    // (same code shape as qDedupSpan past the pair source)
    val pos = texts.toDF("doc_id", "text")
      .select($"doc_id", org.apache.spark.sql.functions.posexplode(
        graft.functions.TextFunctions.shingles3(
          graft.functions.TextFunctions.tokens($"text"))))
      .toDF("doc_id", "p", "sng")
    val m = pairs
      .join(pos.select($"doc_id".as("doc_a"), $"p".as("pa"), $"sng"), "doc_a")
      .join(pos.select($"doc_id".as("doc_b"), $"p".as("pb"), $"sng"), Seq("doc_b", "sng"))
      .withColumn("diag", $"pa" - $"pb")
    val wd = Window.partitionBy($"doc_a", $"doc_b", $"diag").orderBy($"pa".asc)
    val got = m.withColumn("isl", $"pa" - row_number().over(wd))
      .groupBy($"doc_a", $"doc_b", $"diag", $"isl").agg(count(lit(1)).as("run"))
      .groupBy($"doc_a", $"doc_b")
      .agg((max($"run") + 2).cast("long").as("span_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // pair (1,5) shares no trigram -> no row, like the gated operator
    assert(got == expect, s"$got vs $expect")
  }

  test("span cut: char identity, token identity, and the cut really removes the reported span") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.01"
    val rows = graft.queries.Dedup.qDedupSpanCut(spark, sfDir).collect()
    assert(rows.nonEmpty, "no span cuts at sf0.01 — vacuous")
    val toks = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", graft.functions.TextFunctions.tokens($"text").as("t"))
      .as[(Long, Seq[String])].collect().toMap
    rows.foreach { r =>
      val (id, span, nOrig, nClean) = (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))
      val (origChars, removedChars, cleanChars) = (r.getLong(5), r.getLong(6), r.getLong(7))
      // token identity
      assert(nOrig == toks(id).size.toLong, s"doc $id orig token count")
      assert(nClean == nOrig - span, s"doc $id clean token count")
      // char identity: removing k tokens from a space-joined doc removes
      // their chars plus ONE junction space iff both sides are nonempty
      val junction = if (nClean > 0) 1L else 0L
      assert(origChars == cleanChars + removedChars + junction,
        s"doc $id char identity: $origChars != $cleanChars + $removedChars + $junction")
      // the reported hash is the md5 of a genuine subsequence cut: some
      // contiguous k-token window of the original yields exactly clean_md5
      val t = toks(id)
      val k = span.toInt
      val hit = (0 to t.size - k).exists { st =>
        val clean = (t.take(st) ++ t.drop(st + k)).mkString(" ")
        java.security.MessageDigest.getInstance("MD5").digest(clean.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString == r.getString(8)
      }
      assert(hit, s"doc $id: clean_md5 is not any contiguous $k-token cut of the original")
    }
  }

  test("novelty laws: equal shingle totals across entries; anti-monotone in history") {
    import spark.implicits._
    // NOTE: no dominance law relates the two GATED entries — the
    // historical slice (id % 5 != 0) contains ids ABOVE the arriving
    // doc, so a shingle can be novel-in-full (min owner) yet present in
    // history. What IS law: (a) both entries count the same per-doc
    // shingle totals; (b) the shared core is anti-monotone in the
    // history set — a larger history can only reduce novelty.
    val full = SparkEntry.queries("q_text_novelty")(spark, sf)
      .select(col("doc_id"), col("n_shingles").as("ns_f"))
      .filter(col("doc_id") % 5 === 0)
    val incr = SparkEntry.queries("q_text_novelty_incr")(spark, sf)
      .select(col("doc_id"), col("n_shingles").as("ns_i"))
    val j = full.join(incr, "doc_id").collect()
    assert(j.nonEmpty)
    j.foreach(r => assert(r.getAs[Long]("ns_f") == r.getAs[Long]("ns_i"),
      s"doc ${r.getLong(0)}: shingle totals diverge"))

    val inv = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "b"), (2L, "d"))
      .toDF("doc_id", "sng")
    val small = Seq("a").toDF("sng")
    val big = Seq("a", "b", "d").toDF("sng")
    def novelOf(hist: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      graft.queries.TextAnalysis.noveltyAgainstIndex(inv, hist)
        .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_novel")).toMap
    val (ns, nb) = (novelOf(small), novelOf(big))
    assert(ns == Map(1L -> 2L, 2L -> 2L) && nb == Map(1L -> 1L, 2L -> 0L))
    ns.foreach { case (d, n) => assert(n >= nb(d), s"doc $d: bigger history raised novelty") }
  }

  test("Memo.materialize honors the reliable-checkpoint knob") {
    import spark.implicits._
    // default path: localCheckpoint — no files on disk, session-local
    graft.queries.Memo.materialize(Seq(1L, 2L).toDF("x")).count()
    // production path: conf flag + checkpoint dir → DFS-backed checkpoint
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set("spark.graft.reliableCheckpoint", "true")
    try {
      assert(graft.queries.Memo.materialize(Seq(1L, 2L, 3L).toDF("x")).count() == 3)
      val files = new java.io.File(dir).listFiles
      assert(files != null && files.nonEmpty, "no reliable checkpoint written")
    } finally spark.conf.unset("spark.graft.reliableCheckpoint")
  }

  test("incremental band index persists through the lake and joins shuffle-free") {
    import graft.queries.Dedup
    // reload == in-memory: the bucketed round-trip loses nothing
    val mem = Dedup.historicalBandIndex(spark, sf)
    val reloaded = Dedup.persistedBandIndex(spark, sf)
    assert(reloaded.count() == mem.count())
    assert(reloaded.exceptAll(mem).isEmpty && mem.exceptAll(reloaded).isEmpty,
      "reloaded band index diverges from the in-memory build")
    // write-once contract: the gated query joins the CATALOG TABLE (a
    // bucketed scan), and the index side of that join plans ZERO
    // exchanges — only the arriving slice shuffles
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    // at sf0.001 the tiny index would be broadcast (fine, adaptive); the
    // contract under test is the 100 TB shape, where the join shuffles —
    // disable auto-broadcast so the shuffle path is what gets planned
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val plan = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      SparkEntry.queries("q_dedup_incremental")(spark, sf)
        .queryExecution.sparkPlan
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    val joinSides = plan.collect {
      case j: SortMergeJoinExec => Seq(j.left, j.right)
      case j: ShuffledHashJoinExec => Seq(j.left, j.right)
    }.flatten
    val indexSides = joinSides.filter(_.collect {
      case f: FileSourceScanExec if f.relation.bucketSpec.isDefined => f
    }.nonEmpty)
    assert(indexSides.nonEmpty, "no join against the bucketed index in the plan")
    indexSides.foreach { side =>
      assert(side.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"bucketed index side re-shuffles:\n$side")
    }
  }

  test("novelty shingle history persists through the lake and joins shuffle-free") {
    import graft.queries.{Dedup, TextAnalysis}
    import org.apache.spark.sql.functions.{col, explode}
    // reload == in-memory: the bucketed round-trip loses nothing
    val mem = Dedup.docShinglesSrc(spark, sf)
      .filter(col("doc_id") % 5 =!= 0)
      .select(explode(col("sh")).as("sng")).distinct()
    val reloaded = TextAnalysis.persistedShingleHistory(spark, sf)
    assert(reloaded.count() == mem.count())
    assert(reloaded.exceptAll(mem).isEmpty && mem.exceptAll(reloaded).isEmpty,
      "reloaded shingle history diverges from the in-memory build")
    // write-once contract: the gated query probes the CATALOG TABLE (a
    // bucketed scan) and the history side of the probe join plans ZERO
    // exchanges — only the arriving slice shuffles (force the shuffle
    // path; at test scale AQE would broadcast the history)
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val plan = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      SparkEntry.queries("q_text_novelty_incr")(spark, sf)
        .queryExecution.sparkPlan
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    val joinSides = plan.collect {
      case j: SortMergeJoinExec => Seq(j.left, j.right)
      case j: ShuffledHashJoinExec => Seq(j.left, j.right)
    }.flatten
    val histSides = joinSides.filter(_.collect {
      case f: FileSourceScanExec if f.relation.bucketSpec.isDefined => f
    }.nonEmpty)
    assert(histSides.nonEmpty, "no join against the bucketed history in the plan")
    histSides.foreach { side =>
      assert(side.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"bucketed history side re-shuffles:\n$side")
    }
  }

  test("chunk history persists through the lake and joins shuffle-free") {
    import graft.queries.Dedup
    // reload == in-memory: the bucketed round-trip loses nothing
    val mem = Dedup.docChunks(
        Tables.documents(spark, sf).select(col("doc_id"), col("text")))
      .filter(col("doc_id") % 5 =!= 0)
      .select(col("chunk")).distinct()
    val reloaded = Dedup.persistedChunkHistory(spark, sf)
    assert(reloaded.count() == mem.count())
    assert(reloaded.exceptAll(mem).isEmpty && mem.exceptAll(reloaded).isEmpty,
      "reloaded chunk history diverges from the in-memory build")
    // write-once contract: the history side of the probe join plans ZERO
    // exchanges (force the shuffle path; at test scale AQE would broadcast)
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val plan = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      SparkEntry.queries("q_dedup_lines_incr")(spark, sf)
        .queryExecution.sparkPlan
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    val joinSides = plan.collect {
      case j: SortMergeJoinExec => Seq(j.left, j.right)
      case j: ShuffledHashJoinExec => Seq(j.left, j.right)
    }.flatten
    val histSides = joinSides.filter(_.collect {
      case f: FileSourceScanExec if f.relation.bucketSpec.isDefined => f
    }.nonEmpty)
    assert(histSides.nonEmpty, "no join against the bucketed history in the plan")
    histSides.foreach { side =>
      assert(side.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"bucketed history side re-shuffles:\n$side")
    }
  }

  test("bloom-prefiltered decontamination equals the exact operator") {
    import graft.queries.Dedup
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_shingles", "n_eval_hits", "contaminated").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val exact = key(Dedup.qDecontaminate(spark, sf))
    val bloom = key(Dedup.qDecontaminateBloom(spark, sf))
    assert(bloom == exact)
    assert(exact.nonEmpty)
    // both decision directions are exercised on this corpus
    val flags = exact.map(_._4)
    assert(flags.contains(0L) && flags.contains(1L))
  }

  test("persisted eval index: verify join plans zero exchanges on the bucketed side") {
    // round-8: the decontamination eval suite is a write-once bucketed
    // index (Dedup.evalShingleSet) like the band index — the exact-verify
    // join must probe the catalog table without re-shuffling it
    import graft.queries.Dedup
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val plan = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      SparkEntry.queries("q_decontaminate_bloom")(spark, sf)
        .queryExecution.sparkPlan
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    val joinSides = plan.collect {
      case j: SortMergeJoinExec => Seq(j.left, j.right)
      case j: ShuffledHashJoinExec => Seq(j.left, j.right)
    }.flatten
    val indexSides = joinSides.filter(_.collect {
      case f: FileSourceScanExec if f.relation.bucketSpec.isDefined => f
    }.nonEmpty)
    assert(indexSides.nonEmpty, "no join against the bucketed eval index in the plan")
    indexSides.foreach { side =>
      assert(side.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"bucketed eval index side re-shuffles:\n$side")
    }
  }

  test("bloom prefilter prunes non-contaminated shingle volume before the join") {
    import spark.implicits._
    import org.apache.spark.sql.graft.NativeExprs
    // disjoint eval/train vocabularies: every train probe must miss
    val eval_ = (0L until 500L).map(i => s"ev$i").toDF("sng")
    val bloom = eval_
      .agg(NativeExprs.bloomFilterAgg(xxhash64($"sng"), 1000000L, 8000000L))
      .head.getAs[Array[Byte]](0)
    val train = (0L until 5000L).map(i => s"tr$i").toDF("sng")
    val survivors = train
      .filter(NativeExprs.bloomMightContain(lit(bloom), xxhash64($"sng")))
      .count()
    // fpp at 500 items in 8M bits is ~0; allow a handful of collisions
    assert(survivors <= 5, s"bloom passed $survivors of 5000 known-miss probes")
    // and no false negatives: every eval member must survive its own sketch
    val selfHits = eval_
      .filter(NativeExprs.bloomMightContain(lit(bloom), xxhash64($"sng")))
      .count()
    assert(selfHits == 500)
  }

  test("bloom decontamination with no eval source mirrors exact zero-hit semantics") {
    import graft.queries.Dedup
    val dir = java.nio.file.Files.createTempDirectory("graft_noeval").toFile.getPath
    Tables.documents(spark, sf).filter(col("source") =!= "src0")
      .write.parquet(s"$dir/documents.parquet")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_shingles", "n_eval_hits", "contaminated").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val bloom = key(Dedup.qDecontaminateBloom(spark, dir))
    val exact = key(Dedup.qDecontaminate(spark, dir))
    assert(bloom == exact)
    assert(bloom.nonEmpty)
    assert(bloom.forall(r => r._3 == 0L && r._4 == 0L)) // zero hits, zero flags
  }

  test("lake compaction: flagged partitions coalesce, others untouched, data identical") {
    import graft.sources.LakeMaintenance
    val dir = java.nio.file.Files.createTempDirectory("graft_lake").toFile.getPath + "/lake"
    val docs = Tables.documents(spark, sf).select("doc_id", "text", "source")
    // source=src0 written fragmented (8 files), others 1 file each
    docs.filter(col("source") === "src0").repartition(8)
      .write.partitionBy("source").parquet(dir)
    docs.filter(col("source") =!= "src0").repartition(1)
      .write.mode("append").partitionBy("source").parquet(dir)
    val before = LakeMaintenance.fileStats(spark, dir).map(p => p.partition -> p.nFiles).toMap
    assert(before("source=src0") == 8)
    val healthyBefore = before.filter(_._1 != "source=src0")
    val rowsBefore = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

    val rewritten = LakeMaintenance.compact(spark, dir, Seq("source"), maxFilesPerPart = 4)
    assert(rewritten == Seq("source=src0"))
    val after = LakeMaintenance.fileStats(spark, dir).map(p => p.partition -> p.nFiles).toMap
    assert(after("source=src0") == 1, s"src0 still ${after("source=src0")} files")
    assert(after.filter(_._1 != "source=src0") == healthyBefore) // untouched
    val rowsAfter = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(rowsAfter == rowsBefore)
    // idempotent: nothing left to compact
    assert(LakeMaintenance.compact(spark, dir, Seq("source"), maxFilesPerPart = 4).isEmpty)
  }

  test("KMV sketch: error inside theory bound, and k-minima merge distributively") {
    // gated estimator: mean error should sit near 1/sqrt(k-1) ~ 6.3%
    val rows = SparkEntry.queries("q_kmv_distinct")(spark, sf)
      .select("n_exact", "n_h", "est", "err_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (nExact, nH, est, err) =>
      if (nH < 256) assert(est == nH) // exact branch below k
      else assert(err <= 400000L, s"estimator off by $err ppm (exact=$nExact est=$est)")
    }
    // the property that makes KMV a SKETCH: trimming the union of two
    // partitions' k-minima equals the k-minima of the union (so partial
    // sketches combine associatively on executors)
    val rnd = new scala.util.Random(99L)
    val a = Seq.fill(2000)(rnd.nextLong() & Long.MaxValue).distinct
    val b = Seq.fill(2000)(rnd.nextLong() & Long.MaxValue).distinct
    def kmin(xs: Seq[Long], k: Int = 256) = xs.distinct.sorted.take(k)
    assert(kmin(kmin(a) ++ kmin(b)) == kmin(a ++ b))
  }

  test("degree-oriented triangle counting equals brute force on random graphs") {
    import spark.implicits._
    // fixed seeds: deterministic spec, three densities incl. a hub-heavy
    // graph (node 0 connects to everything — the case degree orientation
    // exists for) and duplicate/reversed/self-loop edges to exercise
    // canonicalization
    for ((seed, n, m) <- Seq((42L, 12, 20), (7L, 20, 60), (13L, 15, 40))) {
      val rnd = new scala.util.Random(seed)
      val raw = Seq.tabulate(m)(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)) ++
        Seq.tabulate(n - 1)(i => (0L, (i + 1).toLong)) ++ // hub
        Seq((1L, 1L), (2L, 1L), (1L, 2L))                 // self-loop + reversed dup
      val got = graft.operators.Triangles.perNode(raw.toDF("u", "v"))
        .as[(Long, Long)].collect().toMap
      val want = graft.operators.Triangles.bruteCounts(raw)
      assert(got == want, s"seed=$seed: $got != $want")
      assert(want.nonEmpty, s"seed=$seed produced a triangle-free graph (weak spec)")
    }
  }

  test("kmv overlap: sketch-algebra invariants hold and unsaturated pairs are exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions.explode
    val rows = graft.queries.TextAnalysis.qKmvOverlap(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, u, i) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      // u >= max(a,b) is DETERMINISTIC (merged k-th minimum can only
      // shrink); u <= a+b is only true in expectation — each estimate
      // carries ~1/sqrt(K) noise, so allow 20% slack on the upper bound
      assert(u >= math.max(a, b), s"union est $u below max($a, $b)")
      assert(u * 10 <= (a + b) * 12, s"union est $u far above $a + $b")
      assert(i == math.max(0L, a + b - u) && i <= math.min(a, b))
    }
    // accuracy: per-pair intersection error is large for tiny overlaps
    // (inclusion-exclusion noise scales with UNION size, and the max(0,·)
    // clamp biases small estimates upward — the documented limitation of
    // KMV intersections), so assert at the SUM level where noise partially
    // cancels: total estimated overlap within 3x of total exact overlap.
    // Deterministic on the fixed corpus; catches sign/formula regressions.
    val sng = graft.queries.Dedup.docShinglesSrc(spark, sf)
      .select($"source", explode($"sh").as("sng")).distinct()
      .as[(String, String)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val exactSum = rows.map(r => sng(r.getString(0)).intersect(sng(r.getString(1))).size.toLong).sum
    val estSum = rows.map(_.getLong(5)).sum
    assert(estSum <= exactSum * 3 && estSum * 3 >= exactSum,
      s"sum est $estSum vs sum exact $exactSum out of 3x band")
  }

  test("changepoint: gated argmax equals a brute-force scan of the hourly series") {
    import spark.implicits._
    val hourly = Tables.events(spark, sf)
      .groupBy(org.apache.spark.sql.functions.window($"ts", "1 hour"), $"event_type")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .select($"event_type", $"window.start".as("h"), $"n")
      .as[(String, java.sql.Timestamp, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2.getTime).map(x => (x._2, x._3)))
    val got = graft.queries.Events.qEvChangepoint(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getTimestamp(3))).toMap
    assert(got.keySet == hourly.keySet.toSet)
    hourly.foreach { case (et, series) =>
      val tot = series.map(_._2).sum
      var cum = 0L
      val gaps = series.zipWithIndex.dropRight(1).map { case ((h, n), i0) =>
        val idx = i0 + 1L; cum += n
        val nh = series.length.toLong
        (h, math.abs(cum * 100L / idx - (tot - cum) * 100L / (nh - idx)))
      }
      val best = gaps.map(_._2).max
      val cpHour = gaps.filter(_._2 == best).map(_._1.getTime).min
      val (nHours, gapX100, cp) = got(et)
      assert(nHours == series.length.toLong && gapX100 == best &&
        cp.getTime == cpHour, s"$et: got ${got(et)} want ($best, $cpHour)")
    }
  }

  test("triangle census: transitivity bounded and consistent with per-node counts") {
    val r = graft.queries.Dedup.qGraphTriangles(spark, sf).collect()(0)
    val (nodes, edges, wedges, tris, ppm) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(edges > 0 && nodes > 0)
    assert(tris * 3 <= wedges, s"3*$tris > $wedges wedges") // every triangle closes 3 wedges
    assert(ppm >= 0 && ppm <= 1000000L)
    assert(ppm == (if (wedges > 0) tris * 3 * 1000000L / wedges else 0L))
  }

  test("triangle counting on degenerate graphs: empty, triangle-free, self-loops only") {
    import spark.implicits._
    def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
      graft.operators.Triangles.perNode(edges.toDF("u", "v"))
        .as[(Long, Long)].collect().toMap
    assert(run(Seq.empty) == Map.empty)                     // empty graph
    assert(run(Seq((1L, 2L), (3L, 4L), (5L, 6L))) == Map.empty) // matching, no wedges
    assert(run(Seq((1L, 1L), (2L, 2L))) == Map.empty)       // self-loops only
    assert(run(Seq((1L, 2L), (2L, 3L), (1L, 3L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))                    // one triangle
  }

  test("line-dedup equals a pure-Scala chunk-frequency oracle") {
    import java.security.MessageDigest
    def md5hex(s: String): String = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunksOf = docs.view.mapValues { t =>
      val toks = t.trim.split("\\s+").filter(_.nonEmpty)
      toks.grouped(10).map(_.mkString(" ")).toVector
    }.toMap.filter(_._2.nonEmpty)
    val boiler = chunksOf.toSeq
      .flatMap { case (id, cs) => cs.distinct.map(_ -> id) }
      .groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
    val expected = chunksOf.map { case (id, cs) =>
      id -> ((cs.size.toLong, cs.count(boiler).toLong,
        md5hex(cs.filterNot(boiler).mkString(" "))))
    }
    val got = SparkEntry.queries("q_dedup_lines")(spark, sf)
      .select("doc_id", "n_chunks", "n_boiler", "clean_h").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got == expected)
  }

  test("lsh band-balance: every band partitions the same doc population") {
    val rows = SparkEntry.queries("q_lsh_balance")(spark, sf).collect()
    assert(rows.length == 6)
    // each signature contributes exactly one bucket entry per band, so the
    // per-band population must be identical and equal the shingled-doc count
    val nDocs = rows.map(_.getAs[Long]("n_docs")).distinct
    assert(nDocs.length == 1)
    val shingled = Tables.documents(spark, sf)
      .select(graft.functions.TextFunctions.shingleSet(col("text")).as("sh"))
      .filter(size(col("sh")) > 0).count()
    assert(nDocs.head == shingled)
    rows.foreach { r =>
      assert(r.getAs[Long]("max_bucket") <= r.getAs[Long]("n_docs"))
      // pigeonhole: max >= total/n_buckets exactly, so the integer ratio >= 100
      assert(r.getAs[Long]("skew_x100") >= 100)
    }
  }

  test("soft-dedup weights are consistent with the gated cluster assignment") {
    import spark.implicits._
    val cl = SparkEntry.queries("q_dedup_cluster")(spark, sf)
      .as[(Long, Long)].collect()
    val clusterOf = cl.toMap
    val sizes = cl.groupBy(_._2).view.mapValues(_.size).toMap
    val srcOf = Tables.documents(spark, sf).select("doc_id", "source")
      .as[(Long, String)].collect()
    val expected = srcOf.groupBy(_._2).map { case (src, ds) =>
      val w = ds.map { case (d, _) =>
        1000000L / clusterOf.get(d).map(sizes).getOrElse(1) }.sum
      src -> ((ds.length.toLong,
        ds.count { case (d, _) =>
          clusterOf.get(d).exists(c => sizes(c) >= 2) }.toLong, w))
    }
    val got = SparkEntry.queries("q_soft_dedup")(spark, sf)
      .select("source", "n_docs", "n_dup_docs", "w_ppm").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected)
  }

  test("embedding drift equals a pure-Scala fixed-point recompute") {
    import spark.implicits._
    def fp(x: Float): Long = BigDecimal(x.toDouble * 1e7)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val src = Tables.documents(spark, sf).select("doc_id", "source")
      .as[(Long, String)].collect().toMap
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect()
    val expected = vecs.filter(v => src.contains(v._1))
      .groupBy(v => src(v._1)).flatMap { case (s, vs) =>
        val old = vs.filter(_._1 % 7 != 0)
        if (old.isEmpty) None else {
          def cent(xs: Array[(Long, Seq[Float])], d: Int): Long = {
            val q = xs.map(x => fp(x._2(d)))
            q.sum / q.length // truncate-toward-zero, matching DIV
          }
          val drift = (0 until vs.head._2.length).map { d =>
            val diff = cent(old, d) - cent(vs, d); diff * diff }.sum
          Some(s -> ((old.length.toLong, vs.length.toLong, drift)))
        }
      }
    val got = SparkEntry.queries("q_embed_drift")(spark, sf)
      .select("source", "n_old", "n_new", "drift_sq").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected)
  }

  test("bpe apply: merge applications equal greedy occurrences of the top pair") {
    import spark.implicits._
    val toks = Tables.documents(spark, sf).select("text").as[String].collect()
      .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
    val top = toks.filter(_.length >= 2)
      .flatMap(_.sliding(2).filter(_.length == 2))
      .groupBy(identity).view.mapValues(_.length).toSeq
      .sortBy { case (p, n) => (-n, p) }.head._1
    def greedyApps(t: String): Long = {
      var i = 0; var n = 0L
      while (i < t.length - 1) {
        if (t.substring(i, i + 2) == top) { n += 1; i += 2 } else i += 1
      }
      n
    }
    val rows = SparkEntry.queries("q_text_bpe_apply")(spark, sf).collect()
    val gotApps = rows.map(r =>
      r.getAs[Long]("n_chars") - r.getAs[Long]("n_syms")).sum
    assert(gotApps == toks.map(greedyApps).sum)
    rows.foreach(r =>
      assert(r.getAs[Long]("n_syms") <= r.getAs[Long]("n_chars")))
  }

  test("decoders fail cleanly on corrupt input") {
    import graft.sources.{Blast, Dbc, Dbf}
    assertThrows[IllegalArgumentException](Dbc.toDbf(Array[Byte](1, 2, 3)))
    assertThrows[IllegalArgumentException](Blast.explode(Array[Byte](9, 4, 0)))
    assertThrows[IllegalArgumentException](Blast.explode(Array[Byte](0, 9, 0)))
    val good = Dbf.write(Seq("A"), Seq(Seq("1")))
    // truncated record section yields no rows rather than garbage
    assert(Dbf.records(good.take(Dbf.parseHeader(good).headerSize)).isEmpty)
  }
}
