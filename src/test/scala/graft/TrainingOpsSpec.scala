package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._

/** Invariants for the dedup / similarity / text / events operator families
  * beyond what the DuckDB oracle checks. */
class TrainingOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("minhash LSH pairs equal the exact inverted-index jaccard pairs") {
    val exact = SparkEntry.queries("q_dedup_jaccard")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
  }

  test("minhash estimator tracks exact jaccard within the 128-perm error bound") {
    // sigma = sqrt(j(1-j)/128) <= 0.0442; pairs are all j >= 0.6, so a
    // 200000 ppm (4.5+ sigma) per-pair bound and a 50000 ppm mean bound
    // hold with huge margin unless the estimator is actually broken
    val rows = SparkEntry.queries("q_minhash_est")(spark, sf)
      .select("jaccard_ppm", "est_ppm", "abs_err_ppm").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == math.abs(r.getLong(0) - r.getLong(1)))
      assert(r.getLong(2) <= 200000L, s"estimator off by ${r.getLong(2)} ppm")
    }
    assert(rows.map(_.getLong(2)).sum / rows.length <= 50000L)
  }

  test("native shingleSet equals the HOF array_distinct(shingles3(tokens)) spec") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(200)
    val diff = docs.select(
        shingleSet($"text").as("native"),
        array_distinct(shingles3(tokens($"text"))).as("hof"))
      .filter(not($"native" <=> $"hof"))
      .count()
    assert(diff == 0)
  }

  test("native array_intersect_size equals size(array_intersect) exactly") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(150)
      .select(shingleSet($"text").as("sh")).filter(size($"sh") > 2)
    val pairs = docs.limit(50).crossJoin(docs.limit(50).select($"sh".as("sh2")))
    val diff = pairs.select(
        org.apache.spark.sql.graft.NativeExprs.arrayIntersectSize($"sh", $"sh2").as("native"),
        size(array_intersect($"sh", $"sh2")).cast("long").as("hof"))
      .filter($"native" =!= $"hof").count()
    assert(diff == 0)
  }

  test("native simhash60 equals the HOF bit-walk spec") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val docs = Tables.documents(spark, sf).limit(200)
      .select(shingleSet($"text").as("sh")).filter(size($"sh") > 0)
    val diff = docs.select(simhash60($"sh").as("native"),
        TextFunctions.simhash60Hof($"sh").as("hof"))
      .filter($"native" =!= $"hof").count()
    assert(diff == 0)
  }

  test("simhash of a doc against itself has hamming 0; near-dups bounded") {
    import spark.implicits._
    val df = Seq(
      ("a b c d e f g h i j", "a b c d e f g h i j"),
      ("a b c d e f g h i j", "a b c d e f g h i Z")).toDF("t1", "t2")
    val r = df.select(
      simhash60(array_distinct(shingles3(tokens($"t1")))).as("s1"),
      simhash60(array_distinct(shingles3(tokens($"t2")))).as("s2"))
      .select(call_function("bit_count", $"s1".bitwiseXOR($"s2")).as("hd"))
      .collect().map(_.getInt(0))
    assert(r(0) == 0)
    assert(r(1) > 0 && r(1) < 30) // one-token edit moves few bits
  }

  test("simhash96 equals a pure-Scala md5-walk reference") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(50)
      .select($"doc_id", shingleSet($"text").as("sh")).filter(size($"sh") > 0)
    val native = docs
      .select($"doc_id", org.apache.spark.sql.graft.NativeExprs.simhash96($"sh").as("sim"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    docs.collect().foreach { r =>
      val w = new Array[Int](96)
      r.getSeq[String](1).foreach { s =>
        md.reset()
        val d = md.digest(s.getBytes("UTF-8"))
        var hi = 0L; var lo = 0L
        (0 until 6).foreach(k => hi = (hi << 8) | (d(k) & 0xFFL))
        (6 until 12).foreach(k => lo = (lo << 8) | (d(k) & 0xFFL))
        (0 until 48).foreach { i =>
          w(i) += (if (((lo >>> i) & 1L) == 1L) 1 else -1)
          w(i + 48) += (if (((hi >>> i) & 1L) == 1L) 1 else -1)
        }
      }
      var shi = 0L; var slo = 0L
      (0 until 48).foreach { i =>
        if (w(i) > 0) slo |= 1L << i
        if (w(i + 48) > 0) shi |= 1L << i
      }
      assert(native(r.getLong(0)) == Seq(shi, slo),
        s"doc ${r.getLong(0)}: native ${native(r.getLong(0))} != ref ($shi, $slo)")
    }
  }

  test("simhash96 banded plan equals brute hamming<=3 (lossless pigeonhole)") {
    // The 4x24-bit bands are lossless for hamming <= 3 by pigeonhole
    // (3 flipped bits touch at most 3 of 4 bands) — so the gated banded
    // plan must emit EXACTLY the brute all-pairs hamming<=3 set. Brute
    // side computed in-process over the collected signatures (sf0.1:
    // ~5k docs, ~12M comparisons — spec-affordable, never a plan).
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.1"
    val sims = graft.queries.Dedup.docShinglesSrc(spark, sfDir)
      .select($"doc_id", org.apache.spark.sql.graft.NativeExprs.simhash96($"sh").as("sim"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)(0), r.getSeq[Long](1)(1)))
    val brute = (for {
      i <- sims.indices.iterator
      j <- (i + 1) until sims.length
      (da, ha, la) = sims(i)
      (db, hb, lb) = sims(j)
      hd = java.lang.Long.bitCount(ha ^ hb) + java.lang.Long.bitCount(la ^ lb)
      if hd <= 3
    } yield (math.min(da, db), math.max(da, db), hd.toLong)).toSet
    val gated = graft.queries.Dedup.qDedupSimhash96(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(brute.nonEmpty, "vacuous: no hamming<=3 pairs at sf0.1")
    assert(gated == brute,
      s"banded != brute: only-gated=${(gated -- brute).take(3)}, " +
        s"missed=${(brute -- gated).take(3)}")
  }

  test("bag fingerprint is order- and duplication-insensitive") {
    import spark.implicits._
    val df = Seq("x y z w", "w z y x x y", "x y q w").toDF("t")
    val fps = df.select(bagFingerprint(tokens($"t"))).collect().map(_.getString(0))
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("partial-topk brute ANN (gated) equals the window formulation exactly") {
    val window = graft.queries.Similarity.bruteTopKWindow(spark, sf)
      .select("q_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val partial = graft.queries.Similarity.bruteTopKPartial(spark, sf)
      .select("q_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(partial == window)
  }

  test("LSH ANN achieves reasonable recall vs brute force") {
    val brute = SparkEntry.queries("q_ann_brute")(spark, sf)
      .select("q_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = graft.queries.Similarity.annLshTopK(spark, sf)
      .select("q_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.3, s"LSH ANN recall $recall") // random vectors: hard mode
  }

  test("vector-mean aggregator equals the posexplode centroid formulation") {
    import spark.implicits._
    val v = Tables.embeddings(spark, sf).limit(200)
      .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .select(($"vec_id" % 7).as("c_id"), $"v")
    val agg = new graft.functions.VectorMeanAggregator().toColumn
    val typed = v.as[(Long, Seq[Double])]
      .groupByKey(_._1).mapValues(_._2).agg(agg.name("cv"))
      .collect().toMap
    val exploded = graft.queries.Similarity.centroidMeansExploded(v)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(typed.keySet == exploded.keySet)
    typed.foreach { case (k, cv) =>
      val e = exploded(k)
      assert(cv.length == e.length)
      cv.zip(e).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-12 * math.max(1.0, math.abs(b)), s"centroid $k")
      }
    }
  }

  test("k-means IVF recall is at least competitive with the raw-subset IVF") {
    val brute = SparkEntry.queries("q_ann_brute")(spark, sf)
      .select("q_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val km = graft.queries.Similarity.kmeansIvfTopK(spark, sf)
      .select("q_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & km).size.toDouble / brute.size
    assert(recall >= 0.4, s"k-means IVF recall $recall")
  }

  test("IVF ANN achieves high recall vs brute force") {
    val brute = SparkEntry.queries("q_ann_brute")(spark, sf)
      .select("q_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SparkEntry.queries("q_ann_ivf")(spark, sf)
      .select("q_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall $recall too low") // nprobe=3 of 20 lists
  }

  test("sessions partition all events; funnel counts are monotone") {
    val nEvents = Tables.events(spark, sf).count()
    val sessioned = SparkEntry.queries("q_ev_session")(spark, sf)
      .agg(sum("n_events")).collect()(0).getLong(0)
    assert(sessioned == nEvents)
    val f = SparkEntry.queries("q_ev_funnel")(spark, sf).collect()(0)
    val Seq(nu, nv, nvc, nf) = Seq("n_users", "n_view", "n_view_click", "n_full_funnel")
      .map(c => f.getAs[Long](c))
    assert(nu >= nv && nv >= nvc && nvc >= nf)
  }

  test("winnowing fingerprints: identity, edit-robustness, discrimination, drift merge") {
    import spark.implicits._
    import org.apache.spark.sql.graft.NativeExprs
    val doc = (1 to 60).map(i => s"w${i % 37}").mkString(" ")
    val edited = doc.replace("w5 ", "zz ") // single-token edit
    val other = (1 to 60).map(i => s"q$i").mkString(" ")
    val df = Seq(doc, doc, edited, other).toDF("t")
      .select(NativeExprs.winnowFingerprint(tokens($"t")).as("fp"))
    val fps = df.collect().map(_.getSeq[Long](0).toSet)
    assert(fps(0) == fps(1)) // deterministic
    val overlapEdit = (fps(0) & fps(2)).size.toDouble / fps(0).size
    val overlapOther = (fps(0) & fps(3)).size.toDouble / fps(0).size
    assert(overlapEdit > 0.5, s"edit overlap $overlapEdit") // local edit, most survive
    assert(overlapOther == 0.0)

    // schema drift union (SURVEY §7 risk 2)
    val a = Seq(("1", "x")).toDF("c1", "c2")
    val b = Seq(("2", "y")).toDF("c1", "c3")
    val merged = graft.sources.DatasusEtl.unionWithDrift(Seq(a, b))
    assert(merged.columns.toSeq == Seq("c1", "c2", "c3"))
    assert(merged.count() == 2)
    assert(merged.filter(col("c2").isNull).count() == 1)
  }

  test("connected components: chain graph (multi-iteration), singleton edges, and reliable-checkpoint mode") {
    import spark.implicits._
    // 0-1-2-...-9 chain: diameter 9 forces several propagation rounds;
    // 100-101 is an isolated pair; all labels must reach the min id.
    val chain = (0L until 9L).map(i => (i, i + 1)) :+ (100L, 101L)
    val edges = chain.toDF("u", "v")
    val got = graft.operators.ConnectedComponents.run(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (0L to 9L).foreach(i => assert(got(i) == 0L, s"node $i"))
    assert(got(100L) == 100L && got(101L) == 100L)
    // reliable checkpoint dir variant computes the identical result
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_cp").toString
    val got2 = graft.operators.ConnectedComponents
      .run(edges, checkpointDir = Some(dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got2 == got)
  }

  test("text stats quality is bounded [0,1] and ttr null only for empty docs") {
    val stats = SparkEntry.queries("q_text_stats")(spark, sf)
    assert(stats.filter(col("quality_ppm") < 0 || col("quality_ppm") > 1000000).count() == 0)
    assert(stats.filter(col("ttr_ppm").isNull && col("n_tokens") > 0).count() == 0)
  }

  test("native array_long_sq_l2 equals the zip_with/aggregate HOF spec") {
    import spark.implicits._
    val v = Tables.embeddings(spark, sf).limit(300)
      .select(expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT))").as("a"))
    val pairs = v.crossJoin(v.limit(20).select($"a".as("b")))
    val diff = pairs.select(
        graft.queries.Pq.il2Native($"a", $"b").as("native"),
        graft.queries.Pq.il2Hof($"a", $"b").as("hof"))
      .filter($"native" =!= $"hof").count()
    assert(diff == 0)
  }

  test("PQ-ADC retrieval achieves reasonable recall vs exact brute force") {
    val brute = SparkEntry.queries("q_ann_brute")(spark, sf)
      .select("q_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = graft.queries.Pq.pqTopK(spark, sf)
      .select("q_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & pq).size.toDouble / brute.size
    // random vectors are PQ's hard mode (no cluster structure); the exact
    // re-rank of a 5x pool still recovers a solid fraction
    assert(recall >= 0.3, s"PQ-ADC recall $recall")
  }

  test("IVF-PQ retrieval recall is bounded by its coarse probe, above floor") {
    val brute = SparkEntry.queries("q_ann_brute")(spark, sf)
      .select("q_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpq = graft.queries.Pq.ivfPqTopK(spark, sf)
      .select("q_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivfpq).size.toDouble / brute.size
    // coarse probe (nprobe of the lists) caps recall; random vectors are
    // hard mode for both quantizers — a modest floor proves the chain
    // retrieves real neighbors end-to-end
    assert(recall >= 0.2, s"IVF-PQ recall $recall")
  }

  test("alternating large/small-star CC equals min-label, in fewer rounds on a chain") {
    import spark.implicits._
    // 0-1-...-24 chain: diameter 24 — min-label pays one iteration per hop,
    // the alternating algorithm collapses it in O(log n) rounds
    val chain = (0L until 24L).map(i => (i, i + 1)) :+ (100L, 101L)
    val edges = chain.toDF("u", "v")
    val (lp, lpIters) = graft.operators.ConnectedComponents.runWithIters(edges, maxIter = 40)
    val (alt, altIters) = graft.operators.ConnectedComponents.runAlternating(edges)
    val lpMap = lp.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val altMap = alt.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(altMap == lpMap)
    (0L to 24L).foreach(i => assert(altMap(i) == 0L, s"node $i"))
    assert(altIters < lpIters, s"alternating=$altIters vs min-label=$lpIters rounds")
    // real fixture graph (near-dup pairs): identical clusters too
    val pairs = SparkEntry.queries("q_dedup_jaccard")(spark, sf).select("doc_a", "doc_b")
    val viaLp = graft.operators.ConnectedComponents.run(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaAlt = graft.operators.ConnectedComponents.runAlternating(pairs)._1
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaAlt == viaLp)
  }

  test("hash-aggregate argmax assignment and typed integer recentering equal their window/posexplode spec twins") {
    import spark.implicits._
    val v = graft.queries.Similarity.withDoubles(
      Tables.embeddings(spark, sf)
        .select($"vec_id",
          expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT))").as("vq")),
      "vq", "vd")
    val cents = graft.queries.Similarity.withDoubles(
      v.filter($"vec_id" % 25 === 0).select($"vec_id".as("c_id"), $"vq".as("cq")), "cq", "cd")
    val fast = graft.queries.Similarity.assignInt(v, cents)
    val slow = graft.queries.Similarity.assignIntWindow(v, cents)
    def aKey(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(aKey(fast) == aKey(slow))
    def cKey(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val rFast = cKey(graft.queries.Similarity.recenterInt(fast))
    val rSlow = cKey(graft.queries.Similarity.recenterIntExploded(slow))
    assert(rFast == rSlow)
  }

  test("support-pruned token-pair top-20 equals the unpruned all-pairs baseline") {
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("tok_a", "tok_b", "n_ab", "c_a", "c_b", "n_docs_total").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
    val pruned = key(graft.queries.TokenPairs.prunedTop20(spark, sf))
    val baseline = key(graft.queries.TokenPairs.baselineTop20(spark, sf))
    assert(pruned == baseline)
    assert(pruned.size == 20 || pruned.size == baseline.size)
  }

  test("personalized pagerank: mass bounded, seeds hold more than uniform share") {
    val rows = SparkEntry.queries("q_dedup_ppr")(spark, sf)
      .select("doc_id", "is_seed", "rank_ppb").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val scale = 1000000000L
    val total = rows.map(_._3).sum
    assert(total <= scale, s"rank mass exceeds scale: $total")
    // restart mass flows only to seeds: the seed set's aggregate rank
    // must exceed its population share (strictly, unless ALL are seeds)
    val (seeds, rest) = rows.partition(_._2 == 1L)
    assert(seeds.nonEmpty)
    if (rest.nonEmpty) {
      val seedMass = seeds.map(_._3).sum
      assert(seedMass * rows.length > total * seeds.length,
        s"seed mass $seedMass not above uniform share")
    }
  }

  test("integer pagerank: mass conserved within truncation loss, nodes == jaccard graph") {
    val rows = SparkEntry.queries("q_dedup_pagerank")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, deg, rank) => deg >= 1 && rank > 0 })
    // integer DIV only loses mass: sum <= Scale, and the loss is bounded
    // by a few units per node per iteration
    val total = rows.map(_._3).sum
    val scale = 1000000000L
    assert(total <= scale, s"rank mass exceeds scale: $total")
    assert(total >= scale - 1000L * rows.length, s"too much truncation loss: $total")
    // node set == endpoints of the jaccard pair graph
    val pairNodes = SparkEntry.queries("q_dedup_jaccard")(spark, sf)
      .select("doc_a", "doc_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(rows.map(_._1).toSet == pairNodes)
  }

  test("drift TV distance: bounded [0, 1e6], zero against an identical distribution") {
    val rows = SparkEntry.queries("q_text_drift")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, tv) => tv >= 0L && tv <= 1000000L })
    // sanity of the identity case via the same integer formula in-memory:
    // a distribution compared to itself gives sum_d = 0 and matched0 = N0
    val counts = Map("a" -> 3L, "b" -> 2L); val n0 = counts.values.sum
    val sumD = counts.map { case (_, c) => math.abs(c * n0 - c * n0) }.sum
    val tvSelf = (sumD + (n0 - counts.values.sum) * n0) * 1000000L / (2 * n0 * n0)
    assert(tvSelf == 0L)
  }

  test("curation pipeline funnel: monotone stage counts, bins match token volume") {
    val rows = SparkEntry.queries("q_pipeline_curate")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, nIn, nQ, nD, nC, nS, tok, bins) =>
      assert(nIn >= nQ && nQ >= nD && nD >= nC && nC >= nS,
        s"$src funnel not monotone")
      assert(bins == (tok + 8191) / 8192, s"$src bins/token mismatch")
      assert(nS == 0 || tok > 0)
    }
    // the quality, dedup and sample stages each remove something
    // somewhere (funnel is real); the decontamination stage (nD > nC)
    // is covered by the monotone check — at the tiny suite fixture no
    // doc need be majority-contaminated, and the gate exercises its
    // attrition at sf0.01 (1 doc) under the oracle
    assert(rows.exists(r => r._2 > r._3))
    assert(rows.exists(r => r._3 > r._4))
    assert(rows.exists(r => r._5 > r._6))
  }

  test("weighted pagerank: mass conserved, same node set, ranking differs from unweighted") {
    val w = SparkEntry.queries("q_dedup_pagerank_w")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val u = SparkEntry.queries("q_dedup_pagerank")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(w.nonEmpty && w.map(_._1).toSet == u.keySet)
    val scale = 1000000000L
    val total = w.map(_._3).sum
    assert(total <= scale && total >= scale - 1000L * w.length)
    assert(w.forall(_._3 > 0))
  }

  test("hourly anomaly flags: both directions, and each flag matches the 3-sigma moments") {
    val rows = SparkEntry.queries("q_ev_anomaly")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    val byType = rows.groupBy(_._1)
    byType.foreach { case (t, hs) =>
      val flags = hs.map(_._3).toSet
      assert(flags.contains(0L) && flags.contains(1L), s"$t flags one-sided")
      // recompute the integer 3-sigma decision from raw moments
      val ns = hs.map(_._2)
      val nh = ns.length.toLong; val sn = ns.sum; val ssn = ns.map(n => n * n).sum
      hs.foreach { case (_, n, flag) =>
        val dev = n * nh - sn
        val expected = if (dev * dev > 9L * (nh * ssn - sn * sn)) 1L else 0L
        assert(flag == expected, s"$t hour with n=$n")
      }
    }
  }

  test("incremental dedup equals the new-vs-historical slice of full minhash dedup") {
    val full = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .select("doc_a", "doc_b", "jaccard_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = full.collect {
      case (a, b, j) if a % 5 == 0 && b % 5 != 0 => (a, b, j)
      case (a, b, j) if b % 5 == 0 && a % 5 != 0 => (b, a, j)
    }.toSet
    val inc = SparkEntry.queries("q_dedup_incremental")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc == expected)
    assert(inc.nonEmpty)
  }

  test("hash-ranked top-N sample: exactly N per source, and WindowGroupLimit in the plan") {
    val df = graft.queries.TrainingData.qSampleTopn(spark, sf)
    val perSource = df.groupBy("source").count().collect()
      .map(r => r.getLong(1))
    assert(perSource.nonEmpty && perSource.forall(_ == 5L))
    // Spark 4 pushes rank<=k into WindowGroupLimit: bounded per-partition
    // heaps before the shuffle — the reason the declarative form scales
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("temperature mixing: rates normalize and damp the head toward uniform") {
    val rows = graft.queries.TrainingData.qMixTemperature(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("src_tokens"),
        r.getAs[Long]("w"), r.getAs[Long]("rate_ppm")))
    assert(rows.nonEmpty)
    // integer floor division: rates sum to <= 1e6, within |sources| of it
    val tot = rows.map(_._4).sum
    assert(tot <= 1000000L && tot >= 1000000L - rows.length)
    rows.foreach { case (_, s, w, _) =>
      assert(w * w <= s && (w + 1) * (w + 1) > s, "w must be isqrt(src_tokens)")
    }
    // damping: the max/min RATE ratio is at most the sqrt of the max/min
    // SUPPLY ratio (+1 bin for integer floors) — the point of alpha=0.5
    val (minS, maxS) = (rows.map(_._2).min, rows.map(_._2).max)
    val (minR, maxR) = (rows.map(_._4).min, rows.map(_._4).max)
    assert(maxR.toDouble / minR <= math.sqrt(maxS.toDouble / minS) * 1.01 + 1)
  }

  test("pareto: the top-1% share is at least proportional and internally consistent") {
    val r = graft.queries.Events.qEvPareto(spark, sf).collect()(0)
    val nUsers = r.getAs[Long]("n_users"); val nEvents = r.getAs[Long]("n_events")
    val k = r.getAs[Long]("k_target"); val usersSel = r.getAs[Long]("users_sel")
    val eventsSel = r.getAs[Long]("events_sel"); val share = r.getAs[Long]("share_ppm")
    assert(k == (nUsers + 99) / 100 && usersSel >= k)
    assert(share == eventsSel * 1000000L / nEvents)
    // the most active users are at least as active as average: their
    // event share can never be below their user share
    assert(share * nUsers >= usersSel * 1000000L * 99 / 100,
      s"share $share vs user fraction ${usersSel}/${nUsers}")
  }

  test("min-k distinct aggregator equals the distinct+row_number formulation") {
    import SparkTestSession.spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val raw = graft.queries.Dedup.docShinglesSrc(spark, sf)
      .select(col("source"), explode(col("sh")).as("sng"))
      .select(col("source"), graft.functions.TextFunctions.hash60(col("sng")).as("h"))
    val declarative = raw.distinct()
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("h").asc)).cast("long"))
      .filter(col("rk") <= 256).select("source", "h")
      .as[(String, Long)].collect().toSet
    val minK = new graft.functions.MinKDistinctAggregator(256).toColumn
    val algebraic = raw.as[(String, Long)].groupByKey(_._1).mapValues(_._2)
      .agg(minK.name("ks")).toDF("source", "ks")
      .select(col("source"), explode(col("ks")).as("h"))
      .as[(String, Long)].collect().toSet
    assert(algebraic == declarative && algebraic.nonEmpty)
    // duplicate-heavy and tiny-k edge cases
    val tiny = Seq(("a", 5L), ("a", 5L), ("a", 1L), ("a", 9L), ("a", 1L), ("b", 2L))
      .toDF("source", "h").as[(String, Long)].groupByKey(_._1).mapValues(_._2)
      .agg(new graft.functions.MinKDistinctAggregator(2).toColumn.name("ks"))
      .collect().toMap
    assert(tiny("a") == Seq(1L, 5L) && tiny("b") == Seq(2L))
  }

  test("chunk_rag: exact overlap identity and bounded chunk fan-out") {
    // stride-48/window-64 chunking pays exactly 16 overlap tokens per
    // internal boundary: toks_emitted == toks_in + 16 * (n_chunks - n_docs)
    val rows = graft.queries.TrainingData.qChunkRag(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nDocs = r.getAs[Long]("n_docs"); val nCh = r.getAs[Long]("n_chunks")
      val in = r.getAs[Long]("toks_in"); val out = r.getAs[Long]("toks_emitted")
      assert(out == in + 16L * (nCh - nDocs),
        s"${r.getString(0)}: emitted $out != $in + 16*(${nCh}-${nDocs})")
      assert(nCh >= nDocs && r.getAs[Long]("max_chunks") >= 1L)
      // fan-out bound: nc <= nt/48 + 1 summed => n_chunks <= toks_in/48 + n_docs
      assert(nCh <= in / 48L + nDocs)
    }
  }

  test("quality MAD: median and MAD match a brute-force sort per source") {
    import SparkTestSession.spark.implicits._
    val scored = Tables.documents(spark, sf)
      .select(col("source"),
        size(tokens(col("text"))).cast("long").as("nt"),
        size(array_distinct(tokens(col("text")))).cast("long").as("nd"))
      .filter(col("nt") > 0)
      .select(col("source"), expr("(nd * 1000000L) DIV nt").as("score"))
      .as[(String, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2))
    val got = graft.queries.TrainingData.qQualityMad(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == scored.keySet.toSet)
    scored.foreach { case (src, xs) =>
      def lowerMedian(v: Array[Long]): Long = v.sorted.apply((v.length + 1) / 2 - 1)
      val med = lowerMedian(xs)
      val devs = xs.map(x => math.abs(x - med))
      val mad = lowerMedian(devs)
      val r = got(src)
      assert(r.getAs[Long]("med") == med && r.getAs[Long]("mad") == mad,
        s"$src: got (${r.getAs[Long]("med")},${r.getAs[Long]("mad")}) want ($med,$mad)")
      assert(r.getAs[Long]("n_out") == devs.count(_ > 5L * mad))
      assert(r.getAs[Long]("max_dev") == devs.max)
    }
  }

  test("quality deciles: each source splits into 10 ordered, near-equal bins") {
    val rows = graft.queries.TrainingData.qQualityDeciles(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val bySource = rows.groupBy(_._1)
    bySource.foreach { case (src, bins) =>
      assert(bins.length == 10, s"$src has ${bins.length} bins")
      val sorted = bins.sortBy(_._2)
      // ntile balance: bin sizes differ by at most 1
      val sizes = sorted.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$src sizes: ${sizes.mkString(",")}")
      // monotone score ranges across deciles
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a._5 <= b._4 || a._5 <= b._5, s"$src deciles out of order")
      }
    }
  }
}
