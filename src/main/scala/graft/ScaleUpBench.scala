package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical SCALE-UP evidence (round-8, verdict item 4): the 100×
  * claims in the per-query scaladocs rest on plan audits; this main
  * measures them. Two modes:
  *
  * `gen <srcDir> <outDir> <factor>` — synthesize a `factor`× corpus by
  * deterministic self-union-with-reid: every fact table unions `factor`
  * copies with ids shifted by a per-copy stride (join fan-outs and
  * group sizes per key stay constant — the corpus gets WIDER, not
  * denser). Two content transforms keep similarity structure realistic
  * instead of degenerate:
  *  - documents.text gets a per-copy affine-cipher substitution
  *    (lowercase a–z permuted; 312 distinct permutations): lengths,
  *    whitespace, token counts and each copy's INTERNAL near-dup
  *    structure are preserved, while cross-copy shingles are disjoint —
  *    so dedup output scales linearly, like ingesting N disjoint crawl
  *    shards with the same internal duplication rate, rather than
  *    quadratically as a verbatim self-union would (every doc an
  *    N-clone cluster).
  *  - embeddings.embedding gets a per-copy deterministic SIGN FLIP
  *    (v_j -> ±v_j by hash(copy, j)) — a diagonal orthogonal transform,
  *    so every within-copy cosine (the LSH / ANN structure of each
  *    shard) is preserved bit-for-bit while cross-copy cosines
  *    decorrelate to ~N(0, 1/d). (A cyclic rotation was tried first and
  *    REJECTED by measurement: these cluster-structured vectors stay
  *    correlated with their own rotations — cos(v, rot_i(v)) stayed
  *    near-dup-high and the 10× corpus grew 147× the near-dup pairs,
  *    turning the LSH scale run superlinear for a fixture reason, not
  *    an engine reason.)
  *  Dimension tables (region, nation) stay fixed, as dimensions do.
  *
  * `run <dirA> <dirB> <q1,q2,...>` — time each registered query at both
  * scales (1 warm-up + 3 timed runs, per-query p50) and diff the
  * AQE-final join strategies so broadcast→SMJ plan flips are caught,
  * not guessed. Emits one JSON line per query plus a summary line;
  * NOTES_r8 records the table.
  */
object ScaleUpBench {
  private val Stride = 100000000L

  // Affine cipher x -> (a·x + b) mod 26 with a coprime to 26: 312
  // distinct alphabet permutations, so up to 312 copies carry pairwise
  // disjoint shingle vocabularies. (A plain Caesar shift was REJECTED by
  // measurement at factor 100: its period is 26, so copies i and i+26
  // were verbatim-identical and the dedup outputs grew 32× superlinear
  // for a generator reason — caught because the 100× dedup row counts
  // disagreed with the 10× run's exactly-linear growth.)
  private def affine(i: Int): (String, String) = {
    val abc = "abcdefghijklmnopqrstuvwxyz"
    val as = Array(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
    val a = as((i / 26) % as.length)
    val b = i % 26
    (abc, abc.map(c => ('a' + (a * (c - 'a') + b) % 26).toChar))
  }

  private def copyOf(table: String, df: DataFrame, i: Int): DataFrame = {
    val shifted = df.columns.foldLeft(df) { (d, c) =>
      c match {
        case "c_custkey" | "o_orderkey" | "o_custkey" | "l_orderkey" |
             "l_partkey" | "l_suppkey" | "s_suppkey" | "p_partkey" |
             "event_id" | "user_id" | "doc_id" | "vec_id" =>
          d.withColumn(c, col(c) + lit(i * Stride))
        case _ => d
      }
    }
    table match {
      case "documents" =>
        val (from, to) = affine(i)
        shifted.withColumn("text", translate(col("text"), from, to))
      case "embeddings" if i > 0 =>
        shifted.withColumn("embedding", expr(
          s"transform(embedding, (x, j) -> IF(pmod(hash($i, j), 2) = 0, x, -x))"))
      case _ => shifted
    }
  }

  private[graft] def gen(s: SparkSession, src: String, out: String, factor: Int,
      only: Option[Set[String]] = None): Unit = {
    val dims = Set("region", "nation")
    Tables.all.filter(t => only.forall(_.contains(t))).foreach { t =>
      val base = s.read.parquet(s"$src/$t.parquet")
      val scaled =
        if (dims(t)) base
        else (0 until factor).map(i => copyOf(t, base, i)).reduce(_.unionAll(_))
      // one source split per copy is too coarse for the big facts: spread
      // to the session's parallelism so both scales read multi-split
      scaled.repartition(s.sparkContext.defaultParallelism * 2)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"gen $t: ${s.read.parquet(s"$out/$t.parquet").count()} rows")
    }
  }

  /** Multiset of join strategy names in the AQE-final plan. NOTE:
    * `plan.collect` alone is blind under AQE — AdaptiveSparkPlanExec and
    * the QueryStageExec wrappers are LeafExecNodes, so a naive collect
    * sees only the wrapper and reports zero joins (caught by round-8
    * self-review; the detector was silently dead). Descend through both
    * wrapper classes explicitly. */
  private[graft] def joinShape(df: DataFrame): Map[String, Int] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => flatten(q.plan)
      case other => other.children.flatMap(flatten)
    })
    val names = flatten(df.queryExecution.executedPlan)
      .map(_.nodeName).filter(_.contains("Join"))
    names.groupBy(identity).view.mapValues(_.size).toMap
  }

  /** Rows actually broadcast on the BUILD side of every
    * BroadcastNestedLoopJoin in the AQE-final plan (the broadcast
    * exchange's own numOutputRows metric; -1 when the metric is
    * missing so a renamed metric fails the audit loudly instead of
    * passing it silently). Round-14 audit teeth (ADVICE r13): a BNLJ
    * count increase on a PlanHygieneSpec.cartesianOk-allowlisted query
    * is benign only while every build side MEASURES bounded — a
    * genuinely corpus-proportional cross can no longer hide behind the
    * allowlist. */
  private[graft] def bnljBuildRows(df: DataFrame): Seq[Long] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.catalyst.optimizer.BuildLeft
    // ReusedExchangeExec is a LEAF that points at the original exchange
    // via its `child` field: without resolving it, a build side that AQE
    // served from exchange reuse has no numOutputRows anywhere in its
    // visible subtree and the audit read -1 (= "metric missing") for a
    // provably bounded 1-row broadcast (round-15: q_dedup_ppr flaked on
    // exactly this, memo-cache-state-dependent). The original exchange's
    // metric IS the reused side's row count — same broadcast relation.
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => flatten(q.plan)
      case r: ReusedExchangeExec => flatten(r.child)
      case other => other.children.flatMap(flatten)
    })
    flatten(df.queryExecution.executedPlan).collect {
      case j: BroadcastNestedLoopJoinExec =>
        val build = if (j.buildSide == BuildLeft) j.left else j.right
        flatten(build)
          .flatMap(_.metrics.get("numOutputRows").map(_.value))
          .headOption.getOrElse(-1L)
    }
  }

  private def timeQuery(s: SparkSession, name: String, dir: String,
      runs: Int = 3, warm: Boolean = true)
      : (Seq[Double], Long, Map[String, Int]) = {
    val fn = SparkEntry.queries(name)
    var rows = 0L
    var shape = Map.empty[String, Int]
    if (warm) fn(s, dir).collect() // warm-up: memo builds, code cache
    val times = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      val df = fn(s, dir)
      rows = df.collect().length.toLong
      shape = joinShape(df)
      (System.nanoTime() - t0) / 1e6
    }
    (times, rows, shape)
  }

  /** DOCUMENTED-quadratic registry entries (each retained deliberately
    * as the exact/high-recall sibling of a gated sub-quadratic path —
    * see their scaladocs): at the audit's larger scale they are capped
    * to a single unwarmed run so the sweep stays runnable as scales
    * grow (round-10 VERDICT #5). Never silent: the per-query JSON line
    * carries `"capped":true` and the cap halves reps, it does not skip
    * the measurement — wall and AQE-final plan shape are still real. */
  private val QuadraticCapped = Set("q_dedup_embed_lsh", "q_mm_phash",
    // round-12 100x audit: lossless hamming<=3 pigeonholing needs FIXED
    // 4x15-bit bands, so band collisions grow ~n^2/2^15 once cross-shard
    // simhashes decorrelate — measured 211x wall for 10x rows at the
    // 100x decade (SCALEUP_r12_100x.jsonl); q_dedup_minhash (8.6x) and
    // the IVF embedding family are the gated sub-quadratic siblings
    "q_dedup_simhash")

  /** Wall-ratio classifier (round-13, VERDICT-r12 #5): a measured-wall
    * ratio past this threshold at a 10x corpus step is flagged in the
    * per-query JSON line — the same mechanical visibility plan flips
    * get. Linear queries on this harness land 1.6–4x for 10x rows
    * (shared fixed overhead absorbs the rest); 8x is where r12's
    * audit drew the weak line by hand. */
  private val WallFlagRatio = 8.0

  /** DECLARED causes for queries whose >8x walls are structural, so the
    * classifier emits the cause IN the artifact instead of leaving the
    * line for a human to annotate (r12's audit carried named causes
    * only for non-measured entries). A flagged query absent from this
    * map lands in the summary's `unexplained_slow` — the work list the
    * next round must either fix or name here. */
  private val NamedSuperlinear = Map(
    "q_dedup_embed_hier" -> ("the audit corpus's cross-shard 4-sigma " +
      "tail grows OUTPUT pairs superlinearly (same generator property " +
      "as q_dedup_embed_ivf's entry: 61x verified pairs for 10x " +
      "vectors); the hier ASSIGNMENT stage is sqrt(k)-bounded by " +
      "design — strictly cheaper than the flat router's n*k at every " +
      "scale — so the wall past 8x is output- and verify-" +
      "proportional, not routing"),
    "q_dedup_embed_ivf" -> ("two named components on top of the " +
      "linear candidate stage (measured 10.1x pre-distinct for 10x " +
      "rows, SCALEUP_r13): flat top-nprobe assignment is n*k = n^2/C " +
      "cosines (x100 per decade — the scaladoc's documented ~1e8-" +
      "vector boundary for flat scoring), and the audit corpus's " +
      "cross-shard 4-sigma tail grows OUTPUT pairs superlinearly " +
      "(2538 -> 155502 = 61x for 10x vectors, a generator property " +
      "the r9 gen notes document, not an engine property)"),
    "q_text_tri" -> ("token-pair co-occurrence volume: distinct " +
      "support-pruned pairs grow superlinearly as shard vocabularies " +
      "cross; bounded by the support threshold, not by n"),
    "q_dedup_embed_incr" -> ("per-arrival candidate volume grows as " +
      "sqrt(n_hist): the flat incremental index keeps sqrt-cells (the " +
      "streaming gate's collected centroid literal must stay bounded) " +
      "so each probed cell's list is m_i*sqrt(n_hist) rows; output " +
      "pairs also grow ~62x for 10x vectors (generator 4-sigma tail). " +
      "q_dedup_embed_incr_hier removes the sqrt growth (constant-size " +
      "cells behind a two-level router)"),
    // q_dedup_embed_incr_hier's entry was REMOVED in round 14 (the
    // flat-build cause was fixed by routing; 19.3x -> 3.49x at 100x)
    // with the contract that any re-flag must be re-diagnosed, not
    // auto-excused. Round 15 re-flagged it at the NEXT decade
    // (100x -> 1000x cold: 41.6 s -> 609 s = 14.6x) and this entry is
    // that diagnosis, with measured decomposition:
    "q_dedup_embed_incr_hier" -> ("two DESIGNED superlinear components " +
      "at the 1000x decade, both measured (SCALEUP_r15): OUTPUT pairs " +
      "grow 50.1x for 10x vectors (57,569 -> 2,882,700 — the " +
      "generator's cross-shard 4-sigma tail, the same property named " +
      "on q_dedup_embed_ivf), and the routed index BUILD grows " +
      "Theta(n^1.5/sqrt(C)) = 31.7x/decade on cosines (the declared " +
      "level-2 tier; third level documented past " +
      "IvfHierLevel2MaxHistVectors). The 14.6x total sits BELOW both " +
      "named components; per-ARRIVAL probe cost stays flat by design"),
    "q_stream_embeddedup" -> ("per-batch probes join a history index " +
      "whose cell size grows as sqrt(n_hist) (the FLAT incremental " +
      "path keeps sqrt-cells so the streaming gate's collected " +
      "centroid literal stays bounded); per-arrival candidate volume " +
      "grows with history — q_stream_embeddedup_hier is the gated " +
      "scale sibling: it collects only the sqrt(k) level-1 group " +
      "centroids, so its history index keeps CONSTANT-size cells and " +
      "per-arrival cost stays flat (round 13)"),
    "q_stream_linededup" -> ("chunk-key dedup state is proportional " +
      "to distinct line-chunk history — 10x corpus means 10x state " +
      "the micro-batch engine rehydrates"),
    "q_stream_sessions" -> ("sessionization state proportional to " +
      "active users; the widened corpus carries 10x users so state " +
      "store churn grows with it"))

  def main(args: Array[String]): Unit = {
    val s = GraftSession.local()
    s.sparkContext.setLogLevel("ERROR")
    args.toList match {
      case "gen" :: src :: out :: factor :: Nil =>
        gen(s, src, out, factor.toInt)
      case "gen" :: src :: out :: factor :: tables :: Nil =>
        // partial-corpus generation (round 13): deep-decade audits of
        // one family (e.g. a 1000x embeddings corpus for candvol /
        // incrrecall) need only that family's tables — generating the
        // full 1000x fact set would be hours of parquet nobody reads
        gen(s, src, out, factor.toInt, Some(tables.split(",").map(_.trim).toSet))
      case "run" :: dirA :: dirB :: names :: rest if rest.isEmpty || rest == List("--once") =>
        // "all" = the full registry — the round-9 audit shape: every
        // gated query's AQE-final plan diffed at both scales, dangerous
        // flips asserted MECHANICALLY (summary line), not by sampling.
        // `--once` (round-12, for the 100x audit): a single COLD run per
        // query at both scales — at two decades up the p50-of-3 protocol
        // quadruples a multi-hour sweep for precision the flip detector
        // does not need; the JSON lines carry "once":true so walls from
        // the two protocols are never silently compared.
        val once = rest.nonEmpty
        val qs =
          if (names == "all") SparkEntry.queries.keys.toSeq.sorted
          else names.split(",").toSeq
        val dangerous = scala.collection.mutable.ArrayBuffer[String]()
        val flipped = scala.collection.mutable.ArrayBuffer[String]()
        val unexplainedSlow = scala.collection.mutable.ArrayBuffer[String]()
        val wallFlagged = scala.collection.mutable.ArrayBuffer[String]()
        qs.foreach { q =>
          val capped = QuadraticCapped(q)
          val (ta, rowsA, shapeA) =
            if (once) timeQuery(s, q, dirA, runs = 1, warm = false)
            else timeQuery(s, q, dirA)
          val (tb, rowsB, shapeB) =
            if (capped || once) timeQuery(s, q, dirB, runs = 1, warm = false)
            else timeQuery(s, q, dirB)
          def p50(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
          val ratio = p50(tb) / p50(ta)
          val wallTag =
            if (ratio <= WallFlagRatio) ""
            else {
              wallFlagged += q
              NamedSuperlinear.get(q) match {
                case Some(cause) => s""","wall_flag":true,"wall_cause":"$cause""""
                case None => unexplainedSlow += q
                  ""","wall_flag":true,"wall_cause":"UNEXPLAINED""""
              }
            }
          val capTag = (if (capped) ""","capped":true""" else "") +
            (if (once) ""","once":true""" else "")
          val flip = if (shapeA == shapeB) "" else s""","plan_flip":"$shapeA -> $shapeB""""
          if (shapeA != shapeB) flipped += q
          // The dangerous direction is a BROADCAST-class join APPEARING
          // (or multiplying) at the LARGER scale: a corpus-proportional
          // side AQE decides to pin in memory. Broadcast->SMJ (count
          // decreasing) is the correct threshold transition; equal
          // shapes are no flip at all.
          def bcast(m: Map[String, Int]): Int =
            m.filter { case (k, _) => k.contains("Broadcast") }.values.sum
          if (bcast(shapeB) > bcast(shapeA)) dangerous += q
          println(f"""{"query":"$q","a_ms":${p50(ta)}%.0f,"b_ms":${p50(tb)}%.0f,""" +
            f""""ratio":$ratio%.2f,"rows_a":$rowsA,"rows_b":$rowsB$capTag$flip$wallTag}""")
        }
        def jarr(xs: Seq[String]): String =
          if (xs.isEmpty) "[]" else xs.sorted.mkString("[\"", "\",\"", "\"]")
        println(s"""{"summary":true,"n_queries":${qs.size},""" +
          s""""n_flipped":${flipped.size},"flipped":${jarr(flipped.toSeq)},""" +
          s""""n_dangerous":${dangerous.size},"dangerous":${jarr(dangerous.toSeq)},""" +
          s""""n_wall_flagged":${wallFlagged.size},"wall_flagged":${jarr(wallFlagged.toSeq)},""" +
          s""""unexplained_slow":${jarr(unexplainedSlow.toSeq)}}""")
      case "isolate" :: dir :: names :: rest if rest.size <= 1 =>
        // Isolated per-query p50/p90 (round-14, VERDICT-r13 #4): the
        // bench artifact measures every query inside a 238-query sweep,
        // where a flagged 1.3x can be accumulated-JVM-state noise rather
        // than a plan regression (r13: one paired run read 73 s where
        // the isolated run read 15.5 s from post-batch heap state).
        // This mode is the tie-breaker: fresh-session, one query family
        // at a time, warm-up + N timed runs, p50/p90/min/max printed as
        // one JSON line per query — the protocol a twice-flagged bench
        // diff is settled against before bisecting code. NOTE (ADVICE
        // r14): a comma list shares one SparkSession+JVM across the
        // named queries — fine for a quick sweep, but the TIE-BREAKER
        // protocol is one name per invocation (fresh JVM each), since
        // accumulated session state is exactly the noise being excluded.
        val reps = rest.headOption.map { r =>
          val n = try r.toInt catch {
            case _: NumberFormatException =>
              System.err.println(s"isolate: reps must be an integer >= 1, got '$r'")
              sys.exit(2)
          }
          if (n < 1) {
            System.err.println(s"isolate: reps must be >= 1, got $n")
            sys.exit(2)
          }
          n
        }.getOrElse(9)
        names.split(",").map(_.trim).foreach { q =>
          val (ts, rows, _) = timeQuery(s, q, dir, runs = reps)
          val sorted = ts.sorted
          def pct(p: Double) =
            sorted(math.min(sorted.size - 1, (p * sorted.size).toInt))
          println(f"""{"isolate":"$q","dir":"$dir","runs":$reps,""" +
            f""""p50_ms":${pct(0.5)}%.0f,"p90_ms":${pct(0.9)}%.0f,""" +
            f""""min_ms":${sorted.head}%.0f,"max_ms":${sorted.last}%.0f,""" +
            f""""rows":$rows}""")
        }
      case "recall" :: dir :: rest if rest.size <= 1 =>
        // FULL-corpus IVF pair recall (round-10 VERDICT #3): the brute
        // exact denominator over the whole audit corpus vs the memoized
        // gated IVF pair set — one JSON line for SCALEUP_r*.jsonl, so a
        // recall regression is as visible round-to-round as a plan flip.
        // Round-12 (VERDICT #1): the default-width line is ASSERTED
        // against the declared floor — the run exits nonzero when the
        // index quality regresses, instead of just recording it. An
        // optional width list measures off-default economics (never
        // floor-asserted: the floor is a property of the SHIPPED width).
        val widths = rest.headOption
          .map(_.split(",").map(_.trim.toInt).toSeq)
          .getOrElse(Seq(-1)) // -1 = the shipped default width
        val floor = graft.queries.Dedup.IvfFullRecallFloorPpm
        var failed = false
        widths.foreach { w =>
          val t0 = System.nanoTime()
          val row = (if (w < 0) graft.queries.Dedup.ivfFullRecall(s, dir)
                     else graft.queries.Dedup.ivfFullRecall(s, dir, w)).collect()(0)
          // spelling the shipped width out ("recall dir 6") is the same
          // measurement as the argument-less form and must not dodge the
          // floor — key the assertion on the RESOLVED width, not syntax
          val isDefault = w < 0 || w == graft.queries.Dedup.IvfDedupNProbe
          val pass = !isDefault || row.getLong(2) >= floor
          if (!pass) failed = true
          val widthTag = if (isDefault) "" else s""","nprobe":$w"""
          val floorTag =
            if (isDefault) s""","floor_ppm":$floor,"pass":$pass""" else ""
          println(f"""{"full_recall":true,"dir":"$dir"$widthTag,""" +
            f""""n_exact":${row.getLong(0)},"n_hit":${row.getLong(1)},""" +
            f""""recall_ppm":${row.getLong(2)}$floorTag,""" +
            f""""wall_ms":${(System.nanoTime() - t0) / 1e6}%.0f}""")
        }
        // the HIERARCHICAL router's line (round 13) rides the default
        // invocation — same brute denominator, its own declared floor —
        // so a quiet level-1 geometry regression fails this run exactly
        // like a fine-cell regression does. Width sweeps skip it (the
        // hier floor is a property of the shipped knobs only).
        if (widths == Seq(-1)) {
          val hierFloor = graft.queries.Dedup.IvfHierFullRecallFloorPpm
          val t0 = System.nanoTime()
          val row = graft.queries.Dedup.hierFullRecall(s, dir).collect()(0)
          val pass = row.getLong(2) >= hierFloor
          if (!pass) failed = true
          println(f"""{"full_recall":true,"variant":"hier","dir":"$dir",""" +
            f""""n_exact":${row.getLong(0)},"n_hit":${row.getLong(1)},""" +
            f""""recall_ppm":${row.getLong(2)},"floor_ppm":$hierFloor,"pass":$pass,""" +
            f""""wall_ms":${(System.nanoTime() - t0) / 1e6}%.0f}""")
          // round-13 continuation: the INCREMENTAL hier router's floor —
          // TRUE recall against the bounded exact cross-slice denominator
          // (incrRecallOf) at the shipped knobs, so a quiet regression of
          // the constant-cell index, the disjoint group map, or the
          // per-group cut fails the round exactly like the pair-path
          // floors do
          val incrFloor = graft.queries.Dedup.IvfIncrHierRecallFloorPpm
          val t1 = System.nanoTime()
          val rowI = graft.queries.Dedup.incrRecallOf(s, dir,
            graft.queries.Dedup.qDedupEmbedIncrHier(s, dir), 500L).collect()(0)
          val passI = rowI.getLong(2) >= incrFloor
          if (!passI) failed = true
          println(f"""{"incr_recall":true,"variant":"hier","dir":"$dir","cap":500,""" +
            f""""n_exact":${rowI.getLong(0)},"n_hit":${rowI.getLong(1)},""" +
            f""""recall_ppm":${rowI.getLong(2)},"floor_ppm":$incrFloor,"pass":$passI,""" +
            f""""wall_ms":${(System.nanoTime() - t1) / 1e6}%.0f}""")
        }
        if (failed) {
          System.err.println("FULL-CORPUS RECALL BELOW DECLARED FLOOR")
          s.stop()
          sys.exit(1)
        }
      case "candvol" :: dirs :: Nil =>
        // IVF candidate-volume LINEARITY line (round-13, VERDICT-r12
        // #1's done-criterion): per corpus, n, the cell count k the
        // constant-cell quantizer picked, and the DEDUPLICATED candidate
        // count entering the verify join — across a 10x corpus step the
        // ratio should read ~10x (the sqrt geometry read ~31-39x and
        // died at the 100x decade). One JSON line per dir; cheap enough
        // to run at the 100x corpus because it never materializes the
        // verify join, only the candidate count.
        dirs.split(",").foreach { dir =>
          import graft.queries.Dedup
          val n = s.read.parquet(s"$dir/embeddings.parquet").count()
          val k = math.max((n + Dedup.IvfTargetCellSize - 1) / Dedup.IvfTargetCellSize, 1L)
          val t0 = System.nanoTime()
          // pre-distinct = per-cell sum C(pop, 2) over the probe relation
          // (the spill volume of the pair self-join — the quantity whose
          // 1.61e9 killed the r12 box); distinct = the verify-join input
          val preDistinct = Dedup.ivfProbePairVolume(s, dir)
          val cand = Dedup.ivfCandidates(s, dir).count()
          println(f"""{"candvol":true,"dir":"$dir","n_vectors":$n,"k_cells":$k,""" +
            f""""pre_distinct_candidates":$preDistinct,"cand_pairs":$cand,""" +
            f""""per_vector":${cand.toDouble / n}%.1f,""" +
            f""""wall_ms":${(System.nanoTime() - t0) / 1e6}%.0f}""")
          // the HIERARCHICAL router's volume line (round 13): same
          // metrics over hierProbes — the wall here isolates the
          // two-level assignment because the (v, c1) base is already
          // memoized by the flat line above
          val t1 = System.nanoTime()
          val hp = Dedup.hierProbes(s, dir)
          val hPre = Dedup.probePairVolumeOf(hp)
          val hCand = Dedup.candidatesOf(hp).count()
          println(f"""{"candvol":true,"variant":"hier","dir":"$dir","n_vectors":$n,"k_cells":$k,""" +
            f""""pre_distinct_candidates":$hPre,"cand_pairs":$hCand,""" +
            f""""per_vector":${hCand.toDouble / n}%.1f,""" +
            f""""wall_ms":${(System.nanoTime() - t1) / 1e6}%.0f}""")
        }
      case "phashvol" :: dirs :: Nil =>
        // q_mm_phash band-bucket candidate volume per corpus decade
        // (round-16, VERDICT-r15 #5): the 16-bit aHash's 4x16 = 64 band
        // buckets collide densely, so the candidate stream entering the
        // hamming verify grows ~quadratically per bucket. Per dir: doc
        // count, Σ_bucket C(pop, 2) (= the band-join output rows — the
        // quantity the exchange/verify must absorb), the post-hamming
        // match rows (what the distinct's exchange actually carries
        // since the r15 filter-before-distinct ordering), and the final
        // distinct pairs. One JSON line per dir; never materializes the
        // join wider than a count.
        import org.apache.spark.sql.functions.{col, count, expr, lit, sum}
        dirs.split(",").foreach { dir =>
          val n = s.read.parquet(s"$dir/documents.parquet").count()
          val bands = graft.queries.Multimodal.phashBands(s, dir)
            .localCheckpoint(true)
          val t0 = System.nanoTime()
          val pre = bands.groupBy(col("band"), col("nib"))
            .agg(count(lit(1)).as("c"))
            .agg(sum(expr("c * (c - 1) DIV 2")).as("p"))
            .first().getLong(0)
          val matches = bands.as("x").join(bands.as("y"),
              col("x.band") === col("y.band") && col("x.nib") === col("y.nib") &&
              col("x.doc_id") < col("y.doc_id"))
            .filter(expr("CAST(bit_count(x.ah ^ y.ah) AS LONG)") <= 3)
            .count()
          val dist = graft.queries.Multimodal.qMmPhash(s, dir).count()
          println(f"""{"phashvol":true,"dir":"$dir","n_docs":$n,""" +
            f""""band_candidates":$pre,"hamming_matches":$matches,""" +
            f""""distinct_pairs":$dist,"cand_per_doc":${pre.toDouble / n}%.2f,""" +
            f""""wall_ms":${(System.nanoTime() - t0) / 1e6}%.0f}""")
        }
      case "recall100" :: dir :: Nil =>
        // 100x-DECADE floor assert for the incremental hier router
        // (round 14, VERDICT-r13 #2): true recall at the shipped knobs
        // against the bounded exact denominator on the 100x corpus,
        // asserted against IvfIncrHier100xRecallFloorPpm — the decade
        // where level-1 routing genuinely bites (g > w1). Runs ONLY
        // the hier variant (the flat path at this decade is the slow
        // documented-sqrt tier; its number is recorded by the full
        // incrrecall sweep, not re-paid per round-gate).
        import graft.queries.Dedup
        val floor100 = Dedup.IvfIncrHier100xRecallFloorPpm
        val t0 = System.nanoTime()
        val pairs = Dedup.qDedupEmbedIncrHier(s, dir)
        val nPairs = pairs.count()
        val row = Dedup.incrRecallOf(s, dir, pairs, 500L).collect()(0)
        val pass = row.getLong(2) >= floor100
        println(f"""{"incr_recall":true,"variant":"hier","dir":"$dir","cap":500,""" +
          f""""n_exact":${row.getLong(0)},"n_hit":${row.getLong(1)},""" +
          f""""recall_ppm":${row.getLong(2)},"out_pairs":$nPairs,""" +
          f""""floor_ppm":$floor100,"pass":$pass,""" +
          f""""wall_ms":${(System.nanoTime() - t0) / 1e6}%.0f}""")
        if (!pass) {
          System.err.println("100x INCREMENTAL RECALL BELOW DECLARED FLOOR")
          s.stop()
          sys.exit(1)
        }
      case "incrrecall" :: dir :: rest0 if rest0.size <= 3 =>
        // `hieronly` skips the flat variant — the deep-decade audits
        // (1000x) exist to measure the SCALE path; the flat tier's
        // sqrt-cell probe volume at that decade is the documented wall
        // the hier family replaces, not a measurement worth hours.
        val hierOnly = rest0.contains("hieronly")
        val rest = rest0.filterNot(_ == "hieronly")
        // TRUE recall of BOTH incremental routers against the exact
        // cross-slice pair set on a bounded per-shard id slice (round
        // 13): the hierroute retention line can only compare the two
        // approximations against each other — at the 100x corpus they
        // diverge (both probe different cells), so the decisive
        // question is recall against TRUTH, which this bounded
        // denominator affords at any corpus size. An optional t list
        // sweeps the per-group cell budget's recall economics
        // (candidate volume grows linearly in t; each off-default line
        // also counts the verified pairs so cost rides the artifact).
        import graft.queries.Dedup
        val cap = rest.headOption.map(_.trim.toLong).getOrElse(500L)
        val ts = rest.drop(1).headOption
          .map(_.split(",").map(_.trim.toInt).toSeq)
          .getOrElse(Seq(-1)) // -1 = shipped default
        val variants: Seq[(String, Int => org.apache.spark.sql.DataFrame)] = Seq(
          ("flat", (_: Int) => Dedup.qDedupEmbedIncr(s, dir)),
          ("hier", (t: Int) =>
            if (t < 0) Dedup.qDedupEmbedIncrHier(s, dir)
            else Dedup.qDedupEmbedIncrHier(s, dir, t = t))
        )
        variants.filter(v => !hierOnly || v._1 == "hier").foreach { case (variant, mk) =>
          val widths = if (variant == "flat") Seq(-1) else ts
          widths.foreach { t =>
            val t0 = System.nanoTime()
            val pairs = mk(t)
            val nPairs = pairs.count()
            val row = Dedup.incrRecallOf(s, dir, pairs, cap).collect()(0)
            val tTag = if (t < 0) "" else s""","t":$t"""
            println(f"""{"incr_recall":true,"variant":"$variant"$tTag,"dir":"$dir","cap":$cap,""" +
              f""""n_exact":${row.getLong(0)},"n_hit":${row.getLong(1)},""" +
              f""""recall_ppm":${row.getLong(2)},"out_pairs":$nPairs,""" +
              f""""wall_ms":${(System.nanoTime() - t0) / 1e6}%.0f}""")
          }
        }
      case "incrsweep" :: dir :: cap :: combos :: Nil =>
        // JOINT w1/m_i/m_g SWEEP at a deep decade (round 15, VERDICT-r14
        // #5): w1 (probed level-1 groups), m_i (inverted-list
        // multi-assignment) and m_g (cell->group multi-assignment) were
        // 10x-anchored; this measures their recall economics where
        // routing genuinely bites. Combos are `w1,mi[,mg]` triples
        // separated by `;` (mg defaults to the shipped 1). Each line
        // carries the arithmetic candidate-cost multiplier vs the
        // shipped knobs ((w1*mi)/(8*4); per-arrival candidates are
        // w1*t*mi*C-shaped, mg multiplies stage-2 map rows) plus the
        // measured verified-pair count and wall. mi/mg change the
        // INDEX, so those combos pay a fresh routed build; w1-only
        // variations reuse the session-cached index.
        import graft.queries.Dedup
        combos.split("[;+]").map(_.trim).filter(_.nonEmpty).foreach { c =>
          val parts = c.split(",").map(_.trim.toInt)
          require(parts.length >= 2 && parts.length <= 3 && parts.forall(_ >= 1),
            s"combo must be w1,mi[,mg] with all >= 1: '$c'")
          val (w1, mi) = (parts(0), parts(1))
          val mg = if (parts.length == 3) parts(2) else 1
          val t0 = System.nanoTime()
          val pairs = Dedup.qDedupEmbedIncrHier(s, dir, w1 = w1, mi = mi, mg = mg)
          val nPairs = pairs.count()
          val row = Dedup.incrRecallOf(s, dir, pairs, cap.toLong).collect()(0)
          val cost = (w1 * mi) / 32.0
          println(f"""{"incr_sweep":true,"dir":"$dir","w1":$w1,"mi":$mi,"mg":$mg,""" +
            f""""cap":${cap.toLong},"cost_x":$cost%.3f,""" +
            f""""n_exact":${row.getLong(0)},"n_hit":${row.getLong(1)},""" +
            f""""recall_ppm":${row.getLong(2)},"out_pairs":$nPairs,""" +
            f""""wall_ms":${(System.nanoTime() - t0) / 1e6}%.0f}""")
        }
      case "hierroute" :: dir :: Nil =>
        // LEVEL-1 ROUTING RETENTION (round 13): what fraction of the
        // FLAT router's verified pair set the hierarchical router
        // retains at a given corpus — isolates the two-level routing
        // loss exactly (identical fine cells, identical verify) without
        // the O(n²) brute denominator, so it is affordable at the 100x
        // corpus where the hierarchy actually bites (g = 32 groups,
        // w1 = 8 probed) and the brute recall line is not.
        import graft.queries.Dedup
        val t0 = System.nanoTime()
        val flat = Dedup.qDedupEmbedIvf(s, dir).select("vec_a", "vec_b")
        val hier = Dedup.qDedupEmbedHier(s, dir).select("vec_a", "vec_b")
        val nFlat = flat.count()
        val nHier = hier.count()
        val nBoth = flat.intersect(hier).count()
        println(f"""{"hier_route":true,"dir":"$dir","flat_pairs":$nFlat,""" +
          f""""hier_pairs":$nHier,"retained":$nBoth,""" +
          f""""retained_ppm":${if (nFlat == 0) 1000000L else nBoth * 1000000L / nFlat},""" +
          f""""wall_ms":${(System.nanoTime() - t0) / 1e6}%.0f}""")
        // the INCREMENTAL family's twin (round 13): retention of the
        // two-level incremental router's verified pair set vs the flat
        // incremental path's — the flat path is the semantic anchor
        // (its index probes all k cells), so this line isolates what
        // the constant-cell + level-1 routing approximation costs at a
        // corpus where it bites
        val t1 = System.nanoTime()
        val fi = Dedup.qDedupEmbedIncr(s, dir).select("new_vec", "hist_vec")
        val hi = Dedup.qDedupEmbedIncrHier(s, dir).select("new_vec", "hist_vec")
        val nFi = fi.count()
        val nHi = hi.count()
        val nBi = fi.intersect(hi).count()
        println(f"""{"hier_route":true,"variant":"incr","dir":"$dir","flat_pairs":$nFi,""" +
          f""""hier_pairs":$nHi,"retained":$nBi,""" +
          f""""retained_ppm":${if (nFi == 0) 1000000L else nBi * 1000000L / nFi},""" +
          f""""wall_ms":${(System.nanoTime() - t1) / 1e6}%.0f}""")
      case "nprobe" :: dir :: widths :: Nil =>
        // Cost/recall economics of the IVF probe-width knob, measured:
        // per width, the deduplicated candidate volume (the quantity that
        // enters the verify join), the verified output pairs, the recall
        // vs the bounded exact slice (qIvfRecall's denominator), and TWO
        // walls (round-10 ADVICE: the memoized front hid the component
        // whose cost actually grows with nprobe): `cold_ms` is the first
        // run — quantizer training + probe materialization + pair join —
        // and `wall_ms` is the p50 of 3 warm runs, covering only the
        // pair join + verify stage against the memoized front. One JSON
        // line per width — NOTES records the table.
        widths.split(",").map(_.trim.toInt).foreach { np =>
          import graft.queries.Dedup
          val t0c = System.nanoTime()
          Dedup.qDedupEmbedIvf(s, dir, np).count() // cold: trains + probes + joins
          val coldMs = (System.nanoTime() - t0c) / 1e6
          val cand = Dedup.ivfCandidates(s, dir, np).count()
          val times = (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            Dedup.qDedupEmbedIvf(s, dir, np).count()
            (System.nanoTime() - t0) / 1e6
          }
          val out = Dedup.qDedupEmbedIvf(s, dir, np).count()
          val rec = Dedup.ivfRecallOf(s, dir, Dedup.qDedupEmbedIvf(s, dir, np))
            .collect()(0)
          println(f"""{"nprobe":$np,"cand_pairs":$cand,"out_pairs":$out,""" +
            f""""cold_ms":$coldMs%.0f,"wall_ms":${times.sorted.apply(1)}%.0f,""" +
            f""""n_exact":${rec.getLong(0)},"n_hit":${rec.getLong(1)},""" +
            f""""recall_ppm":${rec.getLong(2)}}""")
        }
      case _ =>
        System.err.println("usage: gen <src> <out> <factor> [tables] | run <dirA> <dirB> <q1,q2,...> [--once] | isolate <dir> <q1,q2,...> [reps] | recall <dir> [w1,w2] | recall100 <dir> | nprobe <dir> <w1,w2,...> | candvol <dir1,dir2,...> | hierroute <dir> | incrrecall <dir> [cap] [t1,t2,...] [hieronly] | incrsweep <dir> <cap> <w1,mi[;w1,mi...]>")
        sys.exit(2)
    }
    s.stop()
  }
}
