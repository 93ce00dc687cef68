package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence of the native Catalyst expressions against
  * independent plain-Scala models, evaluated THROUGH Spark (DataFrame →
  * codegen) so the generated Java — not just nullSafeEval — is what's
  * checked. Inputs are seeded-random (300 rows each, collision-rich
  * alphabets, zero vectors, length mismatches, empties) to cover the edge
  * shapes the corpus fixtures never produce. */
class NativeExprsPropSpec extends AnyFunSuite {
  import SparkTestSession._

  private val rnd = new scala.util.Random(42)

  test("ArrayCosine codegen equals the sequential-accumulation model bit-for-bit") {
    import spark.implicits._
    val rows = Seq.fill(300) {
      val n = rnd.nextInt(8) + 1
      val mk = () => Seq.fill(n)(
        if (rnd.nextInt(10) == 0) 0.0 else rnd.nextDouble() * 20 - 10)
      (mk(), mk())
    }
    val got = rows.toDF("a", "b")
      .select(org.apache.spark.sql.graft.NativeExprs.arrayCosine($"a", $"b"))
      .collect().map(_.getDouble(0))
    rows.zip(got).foreach { case ((a, b), g) =>
      val n = math.min(a.length, b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      (0 until n).foreach { i =>
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      }
      val want = dot / math.sqrt(na * nb)
      assert(java.lang.Double.doubleToLongBits(want) ==
             java.lang.Double.doubleToLongBits(g),
        s"cosine($a, $b): want $want got $g")
    }
  }

  test("ArrayLongSqL2 codegen equals the min-length loop model on random vectors") {
    import spark.implicits._
    val rows = Seq.fill(300) {
      val mk = () => Seq.fill(rnd.nextInt(8) + 1)(rnd.nextLong() % 100000L)
      (mk(), mk()) // independent lengths: exercises the min-length contract
    }
    val got = rows.toDF("a", "b")
      .select(org.apache.spark.sql.graft.NativeExprs.arrayLongSqL2($"a", $"b"))
      .collect().map(_.getLong(0))
    rows.zip(got).foreach { case ((a, b), g) =>
      val n = math.min(a.length, b.length)
      val want = (0 until n).map { i => val d = a(i) - b(i); d * d }.sum
      assert(want == g, s"sqL2($a, $b)")
    }
  }

  test("ArrayIntersectSize codegen equals the membership-count model (dups included)") {
    import spark.implicits._
    val alpha = Vector("a", "b", "c", "d", "e") // small alphabet: dense collisions
    val rows = Seq.fill(300) {
      val mk = () => Seq.fill(rnd.nextInt(10))(alpha(rnd.nextInt(alpha.length)))
      (mk(), mk())
    }
    val got = rows.toDF("a", "b")
      .select(org.apache.spark.sql.graft.NativeExprs.arrayIntersectSize($"a", $"b"))
      .collect().map(_.getLong(0))
    rows.zip(got).foreach { case ((a, b), g) =>
      val want = b.count(a.toSet.contains).toLong
      assert(want == g, s"intersectSize($a, $b): want $want got $g")
    }
  }

  test("TokenShingles equals the sliding-window distinct model on messy whitespace") {
    import spark.implicits._
    val words = Vector("x", "yy", "zzz", "w", "v")
    val rows = Seq.fill(300) {
      val n = rnd.nextInt(8)
      val seps = Vector(" ", "  ", "\t", " \t ")
      Seq.fill(n)(words(rnd.nextInt(words.length)))
        .mkString(seps(rnd.nextInt(seps.length))) +
        (if (rnd.nextBoolean()) " " else "")
    }
    val got = rows.toDF("text")
      .select(org.apache.spark.sql.graft.NativeExprs.tokenShingles($"text", 3))
      .collect().map(_.getSeq[String](0))
    rows.zip(got).foreach { case (t, g) =>
      val toks = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val want =
        if (toks.length < 3) Seq.empty[String]
        else toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
      assert(want.toSet == g.toSet && g.distinct.length == g.length,
        s"shingles('$t'): want $want got $g")
    }
  }

  test("RepetitionStats equals the HOF executable spec AND a plain-Scala model") {
    import spark.implicits._
    // collision-rich alphabet so top/rep counts are exercised hard;
    // messy whitespace so tokenization edge cases ride along
    val words = Vector("a", "b", "ab", "ccc", "a") // duplicate entry: extra skew
    val rows = Seq.fill(300) {
      val n = rnd.nextInt(12)
      val seps = Vector(" ", "  ", "\t")
      (rnd.nextLong().abs,
        Seq.fill(n)(words(rnd.nextInt(words.length)))
          .mkString(seps(rnd.nextInt(seps.length))))
    }
    val docs = rows.toDF("doc_id", "text")
    val key = (r: org.apache.spark.sql.Row) => r.getLong(0)
    val native = graft.queries.TextAnalysis.repetitionColsPerRow(docs)
      .collect().map(r => key(r) -> r.toSeq.drop(1)).toMap
    val hof = graft.queries.TextAnalysis.repetitionColsPerRowHof(docs)
      .select("doc_id", "n_tokens", "top_tok_count", "rep_tokens",
        "rep_ppm", "top_bigram_count")
      .collect().map(r => key(r) -> r.toSeq.drop(1)).toMap
    assert(native.keySet == hof.keySet)
    native.foreach { case (id, got) =>
      assert(got == hof(id), s"doc $id: native $got vs hof ${hof(id)}")
    }
    // independent model (not Spark): per-doc token/bigram hash counts
    checkRepetitionModel(rows, native)
  }

  private def checkRepetitionModel(rows: Seq[(Long, String)],
      native: Map[Long, Seq[Any]]): Unit = {
    rows.foreach { case (id, text) =>
      val toks = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      if (toks.nonEmpty) {
        val tc = toks.groupBy(identity).map(_._2.length)
        val bgs = if (toks.length >= 2)
          toks.sliding(2).map(_.mkString(" ")).toSeq else Seq.empty
        val bc = bgs.groupBy(identity).map(_._2.length)
        val want = Seq(toks.length.toLong, tc.max.toLong,
          tc.filter(_ >= 2).sum.toLong,
          tc.filter(_ >= 2).sum.toLong * 1000000L / toks.length,
          if (bc.isEmpty) 0L else bc.max.toLong)
        assert(native(id) == want, s"doc $id ('$text'): native ${native(id)} vs model $want")
      } else assert(!native.contains(id))
    }
  }

  test("TokenNgrams (bigramsOf) equals the HOF spec AND a sliding-window model") {
    import spark.implicits._
    val words = Vector("x", "yy", "zzz", "w")
    val rows = Seq.fill(300) {
      val nTok = rnd.nextInt(8)
      val seps = Vector(" ", "  ", "\t", " \t ")
      (rnd.nextLong().abs,
        (if (rnd.nextBoolean()) " " else "") +
          Seq.fill(nTok)(words(rnd.nextInt(words.length)))
            .mkString(seps(rnd.nextInt(seps.length))))
    }
    val docs = rows.toDF("doc_id", "text")
    def collectPairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val native = collectPairs(graft.queries.TrainingData.bigramsOf(docs))
    val hof = collectPairs(graft.queries.TrainingData.bigramsOfHof(docs))
    assert(native == hof, s"native $native vs hof $hof")
    rows.foreach { case (id, text) =>
      val toks = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val want = if (toks.length < 2) Seq.empty
        else toks.sliding(2).map(_.mkString(" ")).toSeq
      assert(native.getOrElse(id, Seq.empty) == want,
        s"doc $id ('$text'): ${native.getOrElse(id, Seq.empty)} vs model $want")
    }
  }

  test("arrayIntersectSizeOnce equals the default form and stays out of join conditions") {
    import spark.implicits._
    import org.apache.spark.sql.graft.NativeExprs
    val alpha = Vector("a", "b", "c", "d", "e")
    val rows = Seq.fill(200) {
      val mk = () => Seq.fill(rnd.nextInt(10))(alpha(rnd.nextInt(alpha.length)))
      (mk(), mk())
    }
    val df = rows.toDF("a", "b")
    val plain = df.select(NativeExprs.arrayIntersectSize($"a", $"b")).collect().map(_.getLong(0))
    val once = df.select(NativeExprs.arrayIntersectSizeOnce($"a", $"b")).collect().map(_.getLong(0))
    assert(plain.toSeq == once.toSeq)
    // the whole point (guide §4.4): in the dedup verify shape the once
    // form is computed in ONE project and never cloned into the join
    // condition — the default form gets inlined there twice
    val l = rows.zipWithIndex.map { case ((a, _), i) => (i.toLong, a) }.toDF("k", "sha")
    val r = rows.zipWithIndex.map { case ((_, b), i) => (i.toLong, b) }.toDF("k", "shb")
    val verify = l.join(r, "k")
      .withColumn("i", NativeExprs.arrayIntersectSizeOnce($"sha", $"shb"))
      .filter($"i" * 5 >= (size($"sha") + size($"shb")).cast("long") * 3 - $"i" * 3)
      .select($"k", $"i")
    val plan = verify.queryExecution.executedPlan.toString
    val joinLines = plan.linesIterator.filter(_.contains("Join")).mkString("\n")
    assert(!joinLines.contains("array_intersect_size"),
      s"intersect cloned into the join condition:\n$plan")
    assert(plan.count(_ == '\n') > 0 && "array_intersect_size".r
      .findAllIn(plan).size <= 2, // one Project occurrence (+1 schema echo tolerance)
      s"intersect evaluated more than once:\n$plan")
  }

  test("native tokens() equals the regex/HOF spec on messy whitespace and unicode") {
    import spark.implicits._
    // every Java-\s ASCII whitespace byte, multi-byte UTF-8, empties,
    // leading/trailing runs — the shapes where a byte tokenizer and a
    // regex tokenizer could disagree
    val pieces = Vector("x", "yy", "élan", "中文", "a-b", "",
      " ", "  ", "\t", "\n", "\f", "", "\r", " \t ")
    val rows = Seq.fill(400)(
      Seq.fill(rnd.nextInt(12))(pieces(rnd.nextInt(pieces.length))).mkString)
    val df = rows.toDF("text")
    val native = df.select(graft.functions.TextFunctions.tokens($"text"))
      .collect().map(_.getSeq[String](0))
    val hof = df.select(graft.functions.TextFunctions.tokensHof($"text"))
      .collect().map(_.getSeq[String](0))
    native.zip(hof).zip(rows).foreach { case ((n, h), t) =>
      assert(n == h, s"tokens('$t'): native $n vs regex spec $h")
    }
  }

  test("ArgExtremumStruct equals max/min(struct) incl. NaN, ±0.0 and ties, and plans HashAggregate") {
    import spark.implicits._
    import org.apache.spark.sql.graft.ArgExtremum.{argmaxStruct, argminStruct}
    val specials = Vector(Double.NaN, 0.0, -0.0, 1.0, -1.0,
      Double.PositiveInfinity, Double.NegativeInfinity, 2.5)
    val rows = Seq.fill(800) {
      (rnd.nextInt(40).toLong,
        // dense ties + IEEE special values on the ordering column
        if (rnd.nextInt(3) == 0) specials(rnd.nextInt(specials.length))
        else rnd.nextInt(4).toDouble,
        rnd.nextInt(20).toLong)
    }
    val df = rows.toDF("k", "ord", "sel")
    def toMap(r: Array[org.apache.spark.sql.Row]) =
      r.map(x => x.getLong(0) -> (
        java.lang.Double.doubleToLongBits(x.getDouble(1)), x.getLong(2))).toMap
    val gotMax = toMap(df.groupBy($"k")
      .agg(argmaxStruct($"ord", $"sel", "o", "s").as("best"))
      .select($"k", $"best.o", $"best.s").collect())
    val wantMax = toMap(df.groupBy($"k")
      .agg(max(struct($"ord", $"sel")).as("best"))
      .select($"k", $"best.ord", $"best.sel").collect())
    assert(gotMax == wantMax, s"argmax vs max(struct):\n$gotMax\n$wantMax")
    val gotMin = toMap(df.groupBy($"k")
      .agg(argminStruct($"ord", $"sel", "o", "s").as("best"))
      .select($"k", $"best.o", $"best.s").collect())
    val wantMin = toMap(df.groupBy($"k")
      .agg(min(struct($"ord", $"sel")).as("best"))
      .select($"k", $"best.ord", $"best.sel").collect())
    assert(gotMin == wantMin, s"argmin vs min(struct):\n$gotMin\n$wantMin")
    // the whole point: hash aggregation, no sort below (VERDICT-r15 #1)
    val plan = df.groupBy($"k")
      .agg(argmaxStruct($"ord", $"sel", "o", "s").as("best"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"expected HashAggregate:\n$plan")
    assert(!plan.contains("SortAggregate"), s"unexpected SortAggregate:\n$plan")
    // long-ordering twin (the Pq integer-distance shape)
    val ldf = rows.map { case (k, _, s) => (k, rnd.nextInt(5).toLong, s) }
      .toDF("k", "ord", "sel")
    def toMapL(r: Array[org.apache.spark.sql.Row]) =
      r.map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    val gotMinL = toMapL(ldf.groupBy($"k")
      .agg(argminStruct($"ord", $"sel", "o", "s").as("best"))
      .select($"k", $"best.o", $"best.s").collect())
    val wantMinL = toMapL(ldf.groupBy($"k")
      .agg(min(struct($"ord", $"sel")).as("best"))
      .select($"k", $"best.ord", $"best.sel").collect())
    assert(gotMinL == wantMinL, s"long argmin vs min(struct):\n$gotMinL\n$wantMinL")
  }

  test("CharClassCounts (scriptmix) equals the regexp class-strip spec on mixed unicode") {
    import spark.implicits._
    // codepoints outside ASCII (2- and 3-byte UTF-8) interleaved with the
    // three counted classes: byte-level counting must still equal the
    // codepoint-level regex length deltas
    val pieces = Vector("a", "Z", "7", " ", "\t", "\n", "\r", "é", "ß", "中", "!", "_", "0")
    val rows = Seq.fill(300) {
      val n = rnd.nextInt(40) + 1
      (s"src${rnd.nextInt(4)}",
        Seq.fill(n)(pieces(rnd.nextInt(pieces.length))).mkString)
    }
    val docs = rows.toDF("source", "text")
    def collectMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val native = collectMap(graft.queries.TextAnalysis.scriptmixCols(docs)
      .select("source", "n_docs", "n_chars", "other_ppm", "n_mixed", "n_nonlatin"))
    val regex = collectMap(graft.queries.TextAnalysis.scriptmixColsRegex(docs)
      .select("source", "n_docs", "n_chars", "other_ppm", "n_mixed", "n_nonlatin"))
    assert(native == regex, s"native $native vs regex $regex")
  }
}
