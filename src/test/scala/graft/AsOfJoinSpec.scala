package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** As-of join edge semantics + SQL registration of native functions. */
class AsOfJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of picks latest right <= left; ties match; no-prior yields null") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"),
      (1L, ts("2024-01-01 09:00:00"), "p0"), // before any right row
      (2L, ts("2024-01-01 10:30:00"), "p3")
    ).toDF("k", "t", "name")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100L),
      (1L, ts("2024-01-01 10:00:00"), 200L), // tie with p1 -> matches
      (1L, ts("2024-01-01 11:59:59"), 300L),
      (2L, ts("2024-01-01 10:00:00"), 400L)
    ).toDF("k", "t", "v")
    val out = AsOfJoin.joinAsOf(left, right, Seq("k"), "t", "t", Seq("v" -> "v"))
      .collect().map(r => (r.getAs[String]("name"), Option(r.getAs[java.lang.Long]("v")))).toMap
    assert(out("p0").isEmpty)
    assert(out("p1").contains(200L))
    assert(out("p2").contains(300L))
    assert(out("p3").contains(400L))
  }

  test("as-of attaches the matched row's NULL payload, not an older value") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "p")).toDF("k", "t", "name")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), Option(10L)),
      (1L, ts("2024-01-01 09:30:00"), Option.empty[Long])).toDF("k", "t", "v")
    val out = AsOfJoin.joinAsOf(left, right, Seq("k"), "t", "t", Seq("v" -> "v"))
      .collect()(0)
    // matched row is 09:30 whose v IS NULL — pandas/DuckDB semantics
    assert(out.isNullAt(out.fieldIndex("v")))
  }

  test("as-of tolerance nulls matches older than the bound") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "fresh"),
                   (1L, ts("2024-01-01 12:00:00"), "stale")).toDF("k", "t", "name")
    val right = Seq((1L, ts("2024-01-01 09:59:00"), 7L)).toDF("k", "t", "v")
    val out = AsOfJoin.joinAsOf(left, right, Seq("k"), "t", "t",
        Seq("v" -> "v"), toleranceSeconds = Some(300))
      .collect().map(r => r.getAs[String]("name") -> Option(r.getAs[java.lang.Long]("v"))).toMap
    assert(out("fresh").contains(7L)) // 60s old
    assert(out("stale").isEmpty)      // 2h old > 5min tolerance
  }

  test("as-of join plan has exactly one shuffle (union trick, no range join)") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "x")).toDF("k", "t", "name")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 5L)).toDF("k", "t", "v")
    val plan = AsOfJoin.joinAsOf(left, right, Seq("k"), "t", "t", Seq("v" -> "v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"range-join explosion:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected 1 shuffle, plan:\n$plan")
  }

  test("jaccard length-filter rule rewrites the predicate and preserves results") {
    import spark.implicits._
    import graft.functions.TextFunctions
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    val docs = Tables.documents(spark, sf)
    val pairs = docs.as("a").join(docs.as("b"),
        $"a.doc_id" < $"b.doc_id" && $"a.doc_id" % 7 === 0 && $"b.doc_id" % 11 === 0)
      .select($"a.doc_id".as("da"), $"b.doc_id".as("db"),
        TextFunctions.shingleSet($"a.text").as("sa"),
        TextFunctions.shingleSet($"b.text").as("sb"))
      .filter(TextFunctions.jaccard($"sa", $"sb") >= 0.3)
    val optimized = pairs.queryExecution.optimizedPlan.toString
    assert(optimized.contains("size("), s"length filter not injected:\n$optimized")
    // equivalence: rule-off plan produces the same pairs
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      before.filterNot(_ == org.apache.spark.sql.graft.JaccardLengthFilterRule)
    try {
      val without = docs.as("a").join(docs.as("b"),
          $"a.doc_id" < $"b.doc_id" && $"a.doc_id" % 7 === 0 && $"b.doc_id" % 11 === 0)
        .select($"a.doc_id".as("da"), $"b.doc_id".as("db"),
          TextFunctions.shingleSet($"a.text").as("sa"),
          TextFunctions.shingleSet($"b.text").as("sb"))
        .filter(TextFunctions.jaccard($"sa", $"sb") >= 0.3)
        .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val withRule = pairs.select("da", "db").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(withRule == without)
    } finally spark.experimental.extraOptimizations = before
  }

  test("native functions callable from SQL after registration") {
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT array_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
        |  size(token_shingles('a b c d')) AS ns,
        |  simhash60(token_shingles('a b c d')) AS sh,
        |  array_jaccard(array('x', 'y'), array('y', 'z')) AS j,
        |  array_long_sq_l2(array(3L, 5L), array(1L, 2L)) AS l2
        |""".stripMargin).collect()(0)
    assert(r.getAs[Double]("c") == 1.0)
    assert(r.getAs[Int]("ns") == 2)
    assert(r.getAs[Long]("sh") != 0L)
    assert(math.abs(r.getAs[Double]("j") - 1.0 / 3.0) < 1e-12)
    assert(r.getAs[Long]("l2") == 13L) // (3-1)^2 + (5-2)^2
    // and the extensions class itself applies cleanly
    new org.apache.spark.sql.graft.GraftExtensions()(
      new org.apache.spark.sql.SparkSessionExtensions)
  }
}
