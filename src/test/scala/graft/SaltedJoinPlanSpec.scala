package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ResolveSaltHint, SaltHint, SaltedJoin, SaltedJoinApi}
import org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint
import org.scalatest.funsuite.AnyFunSuite

/** Planner-tier salted join: analyzer hint resolution, optimizer collapse
  * to the custom SaltedJoin logical node, physical planning through the
  * injected strategy, and exact result equivalence with the plain join. */
class SaltedJoinPlanSpec extends AnyFunSuite {
  import SparkTestSession._

  private def probe = Tables.orders(spark, sf)
    .select(col("o_orderkey"), col("o_orderpriority").as("k"),
      col("o_totalprice"))

  private def build = {
    import spark.implicits._
    Seq(("1-URGENT", "hot"), ("2-HIGH", "warm"), ("5-LOW", "cold"))
      .toDF("k2", "tier")
  }

  test("optimizer rule collapses Join-over-marker into the SaltedJoin node") {
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    val salted = probe.join(SaltedJoinApi.markSalted(build, 4),
      col("k") === col("k2"))
    val nodes = salted.queryExecution.optimizedPlan.collect {
      case sj: SaltedJoin => sj
    }
    assert(nodes.length == 1, salted.queryExecution.optimizedPlan.toString)
    assert(nodes.head.salt == 4)
  }

  test("strategy plans the node and results equal the plain join exactly") {
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    val plain = probe.join(build, col("k") === col("k2"))
      .collect().map(_.toSeq).toSet
    val salted = probe.join(SaltedJoinApi.markSalted(build, 8),
      col("k") === col("k2"))
    // physical plan exists (strategy fired — no SaltedJoin survives) and
    // carries the salted expansion (replicated build via explode)
    val phys = salted.queryExecution.executedPlan.toString
    assert(phys.toLowerCase.contains("explode"), phys)
    assert(salted.collect().map(_.toSeq).toSet == plain)
    assert(salted.count() == probe.join(build, col("k") === col("k2")).count())
  }

  test("a stray salt marker without a matching join degrades to the plain plan") {
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    val marked = SaltedJoinApi.markSalted(build, 4)
    // no join on top: marker is stripped, result is just the build rows
    assert(marked.count() == 3)
    assert(marked.queryExecution.optimizedPlan.collect {
      case h: SaltHint => h
    }.isEmpty)
  }

  test("analyzer rule resolves the salt_join hint to the marker node") {
    val hinted = UnresolvedHint("salt_join",
      Seq(org.apache.spark.sql.catalyst.expressions.Literal(6)),
      build.queryExecution.analyzed)
    val resolved = ResolveSaltHint(hinted)
    val hints = resolved.collect { case h: SaltHint => h }
    assert(hints.length == 1 && hints.head.salt == 6)
  }
}
