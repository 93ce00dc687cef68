// Shares the org.apache.spark.sql.graft package with NativeExprs for
// access to the private[sql] registry/ExpressionInfo surface.
package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for graft's native expressions, two ways:
  *
  *  - `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  *    (or `.withExtensions(new GraftExtensions)`) at session build;
  *  - `GraftExtensions.register(spark)` on an existing session.
  *
  * After either, plain SQL can call the engine's functions:
  * `SELECT simhash60(token_shingles(text)), array_cosine(a, b) ...`
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, arity, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        (args: Seq[Expression]) => { checkArity(name, arity, args); builder(args) }))
    }
    ext.injectOptimizerRule(_ => JaccardLengthFilterRule)
    // planner-tier salted join: hint → marker → custom node → strategy
    ext.injectResolutionRule(_ => ResolveSaltHint)
    ext.injectOptimizerRule(_ => SaltedJoinRule)
    ext.injectPlannerStrategy(_ => SaltedJoinStrategy)
  }

  private def checkArity(name: String, arity: Int, args: Seq[Expression]): Unit =
    require(args.length == arity, s"$name expects $arity argument(s), got ${args.length}")
}

object GraftExtensions {

  private val builders: Seq[(String, Int, Seq[Expression] => Expression)] = Seq(
    ("token_shingles", 1, args => NativeExprs.TokenShingles(args.head)),
    ("simhash60", 1, args => NativeExprs.SimHash60(args.head)),
    ("simhash96", 1, args => NativeExprs.SimHash96(args.head)),
    ("minhash_sig", 1, args => NativeExprs.MinHashSig(args.head)),
    ("array_cosine", 2, args => NativeExprs.ArrayCosine(args(0), args(1))),
    ("array_jaccard", 2, args => NativeExprs.ArrayJaccard(args(0), args(1))),
    ("array_intersect_size", 2, args => NativeExprs.ArrayIntersectSize(args(0), args(1))),
    ("winnow_fingerprint", 1, args => NativeExprs.WinnowFingerprint(args.head)),
    ("array_long_sq_l2", 2, args => NativeExprs.ArrayLongSqL2(args(0), args(1))),
  )

  /** Register the functions + optimizer rule into an already-built
    * session (extensions proper require registration at build time;
    * experimental.extraOptimizations is the public post-hoc seam). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    builders.foreach { case (name, _, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
    if (!spark.experimental.extraOptimizations.contains(JaccardLengthFilterRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ JaccardLengthFilterRule
    if (!spark.experimental.extraOptimizations.contains(SaltedJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SaltedJoinRule
    if (!spark.experimental.extraStrategies.contains(SaltedJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ SaltedJoinStrategy
    // hint("salt_join", n) needs build-time extensions (analyzer rule);
    // post-hoc sessions use SaltedJoinApi.markSalted instead.
  }
}
