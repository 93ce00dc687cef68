// Shares the org.apache.spark.sql.graft package with NativeExprs for the
// private[sql] surface (classic.Dataset.ofRows, ExpressionUtils).
package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Literal}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, Join, LogicalPlan, Project, UnaryNode, UnresolvedHint}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions._

/** Planner-tier salted join (the (c)-tier of the extension ladder:
  * expression → rule → LogicalPlan + SparkStrategy).
  *
  * Skew salting itself is plain algebra (operators.Skew proves it); what
  * this adds is the PLANNER wiring, so a user marks intent and Catalyst
  * does the rewrite:
  *
  *   probe.join(SaltedJoinApi.markSalted(build, salt), cond)   // post-hoc
  *   probe.join(build.hint("salt_join", salt), cond)           // with extensions
  *
  * Pipeline: hint resolves to [[SaltHint]] (analyzer, [[ResolveSaltHint]])
  * → [[SaltedJoinRule]] (optimizer) collapses Join-over-SaltHint into the
  * custom [[SaltedJoin]] logical node → [[SaltedJoinStrategy]] plans it by
  * expanding to the salted algebra (probe scattered over `salt` sub-keys
  * by a hash of its columns, build side replicated via explode) and
  * delegating to the main planner with planLater. At 100 TB this turns a
  * known heavy-hitter key into `salt` parallel tasks when AQE's runtime
  * skew split cannot apply (e.g. forced shuffle-hash joins).
  *
  * Note: the SaltHint barrier is opaque to filter pushdown — mark a
  * complete (already-filtered) build side.
  */
case class SaltHint(salt: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): SaltHint =
    copy(child = newChild)
}

/** Analyzer rule (build-time extensions only): `.hint("salt_join", n)` →
  * [[SaltHint]]. Runs in the Resolution batch, before unresolved-hint
  * cleanup would drop the unknown hint name. */
object ResolveSaltHint extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case UnresolvedHint(name, Seq(Literal(salt: Int, _)), child)
        if name.equalsIgnoreCase("salt_join") =>
      SaltHint(salt, child)
  }
}

/** Custom logical node: inner equi-join of `left` (probe) with `right`
  * (build, replicated `salt` times). Output = plain join output. */
case class SaltedJoin(left: LogicalPlan, right: LogicalPlan,
                      leftKey: Attribute, rightKey: Attribute,
                      salt: Int) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): SaltedJoin =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: Join over a salt-marked build side → [[SaltedJoin]];
  * stray markers (no matching join shape) are stripped, degrading to the
  * plain plan. */
object SaltedJoinRule extends Rule[LogicalPlan] {

  /** Peels a SaltHint marker off the top of a join input, seeing through
    * the Filter/Project layers the optimizer interposes (e.g. inferred
    * isnotnull filters land ABOVE the opaque marker). Returns (salt,
    * the subtree with the marker removed). */
  private object SaltedSide {
    def unapply(p: LogicalPlan): Option[(Int, LogicalPlan)] = p match {
      case SaltHint(s, c)                    => Some((s, c))
      case f @ Filter(_, SaltHint(s, c))     => Some((s, f.copy(child = c)))
      case pr @ Project(_, SaltHint(s, c))   => Some((s, pr.copy(child = c)))
      case f @ Filter(_, pr @ Project(_, SaltHint(s, c))) =>
        Some((s, f.copy(child = pr.copy(child = c))))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case Join(l, SaltedSide(salt, r), Inner, Some(EqualTo(a: Attribute, b: Attribute)), _)
        if orient(l, r, a, b).isDefined =>
      val (lk, rk) = orient(l, r, a, b).get
      SaltedJoin(l, r, lk, rk, salt)
    case SaltHint(_, child) => child
  }

  private def orient(l: LogicalPlan, r: LogicalPlan, a: Attribute, b: Attribute)
      : Option[(Attribute, Attribute)] =
    if (l.outputSet.contains(a) && r.outputSet.contains(b)) Some((a, b))
    else if (l.outputSet.contains(b) && r.outputSet.contains(a)) Some((b, a))
    else None
}

/** Physical strategy: expand [[SaltedJoin]] to the salted algebra and let
  * the main planner pick the join implementation (planLater). The final
  * projection pins the node's exact output attributes. */
object SaltedJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case SaltedJoin(l, r, lk, rk, salt) =>
      val spark = SparkSession.active
        .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      val probe = org.apache.spark.sql.classic.Dataset.ofRows(spark, l)
      val build = org.apache.spark.sql.classic.Dataset.ofRows(spark, r)
      val p = probe.withColumn("_salt_l",
        pmod(xxhash64(l.output.map(ExpressionUtils.column): _*), lit(salt.toLong)).cast("int"))
      val b = build.withColumn("_salt_r",
        explode(sequence(lit(0), lit(salt - 1))))
      val joined = p.join(b,
        ExpressionUtils.column(lk) === ExpressionUtils.column(rk) &&
          col("_salt_l") === col("_salt_r"))
        .select((l.output ++ r.output).map(ExpressionUtils.column): _*)
      planLater(joined.queryExecution.optimizedPlan) :: Nil
    case _ => Nil
  }
}

/** Post-hoc API (no build-time extensions needed): mark a build side for
  * salting by wrapping its analyzed plan in [[SaltHint]] directly. */
object SaltedJoinApi {
  def markSalted(df: DataFrame, salt: Int): DataFrame = {
    require(salt > 1, s"salt must be > 1, got $salt")
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    org.apache.spark.sql.classic.Dataset.ofRows(spark,
      SaltHint(salt, df.queryExecution.analyzed))
  }
}
