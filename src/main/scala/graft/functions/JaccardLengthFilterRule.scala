package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: prefix any `array_jaccard(a, b) >= t` predicate with
  * the implied LENGTH FILTER `|a| >= ceil(t*|b|) && |b| >= ceil(t*|a|)`.
  *
  * Soundness: jaccard(a,b) = |a∩b| / |a∪b| <= min(|a|,|b|) / max(|a|,|b|),
  * so jaccard >= t implies the size ratio bound — the added conjuncts
  * never change results (spec-verified), but size() is O(1) against the
  * hash-set verify's O(|a|+|b|), so wildly mismatched candidate pairs
  * short-circuit before the expensive intersection. The classic length
  * filter of similarity-join literature, here as a Catalyst rewrite so
  * EVERY query with the predicate benefits without hand-tuning.
  *
  * Fixpoint-safe via a TreeNodeTag marker on rewritten predicates. */
object JaccardLengthFilterRule extends Rule[LogicalPlan] {

  private val Rewritten = TreeNodeTag[Boolean]("graft.jaccard.lengthFiltered")

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case gte @ GreaterThanOrEqual(j: NativeExprs.ArrayJaccard, Literal(t: Double, DoubleType))
          if t > 0.0 && gte.getTagValue(Rewritten).isEmpty =>
        val sa = Cast(Size(j.left), DoubleType)
        val sb = Cast(Size(j.right), DoubleType)
        val lenOk = And(
          GreaterThanOrEqual(sa, Multiply(Literal(t), sb)),
          GreaterThanOrEqual(sb, Multiply(Literal(t), sa)))
        val marked = gte.copy()
        marked.setTagValue(Rewritten, true)
        And(lenOk, marked)
    }
}
