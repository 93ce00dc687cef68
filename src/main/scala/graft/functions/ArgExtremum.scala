// Lives under org.apache.spark.sql so the aggregate can use the catalyst
// expression surface directly — same packaging as NativeExprs.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Hash-aggregable argmax/argmin with a deterministic tie-break — the
  * round-16 replacement for the `max(struct(ord, sel))` / `min(struct(ord,
  * sel))` argmax idiom of the kmeans/PQ training family (VERDICT-r15 #1).
  *
  * WHY: `max(struct(...))` cannot hash-aggregate — a struct is not an
  * UnsafeRow-mutable buffer type, so every assignment round planned as
  * Sort + SortAggregate and SORTED its whole per-partition candidate
  * stream (|vectors| x |centroids| rows) just to keep one row per key
  * (guide §1.2/§4: the sort is pure overhead; an O(n) hash pass suffices).
  * This aggregate keeps the (ord, sel) pair in TWO primitive buffer slots,
  * so HashAggregateExec accepts it (both slots UnsafeRow-mutable) and the
  * whole update inlines into whole-stage codegen. Plan diff on the six
  * wired sites: Sort + SortAggregate -> HashAggregate, no Sort below.
  *
  * EXACTNESS (the NaN/-0.0/tie risk VERDICT-r15 scoped): the replacement
  * is built from Catalyst's own GreaterThan/LessThan/EqualTo comparisons,
  * which funnel through the same SQLOrderingUtil double semantics as the
  * interpreted struct ordering `max(struct)` used — NaN > any non-NaN,
  * NaN = NaN, -0.0 = 0.0. Tie on `ord` resolves by extremum of `sel`
  * (greatest: larger sel wins = max(struct) field-2 order; least: smaller
  * sel wins = min(struct) field-2 order). NativeExprsPropSpec proves
  * equality against the max/min(struct) forms including NaN, ±0.0 and
  * exact-tie inputs.
  *
  * PRECONDITION (all wired sites satisfy it by construction): whenever
  * `ord` is non-null, `sel` is non-null. Rows with ord = null never
  * replace the buffer; a group whose rows are ALL ord-null evaluates to a
  * null struct (max(struct) would yield struct(null, max sel) there —
  * unreachable at the wired sites, where ord is an arithmetic result of
  * non-null inputs).
  */
case class ArgExtremumStruct(
    ord: Expression,
    sel: Expression,
    greatest: Boolean,
    ordName: String,
    selName: String)
  extends DeclarativeAggregate with BinaryLike[Expression] {

  override def left: Expression = ord
  override def right: Expression = sel
  override def prettyName: String = if (greatest) "argmax_struct" else "argmin_struct"
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField(ordName, ord.dataType, nullable = ord.nullable),
    StructField(selName, sel.dataType, nullable = sel.nullable)))

  private lazy val bufOrd = AttributeReference("argext_ord", ord.dataType)()
  private lazy val bufSel = AttributeReference("argext_sel", sel.dataType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(bufOrd, bufSel)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, ord.dataType),
    Literal.create(null, sel.dataType))

  /** True iff the (nOrd, nSel) candidate strictly beats the (oOrd, oSel)
    * incumbent under (ord extremum, then sel extremum) — never true for a
    * null candidate, always true against a null (empty) incumbent. */
  private def replaces(nOrd: Expression, nSel: Expression,
                       oOrd: Expression, oSel: Expression): Expression = {
    val strictly = if (greatest) GreaterThan(nOrd, oOrd) else LessThan(nOrd, oOrd)
    val tieSel = if (greatest) GreaterThan(nSel, oSel) else LessThan(nSel, oSel)
    And(IsNotNull(nOrd),
      Or(IsNull(oOrd), Or(strictly, And(EqualTo(nOrd, oOrd), tieSel))))
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val repl = replaces(ord, sel, bufOrd, bufSel)
    Seq(If(repl, ord, bufOrd), If(repl, sel, bufSel))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val repl = replaces(bufOrd.right, bufSel.right, bufOrd.left, bufSel.left)
    Seq(If(repl, bufOrd.right, bufOrd.left), If(repl, bufSel.right, bufSel.left))
  }

  override lazy val evaluateExpression: Expression =
    If(IsNull(bufOrd),
      Literal.create(null, dataType),
      CreateNamedStruct(Seq(Literal(ordName), bufOrd, Literal(selName), bufSel)))

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(ord = l, sel = r)
}

object ArgExtremum {
  /** Drop-in for `max(struct(ord, sel))`: struct(ordName, selName) of the
    * row with the largest ord, ties to the largest sel. */
  def argmaxStruct(ord: Column, sel: Column, ordName: String, selName: String): Column =
    ExpressionUtils.column(ArgExtremumStruct(
      ExpressionUtils.expression(ord), ExpressionUtils.expression(sel),
      greatest = true, ordName, selName).toAggregateExpression())

  /** Drop-in for `min(struct(ord, sel))`: struct(ordName, selName) of the
    * row with the smallest ord, ties to the smallest sel. */
  def argminStruct(ord: Column, sel: Column, ordName: String, selName: String): Column =
    ExpressionUtils.column(ArgExtremumStruct(
      ExpressionUtils.expression(ord), ExpressionUtils.expression(sel),
      greatest = false, ordName, selName).toAggregateExpression())
}
