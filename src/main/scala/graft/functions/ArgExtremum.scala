package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** HASH-AGGREGABLE argmax/argmin — the r17 fix for the catalog's hottest
  * hidden cost.
  *
  * Every nearest-centroid assignment in the similarity tier was written as
  * `max_by(cid, struct(score, -cid))` / `min_by(cid, struct(d2, cid))`.
  * Spark's MaxBy/MinBy carry their ordering value in a STRUCT-typed
  * aggregation buffer, and HashAggregate requires mutable fixed-width
  * buffer types — so the plan silently degrades to SortAggregate, whose
  * per-row update path (interpreted struct construction + comparison +
  * copy) costs ~10 µs/row. Over an assignment cross product that is the
  * whole wall: the catalog100x q179 rung spent 4,063 CPU-seconds (32
  * balanced 127 s tasks) pushing 400M (id, cid, sim) rows through exactly
  * that stage, while the same cross product under a pruned `count()`
  * (no max_by) ran in 3 s. The cost was invisible at sf0.1 and grows as
  * n·|centroids| — the classic scale-only defect this probe exists to
  * surface.
  *
  * This aggregate keeps the ordering state as THREE flat primitives
  * (bestScore: Double, bestArg: Long, seen: Boolean) — a mutable buffer,
  * so the planner keeps HashAggregate and the update expressions (plain
  * If/comparison trees) stay inside whole-stage codegen. One pass, no
  * sort, no join.
  *
  * SEMANTICS (spec-pinned equal to the forms it replaces):
  *  - `argmax(arg, score)` ≡ `max_by(arg, struct(score, -arg))`: the arg
  *    of the highest score, ties broken by the SMALLEST arg.
  *  - `argmin(arg, score)` ≡ `min_by(arg, struct(score, arg))`: the arg of
  *    the lowest score, ties broken by the smallest arg.
  *  - Rows with a null score or null arg are ignored (max_by's contract);
  *    a group with no valid row evaluates to null.
  *  - NaN scores: primitive-comparison semantics (NaN never wins a `>`),
  *    matching IEEE, NOT max_by's total-order-with-NaN-largest. No caller
  *    produces NaN (cosine/sqdist over finite vectors); documented, not
  *    silently depended on.
  *
  * `arg` must be LongType and `score` DoubleType — the assignment shape
  * (integer ids scored by a float metric). Callers with integer scores
  * (label-propagation vote counts) cast to double, exact below 2⁵³.
  */
case class ArgExtremum(arg: Expression, score: Expression, maximize: Boolean)
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(arg, score)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(arg = newChildren(0), score = newChildren(1))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (arg.dataType == LongType && score.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"arg_extremum needs (LongType arg, DoubleType score), got " +
        s"(${arg.dataType}, ${score.dataType})")

  private lazy val bestScore =
    AttributeReference("bestScore", DoubleType, nullable = false)()
  private lazy val bestArg =
    AttributeReference("bestArg", LongType, nullable = false)()
  private lazy val seen =
    AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bestScore, bestArg, seen)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal(if (maximize) Double.NegativeInfinity else Double.PositiveInfinity),
    Literal(Long.MaxValue),
    Literal(false))

  /** (s, a) beats the current (curS, curA)? First valid row always wins
    * (curSeen false); then strict score improvement; then equal score with
    * a smaller arg. */
  private def beats(s: Expression, a: Expression, curS: Expression,
      curA: Expression, curSeen: Expression): Expression = {
    val cmp = if (maximize) GreaterThan(s, curS) else LessThan(s, curS)
    Or(Not(curSeen), Or(cmp, And(EqualTo(s, curS), LessThan(a, curA))))
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val valid = And(IsNotNull(score), IsNotNull(arg))
    val isBetter = And(valid, beats(score, arg, bestScore, bestArg, seen))
    Seq(
      If(isBetter, score, bestScore),
      If(isBetter, arg, bestArg),
      Or(seen, valid))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val isBetter = And(seen.right,
      beats(bestScore.right, bestArg.right, bestScore.left, bestArg.left, seen.left))
    Seq(
      If(isBetter, bestScore.right, bestScore.left),
      If(isBetter, bestArg.right, bestArg.left),
      Or(seen.left, seen.right))
  }

  override lazy val evaluateExpression: Expression =
    If(seen, bestArg, Literal(null, LongType))

  override def prettyName: String = if (maximize) "argmax_by" else "argmin_by"
}

object ArgExtremum {

  /** The long `arg` of the HIGHEST double `score`; ties → smallest arg.
    * Drop-in for `max_by(arg, struct(score, -arg))`, HashAggregate-able. */
  def argmax(arg: Column, score: Column): Column =
    ColumnBridge.column(ArgExtremum(ColumnBridge.expression(arg),
      ColumnBridge.expression(score), maximize = true).toAggregateExpression())

  /** The long `arg` of the LOWEST double `score`; ties → smallest arg.
    * Drop-in for `min_by(arg, struct(score, arg))`, HashAggregate-able. */
  def argmin(arg: Column, score: Column): Column =
    ColumnBridge.column(ArgExtremum(ColumnBridge.expression(arg),
      ColumnBridge.expression(score), maximize = false).toAggregateExpression())
}
