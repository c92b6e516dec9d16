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
  *  - Rows with a null score, null arg, or NaN score are ignored; a group
  *    with no valid row evaluates to null. NaN-as-invalid (r18) is the
  *    only DETERMINISTIC primitive-buffer treatment: under IEEE
  *    comparisons nothing can displace a NaN that arrives first (NaN>x,
  *    x>NaN, NaN==x are all false), so "first valid row wins" would make
  *    the result partition-order-dependent for any caller whose score can
  *    be NaN (cosine of a zero-norm vector is 0/0). This differs from
  *    max_by's total-order-with-NaN-largest; no current caller produces
  *    NaN, and ArgExtremumSpec pins the drop-NaN contract.
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
    val valid = And(And(IsNotNull(score), IsNotNull(arg)), Not(IsNaN(score)))
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

/** [[ArgExtremum]] with CARRIED PAYLOAD (r18): the winner row's extra
  * columns ride in the SAME flat aggregation buffer — (bestScore, bestArg,
  * seen, payload…), every field a fixed-width primitive, so the aggregate
  * stays HashAggregate while returning `struct(arg, p1…pn)` per group.
  *
  * Exists because the fetch-back alternative (argmax ids + join the source
  * again for payloads) pays an extra scan, a lineage barrier, and N
  * broadcast joins — measured 2–4× the whole-query wall on q218's M4
  * downsample, whose four struct-buffered min/max were the generalized
  * physical lint's first in-catalog catch of the q179 degradation class.
  *
  * Same selection semantics as [[ArgExtremum]] (highest/lowest score, ties
  * → smallest arg, null/NaN scores and null args ignored; group with no
  * valid row → null struct). Payload NULLS are carried faithfully: the
  * buffer fields are nullable primitives (fixed width + null bit — still
  * hash-aggregable). Payload types must be UnsafeRow-mutable; anything
  * else fails analysis loudly. */
case class ArgExtremumPayload(arg: Expression, score: Expression,
    payload: Seq[Expression], maximize: Boolean) extends DeclarativeAggregate {

  override def children: Seq[Expression] = arg +: score +: payload
  override def nullable: Boolean = true
  override lazy val dataType: DataType = StructType(
    StructField("arg", LongType, nullable = false) +:
      payload.zipWithIndex.map { case (p, i) =>
        StructField(s"p${i + 1}", p.dataType, nullable = true) })

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(arg = newChildren(0), score = newChildren(1),
      payload = newChildren.drop(2))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val badP = payload.filterNot(p => UnsafeRow.isMutable(p.dataType))
    if (arg.dataType != LongType || score.dataType != DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"arg_extremum needs (LongType arg, DoubleType score), got " +
          s"(${arg.dataType}, ${score.dataType})")
    else if (badP.nonEmpty)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "payload columns must be fixed-width primitives (hash-aggregable), got " +
          badP.map(_.dataType.simpleString).mkString(", "))
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  private lazy val bestScore =
    AttributeReference("bestScore", DoubleType, nullable = false)()
  private lazy val bestArg =
    AttributeReference("bestArg", LongType, nullable = false)()
  private lazy val seen =
    AttributeReference("seen", BooleanType, nullable = false)()
  private lazy val pbuf = payload.zipWithIndex.map { case (p, i) =>
    AttributeReference(s"p${i + 1}", p.dataType, nullable = true)() }

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bestScore, bestArg, seen) ++ pbuf

  override lazy val initialValues: Seq[Expression] =
    Seq(
      Literal(if (maximize) Double.NegativeInfinity else Double.PositiveInfinity),
      Literal(Long.MaxValue),
      Literal(false)) ++ payload.map(p => Literal(null, p.dataType))

  private def beats(s: Expression, a: Expression, curS: Expression,
      curA: Expression, curSeen: Expression): Expression = {
    val cmp = if (maximize) GreaterThan(s, curS) else LessThan(s, curS)
    Or(Not(curSeen), Or(cmp, And(EqualTo(s, curS), LessThan(a, curA))))
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val valid = And(And(IsNotNull(score), IsNotNull(arg)), Not(IsNaN(score)))
    val isBetter = And(valid, beats(score, arg, bestScore, bestArg, seen))
    Seq(
      If(isBetter, score, bestScore),
      If(isBetter, arg, bestArg),
      Or(seen, valid)) ++
      payload.zip(pbuf).map { case (p, b) => If(isBetter, p, b) }
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val isBetter = And(seen.right,
      beats(bestScore.right, bestArg.right, bestScore.left, bestArg.left, seen.left))
    Seq(
      If(isBetter, bestScore.right, bestScore.left),
      If(isBetter, bestArg.right, bestArg.left),
      Or(seen.left, seen.right)) ++
      pbuf.map(b => If(isBetter, b.right, b.left))
  }

  override lazy val evaluateExpression: Expression =
    If(seen,
      CreateNamedStruct(
        (Literal("arg") :: (bestArg: Expression) :: Nil) ++
          pbuf.zipWithIndex.flatMap { case (b, i) =>
            Seq(Literal(s"p${i + 1}"), b) }),
      Literal(null, dataType))

  override def prettyName: String =
    if (maximize) "argmax_payload" else "argmin_payload"
}

object ArgExtremum {

  /** SQL-surface widening (r18): integral args widen to Long and numeric
    * scores to Double — both exact below 2⁵³ — while anything else (string,
    * array, struct, decimal beyond the exact range is the caller's call)
    * fails ANALYSIS loudly via [[ArgExtremum.checkInputDataTypes]], never
    * silently degrades. Builder-side because Spark's implicit-cast trait
    * types are `private[sql]`. */
  def widened(arg: Expression, score: Expression, maximize: Boolean): Expression = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    // arg: INTEGRAL widening only — a float arg must fail, not truncate
    val a = if (arg.resolved && (arg.dataType match {
        case _: ByteType | _: ShortType | _: IntegerType => true
        case _ => false
      })) Cast(arg, LongType) else arg
    // score: any numeric primitive widens (exact below 2^53)
    val s = if (score.resolved && (score.dataType match {
        case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
             _: FloatType => true
        case _ => false
      })) Cast(score, DoubleType) else score
    ArgExtremum(a, s, maximize)
  }

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

  /** `struct(arg, p1…pn)` of the row with the HIGHEST score (ties →
    * smallest arg), payload carried in the flat buffer — the
    * HashAggregate-able replacement for `max_by(struct(...), struct(...))`
    * / `max(struct(score, tiebreak, payload…))`. */
  def argmaxStruct(arg: Column, score: Column, payload: Column*): Column =
    ColumnBridge.column(ArgExtremumPayload(ColumnBridge.expression(arg),
      ColumnBridge.expression(score), payload.map(ColumnBridge.expression),
      maximize = true).toAggregateExpression())

  /** `struct(arg, p1…pn)` of the row with the LOWEST score (ties →
    * smallest arg); see [[argmaxStruct]]. */
  def argminStruct(arg: Column, score: Column, payload: Column*): Column =
    ColumnBridge.column(ArgExtremumPayload(ColumnBridge.expression(arg),
      ColumnBridge.expression(score), payload.map(ColumnBridge.expression),
      maximize = false).toAggregateExpression())
}
