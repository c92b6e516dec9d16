package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that declares itself NON-DETERMINISTIC so the
  * optimizer may not duplicate, push, or constant-fold the wrapped
  * expression — the custom-expression analogue of marking an expensive
  * UDF non-deterministic (guide §4.4).
  *
  * The catalog's verify tiers share one shape:
  *
  * {{{ .select(expensive(a, b).as("score")).filter(col("score") >= t) }}}
  *
  * where `expensive` is a per-pair merge (SortedJaccard over two token
  * arrays). PushPredicateThroughProject rewrites the filter into
  * `expensive(a, b) >= t` BELOW the projection — usually into the join
  * condition — and the projection still emits `expensive(a, b)`: the
  * merge runs TWICE for every surviving pair (measured in
  * plans/r19/q30_jaccard_pairs_before.txt: `sorted_jaccard` in
  * SortMergeJoin(113)'s condition AND in Project(114)). Wrapping the
  * projected expression in the fence blocks the pushdown, so the merge
  * runs once per candidate and the threshold filters the materialized
  * column. Values are bit-identical (the wrapper is `eval = child.eval`);
  * only evaluation COUNT changes, so oracle results cannot move.
  *
  * Trade-off (why this is opt-in per call site, not automatic): the
  * fence also blocks LEGITIMATE pushes of the threshold below exchanges
  * or into scans. Use it only where the expression's inputs already meet
  * at the operator directly below the projection (the verify joins: the
  * token arrays exist only inside the join stage, so there is nothing
  * further down the filter could have pruned).
  */
case class EvalFence(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = child.dataType
  override def prettyName: String = "eval_fence"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx) // pure pass-through: same generated code, same value
  override protected def withNewChildInternal(newChild: Expression): EvalFence =
    copy(child = newChild)
}

object EvalFence {
  def fence(c: Column): Column =
    ColumnBridge.column(EvalFence(ColumnBridge.expression(c)))
}
