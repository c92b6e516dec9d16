package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Descending, Expression,
  GenericInternalRow, JoinedRow, NullsFirst, SortOrder, UnsafeProjection,
  XxHash64}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** NATIVE AS-OF JOIN — the whole-operator extension tier (custom
  * `LogicalPlan` + planner `SparkStrategy` + physical `SparkPlan`),
  * complementing the repo's composed [[graft.ext.AsOfJoin]] (stock
  * windows) and its native-`Expression` tier (graft.functions).
  *
  * Why a physical operator when the composition already runs in one
  * shuffle: the union formulation pads EVERY shuffled row to the
  * combined left+right schema width (each side carries nulls for the
  * other side's columns through the exchange and the window buffer).
  * At 100 TB with wide fact/feature schemas that inflation IS the join
  * cost. This exec shuffles each side at its OWN width (two exchanges,
  * |L|+|R| narrow rows), sorts within partitions, and stream-merges with
  * O(1) state per key — no window machinery, no null padding, no row
  * blow-up. Same declared-requirements mechanism as SortMergeJoin:
  * `requiredChildDistribution` = ClusteredDistribution per side (Catalyst
  * inserts and aligns the exchanges; AQE's coalescing is validated
  * against the same requirements), `requiredChildOrdering` = (key, time)
  * per side, so the planner owns partitioning/sorting and the exec owns
  * only the merge.
  *
  * Semantics — identical to [[graft.ext.AsOfJoin.asOf]] (backward) and
  * [[graft.ext.AsOfJoin.asOfForward]] (forward = true), spec-pinned
  * bit-equal (NativeAsOfSpec): backward matches the most recent right
  * row with `rightTime <= leftTime` per key, forward the earliest with
  * `rightTime >= leftTime`; equal timestamps match in both directions;
  * ties on (key, rightTime) break by xxhash64(payload) exactly as the
  * composed operators do (backward: max hash; forward: min hash), so
  * the implementations agree row-for-row even on tied inputs. The
  * forward merge is the backward merge under time-reversed sort order —
  * one algorithm, a flipped comparison. Null keys or times never match
  * (SQL join-null semantics).
  *
  * Types: key and both time columns must be LongType or TimestampType
  * (micros-as-long internally) — the shapes the testdata and q49-family
  * catalog queries use; widen with casts upstream.
  */
object NativeAsOf {

  /** Logical node: output = left columns + right payload columns
    * (nullable — unmatched left rows carry nulls). Key/time columns of
    * the right side are consumed by the match and not re-emitted. */
  case class AsOfJoinNode(
      left: LogicalPlan, right: LogicalPlan,
      leftKey: Expression, rightKey: Expression,
      leftTime: Expression, rightTime: Expression,
      payload: Seq[Attribute], forward: Boolean) extends BinaryNode {
    override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
      copy(left = newLeft, right = newRight)
  }

  /** Planner strategy: one-to-one translation of the logical node. */
  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinNode(l, r, lk, rk, lt, rt, payload, forward) =>
        AsOfJoinExec(lk, rk, lt, rt, payload, forward,
          planLater(l), planLater(r)) :: Nil
      case _ => Nil
    }
  }

  case class AsOfJoinExec(
      leftKey: Expression, rightKey: Expression,
      leftTime: Expression, rightTime: Expression,
      payload: Seq[Attribute], forward: Boolean,
      left: SparkPlan, right: SparkPlan) extends SparkPlan with BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ payload.map(_.withNullability(true))

    // each side clusters on its own key — Catalyst co-partitions the two
    // exchanges exactly as it does for SortMergeJoin
    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

    // the merge keeps the LAST tied (key, time) right row it passes, so
    // the tiebreak sort direction encodes the composed operators' rules:
    // backward (time asc, hash asc) -> max hash wins (ext.AsOfJoin.asOf's
    // `last` over ascending __tb); forward (time desc, hash desc) -> MIN
    // hash wins (asOfForward's `first` over ascending __tb)
    private def timeDir = if (forward) Descending else Ascending
    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, Ascending, NullsFirst, Seq.empty),
        SortOrder(leftTime, timeDir, timeDir.defaultNullOrdering, Seq.empty)),
      Seq(SortOrder(rightKey, Ascending, NullsFirst, Seq.empty),
        SortOrder(rightTime, timeDir, timeDir.defaultNullOrdering, Seq.empty),
        SortOrder(XxHash64(payload, 42L), timeDir,
          timeDir.defaultNullOrdering, Seq.empty)))

    override def outputPartitioning: Partitioning = left.outputPartitioning

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val lOut = left.output
      val rOut = right.output
      val outAttrs = output
      val lk = BindReferences.bindReference(leftKey, lOut)
      val lt = BindReferences.bindReference(leftTime, lOut)
      val rk = BindReferences.bindReference(rightKey, rOut)
      val rt = BindReferences.bindReference(rightTime, rOut)
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        // bind payload against NULLABLE right attrs: unmatched left rows
        // feed an all-null right row, so the bound reference must carry a
        // null check even when the source column is non-nullable
        val resultProj = UnsafeProjection.create(
          outAttrs, lOut ++ rOut.map(_.withNullability(true)))
        val nullRight = new GenericInternalRow(rOut.size)
        val joined = new JoinedRow
        new Iterator[InternalRow] {
          // one-row lookahead on the right + the held best match so far:
          // O(1) state per key, single forward pass over both sides
          private var rNext: InternalRow = _
          private var rNextValid = advanceRight()
          private var held: InternalRow = _
          private var heldKey = 0L
          private var heldValid = false

          private def advanceRight(): Boolean = {
            while (rIter.hasNext) {
              val r = rIter.next()
              val k = rk.eval(r); val t = rt.eval(r)
              if (k != null && t != null) { rNext = r; return true }
              // null key/time right rows can never match — drop them
            }
            false
          }
          private def asLong(v: Any): Long = v match {
            case l: java.lang.Long => l.longValue()
            case i: java.lang.Integer => i.longValue()
            case other => other.asInstanceOf[Long]
          }
          override def hasNext: Boolean = lIter.hasNext
          override def next(): InternalRow = {
            val l = lIter.next()
            val kv = lk.eval(l); val tv = lt.eval(l)
            if (kv == null || tv == null) return resultProj(joined(l, nullRight))
            val k = asLong(kv); val t = asLong(tv)
            var continue = rNextValid
            while (continue) {
              val rKey = asLong(rk.eval(rNext))
              val rT = if (rKey == k) asLong(rt.eval(rNext)) else 0L
              val timeOk = if (forward) rT >= t else rT <= t
              if (rKey < k || (rKey == k && timeOk)) {
                if (rKey == k) { // candidate: copy out of the reused buffer
                  held = rNext.copy(); heldKey = k; heldValid = true
                }
                rNextValid = advanceRight()
                continue = rNextValid
              } else continue = false
            }
            if (heldValid && heldKey == k) resultProj(joined(l, held))
            else resultProj(joined(l, nullRight))
          }
        }
      }
    }
  }

  /** `left` (key, leftTime, ...) matched to the most recent `right`
    * (key, rightTime, payload...) row — output: left.* + `asof_<payload>`
    * columns, exactly [[graft.ext.AsOfJoin.asOf]]'s surface. The two
    * inputs must not share attribute lineage (re-read the table for a
    * self-as-of, as q208 does) and payload names must not collide with
    * left's columns. */
  def asOf(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      payload: Seq[String], forward: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val rNarrow = right.select((key +: rightTime +: payload).distinct.map(col): _*)
    val lp = left.queryExecution.analyzed
    val rp = rNarrow.queryExecution.analyzed
    require(lp.outputSet.intersect(rp.outputSet).isEmpty,
      "left and right must not share attribute lineage — re-read or alias one side")
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${p.output.map(_.name)}"))
    val payloadAttrs = payload.map(attr(rp, _))
    val node = AsOfJoinNode(lp, rp,
      attr(lp, key), attr(rp, key), attr(lp, leftTime), attr(rp, rightTime),
      payloadAttrs, forward)
    val joinedDf = org.apache.spark.sql.graft.PlanBridge.ofRows(spark, node)
    joinedDf.select(left.columns.map(col) ++
      payload.map(p => col(p).as(s"asof_$p")): _*)
  }
}
