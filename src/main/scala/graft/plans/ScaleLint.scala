package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.expressions.aggregate.Percentile
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** The repo's 100 TB scale discipline as a MECHANICAL plan linter — the
  * rules every VERDICT audit and PlanSpec pin enforces by hand, checkable
  * on any query in one call:
  *
  *  1. `global-window-over-raw` (error): a `Window` with an empty
  *     partitionSpec funnels its whole input through ONE task; that is only
  *     acceptable over a support-bounded table (something an `Aggregate`,
  *     `Limit`, or literal relation produced — the q157/q186 "bounded
  *     support" idiom, and the shape `ext/Scan` exists to provide for
  *     data-sized inputs).
  *  2. `raw-broadcast-hint` (error): a mandatory broadcast hint on a side
  *     that is a bare full-table scan (no filter, aggregate, or limit
  *     between the hint and the relation) OOMs the driver when the table
  *     is data-sized — hints bypass autoBroadcastJoinThreshold (the q193
  *     rule). Constant-size catalog tables (region/nation by default) are
  *     exempt.
  *  3. `unbounded-cartesian` (error): a join with NO condition where
  *     neither side is support-bounded is a data×data product.
  *  4. `exact-percentile` (advice): Spark's exact `percentile` buffers the
  *     whole per-group value multiset (the q187-r13 OOM class); counting
  *     percentiles (q169) or `approx_percentile` (q115) are the scale
  *     recipes. Advice, not error — the exact form is deliberately kept
  *     where it IS the oracle contract (bounded groups).
  *
  * A subtree is judged support-bounded if it contains an Aggregate, a
  * Limit, a literal relation, or a lineage barrier (`localCheckpoint` →
  * LeafNode RDD scan) — barriers are opaque, so the linter trusts them;
  * the house convention localCheckpoints only bounded intermediates.
  *
  * ScaleLintSpec proves each rule fires on a minimal offending plan, stays
  * quiet on the approved shapes, and — the point — that EVERY catalog query
  * passes with zero errors (the per-query PlanSpec pins generalized to the
  * whole surface). [[GraftLintExtension]] injects the warn-only rule via
  * `SparkSessionExtensions.injectOptimizerRule`, so any session built with
  * `spark.sql.extensions=graft.plans.GraftLintExtension` gets the lint on
  * every query it runs.
  */
object ScaleLint {

  sealed trait Severity
  case object Error extends Severity
  case object Advice extends Severity

  final case class Finding(rule: String, severity: Severity, detail: String)

  /** Tables whose cardinality is constant by schema contract (TPC-H region
    * and nation) — full-scan broadcasts of these are fine at any SF. */
  val DefaultConstantTables: Set[String] = Set("region", "nation")

  private def isBarrier(p: LogicalPlan): Boolean = p match {
    // localCheckpoint / cached intermediate: opaque, trusted (see scaladoc)
    case l: LeafNode => l.getClass.getSimpleName == "LogicalRDD"
    case _ => false
  }

  /** Support-bounded: some node below caps the row count independently of
    * the input data size (aggregate output, limit, literal, barrier). A
    * join or union is bounded iff every input is; a unary node inherits
    * its child's verdict; a real relation scan is data-sized. */
  private def bounded(p: LogicalPlan): Boolean =
    if (isBarrier(p)) true
    else p match {
      case _: Aggregate | _: GlobalLimit | _: LocalLimit => true
      case _: LocalRelation | _: OneRowRelation => true
      case _: LeafNode => false
      case other => other.children.forall(bounded)
    }

  private def scannedTables(p: LogicalPlan): Seq[String] = p.collect {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      fs.location.rootPaths.map(_.getName.replaceAll("\\.parquet$", ""))
  }.flatten

  private def conjuncts(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** True when every conjunct is a bare IsNotNull guard — the filters the
    * optimizer itself infers from join keys; they reduce nothing on clean
    * data, so they don't make a scan "row-reduced". */
  private def onlyNullGuards(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    conjuncts(e).forall(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.IsNotNull])

  /** True when `side` is a bare relation scan with nothing row-reducing on
    * top (projections, aliases, and inferred null guards only). */
  private def bareFullScan(side: LogicalPlan): Boolean = side match {
    case _: LogicalRelation => true
    case Project(_, c) => bareFullScan(c)
    case SubqueryAlias(_, c) => bareFullScan(c)
    case Filter(cond, c) if onlyNullGuards(cond) => bareFullScan(c)
    case _ => false
  }

  /** A side that is not structurally bounded but is hinted broadcast AND
    * row-reduced (a real filter / limit / aggregate above the scan): the
    * approved "broadcast the small scored set against the corpus" idiom
    * (q33's query set, centroid tables, anchor sets) — the author asserts
    * the contract the hint encodes, and rule 2 still rejects the hint when
    * nothing reduces the side. */
  private def smallByContract(side: LogicalPlan,
      hint: Option[HintInfo]): Boolean =
    hint.exists(_.strategy.contains(BROADCAST)) && !bareFullScan(side)

  def lint(plan: LogicalPlan,
      constantTables: Set[String] = DefaultConstantTables): Seq[Finding] = {
    val out = Seq.newBuilder[Finding]

    plan.foreach {
      case w: Window if w.partitionSpec.isEmpty =>
        if (!bounded(w.child))
          out += Finding("global-window-over-raw", Error,
            s"unpartitioned window over a data-sized input: ${w.windowExpressions.map(_.sql).mkString(", ")}")
      case j: Join =>
        def checkHint(h: Option[HintInfo], side: LogicalPlan, name: String): Unit =
          if (h.exists(_.strategy.contains(BROADCAST))
              && bareFullScan(side)
              && !scannedTables(side).forall(constantTables.contains))
            out += Finding("raw-broadcast-hint", Error,
              s"mandatory broadcast of a bare full scan on the $name side: ${scannedTables(side).mkString(",")}")
        checkHint(j.hint.leftHint, j.left, "left")
        checkHint(j.hint.rightHint, j.right, "right")
        if (j.condition.isEmpty
            && !bounded(j.left) && !bounded(j.right)
            && !smallByContract(j.left, j.hint.leftHint)
            && !smallByContract(j.right, j.hint.rightHint))
          out += Finding("unbounded-cartesian", Error,
            "condition-free join with two data-sized sides")
      case p =>
        p.expressions.foreach(_.foreach {
          case _: Percentile =>
            out += Finding("exact-percentile", Advice,
              "exact percentile buffers the per-group value multiset; " +
                "use counting percentiles (q169) or approx_percentile (q115) at scale")
          case _ => ()
        })
    }
    out.result().distinct
  }

  /** Lint a DataFrame's OPTIMIZED plan (post-pushdown, the shape that
    * executes). */
  def check(df: DataFrame,
      constantTables: Set[String] = DefaultConstantTables): Seq[Finding] =
    lint(df.queryExecution.optimizedPlan, constantTables)

  /** Warn-only optimizer rule: logs findings, never rewrites. */
  class LintRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      lint(plan).foreach { f =>
        logWarning(s"[scale-lint] ${f.severity}/${f.rule}: ${f.detail}")
      }
      plan
    }
  }
}

/** `spark.sql.extensions=graft.plans.GraftLintExtension` (or
  * `.withExtensions(new GraftLintExtension)`): every query planned in the
  * session is linted, findings land in the driver log. */
class GraftLintExtension
    extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => new ScaleLint.LintRule)
}
