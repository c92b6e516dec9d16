package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.ScalarSubquery
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge for building an UNCORRELATED SCALAR SUBQUERY Column from a
  * 1-row/1-column DataFrame — the lazy alternative to collecting a scalar
  * on the driver at plan-construction time. The subquery executes as part
  * of the consuming query's job graph (Spark plans it as a
  * ScalarSubqueryExec / SubqueryExec stage), so plan construction stays
  * action-free and the whole pipeline remains ONE lazy plan.
  *
  * This is also the only DataFrame-API route into expressions whose type
  * check demands "a constant or an uncorrelated scalar subquery" (e.g.
  * `BloomFilterMightContain`): a join-produced column reference fails that
  * check, a driver-side collect would be eager — a ScalarSubquery over the
  * aggregate's analyzed plan is both lazy and accepted.
  */
object SubqueryBridge {
  /** `df` must produce exactly one row and one column (enforced by Spark at
    * execution — a multi-row subquery fails the query, same as SQL). */
  def scalar(df: DataFrame): Column =
    ExpressionUtils.column(ScalarSubquery(df.queryExecution.analyzed))
}
