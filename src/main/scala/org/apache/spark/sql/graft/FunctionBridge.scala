package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` session function registry: registers a
  * builder under a SQL name on an EXISTING session (the complement of
  * `SparkSessionExtensions.injectFunction`, which only applies at session
  * build time).
  */
object FunctionBridge {
  def registerTemp(
      spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
}
