package graft
import org.apache.spark.sql.SparkSession

/** Session hygiene between catalog queries. Several operators materialize
  * state the RESULT DataFrame still references (connected-components final
  * labels, the PPJoin cluster table, LSH bucket checkpoints) — they cannot
  * unpersist it themselves. Once a harness has consumed a query's result,
  * those blocks are garbage; left in place they accumulate across the
  * catalog and degrade every later query (block-manager pressure measured
  * 2-10x on queries that happen to run after the CC family).
  */
object Housekeeping {
  /** Drop every persisted RDD and cached plan. Only call when no live
    * DataFrame from a prior query will be reused — unpersisting a
    * localCheckpointed RDD discards both its blocks and its lineage. */
  def releaseAll(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    spark.catalog.clearCache()
  }
}
