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

  /** [[releaseAll]] plus a guarded full GC when the heap is filling up.
    * For benchmark gaps only (it is deliberately NOT called from library
    * code): across a long query catalog the driver JVM accumulates garbage
    * — shuffle/broadcast metadata, codegen classes, collected buffers —
    * and on a large heap the eventual major collection plus the
    * ContextCleaner backlog it releases land INSIDE whichever query is
    * running when it fires (driver-run benches showed a ~8-13 s spike
    * migrating between CC-family queries round to round). Forcing the
    * collection in the untimed gap once usage crosses `minUsedFraction`
    * moves that cost out of every timed section without changing what is
    * measured. */
  def releaseAndSettle(spark: SparkSession, minUsedFraction: Double = 0.4): Unit = {
    releaseAll(spark)
    val rt = Runtime.getRuntime
    if (rt.totalMemory() - rt.freeMemory() > minUsedFraction * rt.maxMemory())
      System.gc()
  }
}
