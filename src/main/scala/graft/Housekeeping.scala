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

  /** [[releaseAll]] plus an UNCONDITIONAL full GC and a blocking drain of
    * the async ContextCleaner. For benchmark gaps only (it is deliberately
    * NOT called from library code): across a long query catalog the driver
    * JVM accumulates garbage — shuffle/broadcast metadata, codegen classes,
    * collected buffers — and the eventual major collection plus the
    * ContextCleaner backlog it releases land INSIDE whichever query is
    * running when they fire (driver benches showed a ~8-13 s spike
    * migrating between queries round to round; a heap-fraction-gated
    * `System.gc()` demonstrably did not stop it, because the gate skipped
    * settles and `System.gc()` alone only ENQUEUES cleanup work for the
    * async cleaner thread). Every settle now pays the full collection AND
    * waits for cleaner quiescence in the untimed gap, so no timed section
    * inherits another query's cleanup. */
  def releaseAndSettle(spark: SparkSession): Unit = {
    releaseAll(spark)
    org.apache.spark.graft.CleanerBridge.settle(spark.sparkContext)
  }
}
