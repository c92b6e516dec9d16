package org.apache.spark.graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.{CleanerListener, SparkContext}

/** Minimal `private[spark]` accessor for the async ContextCleaner, used by
  * benchmark housekeeping to move GC + cleanup cost OUT of timed sections.
  *
  * Why it exists: `System.gc()` only ENQUEUES the weak references of
  * collected RDDs/broadcasts/shuffles; the ContextCleaner thread processes
  * that queue asynchronously, issuing blocking block-manager and shuffle
  * removals. Without waiting for that drain, a settle in the untimed gap
  * still leaks an 8-13 s cleanup spike into whichever query runs next
  * (observed migrating between catalog queries across driver bench rounds).
  * The cleaner's backlog is not directly observable (its referenceBuffer
  * also holds refs for still-live objects), so drain completion is detected
  * by QUIESCENCE: a listener counts cleaned events and the settle returns
  * once no event has arrived for `quietMs`.
  */
object CleanerBridge {
  private val cleanedCount = new AtomicLong(0L)
  @volatile private var attachedTo: SparkContext = _

  private def ensureListener(sc: SparkContext): Unit = synchronized {
    if (attachedTo ne sc) {
      sc.cleaner.foreach(_.attachListener(new CleanerListener {
        override def rddCleaned(rddId: Int): Unit = cleanedCount.incrementAndGet()
        override def shuffleCleaned(shuffleId: Int): Unit = cleanedCount.incrementAndGet()
        override def broadcastCleaned(broadcastId: Long): Unit = cleanedCount.incrementAndGet()
        override def accumCleaned(accId: Long): Unit = cleanedCount.incrementAndGet()
        override def checkpointCleaned(rddId: Long): Unit = cleanedCount.incrementAndGet()
      }))
      attachedTo = sc
    }
  }

  /** Block until the async listener bus has delivered every queued event —
    * lets tests attach a counting listener with no stale backlog racing in. */
  def waitListenerBusEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()

  /** Force a full collection and block until the ContextCleaner has gone
    * quiet (two GC passes: the cleaner's own processing frees more driver
    * objects, whose refs the second pass enqueues). Bounded by `timeoutMs`
    * so a wedged cleaner can never hang the caller. */
  def settle(sc: SparkContext, quietMs: Long = 200, timeoutMs: Long = 8000): Unit = {
    ensureListener(sc)
    val deadline = System.currentTimeMillis() + timeoutMs
    var pass = 0
    while (pass < 2 && System.currentTimeMillis() < deadline) {
      System.gc()
      var last = cleanedCount.get()
      var quietStart = System.currentTimeMillis()
      var quiet = false
      while (!quiet && System.currentTimeMillis() < deadline) {
        Thread.sleep(25)
        val now = cleanedCount.get()
        if (now != last) { last = now; quietStart = System.currentTimeMillis() }
        else if (System.currentTimeMillis() - quietStart >= quietMs) quiet = true
      }
      pass += 1
    }
  }
}
