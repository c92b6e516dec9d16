package graft.ext

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed Space-Saving heavy hitters (Metwally 2005) — the batch and
  * global-merge side of the summary whose per-shard streaming form lives in
  * [[graft.streaming.Stateful.SpaceSavingProcessor]].
  *
  * Why not just groupBy-count? At 100 TB the exact count table is itself
  * huge (one row per distinct item — for corpus tokens, billions), and most
  * consumers only want the head. Space-Saving maintains a CAPACITY-BOUNDED
  * summary with a per-item error certificate:
  * `true ∈ [count − over, count]`, and every item with true frequency
  * > N/capacity is guaranteed present (the Metwally invariant).
  *
  * Distribution model (the "mergeable summaries" construction — Agarwal,
  * Cormode et al.): each partition folds its rows through the plain
  * streaming insert; partial summaries merge pairwise with the
  * error-accumulating rule (absent items take the other side's minimum
  * counter as both count proxy and added overestimate), then trim to
  * capacity. Merged error bounds ADD — the result of any merge tree over
  * partitions of a stream of N items keeps error ≤ N/capacity, which is
  * why the final summary's certificates survive arbitrary partitioning and
  * merge order. Summary CONTENT below the guarantee line may vary with
  * merge order (inherent to the algorithm, same as the streaming form's
  * arrival-order dependence) ⇒ catalog exposure is rows-only, with the
  * invariants guarded in QualityGuardSpec against exact counts.
  *
  * 100 TB shape: state is O(capacity) per partial, shuffle is one summary
  * per partition (KBs), one pass over the data, no exact count table ever
  * materializes. The same merge serves the streaming reader: per-shard
  * summaries from the processor (disjoint item sets by construction)
  * concatenate and trim via [[mergeShards]].
  */
object SpaceSaving {

  /** One summary row: estimated count and its overestimate bound.
    * Invariant: true count ∈ [count − over, count]. */
  final case class Entry(item: String, count: Long, over: Long)

  /** Fixed-capacity builder: `n` live slots of the parallel arrays. */
  final case class Buf(var n: Int, items: Array[String],
    counts: Array[Long], overs: Array[Long])

  final case class Summary(entries: Array[Entry])

  private def insert(b: Buf, item: String, k: Int): Buf = {
    var i = 0
    while (i < b.n) {
      if (b.items(i) == item) { b.counts(i) += 1; return b }
      i += 1
    }
    if (b.n < k) {
      b.items(b.n) = item; b.counts(b.n) = 1L; b.overs(b.n) = 0L; b.n += 1
    } else {
      // evict the (count, item)-minimum; the newcomer inherits its count
      // as the overestimate bound — the Metwally replacement rule
      var m = 0
      i = 1
      while (i < b.n) {
        if (b.counts(i) < b.counts(m) ||
          (b.counts(i) == b.counts(m) && b.items(i) < b.items(m))) m = i
        i += 1
      }
      val minC = b.counts(m)
      b.items(m) = item; b.counts(m) = minC + 1; b.overs(m) = minC
    }
    b
  }

  /** Error floor a summary charges an ABSENT item: 0 while under capacity
    * (absent ⇒ never seen), else the minimum counter. */
  private def minProxy(b: Buf, k: Int): Long =
    if (b.n < k) 0L
    else { var m = b.counts(0); var i = 1; while (i < b.n) { if (b.counts(i) < m) m = b.counts(i); i += 1 }; m }

  /** Pairwise merge with trim-to-capacity: counts and overestimates add;
    * an item absent from one side takes that side's min counter as both
    * count proxy and extra overestimate (it may have occurred up to that
    * many times there without surviving). Survivors keep valid
    * certificates; total error stays ≤ (N_a + N_b)/capacity. */
  private def merge(a: Buf, b: Buf, k: Int): Buf = {
    val ma = minProxy(a, k)
    val mb = minProxy(b, k)
    val m = scala.collection.mutable.HashMap[String, (Long, Long)]()
    val inB = scala.collection.mutable.HashSet[String]()
    var i = 0
    while (i < a.n) { m(a.items(i)) = (a.counts(i), a.overs(i)); i += 1 }
    i = 0
    while (i < b.n) {
      val it = b.items(i)
      inB += it
      m.get(it) match {
        case Some((c, o)) => m(it) = (c + b.counts(i), o + b.overs(i))
        case None => m(it) = (b.counts(i) + ma, b.overs(i) + ma)
      }
      i += 1
    }
    // items only in a: charge b's proxy
    i = 0
    while (i < a.n) {
      val it = a.items(i)
      if (!inB.contains(it)) m(it) = (a.counts(i) + mb, a.overs(i) + mb)
      i += 1
    }
    val top = m.toArray.sortBy { case (it, (c, _)) => (-c, it) }.take(k)
    val out = Buf(top.length, new Array[String](k), new Array[Long](k), new Array[Long](k))
    i = 0
    while (i < top.length) {
      out.items(i) = top(i)._1; out.counts(i) = top(i)._2._1
      out.overs(i) = top(i)._2._2; i += 1
    }
    out
  }

  private class SSAgg(k: Int) extends Aggregator[String, Buf, Summary] {
    def zero: Buf = Buf(0, new Array[String](k), new Array[Long](k), new Array[Long](k))
    def reduce(b: Buf, item: String): Buf = insert(b, item, k)
    def merge(a: Buf, b: Buf): Buf = SpaceSaving.merge(a, b, k)
    def finish(b: Buf): Summary = Summary(
      (0 until b.n).map(i => Entry(b.items(i), b.counts(i), b.overs(i)))
        .sortBy(e => (-e.count, e.item)).toArray)
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Summary] = Encoders.product[Summary]
  }

  /** One-pass capacity-bounded heavy-hitter summary of `itemCol`:
    * (item, count, over, floor) rows, count-descending, where
    * `floor = count − over` is the certified lower bound. Fully
    * distributed — per-partition folds, summary-sized shuffle, no collect.
    * Null items are dropped up front (a count of nulls is a data-quality
    * stat, not a heavy hitter): the eviction/merge orderings compare items
    * with String `<`, so an unfiltered null would NPE inside the
    * aggregator rather than fail diagnosably. */
  def summarize(df: DataFrame, itemCol: String, capacity: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new SSAgg(capacity).toColumn
    df.filter(col(itemCol).isNotNull)
      .select(col(itemCol).cast("string")).as[String]
      .select(agg) // Summary's fields flatten: one `entries` array column
      .select(explode(col("entries")).as("e"))
      .select(col("e.item").as("item"), col("e.count").as("count"),
        col("e.over").as("over"), (col("e.count") - col("e.over")).as("floor"))
  }

  /** Global view over PER-SHARD summaries (the streaming processor's
    * output, where items are hash-sharded so shard item sets are
    * DISJOINT): merge = concatenate + keep the capacity largest. Bounds
    * carry through unchanged — each item's certificate came from the one
    * shard that saw its whole stream. */
  def mergeShards(shardSummaries: DataFrame, capacity: Int): DataFrame =
    shardSummaries
      .select(col("item"), col("count"), col("over"),
        (col("count") - col("over")).as("floor"))
      .orderBy(col("count").desc, col("item")).limit(capacity)
}
