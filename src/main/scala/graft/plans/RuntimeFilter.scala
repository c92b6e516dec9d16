package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.{ColumnBridge, SubqueryBridge}

/** Explicit runtime-filter (semi-join reduction) operators: prune a huge
  * fact table BEFORE its shuffle using a compact summary of the (already
  * filtered) build side. This is the manual form of what Spark's
  * `InjectRuntimeFilter` rule does when it fires — exposed as an operator
  * so a pipeline author can apply it deterministically (the rule's
  * heuristics — creation-side size thresholds, one-filter-per-query caps —
  * often decline exactly the 100 TB joins that need it most).
  *
  * Scale rationale: a selective dimension filter (`s_nationkey = 7`) keeps
  * ~4 % of suppliers, but every lineitem row still pays the full shuffle
  * before the join discards 96 % of them. A bloom filter over the surviving
  * build keys is a few hundred KB, ships to every scan task, and drops
  * non-joining fact rows AT THE SCAN — the shuffle then carries only
  * ~|matching| rows. False positives merely ride along and are removed by
  * the real join, so the composed result is EXACT (oracle-checkable against
  * the plain join, q80).
  */
object RuntimeFilter {

  /** Rows of `fact` whose `factKey` might be in `keys.keyCol`, decided by a
    * bloom filter built over the build side in ONE aggregate. Lazy
    * end-to-end: the bloom aggregate runs as an uncorrelated scalar
    * subquery inside the consuming query (no driver-side collect at
    * construction). Output is a SUPERSET of the joining rows (bloom false
    * positives, rate set by `expectedItems`/`numBits`) — always follow with
    * the real join; never use alone as a semi join.
    *
    * @param expectedItems build-side distinct-key estimate; sizes the
    *                      filter (default 1M keys / ~8.4 Mbit ≈ 1 MB,
    *                      <3 % FP at capacity — the broadcast stays
    *                      dimension-sized even when the estimate is off)
    */
  def bloomPrune(
      fact: DataFrame, factKey: Column,
      keys: DataFrame, keyCol: Column,
      expectedItems: Long = 1000000L): DataFrame = {
    val bloomAgg = ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(keyCol)), expectedItems)
        .toAggregateExpression())
    val bloom = keys.agg(bloomAgg.as("__bloom"))
    fact.filter(ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(SubqueryBridge.scalar(bloom)),
      ColumnBridge.expression(xxhash64(factKey)))))
  }
}
