package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted joins and bucketed (co-located) joins.
  *
  * A hot join key sends all its rows to one reducer; AQE's skew-join split
  * handles sort-merge cases adaptively, but salting is the explicit,
  * strategy-independent fix: spread the hot key over `factor` sub-keys and
  * replicate the other side `factor`×. Equivalent result, `factor`-way
  * parallel hot key.
  */
object Salt {

  /** Inner equi-join with an exploded-salt right side.
    * `big` gets a deterministic per-row salt (hash of the whole row — no
    * rand(), so retries/replays stay stable); `small` is replicated once per
    * salt value. Same rows as `big.join(small, key)`, minus the skew. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, factor: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(factor)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Aggregate-side salting: two-phase groupBy for a skewed grouping key.
    * Phase 1 aggregates (key, salt) partials; phase 2 merges per key. Only
    * works for algebraic aggregates — here count and sum. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String, factor: Int): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(struct(df.columns.map(col): _*)), lit(factor)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("total"))

  /** 2-D TILED pair self-join for skewed key groups — the all-pairs
    * analogue of [[saltedJoin]]. `left.join(right, key)` on a self-join
    * shape (both sides the same per-key row sets under different column
    * names) sends a group of m rows to ONE task that emits all m² pairs;
    * one oversized group is then a straggler no matter how balanced the
    * rest of the shuffle is (the q179 kNN-graph attractor cluster:
    * one 116 s task under a 139 s wall at 100×).
    *
    * The fix is the standard grid decomposition for all-pairs work: split
    * each group into f sub-groups (f = ⌈m / √pairBudget⌉, so every tile
    * holds ≤ pairBudget pairs), assign each left row its hash tile row
    * `h(id) mod f` replicated across all f tile columns, each right row
    * its hash tile column replicated across all f tile rows, and equi-join
    * on (key, tileRow, tileCol). A pair (a, b) meets in EXACTLY the tile
    * (h(a) mod f, h(b) mod f) — same pair set as the plain join, no dedup
    * needed — while the group's m² pairs spread over f² tasks. Replication
    * is f× per side (m·f = m²/√pairBudget rows), asymptotically dwarfed by
    * the pair work itself, and f = 1 (zero replication, the plain join's
    * exact shuffle) for every group under the budget.
    *
    * Per-group factors come from narrow count aggregates over BOTH sides
    * (r18 — factors were left-only, which honored the budget only for the
    * symmetric self-join shape; with asymmetric inputs per-tile pairs grew
    * as pairBudget·(mR/mL)): f = ⌈√(mL·mR / pairBudget)⌉, so per-tile
    * pairs = mL·mR/f² ≤ pairBudget for ANY shape, and the full-outer size
    * merge means keys present on only one side keep a factor row (they
    * emit zero pairs either way — inner join on key — but are never
    * silently dropped by the factor attach). Factors broadcast back to
    * both sides — no collect, they scale with the data. CALLER CONTRACT:
    * `left`/`right` derived from an expensive lineage should be
    * barrier()ed first, or the sizes branch re-derives it a third time.
    * Deterministic (xxhash64 tiles) ⇒ replays stable. */
  def tiledPairJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftId: String, rightId: String, pairBudget: Long): DataFrame = {
    require(pairBudget > 0, "pairBudget must be positive")
    val lSz = left.groupBy(col(key)).agg(count(lit(1)).as("__ml"))
    val rSz = right.groupBy(col(key)).agg(count(lit(1)).as("__mr"))
    val factors = lSz.join(rSz, Seq(key), "full_outer")
      .select(col(key),
        greatest(lit(1), ceil(sqrt(
          coalesce(col("__ml"), lit(1L)) * coalesce(col("__mr"), lit(1L))
            / lit(pairBudget.toDouble))).cast("int")).as("__f"))
    tiledPairJoinWithFactors(left, right, key, leftId, rightId, factors)
  }

  /** [[tiledPairJoin]] with CALLER-SUPPLIED per-key tile factors
    * `(key, __f)` — for callers that already know (an upper bound on)
    * per-key group sizes and can skip the counting aggregates: the PPJoin
    * hot-token branch derives factors from the vocabulary's document
    * frequencies it computes anyway (`ext/Dedup.repStructure`). Keys
    * missing from `factors` are DROPPED (the inner attach) — supply a
    * factor row for every key both sides can carry. A factor upper bound
    * is safe: tiles get smaller, replication grows, the pair set is
    * unchanged. */
  def tiledPairJoinWithFactors(
      left: DataFrame, right: DataFrame, key: String,
      leftId: String, rightId: String, factors: DataFrame): DataFrame = {
    val l = left.join(broadcast(factors), Seq(key))
      .withColumn("__ta", pmod(xxhash64(col(leftId)), col("__f")).cast("int"))
      .withColumn("__tb", explode(sequence(lit(0), col("__f") - 1)))
      .drop("__f")
    val r = right.join(broadcast(factors), Seq(key))
      .withColumn("__ta", explode(sequence(lit(0), col("__f") - 1)))
      .withColumn("__tb", pmod(xxhash64(col(rightId)), col("__f")).cast("int"))
      .drop("__f")
    l.join(r, Seq(key, "__ta", "__tb")).drop("__ta", "__tb")
  }
}
