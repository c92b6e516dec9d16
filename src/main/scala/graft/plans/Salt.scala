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
}
