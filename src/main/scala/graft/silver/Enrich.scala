package graft.silver

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Enrichment combinators: literal-map lookups, bucketing, risk scoring.
  *
  * Reference behavior: `/root/reference/02_Silver_Cleanse_PII.py:143-165`
  * (mcc_category map lookup, amount buckets, additive risk score).
  *
  * Scale notes:
  *  - A literal `map(...)` lookup is constant-folded into the projection —
  *    zero joins, zero shuffles; correct for small closed code sets.
  *  - For dimension tables too big to inline but small enough for memory,
  *    [[dimLookup]] does an explicit `broadcast()` join — no shuffle of the
  *    fact side.
  */
object Enrich {

  /** Literal map lookup with default: `lookup(col, "a"->"x", ...)`.
    * Plans as `element_at(map(...), col)` — folded by Catalyst, codegen'd. */
  def lookup(key: Column, mapping: Seq[(String, String)], default: String): Column =
    coalesce(
      element_at(map(mapping.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*), key),
      lit(default))

  /** Range bucketing via a when-chain (ref 02:150-154).
    * `bounds` are upper bounds (exclusive) paired with labels, checked in
    * order; `last` labels everything ≥ the final bound. */
  def buckets(c: Column, bounds: Seq[(Double, String)], last: String): Column =
    bounds.foldRight(lit(last): Column) { case ((ub, label), elseCol) =>
      when(c < ub, label).otherwise(elseCol)
    }

  /** Additive signal score (ref 02:159-164): sum of weights for true flags. */
  def additiveScore(signals: Seq[(Column, Int)]): Column =
    signals.map { case (flag, w) => when(coalesce(flag, lit(false)), w).otherwise(0) }
      .reduce(_ + _)

  /** Broadcast dimension join — the scale-out version of [[lookup]]: the dim
    * is shipped to every executor, the (huge) fact side never shuffles.
    */
  def dimLookup(fact: DataFrame, dim: DataFrame, key: Seq[String]): DataFrame =
    fact.join(broadcast(dim), key, "left")
}
