package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic embedding corpus for scale probes: component
  * (id, dim) is xxhash64-derived uniform in [-1, 1) — the
  * [[graft.ext.Similarity]] hyperplane recipe, so every executor (and every
  * run) materializes identical vectors with zero driver state, and corpus
  * size is a dial, not a dataset. Distribution matches the testdata's
  * near-orthogonal regime (i.i.d. components), i.e. the ANN worst case —
  * scale measurements on it are conservative. */
object VecGen {
  def vectors(spark: SparkSession, n: Long, d: Int): DataFrame =
    spark.range(n).select(col("id"),
      transform(sequence(lit(0), lit(d - 1)), dim =>
        (pmod(xxhash64(col("id"), dim), lit(2000001L)) - lit(1000000L))
          .cast("double") / 1000000.0).as("vec"))

  /** CLUSTERED deterministic corpus — the regime where coarse+residual
    * quantization has structure to exploit (the near-orthogonal
    * [[vectors]] is the no-structure worst case): vector `id` = center
    * `id % k` plus `spread`-scaled i.i.d. noise, both xxhash64-derived
    * (same zero-driver-state property as [[vectors]]). With `spread` well
    * under the ~O(√d) inter-center distance, true nearest neighbors are
    * intra-cluster — exactly the structure residual codebooks model. */
  def clusteredVectors(spark: SparkSession, n: Long, d: Int, k: Int,
      spread: Double): DataFrame = {
    def unit(seed: org.apache.spark.sql.Column, dim: org.apache.spark.sql.Column) =
      (pmod(xxhash64(seed, dim), lit(2000001L)) - lit(1000000L))
        .cast("double") / 1000000.0
    spark.range(n).select(col("id"),
      transform(sequence(lit(0), lit(d - 1)), dim =>
        unit(concat(lit("c"), pmod(col("id"), lit(k.toLong))), dim) +
          lit(spread) * unit(col("id"), dim)).as("vec"))
  }
}
