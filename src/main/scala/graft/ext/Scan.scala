package graft.ext

import graft.plans.ScaleLint.BarrierSyntax

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PREFIX SCAN over a global order — running aggregates
  * without the single-partition window a plain
  * `agg(...).over(Window.orderBy(...))` plans (the classic 100 TB
  * dead-end: the whole table funnels through one task).
  *
  * The [[Dedup.distributedDenseRank]] decomposition generalized from
  * row-counting to any associative, commutative-merge aggregate:
  * range-repartition on the order keys, compute the running aggregate
  * WITHIN each partition in parallel, then combine each partition's
  * prefix (the aggregate of all earlier partitions — #partitions rows,
  * broadcast) into every row. Same pinning rule: the ranged table is
  * lazily checkpointed before branching so the offsets join and the data
  * rows observe ONE spark_partition_id assignment.
  *
  * Shipped instances: running exclusive MAX ([[runningMaxExclusive]]),
  * SUM ([[runningSumExclusive]]) and MIN ([[runningMinExclusive]]) — each
  * is the generic core with its (window aggregate, prefix combiner) pair;
  * the three-layout equivalence matrix in ScanSpec covers all of them.
  */
object Scan {

  /** The shared decomposition: `agg` is the associative aggregate applied
    * both within partitions and over the per-partition totals; `combine`
    * merges a non-null partition prefix with a non-null local running
    * value (greatest / + / least). Rows with no earlier rows anywhere get
    * null (exclusive frame, empty prefix). */
  private def scanExclusive(df: DataFrame, order: Seq[Column], value: String,
      out: String, agg: Column => Column,
      combine: (Column, Column) => Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pid = "__scan_pid"
    val local = df.repartitionByRange(order: _*)
      .withColumn(pid, spark_partition_id())
      .withColumn("__local",
        agg(col(value)).over(Window.partitionBy(col(pid)).orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .barrier()
    val offsets = local.groupBy(col(pid)).agg(agg(col(value)).as("__ptot"))
      .withColumn("__prefix", agg(col("__ptot")).over(
        Window.orderBy(col(pid)).rowsBetween(Window.unboundedPreceding, -1)))
      .select(col(pid), col("__prefix"))
    local.join(broadcast(offsets), Seq(pid))
      .withColumn(out,
        when(col("__prefix").isNull, col("__local"))
          .when(col("__local").isNull, col("__prefix"))
          .otherwise(combine(col("__prefix"), col("__local"))))
      .drop(pid, "__local", "__prefix")
  }

  /** Running EXCLUSIVE max of `value` over the global `order`: each row
    * gets the max of `value` over all STRICTLY EARLIER rows (null for
    * the global first row — no earlier rows). The building block of
    * sort-based skyline/Pareto extraction and high-watermark scans. */
  def runningMaxExclusive(df: DataFrame, order: Seq[Column],
      value: String, out: String): DataFrame =
    scanExclusive(df, order, value, out, max, greatest(_, _))

  /** Running EXCLUSIVE min — the low-watermark twin of
    * [[runningMaxExclusive]]. */
  def runningMinExclusive(df: DataFrame, order: Seq[Column],
      value: String, out: String): DataFrame =
    scanExclusive(df, order, value, out, min, least(_, _))

  /** Running EXCLUSIVE sum of `value` over the global `order` — the
    * data-sized running global total (cumulative revenue, global
    * high-watermark sums) that would otherwise force a single-partition
    * window over the data. Inclusive form: `coalesce(out, 0) + value`.
    * Pass an exact-width column (long counts, decimal money): the partial
    * sums are data-proportional, so a narrow integer can overflow at
    * scale exactly as it would under a plain windowed sum. */
  def runningSumExclusive(df: DataFrame, order: Seq[Column],
      value: String, out: String): DataFrame =
    scanExclusive(df, order, value, out, sum, _ + _)

  /** 2-D SKYLINE (Pareto frontier, maximize both dims) of DISTINCT
    * (x, y) points: a point survives iff no other point is ≥ in both
    * dims and > in at least one. Sort-based: order by (x desc, y desc,
    * tiebreak); a point is on the skyline iff its y exceeds the running
    * exclusive max of y — which [[runningMaxExclusive]] computes without
    * a global sort bottleneck. Callers collapse duplicate (x, y) pairs
    * first (equal points don't dominate each other; keeping one
    * representative is the standard distinct-skyline convention). */
  def skyline2D(points: DataFrame, x: String, y: String,
      tiebreak: String): DataFrame =
    runningMaxExclusive(points,
      Seq(col(x).desc, col(y).desc, col(tiebreak)), y, "__premax")
      .filter(col("__premax").isNull || col(y) > col("__premax"))
      .drop("__premax")
}
