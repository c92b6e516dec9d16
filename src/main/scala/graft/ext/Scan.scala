package graft.ext

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
  */
object Scan {

  /** Running EXCLUSIVE max of `value` over the global `order`: each row
    * gets the max of `value` over all STRICTLY EARLIER rows (null for
    * the global first row — no earlier rows). The building block of
    * sort-based skyline/Pareto extraction and high-watermark scans. */
  def runningMaxExclusive(df: DataFrame, order: Seq[Column],
      value: String, out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pid = "__scan_pid"
    val local = df.repartitionByRange(order: _*)
      .withColumn(pid, spark_partition_id())
      .withColumn("__local_max",
        max(col(value)).over(Window.partitionBy(col(pid)).orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .localCheckpoint(eager = false)
    val offsets = local.groupBy(col(pid)).agg(max(col(value)).as("__pmax"))
      .withColumn("__prefix", max(col("__pmax")).over(
        Window.orderBy(col(pid)).rowsBetween(Window.unboundedPreceding, -1)))
      .select(col(pid), col("__prefix"))
    local.join(broadcast(offsets), Seq(pid))
      .withColumn(out,
        when(col("__prefix").isNull, col("__local_max"))
          .when(col("__local_max").isNull, col("__prefix"))
          .otherwise(greatest(col("__prefix"), col("__local_max"))))
      .drop(pid, "__local_max", "__prefix")
  }

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
