package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without a nested-loop plan.
  *
  * Spark plans `points JOIN intervals ON p BETWEEN s AND e` as
  * BroadcastNestedLoopJoin — O(|P|·|I|) compares, non-viable once the
  * interval side outgrows a broadcast. The scale shape (Flink interval
  * joins, spatial engines' grid joins) is BINNING: discretize the domain
  * into fixed-width bins, replicate each interval to every bin it overlaps,
  * map each point to its single bin, equi-join on the bin id, then verify
  * the exact predicate.
  *
  *  - A (point, interval) pair meets in EXACTLY one bin — the point's —
  *    so no post-join dedup is needed.
  *  - Cost: one hash shuffle on the bin id + |interval| × (span/width)
  *    replication. Pick `binWidth` ≈ the typical interval length: short
  *    intervals replicate ~2×, and bin population (not the whole table)
  *    bounds the per-bin verify work.
  *  - Long-tail intervals (≫ binWidth) replicate proportionally — cap or
  *    split pathological spans upstream the same way LSH caps buckets.
  */
object RangeJoin {

  /** `point`, `start`, `end` are integral-valued columns in the same units
    * (e.g. epoch days/seconds); match condition is `start <= point <= end`
    * (inclusive both ends). Output: all columns of both inputs. */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      point: String, start: String, end: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val pb = points.withColumn("__bin",
      floor(col(point) / lit(binWidth.toDouble)).cast("long"))
    val ib = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(start) / lit(binWidth.toDouble)).cast("long"),
        floor(col(end) / lit(binWidth.toDouble)).cast("long"))))
    pb.join(ib, Seq("__bin"))
      .filter(col(point) >= col(start) && col(point) <= col(end))
      .drop("__bin")
  }

  /** Interval × interval OVERLAP join (closed intervals, integral units):
    * pairs where `lStart <= rEnd AND rStart <= lEnd`. Same binning shape
    * as [[pointInInterval]], with one twist: an overlapping pair shares
    * SEVERAL bins, so the match is attributed to exactly ONE canonical
    * bin — the bin of the overlap's START (`greatest(lStart, rStart)`),
    * which lies inside both intervals by definition of overlap and is
    * therefore covered by both replications. That keeps the join
    * duplicate-free WITHOUT a distinct pass (a distinct would shuffle the
    * whole match set a second time). Cost: one equi-join on the bin id +
    * span/width replication per side. Column names must be disjoint
    * across the two inputs. */
  def intervalOverlap(
      left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bins(df: DataFrame, s: String, e: String) = df.withColumn("__bin",
      explode(sequence(
        floor(col(s) / lit(binWidth.toDouble)).cast("long"),
        floor(col(e) / lit(binWidth.toDouble)).cast("long"))))
    bins(left, lStart, lEnd).join(bins(right, rStart, rEnd), Seq("__bin"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bin") ===
        floor(greatest(col(lStart), col(rStart)) / lit(binWidth.toDouble)).cast("long"))
      .drop("__bin")
  }
}
