package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Batch sessionization over an event stream table (north-star ST7 analogue;
  * the streaming twin uses `session_window` — see graft.streaming).
  *
  * Algorithm: per-user ordered scan; a session break is a gap > `gapSec`
  * from the previous event; session id = running count of breaks. Exactly
  * one shuffle (hash by user) + one in-partition sort; both window passes
  * and the final groupBy reuse the same partitioning, so Catalyst plans a
  * single Exchange for the whole pipeline — the sessionization shape that
  * holds at 100 TB (user cardinality ≫ cores, no driver state).
  */
object Sessionize {

  /** One row per (user_id, session_id): bounds, size, value sum.
    * Timestamps are compared in whole microseconds (`unix_micros`) so the
    * semantics are engine-portable (no float seconds). */
  def sessions(events: DataFrame, gapSec: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = gapSec * 1000000L
    val withBreaks = events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("is_break",
        when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("is_break")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withBreaks
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sum(col("value").cast(DecimalType(28, 2))).cast("double").as("session_value"))
      .withColumn("duration_sec",
        ((unix_micros(col("session_end")) - unix_micros(col("session_start"))) / 1000000L)
          .cast("long"))
  }
}
