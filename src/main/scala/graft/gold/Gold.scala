package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Gold-stage aggregate builders — the reference's three Gold tables
  * re-expressed over the testdata star schema.
  *
  * Reference behavior: `/root/reference/03_Gold_Aggregates_Features.py`
  * (merchant risk 03:40-59, cardholder features 03:93-147, hourly stats
  * 03:173-183).
  *
  * All are single groupBy+agg passes: partial aggregation map-side, only
  * |groups| rows cross the shuffle — the shape that survives a 1000×
  * scale-up. Mixed countDistinct+plain aggs are rewritten by Catalyst into
  * Expand + two-phase HashAggregate; nothing custom needed.
  */
object Gold {

  private def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double")

  private def countIf(cond: Column): Column = sum(when(cond, 1L).otherwise(0L))

  /** Merchant-risk-style summary (ref 03:40-59): per-supplier transaction
    * aggregates + flag rates. `lineitem ⋈ supplier` plays txns⋈merchant.
    * The merchant dimension joins UNHINTED: it is data-sized (one row per
    * supplier — SF-proportional), so a mandatory broadcast would OOM the
    * driver at 100 TB (the q193 rule; flagged by ScaleLint r14, a shipped
    * r1 liability). AQE still elects a broadcast at bench SFs where it
    * fits under the threshold. */
  def merchantRisk(lineitem: DataFrame, supplier: DataFrame): DataFrame =
    lineitem
      .join(supplier, lineitem("l_suppkey") === supplier("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(
        count(lit(1)).as("n_txns"),
        dsum(col("l_extendedprice"), 2).as("total_amount"),
        max(col("l_extendedprice")).as("max_amount"),
        min(col("l_extendedprice")).as("min_amount"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        countIf(col("l_extendedprice") > 80000).as("n_high_amount"),
        countIf(col("l_returnflag") === "R").as("n_returned"))
      .withColumn("avg_amount", col("total_amount") / col("n_txns"))
      .withColumn("high_amount_rate", col("n_high_amount") / col("n_txns"))
      .withColumn("return_rate", col("n_returned") / col("n_txns"))

  /** Cardholder-features-style per-entity feature table (ref 03:93-147,
    * feature list 04:61-71): one row per customer, ~12 behavioral features.
    */
  def customerFeatures(orders: DataFrame): DataFrame =
    orders
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice"), 2).as("total_spend"),
        max(col("o_totalprice")).as("max_order"),
        min(col("o_totalprice")).as("min_order"),
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        countDistinct(to_date(col("o_orderdate"))).as("n_active_days"),
        countIf(col("o_orderstatus") === "F").as("n_finished"),
        countIf(col("o_orderpriority") === "1-URGENT").as("n_urgent"),
        min(to_date(col("o_orderdate"))).as("first_order_date"),
        max(to_date(col("o_orderdate"))).as("last_order_date"))
      .withColumn("avg_order_value", col("total_spend") / col("n_orders"))
      .withColumn("urgent_ratio", col("n_urgent") / col("n_orders"))
      .withColumn("finished_ratio", col("n_finished") / col("n_orders"))
      .withColumn("lifetime_days",
        datediff(col("last_order_date"), col("first_order_date")).cast("long"))

  /** Hourly volume stats (ref 03:173-183): event-time grouping on
    * pre-extracted date/hour columns. */
  def hourlyStats(events: DataFrame): DataFrame =
    events
      .groupBy(
        to_date(col("ts")).as("event_date"),
        hour(col("ts")).cast("long").as("event_hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value"), 2).as("total_value"),
        countDistinct(col("user_id")).as("n_users"))
      .withColumn("avg_value", col("total_value") / col("n_events"))
}
