package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's three Gold tables over the Silver transaction schema.
  *
  * Reference behavior: `/root/reference/03_Gold_Aggregates_Features.py`.
  * Expected shapes (README:24-28): merchant_risk_summary one row per
  * merchant (500), cardholder_features one row per token (10), hourly stats
  * one row per (date, hour, network, category).
  */
object TxnGold {

  private def countIf(cond: Column): Column = sum(when(cond, 1L).otherwise(0L))

  /** Merchant risk summary (03:40-59). */
  def merchantRiskSummary(silver: DataFrame): DataFrame =
    silver.groupBy(col("merchant_name"), col("mcc_category"))
      .agg(
        count(lit(1)).as("txn_count"),
        round(sum(col("amount")), 2).as("total_amount"),
        round(avg(col("amount")), 2).as("avg_amount"),
        max(col("amount")).as("max_amount"),
        countDistinct(col("cardholder_token")).as("unique_cardholders"),
        countIf(col("risk_score_raw") >= 50).as("high_risk_txns"),
        countIf(col("is_online")).as("online_txns"),
        countIf(col("amount_anomaly_flag")).as("anomaly_txns"))
      .withColumn("high_risk_pct", // 03:55-58
        round(col("high_risk_txns") / col("txn_count") * 100, 2))

  /** Cardholder behavioral features (03:93-147; feature list 04:61-71). */
  def cardholderFeatures(silver: DataFrame): DataFrame =
    silver.groupBy(col("cardholder_token"))
      .agg(
        count(lit(1)).as("txn_count"),
        round(sum(col("amount")), 2).as("total_spend"),
        round(avg(col("amount")), 2).as("avg_amount"),
        round(stddev(col("amount")), 2).as("stddev_amount"),
        max(col("amount")).as("max_amount"),
        min(col("amount")).as("min_amount"),
        countDistinct(col("merchant_name")).as("unique_merchants"),
        countDistinct(col("mcc_category")).as("unique_categories"),
        countDistinct(col("merchant_state")).as("unique_states"),
        countIf(col("is_online")).as("online_count"),
        countIf(!col("is_online")).as("offline_count"),
        countIf(col("is_international")).as("international_count"),
        countIf(col("velocity_flag")).as("velocity_count"),
        countIf(col("amount_anomaly_flag")).as("anomaly_count"),
        avg(col("risk_score_raw")).as("avg_risk_score"),
        max(col("risk_score_raw")).as("max_risk_score"),
        min(col("event_date")).as("first_seen"),
        max(col("event_date")).as("last_seen"))
      .withColumn("online_ratio", round(col("online_count") / col("txn_count"), 4)) // 03:130-137
      .withColumn("international_ratio", round(col("international_count") / col("txn_count"), 4))
      .withColumn("velocity_ratio", round(col("velocity_count") / col("txn_count"), 4))
      .withColumn("anomaly_ratio", round(col("anomaly_count") / col("txn_count"), 4))
      .withColumn("is_suspicious", // 03:140-146
        (col("avg_risk_score") >= 40) ||
          (col("velocity_count") >= 2) ||
          (col("anomaly_count") >= 3))

  /** Hourly volume stats (03:173-183). */
  def hourlyVolumeStats(silver: DataFrame): DataFrame =
    silver.groupBy(
        col("event_date"), col("event_hour"), col("card_network"), col("mcc_category"))
      .agg(
        count(lit(1)).as("txn_count"),
        round(sum(col("amount")), 2).as("total_volume"),
        round(avg(col("amount")), 2).as("avg_amount"),
        countDistinct(col("cardholder_token")).as("unique_cardholders"),
        countIf(col("risk_score_raw") >= 50).as("high_risk_count"))
}
