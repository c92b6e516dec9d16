package graft.silver

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's Silver transform assembled from the silver combinators:
  * DQ split → PII masking → enrichment → risk score.
  *
  * Reference behavior: `/root/reference/02_Silver_Cleanse_PII.py:97-184`.
  */
object TxnSilver {

  /** DQ rules (02:113-117). */
  def rules(validMcc: Seq[String]): Seq[Quality.Rule] = Seq(
    Quality.Rule("null_transaction_id", col("transaction_id").isNotNull),
    Quality.Rule("non_positive_amount", col("amount") > 0),
    Quality.Rule("bad_card_number", length(col("card_number")) === 16),
    Quality.Rule("unknown_mcc", col("mcc_code").isin(validMcc: _*)))

  private val mccCategories = Seq( // 02:42-48, 145-147
    "5411" -> "Grocery", "5541" -> "Gas", "5812" -> "Restaurant",
    "5912" -> "Pharmacy", "5999" -> "Retail", "6011" -> "ATM",
    "4829" -> "Wire Transfer", "7011" -> "Hotel",
    "5732" -> "Electronics", "3000" -> "Airlines")

  /** Masking + enrichment of a valid batch (02:133-165): drops raw PII,
    * adds tokens, categories, buckets, and the additive risk score.
    * One codegen'd projection — no shuffle, no UDF. */
  def enrich(valid: DataFrame, clock: java.sql.Timestamp): DataFrame =
    valid
      .withColumn("card_number_masked", Masking.maskCardNumber(col("card_number"))) // 02:135
      .withColumn("cardholder_token", Masking.tokenize(col("cardholder_name"))) // 02:136
      .drop("card_number", "cardholder_name") // 02:137
      .withColumn("mcc_category",
        Enrich.lookup(col("mcc_code"), mccCategories, "Other")) // 02:145-147
      .withColumn("event_date", to_date(col("event_timestamp"))) // 02:148
      .withColumn("event_hour", hour(col("event_timestamp"))) // 02:149
      .withColumn("amount_bucket", // 02:150-154
        Enrich.buckets(col("amount"),
          Seq(10.0 -> "micro", 50.0 -> "small", 200.0 -> "medium"), "large"))
      .withColumn("is_high_risk_mcc", col("mcc_code").isin("6011", "4829")) // 02:156-158
      .withColumn("risk_score_raw", // 02:159-164
        Enrich.additiveScore(Seq(
          col("velocity_flag") -> 30,
          col("amount_anomaly_flag") -> 25,
          col("is_high_risk_mcc") -> 20,
          col("is_international") -> 15,
          col("is_online") -> 10)))
      .withColumn("silver_timestamp", lit(clock)) // 02:165

  /** Full batch transform (the body of the reference's foreachBatch,
    * 02:97-184): returns (silverReady, quarantined).
    * The caller merges silverReady into the Silver table keyed on
    * transaction_id ([[Merge.upsert]]) and appends quarantined. */
  def processBatch(batch: DataFrame, clock: java.sql.Timestamp,
      validMcc: Seq[String]): (DataFrame, DataFrame) = {
    val (valid, quarantined) = Quality.split(batch, rules(validMcc))
    (enrich(valid, clock),
      quarantined.withColumn("quarantine_timestamp", lit(clock))) // 02:125-126
  }
}
