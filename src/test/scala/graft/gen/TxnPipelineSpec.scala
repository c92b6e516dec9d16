package graft.gen

import graft.SparkSuite
import graft.gold.TxnGold
import graft.silver.TxnSilver
import org.apache.spark.sql.functions._

/** End-to-end reference-parity pipeline: generator → silver → gold, checked
  * against the reference's published construction invariants
  * (/root/reference/README.md:20-31 + 01:86-155).
  */
class TxnPipelineSpec extends SparkSuite {
  import spark.implicits._

  val t0 = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
  val clock = java.sql.Timestamp.valueOf("2024-06-02 00:00:00")
  lazy val bronze = TxnGen.batch(spark, 5000, t0, clock).cache()
  lazy val (silver, quarantine) = TxnSilver.processBatch(bronze, clock, TxnGen.ValidMcc)

  test("generator is deterministic and well-formed") {
    val again = TxnGen.batch(spark, 5000, t0, clock)
    assert(bronze.exceptAll(again).isEmpty && again.exceptAll(bronze).isEmpty)
    assert(bronze.count() === 5000)
    assert(bronze.filter(length($"card_number") =!= 16).count() === 0)
    assert(bronze.filter($"amount" <= 0 || $"amount" > 501.5).count() === 0)
  }

  test("known values reproduce the reference derivations exactly (01:93-149)") {
    val rows = bronze.filter($"transaction_id".isin(
      "TXN-20240601-00000000", "TXN-20240601-00000001", "TXN-20240601-00000007"))
      .collect().map(r => r.getAs[String]("transaction_id") -> r).toMap
    val v0 = rows("TXN-20240601-00000000")
    assert(v0.getAs[String]("card_number") === "4000000000000000") // 0*7 % 999999999
    assert(v0.getAs[String]("cardholder_name") === "James Smith") // idx 0, 0
    assert(v0.getAs[String]("currency") === "USD")
    assert(v0.getAs[String]("mcc_code") === "5411")
    assert(v0.getAs[String]("merchant_name") === "QuickMart #1")
    assert(v0.getAs[String]("card_type") === "CREDIT")
    assert(v0.getAs[Boolean]("is_online") && v0.getAs[Boolean]("is_international")
      && v0.getAs[Boolean]("velocity_flag"))
    assert(v0.getAs[Double]("amount") === 1.5) // |sin(0)|*500+1.5
    val v1 = rows("TXN-20240601-00000001")
    assert(v1.getAs[String]("cardholder_name") === "Maria Brown") // idx 1, 3 (1*3%10)
    assert(v1.getAs[String]("card_type") === "DEBIT")
    val v7 = rows("TXN-20240601-00000007")
    assert(v7.getAs[String]("cardholder_name") === "Lisa Johnson") // idx 7, 1 (21%10)
  }

  test("cardholder cardinality is 10 by construction (README:26)") {
    // both name indexes derive from value mod 10 ⇒ 10 distinct full names
    assert(bronze.select("cardholder_name").distinct().count() === 10)
  }

  test("merchant cardinality is 500 by construction (README:27)") {
    assert(bronze.select("merchant_name").distinct().count() === 500)
  }

  test("silver: zero quarantined on clean generator output (README:25)") {
    assert(quarantine.count() === 0)
    assert(silver.count() === 5000)
  }

  test("silver drops raw PII and adds masked/tokenized columns (02:133-137)") {
    val cols = silver.columns.toSet
    assert(!cols.contains("card_number") && !cols.contains("cardholder_name"))
    assert(cols.contains("card_number_masked") && cols.contains("cardholder_token"))
    val m = silver.select("card_number_masked").head.getString(0)
    assert(m.matches("""\*\*\*\*-\*\*\*\*-\*\*\*\*-\d{4}"""))
    assert(silver.select("cardholder_token").distinct().count() === 10)
  }

  test("risk score is the additive signal sum within [0, 100] (02:159-164)") {
    val bad = silver.filter($"risk_score_raw" < 0 || $"risk_score_raw" > 100).count()
    assert(bad === 0)
    // spot check: velocity(30) + anomaly(25) rows exist and score >= 55
    val v = silver.filter($"velocity_flag" && $"amount_anomaly_flag")
    assert(v.filter($"risk_score_raw" < 55).count() === 0)
  }

  test("gold shapes match reference cardinality invariants") {
    assert(TxnGold.cardholderFeatures(silver).count() === 10)
    assert(TxnGold.merchantRiskSummary(silver).count() ===
      silver.select("merchant_name", "mcc_category").distinct().count())
    val hourly = TxnGold.hourlyVolumeStats(silver)
    assert(hourly.count() ===
      silver.select("event_date", "event_hour", "card_network", "mcc_category")
        .distinct().count())
    assert(hourly.agg(sum($"txn_count")).head.getLong(0) === 5000)
  }

  test("DQ rules quarantine malformed rows with the right reasons") {
    val broken = bronze.limit(4).select(bronze.columns.map(col): _*)
      .withColumn("transaction_id", lit(null).cast("string"))
      .unionByName(bronze.limit(4).withColumn("amount", lit(-1.0)))
      .unionByName(bronze.limit(4).withColumn("mcc_code", lit("9999")))
    val (v2, q2) = TxnSilver.processBatch(broken, clock, TxnGen.ValidMcc)
    assert(v2.count() === 0)
    val reasons = q2.groupBy("quarantine_reason").count()
      .as[(String, Long)].collect().toMap
    assert(reasons === Map(
      "null_transaction_id" -> 4L, "non_positive_amount" -> 4L, "unknown_mcc" -> 4L))
  }
}
