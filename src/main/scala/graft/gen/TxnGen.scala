package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic credit-card transaction generator — the
  * reference's Bronze source re-expressed in Scala.
  *
  * Reference behavior: `/root/reference/01_Bronze_FinServ_Streaming.py:78-155`
  * — every column is a pure function of the monotonically increasing `value`
  * ("reproducible but looks realistic", 01:86-87), so batch (spark.range)
  * and streaming (rate source) share one derivation. Zero data is shipped
  * from the driver: executors synthesize rows from range/rate splits, which
  * is what makes the generator scale linearly with cores.
  */
object TxnGen {

  val ValidMcc: Seq[String] = Seq(
    "5411", "5541", "5812", "5912", "5999",
    "6011", "4829", "7011", "5732", "3000") // 01:36-48, 02:40-41

  private val firstNames = Seq("James", "Maria", "Robert", "Sarah", "Michael",
    "Jennifer", "David", "Lisa", "William", "Emily") // 01:101-102
  private val lastNames = Seq("Smith", "Johnson", "Williams", "Brown", "Jones",
    "Garcia", "Miller", "Davis", "Wilson", "Anderson") // 01:105-106
  private val merchants = Seq("QuickMart", "FuelStop", "Bistro", "MedPlus",
    "ShopAll", "CashPoint", "WireNow", "StayInn", "TechZone", "SkyAir") // 01:119-121
  private val states = Seq("NY", "CA", "TX", "FL", "IL", "PA", "OH", "GA", "NC",
    "NJ", "MA", "WA", "AZ", "CO", "TN", "SC", "VA", "MD", "MN", "OR") // 01:52-53
  private val networks = Seq("VISA", "MASTERCARD", "AMEX", "DISCOVER") // 01:131-132

  private def pick(options: Seq[String], idx: Column): Column =
    element_at(array(options.map(lit): _*), (idx + 1).cast("int")) // 1-based (01:101-133)

  /** Derive the full 19-column Bronze frame from (value, event_timestamp).
    * `clock` freezes ingestion_timestamp/date for deterministic tests
    * (the reference uses current_timestamp/current_date, 01:152-153).
    */
  def derive(src: DataFrame, clock: java.sql.Timestamp): DataFrame = {
    val v = col("value")
    src
      .withColumn("transaction_id", // 01:93-95
        concat(lit("TXN-"), date_format(col("event_timestamp"), "yyyyMMdd"), lit("-"),
          lpad(v.cast("string"), 8, "0")))
      .withColumn("card_number", // 01:96-97
        concat(lit("4"), lpad(((v * 7) % 999999999L).cast("string"), 15, "0")))
      .withColumn("cardholder_name", // 01:99-107: both indexes are v-mod-10
        // bijections (gcd(3,10)=1) => exactly 10 distinct names (README:26)
        concat(pick(firstNames, v % 10), lit(" "), pick(lastNames, (v * 3) % 10)))
      .withColumn("amount", round(abs(sin(v * 0.1)) * 500 + 1.5, 2)) // 01:109-110
      .withColumn("currency", // 01:111-113
        pick(Seq("USD", "USD", "USD", "USD", "EUR", "GBP"), v % 6))
      .withColumn("mcc_code", pick(ValidMcc, v % 10)) // 01:114-116
      .withColumn("merchant_name", // 01:117-124
        concat(pick(merchants, v % 10), lit(" #"), ((v % 500) + 1).cast("string")))
      .withColumn("merchant_state", pick(states, v % 20)) // 01:126-128
      .withColumn("merchant_country", lit("US")) // 01:129
      .withColumn("card_network", pick(networks, v % 4)) // 01:131-133
      .withColumn("card_type", // 01:134-137
        when(v % 3 === 0, "CREDIT").when(v % 3 === 1, "DEBIT").otherwise("PREPAID"))
      .withColumn("auth_code", lpad(((v * 13) % 999999L).cast("string"), 6, "0")) // 01:139-140
      .withColumn("is_online", v % 4 === 0) // 01:141-142
      .withColumn("is_international", v % 20 === 0) // 01:143-144
      .withColumn("velocity_flag", v % 50 === 0) // 01:146-147
      .withColumn("amount_anomaly_flag", col("amount") > 400) // 01:148-149
      .withColumn("ingestion_timestamp", lit(clock)) // 01:152
      .withColumn("ingestion_date", to_date(lit(clock))) // 01:153
      .drop("value") // 01:154
  }

  /** Batch generator: n transactions at `rowsPerSecond` pacing from `start`.
    * spark.range parallelizes across the cluster; no driver data. */
  def batch(spark: SparkSession, n: Long, start: java.sql.Timestamp,
      clock: java.sql.Timestamp, rowsPerSecond: Int = 20): DataFrame = {
    val base = spark.range(n).toDF("value")
      .withColumn("event_timestamp",
        timestamp_micros(lit(start.getTime * 1000L) +
          col("value") * (1000000L / rowsPerSecond)))
    derive(base, clock)
  }

  /** Streaming generator from the rate source (01:78-83): 20 rows/s default,
    * `value`+`timestamp` renamed into the shared derivation. */
  def stream(spark: SparkSession, rowsPerSecond: Int = 20,
      clock: java.sql.Timestamp): DataFrame = {
    val src = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .withColumnRenamed("timestamp", "event_timestamp")
    derive(src, clock)
  }
}
