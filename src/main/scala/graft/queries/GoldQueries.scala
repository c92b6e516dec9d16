package graft.queries

import graft.{Q, QueryDsl}
import QueryDsl._
import graft.ext.Sessionize
import graft.gold.Gold
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Gold-stage aggregates + event-time queries (SURVEY §2.4 A1-A9, §2.5,
  * §2.8 ST7-batch).
  */
object GoldQueries {

  /** Merchant-risk summary (ref 03:40-59): supplier plays merchant. */
  val q21MerchantRisk: Q = Q(
    "q21_merchant_risk",
    (s, dir) => Gold.merchantRisk(t(s, dir, "lineitem"), t(s, dir, "supplier")),
    Some("""
      SELECT s_suppkey, s_name,
        COUNT(*) AS n_txns,
        %s AS total_amount,
        MAX(l_extendedprice) AS max_amount,
        MIN(l_extendedprice) AS min_amount,
        COUNT(DISTINCT l_partkey) AS n_parts,
        COUNT(DISTINCT l_orderkey) AS n_orders,
        %s AS n_high_amount,
        %s AS n_returned,
        %s / COUNT(*) AS avg_amount,
        %s / COUNT(*) AS high_amount_rate,
        %s / COUNT(*) AS return_rate
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_suppkey, s_name
    """.format(
      oracleDsum("l_extendedprice", 2),
      oracleCountIf("l_extendedprice > 80000"),
      oracleCountIf("l_returnflag = 'R'"),
      oracleDsum("l_extendedprice", 2),
      oracleCountIf("l_extendedprice > 80000"),
      oracleCountIf("l_returnflag = 'R'"))),
    headline = true)

  /** Cardholder-features analogue (ref 03:93-147): per-customer features. */
  val q22CustomerFeatures: Q = Q(
    "q22_customer_features",
    (s, dir) => Gold.customerFeatures(t(s, dir, "orders")),
    Some("""
      SELECT o_custkey,
        COUNT(*) AS n_orders,
        %s AS total_spend,
        MAX(o_totalprice) AS max_order,
        MIN(o_totalprice) AS min_order,
        COUNT(DISTINCT o_orderpriority) AS n_priorities,
        COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS n_active_days,
        %s AS n_finished,
        %s AS n_urgent,
        MIN(CAST(o_orderdate AS DATE)) AS first_order_date,
        MAX(CAST(o_orderdate AS DATE)) AS last_order_date,
        %s / COUNT(*) AS avg_order_value,
        %s / COUNT(*) AS urgent_ratio,
        %s / COUNT(*) AS finished_ratio,
        date_diff('day', MIN(CAST(o_orderdate AS DATE)), MAX(CAST(o_orderdate AS DATE))) AS lifetime_days
      FROM orders GROUP BY o_custkey
    """.format(
      oracleDsum("o_totalprice", 2),
      oracleCountIf("o_orderstatus = 'F'"),
      oracleCountIf("o_orderpriority = '1-URGENT'"),
      oracleDsum("o_totalprice", 2),
      oracleCountIf("o_orderpriority = '1-URGENT'"),
      oracleCountIf("o_orderstatus = 'F'"))),
    headline = true)

  /** Hourly volume stats over the event table (ref 03:173-183). */
  val q23HourlyStats: Q = Q(
    "q23_hourly_stats",
    (s, dir) => Gold.hourlyStats(t(s, dir, "events")),
    Some("""
      SELECT CAST(ts AS DATE) AS event_date,
        CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS event_hour,
        event_type,
        COUNT(*) AS n_events,
        %s AS total_value,
        COUNT(DISTINCT user_id) AS n_users,
        %s / COUNT(*) AS avg_value
      FROM events
      GROUP BY 1, 2, 3
    """.format(oracleDsum("value", 2), oracleDsum("value", 2))))

  /** Batch sessionization (30-min gap) over events — lag + running-sum
    * windows + session agg, all on one user-hash partitioning. */
  val q24Sessionize: Q = Q(
    "q24_sessionize",
    (s, dir) =>
      // cast instants → NTZ at the query boundary: DuckDB TIMESTAMP is naive,
      // Spark TimestampType is tz-adjusted; wall values are identical under
      // the pinned UTC session timezone
      Sessionize.sessions(t(s, dir, "events"), gapSec = 1800)
        .withColumn("session_start", col("session_start").cast("timestamp_ntz"))
        .withColumn("session_end", col("session_end").cast("timestamp_ntz")),
    Some("""
      WITH ordered AS (
        SELECT user_id, event_id, value,
          CAST(ts AS TIMESTAMP) AS ts,
          LAG(epoch_us(CAST(ts AS TIMESTAMP)), 1)
            OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_us
        FROM events
      ), flagged AS (
        SELECT *, CASE WHEN prev_us IS NULL
                         OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END AS is_break
        FROM ordered
      ), numbered AS (
        SELECT *, CAST(SUM(is_break) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM flagged
      )
      SELECT user_id, session_id,
        COUNT(*) AS n_events,
        MIN(ts) AS session_start,
        MAX(ts) AS session_end,
        CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS session_value,
        CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS BIGINT) AS duration_sec
      FROM numbered
      GROUP BY user_id, session_id
    """))

  /** Frame-spec windows (W2): running total + 3-row moving sum per customer,
    * decimal-accumulated for engine parity. */
  val q25RunningWindow: Q = Q(
    "q25_running_window",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        sum(col("o_totalprice").cast(DecimalType(28, 2)))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_spend"),
        sum(col("o_totalprice").cast(DecimalType(28, 2)))
          .over(w.rowsBetween(-2, Window.currentRow))
          .cast("double").as("moving3_spend"))
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving3_spend
      FROM orders
    """))

  /** Batch fraud-scoring write-back (ref 04:308-325): score every cardholder
    * with a fixed linear model + sigmoid and emit the `fraud_predictions`
    * shape (token, features, prediction, probability, model_version,
    * scored_at). The reference trains sklearn on the driver and scores via
    * `toPandas` round-trip; here scoring is a pure DataFrame projection over
    * the q22 feature table — fully distributed, no driver materialization.
    *
    * Scaler note: the reference standardizes features before the linear
    * model. `linear ∘ scaler` is itself affine in raw-feature space, so
    * fixed weights over raw features are the same model class — weights
    * below are the folded form. Determinism: the score `z` uses only IEEE
    * +,*,/ in a fixed association (bit-identical in Spark and DuckDB);
    * `exp` is the one transcendental, so the probability is rounded at 6
    * decimals (q9's sin/sqrt precedent) and the 0/1 prediction keys off
    * `z > 0` (⇔ p > 0.5) rather than the rounded probability.
    */
  val q114FraudScoring: Q = Q(
    "q114_fraud_scoring",
    (s, dir) => {
      val feats = Gold.customerFeatures(t(s, dir, "orders"))
      val z = lit(-3.0) +
        col("total_spend") * lit(5.0e-7) +
        col("n_orders") * lit(0.05) +
        col("urgent_ratio") * lit(1.5) +
        col("finished_ratio") * lit(-0.8) +
        col("lifetime_days") * lit(2.0e-4)
      feats.select(
        sha2(col("o_custkey").cast("string"), 256).as("cardholder_token"),
        col("n_orders").as("total_txns"),
        col("total_spend"),
        col("avg_order_value"),
        // no raw-score column: z is a sum of decimal-granular terms, so
        // round(z, k) can land on exact .5 ties where Spark's BigDecimal
        // HALF_UP and DuckDB's fp round disagree; sigmoid(z) is irrational
        // and never ties, so the probability is the only rounded surface.
        when(z > 0, 1).otherwise(0).as("fraud_prediction"),
        round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("fraud_probability"),
        lit(1).as("model_version"),
        lit("2026-01-01 00:00:00").cast("timestamp_ntz").as("scored_at"))
    },
    Some("""
      WITH feats AS (
        SELECT o_custkey,
          COUNT(*) AS n_orders,
          %s AS total_spend,
          %s / COUNT(*) AS avg_order_value,
          %s / COUNT(*) AS urgent_ratio,
          %s / COUNT(*) AS finished_ratio,
          date_diff('day', MIN(CAST(o_orderdate AS DATE)), MAX(CAST(o_orderdate AS DATE))) AS lifetime_days
        FROM orders GROUP BY o_custkey
      ), scored AS (
        SELECT *,
          -3.0 + total_spend * 0.0000005 + n_orders * 0.05 + urgent_ratio * 1.5
            + finished_ratio * -0.8 + lifetime_days * 0.0002 AS z
        FROM feats
      )
      SELECT sha256(CAST(o_custkey AS VARCHAR)) AS cardholder_token,
        n_orders AS total_txns,
        total_spend,
        avg_order_value,
        CASE WHEN z > 0 THEN 1 ELSE 0 END AS fraud_prediction,
        round(1.0 / (1.0 + exp(-z)), 6) AS fraud_probability,
        1 AS model_version,
        CAST('2026-01-01 00:00:00' AS TIMESTAMP) AS scored_at
      FROM scored
    """.format(
      oracleDsum("o_totalprice", 2),
      oracleDsum("o_totalprice", 2),
      oracleCountIf("o_orderpriority = '1-URGENT'"),
      oracleCountIf("o_orderstatus = 'F'"))))

  val all: Seq[Q] = Seq(
    q21MerchantRisk, q22CustomerFeatures, q23HourlyStats, q24Sessionize, q25RunningWindow,
    q114FraudScoring)
}
