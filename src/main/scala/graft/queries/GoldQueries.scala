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

  val all: Seq[Q] = Seq(
    q21MerchantRisk, q22CustomerFeatures, q23HourlyStats, q24Sessionize, q25RunningWindow)
}
