package graft.gold

import graft.{SparkSuite, Tables}
import graft.ext.Sessionize
import org.apache.spark.sql.functions._

class GoldSpec extends SparkSuite {
  import spark.implicits._
  val dir = "/root/testdata/sf0.001"

  test("merchantRisk: one row per supplier, rates within [0,1]") {
    val out = Gold.merchantRisk(
      Tables.load(spark, dir, "lineitem"), Tables.load(spark, dir, "supplier")).cache()
    val nSupp = Tables.load(spark, dir, "supplier").count()
    assert(out.count() === nSupp)
    assert(out.filter($"high_amount_rate" < 0 || $"high_amount_rate" > 1).count() === 0)
    assert(out.filter($"n_orders" > $"n_txns").count() === 0)
  }

  test("customerFeatures: totals reconcile with raw orders") {
    val o = Tables.load(spark, dir, "orders")
    val out = Gold.customerFeatures(o)
    val totalOrders = out.agg(sum($"n_orders")).head.getLong(0)
    assert(totalOrders === o.count())
    assert(out.filter($"lifetime_days" < 0).count() === 0)
  }

  test("hourlyStats: event counts reconcile") {
    val e = Tables.load(spark, dir, "events")
    val out = Gold.hourlyStats(e)
    assert(out.agg(sum($"n_events")).head.getLong(0) === e.count())
  }

  test("sessionize: gap semantics on a hand-built stream") {
    // user 1: events at t=0s, 10s, 2000s (gap>30min? no - gap 1800s means >1800)
    // with gapSec=60: breaks at 0 (first) and 2000 (gap 1990 > 60) => 2 sessions
    val base = 1700000000000000L // epoch micros
    val df = Seq(
      (1L, base, 1L, "a", 1.0, "{}"),
      (2L, base + 10000000L, 1L, "a", 2.0, "{}"),
      (3L, base + 2000000000L, 1L, "a", 3.0, "{}"),
      (4L, base, 2L, "a", 4.0, "{}")
    ).toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros($"us")).drop("us")
    val out = Sessionize.sessions(df, gapSec = 60).collect()
    assert(out.length === 3) // user1: 2 sessions, user2: 1
    val u1s1 = out.find(r => r.getLong(0) == 1L && r.getLong(1) == 1L).get
    assert(u1s1.getAs[Long]("n_events") === 2)
    assert(u1s1.getAs[Double]("session_value") === 3.0)
    assert(u1s1.getAs[Long]("duration_sec") === 10L)
  }
}
