package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  val trades = Seq(
    (1L, ts("2024-01-01 10:00:05"), "t1"),
    (1L, ts("2024-01-01 10:00:30"), "t2"),
    (1L, ts("2024-01-01 09:59:00"), "t0"), // before any quote
    (2L, ts("2024-01-01 10:00:10"), "t3")
  ).toDF("key", "ts", "trade")

  val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 10:00:30"), 101.0), // equal-ts with t2
    (1L, ts("2024-01-01 10:01:00"), 102.0),
    (2L, ts("2024-01-01 10:00:00"), 50.0)
  ).toDF("key", "qts", "price")

  test("matches most recent quote at-or-before each trade, null when none") {
    val out = AsOfJoin.asOf(trades, quotes, "key", "ts", "qts", Seq("price"))
      .select($"trade", $"asof_price").as[(String, Option[Double])]
      .collect().toMap
    assert(out === Map(
      "t0" -> None, // no quote precedes it
      "t1" -> Some(100.0),
      "t2" -> Some(101.0), // equal timestamps match (<= semantics)
      "t3" -> Some(50.0))) // per-key isolation
  }

  test("null payload in the matched row is preserved, and multi-payload comes from ONE row") {
    val quotes2 = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(100.0), Some("nyse")),
      (1L, ts("2024-01-01 10:00:20"), None, Some("cboe")) // most recent for t2: null price
    ).toDF("key", "qts", "price", "venue")
    val out = AsOfJoin.asOf(trades, quotes2, "key", "ts", "qts", Seq("price", "venue"))
      .select($"trade", $"asof_price", $"asof_venue")
      .as[(String, Option[Double], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // t2 (10:00:30) matches the 10:00:20 row: price NULL (not the older 100.0),
    // venue "cboe" — both fields from the SAME matched row
    assert(out("t2") === ((None, Some("cboe"))))
    assert(out("t1") === ((Some(100.0), Some("nyse"))))
    assert(out("t0") === ((None, None)))
  }

  test("plans one exchange (union-window, not a range join)") {
    val out = AsOfJoin.asOf(trades, quotes, "key", "ts", "qts", Seq("price"))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"as-of must not plan a product join:\n$p")
  }
}
