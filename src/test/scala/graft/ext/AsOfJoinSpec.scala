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

  test("equal (key, rightTime) right rows match deterministically across partitionings") {
    // two quotes at the SAME instant: without the payload-hash tiebreak the
    // winner depends on which partition's rows happen to sort first; with
    // it, every run and layout picks the same row
    val dupQuotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0, "a"),
      (1L, ts("2024-01-01 10:00:00"), 200.0, "b"),
      (1L, ts("2024-01-01 10:00:00"), 300.0, "c")
    ).toDF("key", "qts", "price", "src")
    def backward(df: org.apache.spark.sql.DataFrame) =
      AsOfJoin.asOf(trades, df, "key", "ts", "qts", Seq("price", "src"))
        .select($"trade", $"asof_price", $"asof_src")
        .as[(String, Option[Double], Option[String])].collect().sortBy(_._1).toSeq
    def forward(df: org.apache.spark.sql.DataFrame) =
      AsOfJoin.asOfForward(trades, df, "key", "ts", "qts", Seq("price", "src"))
        .select($"trade", $"asof_price", $"asof_src")
        .as[(String, Option[Double], Option[String])].collect().sortBy(_._1).toSeq
    val layouts = Seq(dupQuotes.coalesce(1), dupQuotes.repartition(5),
      dupQuotes.orderBy(desc("price")).repartition(3))
    val b = layouts.map(backward)
    val f = layouts.map(forward)
    assert(b.distinct.size == 1, s"backward as-of flaked across layouts: $b")
    assert(f.distinct.size == 1, s"forward as-of flaked across layouts: $f")
    // the matched (price, src) must come from ONE of the tied rows intact
    val matched = b.head.collectFirst { case ("t1", p, s) => (p, s) }.get
    assert(Seq((Some(100.0), Some("a")), (Some(200.0), Some("b")),
      (Some(300.0), Some("c"))).contains(matched))
  }

  test("nearest as-of: picks the closer side, ties to backward, tolerance drops far matches") {
    // numeric time axis (exact arithmetic): left points probe a right
    // timeline at 100/200/210
    val l = Seq((1L, 90L, "a"), // only forward in reach → 100
      (1L, 150L, "b"),          // equidistant 100/200 → backward (pandas rule)
      (1L, 204L, "c"),          // 200 (4 away) vs 210 (6) → backward 200
      (1L, 208L, "d"),          // 200 (8) vs 210 (2) → forward 210
      (1L, 500L, "e"),          // nearest 210 is 290 away → tolerance kills it
      (2L, 100L, "f")           // no right rows for key 2 → null
    ).toDF("key", "t", "tag")
    val r = Seq((1L, 100L, 10.0), (1L, 200L, 20.0), (1L, 210L, 21.0))
      .toDF("key", "rt", "price")
    val out = AsOfJoin.asOfNearest(l, r, "key", "t", "rt", Seq("price"),
        tolerance = Some(100L))
      .select($"tag", $"asof_price").as[(String, Option[Double])]
      .collect().toMap
    assert(out === Map(
      "a" -> Some(10.0), "b" -> Some(10.0), "c" -> Some(20.0),
      "d" -> Some(21.0), "e" -> None, "f" -> None))
    // and without tolerance, "e" matches the closest (210)
    val noTol = AsOfJoin.asOfNearest(l, r, "key", "t", "rt", Seq("price"))
      .select($"tag", $"asof_price").as[(String, Option[Double])]
      .collect().toMap
    assert(noTol("e") === Some(21.0))
  }

  test("plans one exchange (union-window, not a range join)") {
    val out = AsOfJoin.asOf(trades, quotes, "key", "ts", "qts", Seq("price"))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"as-of must not plan a product join:\n$p")
  }
}
