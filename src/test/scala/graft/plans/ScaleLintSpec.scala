package graft.plans

import graft.{QueryCatalog, SparkSuite, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins [[ScaleLint]]: each rule fires on a minimal offending plan, stays
  * quiet on the approved shapes, and — the point of the linter — EVERY
  * catalog query passes with zero errors: the scale discipline the
  * per-query PlanSpec pins enforce by hand, generalized mechanically to
  * the whole 229-query surface.
  */
class ScaleLintSpec extends SparkSuite {
  import spark.implicits._
  val dir = "/root/testdata/sf0.001"

  private def errs(df: org.apache.spark.sql.DataFrame) =
    ScaleLint.check(df).filter(_.severity == ScaleLint.Error)

  test("global-window-over-raw fires on a data-sized unpartitioned window, not on bounded support") {
    val events = Tables.load(spark, dir, "events")
    val bad = events.withColumn("rn",
      row_number().over(Window.orderBy($"ts", $"event_id")))
    assert(errs(bad).exists(_.rule == "global-window-over-raw"), "raw global window must flag")

    // the approved shape: the cumulate runs over an AGGREGATED (bounded) table
    val good = events.groupBy($"event_type").agg(count(lit(1)).as("n"))
      .withColumn("rnk", row_number().over(Window.orderBy($"n".desc, $"event_type")))
    assert(errs(good).isEmpty, s"bounded-support global window must pass: ${errs(good)}")

    // user-keyed windows over raw data are fine
    val keyed = events.withColumn("rn",
      row_number().over(Window.partitionBy($"user_id").orderBy($"ts")))
    assert(errs(keyed).isEmpty)
  }

  test("raw-broadcast-hint fires on a bare full-scan hint, not on filtered/aggregated/constant sides") {
    val li = Tables.load(spark, dir, "lineitem")
    val orders = Tables.load(spark, dir, "orders")
    val bad = li.join(broadcast(orders), $"l_orderkey" === $"o_orderkey")
    assert(errs(bad).exists(_.rule == "raw-broadcast-hint"),
      "hinted broadcast of a data-sized full scan must flag")

    val filtered = li.join(
      broadcast(orders.filter($"o_orderpriority" === "1-URGENT")),
      $"l_orderkey" === $"o_orderkey")
    assert(errs(filtered).isEmpty, s"filtered broadcast side passes: ${errs(filtered)}")

    val nation = Tables.load(spark, dir, "nation")
    val dim = Tables.load(spark, dir, "customer")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
    assert(errs(dim).isEmpty, "constant-size catalog tables are exempt")

    val unhinted = li.join(orders, $"l_orderkey" === $"o_orderkey")
    assert(errs(unhinted).isEmpty, "unhinted joins are AQE's call - no finding")
  }

  test("unbounded-cartesian fires on data x data, not on scalar/aggregate cross joins") {
    val li = Tables.load(spark, dir, "lineitem")
    val bad = li.crossJoin(Tables.load(spark, dir, "orders"))
    assert(errs(bad).exists(_.rule == "unbounded-cartesian"))

    val bounds = li.agg(min($"l_quantity").as("lo"), max($"l_quantity").as("hi"))
    assert(errs(li.crossJoin(bounds)).isEmpty,
      "the 1-row aggregate cross join (q218 shape) must pass")
  }

  test("unbounded-cartesian: the hinted row-reduced side is the approved scored-set idiom; unhinted stays flagged") {
    val li = Tables.load(spark, dir, "lineitem")
    val scored = Tables.load(spark, dir, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
    // q33's shape: hinted broadcast of a FILTERED set against the corpus —
    // the author asserts the size contract the hint encodes
    assert(errs(li.crossJoin(broadcast(scored))).isEmpty,
      "hinted + row-reduced side is the approved idiom")
    // same join UNHINTED: a filter over a scan is not structurally bounded
    // and nobody asserted smallness — flag it
    assert(errs(li.crossJoin(scored)).exists(_.rule == "unbounded-cartesian"),
      "unhinted filtered side must still flag")
  }

  test("exact-percentile is advice, not error") {
    val f = ScaleLint.check(
      Tables.load(spark, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(expr("percentile(o_totalprice, 0.5)").as("p50")))
    assert(f.exists(x => x.rule == "exact-percentile" && x.severity == ScaleLint.Advice))
    assert(!f.exists(_.severity == ScaleLint.Error))
  }

  test("the ENTIRE catalog passes the linter with zero errors") {
    // every flagged exact-percentile is a documented oracle-contract use
    // over bounded groups (see each query's scaladoc)
    val allowedAdvice = Set("exact-percentile")
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    val advice = scala.collection.mutable.ArrayBuffer[String]()
    QueryCatalog.all.foreach { qq =>
      val findings =
        try ScaleLint.check(qq.fn(spark, dir))
        catch { case e: Throwable =>
          failures += s"${qq.name}: construction failed: ${e.getMessage}"
          Nil
        }
      findings.foreach {
        case ScaleLint.Finding(rule, ScaleLint.Error, detail) =>
          failures += s"${qq.name}: $rule - $detail"
        case ScaleLint.Finding(rule, ScaleLint.Advice, _) =>
          advice += s"${qq.name}: $rule"
          if (!allowedAdvice.contains(rule)) failures += s"${qq.name}: unexpected advice $rule"
      }
    }
    assert(failures.isEmpty,
      s"scale-lint errors in the catalog:\n  ${failures.mkString("\n  ")}")
    info(s"advice findings (documented oracle-contract uses): ${advice.distinct.mkString("; ")}")
  }

  test("the warn-only rule is identity on plans; the extension wiring builds") {
    val events = Tables.load(spark, dir, "events")
    val bad = events.withColumn("rn",
      row_number().over(Window.orderBy($"ts", $"event_id")))
    val plan = bad.queryExecution.optimizedPlan
    val rule = new ScaleLint.LintRule
    assert(rule(plan) eq plan, "lint must never rewrite")
    // injection wiring: registering on a fresh extensions object must work
    new GraftLintExtension().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
