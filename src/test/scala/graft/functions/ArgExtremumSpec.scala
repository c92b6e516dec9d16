package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[ArgExtremum]] (hash-aggregable argmax/argmin) against the struct-
  * buffered max_by/min_by forms it replaces: bit-equal results on dense
  * tie-heavy data, null handling, and — the point of its existence — the
  * plan pin that the aggregate stays HashAggregate (max_by/min_by degrade
  * to SortAggregate, whose interpreted per-row updates were the q179
  * catalog100x wall: 4,063 CPU-s over the assignment cross product).
  */
class ArgExtremumSpec extends SparkSuite {
  import spark.implicits._

  // dense collisions: 40 keys × 200 rows, scores drawn from 7 distinct
  // values so every group has score ties that exercise the arg tiebreak
  private def df = spark.range(8000).select(
    (col("id") % 40).as("k"),
    (col("id") * 2654435761L % 1000003L).as("arg"),
    ((col("id") * 40503L % 7L).cast("double") / 7.0).as("score"))

  test("argmax bit-matches max_by(arg, struct(score, -arg)) on tie-heavy data") {
    val got = df.groupBy($"k").agg(ArgExtremum.argmax($"arg", $"score").as("a"))
      .as[(Long, Long)].collect().toMap
    val exp = df.groupBy($"k")
      .agg(max_by($"arg", struct($"score", -$"arg")).as("a"))
      .as[(Long, Long)].collect().toMap
    assert(got === exp)
  }

  test("argmin bit-matches min_by(arg, struct(score, arg)) on tie-heavy data") {
    val got = df.groupBy($"k").agg(ArgExtremum.argmin($"arg", $"score").as("a"))
      .as[(Long, Long)].collect().toMap
    val exp = df.groupBy($"k")
      .agg(min_by($"arg", struct($"score", $"arg")).as("a"))
      .as[(Long, Long)].collect().toMap
    assert(got === exp)
  }

  test("null scores and null args are ignored; all-null group evaluates to null") {
    val d = Seq[(Long, java.lang.Long, java.lang.Double)](
      (1L, 10L, 0.5), (1L, 11L, null), (1L, null, 9.9),
      (2L, 20L, null), (2L, null, null)
    ).toDF("k", "arg", "score")
    val got = d.groupBy($"k").agg(ArgExtremum.argmax($"arg", $"score").as("a"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1)))
      .toMap
    assert(got === Map(1L -> 10L, 2L -> null))
  }

  test("plans as HashAggregate — never the SortAggregate max_by degrades to") {
    val agg = df.groupBy($"k").agg(ArgExtremum.argmax($"arg", $"score").as("a"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"argmax must hash-aggregate:\n$plan")
    assert(!plan.contains("SortAggregate"), s"argmax must not sort-aggregate:\n$plan")
    // and the baseline it replaces really does degrade (the reason this
    // aggregate exists) — if Spark ever makes max_by hash-aggregable this
    // pin tells us the custom aggregate can retire
    val old = df.groupBy($"k").agg(max_by($"arg", struct($"score", -$"arg")))
    assert(old.queryExecution.executedPlan.toString.contains("SortAggregate"),
      "upstream max_by became hash-aggregable — revisit ArgExtremum's rationale")
  }

  test("the degradation class is linted: physical lint flags max_by-in-SortAggregate, not argmax (r17)") {
    val bad = df.groupBy($"k").agg(max_by($"arg", struct($"score", -$"arg")))
    bad.collect()
    val findings = graft.plans.ScaleLint.lintPhysical(bad.queryExecution.executedPlan)
    assert(findings.exists(_.rule == "struct-buffered-argmax"),
      "SortAggregate'd max_by must be flagged")
    assert(findings.forall(_.severity == graft.plans.ScaleLint.Advice),
      "advice severity — bounded-input sort-aggs are legitimate")
    val good = df.groupBy($"k").agg(ArgExtremum.argmax($"arg", $"score"))
    good.collect()
    assert(graft.plans.ScaleLint.lintPhysical(good.queryExecution.executedPlan).isEmpty)
  }

  test("first-valid-row semantics at extreme scores (-inf/+inf present in data)") {
    val d = Seq((1L, 5L, Double.NegativeInfinity), (1L, 3L, Double.NegativeInfinity))
      .toDF("k", "arg", "score")
    val got = d.groupBy($"k").agg(ArgExtremum.argmax($"arg", $"score").as("a"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L), "ties at -inf still break by smallest arg")
    val d2 = Seq((1L, 5L, Double.PositiveInfinity), (1L, 3L, 1.0))
      .toDF("k", "arg", "score")
    val got2 = d2.groupBy($"k").agg(ArgExtremum.argmin($"arg", $"score").as("a"))
      .as[(Long, Long)].collect().toMap
    assert(got2 === Map(1L -> 3L))
  }
}
