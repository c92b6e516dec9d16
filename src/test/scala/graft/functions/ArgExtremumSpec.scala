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

  test("SQL surface: argmax/argmin registered, implicit integral casts, loud type errors (r18)") {
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("g_argx")
    // SQL name resolves and hash-matches the Column API
    val sql = spark.sql(
      "SELECT k, argmax(arg, score) AS a FROM g_argx GROUP BY k")
      .as[(Long, Long)].collect().toMap
    val api = df.groupBy($"k").agg(ArgExtremum.argmax($"arg", $"score").as("a"))
      .as[(Long, Long)].collect().toMap
    assert(sql === api)
    // the SQL path must keep the hash aggregate — the whole point
    val plan = spark.sql(
      "SELECT k, argmin(arg, score) AS a FROM g_argx GROUP BY k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") && !plan.contains("SortAggregate"))
    // integral scores widen implicitly (exact below 2^53)
    val cast = spark.sql(
      "SELECT k, argmin(arg, arg % 7) AS a FROM g_argx GROUP BY k").count()
    assert(cast === 40L)
    // a string score fails ANALYSIS loudly — never a silent degradation
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT k, argmax(arg, CAST(k AS STRING)) FROM g_argx GROUP BY k")
        .collect()
    }
    assert(err.getMessage.toLowerCase.contains("argmax")
      || err.getMessage.toLowerCase.contains("double"), err.getMessage)
  }

  test("NaN scores are dropped deterministically — a first-arriving NaN cannot stick (r18)") {
    // one partition, NaN first: under first-valid-wins a NaN would be
    // undisplaceable (NaN>x, x>NaN, NaN==x all false) and the answer would
    // depend on row order — the advisor-flagged nondeterminism
    val d = Seq((1L, 99L, Double.NaN), (1L, 10L, 0.5), (1L, 11L, 0.9))
      .toDF("k", "arg", "score").coalesce(1)
    val got = d.groupBy($"k").agg(ArgExtremum.argmax($"arg", $"score").as("a"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 11L), "NaN row must be ignored, not sticky")
    // all-NaN group behaves like all-null: evaluates to null
    val d2 = Seq((2L, 7L, Double.NaN), (2L, 8L, Double.NaN)).toDF("k", "arg", "score")
    val got2 = d2.groupBy($"k").agg(ArgExtremum.argmin($"arg", $"score").as("a"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1))).toMap
    assert(got2 === Map(2L -> true))
  }

  test("ArgExtremumPayload: bit-matches min/max(struct(score, arg, payload)) and stays HashAggregate (r18)") {
    // the q218 M4 shape: winner's payload must ride the flat buffer with
    // tie semantics identical to the lexicographic struct comparators
    val d = df.withColumn("pay", ($"arg" * 3).cast("double"))
      .withColumn("pay2", $"arg" % 11)
    val got = d.groupBy($"k").agg(
        ArgExtremum.argminStruct($"arg", $"score", $"pay", $"pay2").as("w"))
      .select($"k", $"w.arg".as("a"), $"w.p1".as("p"), $"w.p2".as("p2"))
      .as[(Long, Long, Double, Long)].collect().map { case (k, a, p, p2) => (k, (a, p, p2)) }.toMap
    val exp = d.groupBy($"k").agg(
        min(struct($"score", $"arg", $"pay", $"pay2")).as("w"))
      .select($"k", $"w.arg".as("a"), $"w.pay".as("p"), $"w.pay2".as("p2"))
      .as[(Long, Long, Double, Long)].collect().map { case (k, a, p, p2) => (k, (a, p, p2)) }.toMap
    assert(got === exp)
    // argmax ties -> smallest arg == max over struct(score, -arg) winner
    val gotMax = d.groupBy($"k").agg(
        ArgExtremum.argmaxStruct($"arg", $"score", $"pay").as("w"))
      .select($"k", $"w.arg", $"w.p1").as[(Long, Long, Double)].collect()
      .map { case (k, a, p) => (k, (a, p)) }.toMap
    val expMax = d.groupBy($"k").agg(
        max_by(struct($"arg", $"pay"), struct($"score", -$"arg")).as("w"))
      .select($"k", $"w.arg", $"w.pay").as[(Long, Long, Double)].collect()
      .map { case (k, a, p) => (k, (a, p)) }.toMap
    assert(gotMax === expMax)
    // the point: flat payload buffer keeps HashAggregate
    val plan = d.groupBy($"k").agg(
      ArgExtremum.argminStruct($"arg", $"score", $"pay").as("w"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      s"payload argmin must hash-aggregate:\n$plan")
    // null payloads carry faithfully; non-primitive payloads fail loudly
    val withNull = Seq((1L, 5L, 1.0, null), (1L, 3L, 2.0, java.lang.Double.valueOf(7.0)))
      .toDF("k", "arg", "score", "pay")
    val r = withNull.groupBy($"k")
      .agg(ArgExtremum.argminStruct($"arg", $"score", $"pay").as("w"))
      .select($"w.arg", $"w.p1").head
    assert(r.getLong(0) === 5L && r.isNullAt(1), "winner's null payload must surface as null")
    val err = intercept[Exception] {
      df.groupBy($"k").agg(ArgExtremum.argminStruct($"arg", $"score",
        array($"arg")).as("w")).collect()
    }
    assert(err.getMessage.contains("fixed-width") || err.getMessage.contains("DATATYPE"),
      err.getMessage)
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
