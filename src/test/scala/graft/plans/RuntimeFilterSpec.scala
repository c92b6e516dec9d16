package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[RuntimeFilter.bloomPrune]]: exactness of the composed join, the
  * superset contract of the prune alone, and the lazy scalar-subquery plan
  * shape (no driver action at construction).
  */
class RuntimeFilterSpec extends SparkSuite {
  import spark.implicits._

  private def fact = (1L to 2000L).map(i => (i, i % 97)).toDF("row_id", "fk")
  private def keys = Seq(3L, 11L, 42L).toDF("k")

  test("prune + join result equals the plain join (bloom is transparent)") {
    val pruned = RuntimeFilter.bloomPrune(fact, col("fk"), keys, col("k"))
    val viaBloom = pruned.join(keys, col("fk") === col("k"))
      .select("row_id").as[Long].collect().sorted
    val plain = fact.join(keys, col("fk") === col("k"))
      .select("row_id").as[Long].collect().sorted
    assert(viaBloom.sameElements(plain))
    assert(plain.nonEmpty, "test join must not be vacuous")
  }

  test("prune alone is a superset of joining rows and no false negatives") {
    val prunedIds = RuntimeFilter.bloomPrune(fact, col("fk"), keys, col("k"))
      .select("row_id").as[Long].collect().toSet
    val joining = fact.join(keys, col("fk") === col("k"))
      .select("row_id").as[Long].collect().toSet
    assert(joining.subsetOf(prunedIds), "bloom dropped a joining row (false negative)")
  }

  test("bloom rides as an uncorrelated scalar subquery — lazy, in-plan") {
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val pruned = RuntimeFilter.bloomPrune(fact, col("fk"), keys, col("k"))
    val plan = pruned.queryExecution.executedPlan.toString
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "plan construction ran a Spark job (should be lazy)")
    assert(plan.contains("Subquery") || plan.contains("subquery"),
      s"bloom build not planned as a subquery:\n$plan")
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
  }

  test("SQL surface: bloom_filter_agg + might_contain registered") {
    graft.functions.GraftFunctions.register(spark)
    Seq(1L, 2L, 3L).toDF("k").createOrReplaceTempView("rf_keys")
    Seq(1L, 5L, 2L, 9L).toDF("fk").createOrReplaceTempView("rf_fact")
    val out = spark.sql("""
      SELECT fk FROM rf_fact
      WHERE might_contain(
        (SELECT bloom_filter_agg(xxhash64(k)) FROM rf_keys), xxhash64(fk))
    """).as[Long].collect().toSet
    // membership is probabilistic on the positive side (FPs allowed), exact
    // on the negative side: true keys must always survive
    assert(Set(1L, 2L).subsetOf(out), s"false negative in SQL path: $out")
  }
}
