package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SaltBucketSpec extends SparkSuite {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of rows share one key — the classic hot-key shape
    val big = spark.range(10000)
      .withColumn("k", when($"id" % 10 =!= 0, lit(7L)).otherwise($"id" % 100))
      .withColumn("payload", $"id" * 2)
    val small = spark.range(100).select($"id".as("k"), concat(lit("dim"), $"id").as("name"))
    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
    val salted = Salt.saltedJoin(big, small, "k", factor = 8).select("k", "payload", "name")
    assert(salted.count() === plain.count())
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val df = spark.range(20000)
      .withColumn("k", when($"id" % 5 =!= 0, lit(1L)).otherwise($"id" % 50))
      .withColumn("v", ($"id" % 97).cast("double"))
    val direct = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("total"))
    val salted = Salt.saltedCountSum(df, "k", "v", factor = 16)
    val joined = direct.as("d").join(salted.as("s"), "k")
      .filter($"d.n" =!= $"s.n" || abs($"d.total" - $"s.total") > 1e-6)
    assert(joined.count() === 0)
  }

  test("bucketed tables join without an exchange on the bucket key") {
    spark.range(5000).select($"id".as("k"), ($"id" * 3).as("a"))
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("graft_bk_a")
    spark.range(5000).select($"id".as("k"), ($"id" * 5).as("b"))
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("graft_bk_b")
    val j = spark.table("graft_bk_a").join(spark.table("graft_bk_b"), "k")
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should be exchange-free:\n$plan")
    assert(j.count() === 5000)
    spark.sql("DROP TABLE graft_bk_a")
    spark.sql("DROP TABLE graft_bk_b")
  }
}
