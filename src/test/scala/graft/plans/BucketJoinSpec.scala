package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The co-located-join claim behind [[Layout.writeBucketed]]: two tables
  * bucketed identically on the join key must join with ZERO Exchange —
  * the on-disk hash distribution satisfies the join's requirement, so the
  * plan's most expensive stage (two full shuffles) disappears. That is
  * the 100 TB fact⋈fact recipe; at test scale we force sort-merge (no
  * broadcast) to make the claim observable.
  */
class BucketJoinSpec extends SparkSuite {
  import spark.implicits._

  test("bucketed⋈bucketed on the bucket key plans no Exchange; results identical") {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
      .select($"c_custkey", $"c_mktsegment")
    Layout.writeBucketed(orders, "orders_b", 8, Seq("o_custkey"), Seq("o_custkey"))
    Layout.writeBucketed(customer, "customer_b", 8, Seq("c_custkey"), Seq("c_custkey"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), $"o_custkey" === $"c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"broadcast must be disabled for the claim to be observable:\n$plan")
      assert(!plan.contains("Exchange"),
        s"identically-bucketed sides must join WITHOUT shuffling:\n$plan")
      // and the layout is a pure optimization: same rows as the plain join
      val expect = orders.join(customer, $"o_custkey" === $"c_custkey").count()
      assert(joined.count() === expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("bucketed side joined to an unbucketed side shuffles only the unbucketed side") {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select($"o_orderkey", $"o_custkey")
    Layout.writeBucketed(orders, "orders_b1", 8, Seq("o_custkey"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val customer = spark.read.parquet(s"$dir/customer.parquet")
        .select($"c_custkey", $"c_mktsegment")
      val joined = spark.table("orders_b1")
        .join(customer, $"o_custkey" === $"c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges === 1,
        s"exactly the unbucketed side shuffles (got $exchanges):\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b1")
    }
  }
}
