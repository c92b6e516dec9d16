package graft

class QueryCatalogSpec extends SparkSuite {
  val dir = "/root/testdata/sf0.001"

  test("every catalog query runs and returns rows on sf0.001") {
    QueryCatalog.all.foreach { q =>
      val n = q.fn(spark, dir).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
  }

  test("q1 aggregates are consistent") {
    val df = QueryCatalog.q1PricingSummary.fn(spark, dir)
    val rows = df.collect()
    assert(rows.length === 6) // 3 returnflags x 2 linestatus
    rows.foreach { r =>
      val sumQty = r.getAs[Double]("sum_qty")
      val cnt = r.getAs[Long]("count_order")
      val avg = r.getAs[Double]("avg_qty")
      assert(math.abs(sumQty / cnt - avg) < 1e-3)
      assert(r.getAs[Long]("n_orders") <= cnt)
    }
  }

  test("q4 topk is sorted descending and unique-keyed") {
    val rows = QueryCatalog.q4TopK.fn(spark, dir).collect()
    assert(rows.length === 10)
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sortBy(-_)))
  }
}
