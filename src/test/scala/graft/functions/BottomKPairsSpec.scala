package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[BottomKPairs]] — the native mergeable bottom-k aggregate: window-form
  * parity (the q180 shape), partitioning invariance (the merge path), and
  * the SQL registration.
  */
class BottomKPairsSpec extends SparkSuite {
  import spark.implicits._

  private def docs = {
    val p = 1000003L
    spark.read.parquet(s"${sf("")}/documents.parquet")
      .select(col("source"), col("doc_id"),
        pmod(pmod(col("doc_id"), lit(p)) * lit(2654435761L), lit(p)).as("h"))
  }

  /** (source → seq of (h, id)) via the window form — the semantic oracle. */
  private def windowForm(k: Int): Map[String, Seq[(Long, Long)]] = {
    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    docs.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .groupBy(col("source"))
      .agg(collect_list(struct(col("h"), col("doc_id"))).as("sk"))
      .as[(String, Seq[(Long, Long)])].collect()
      .map { case (s, xs) => s -> xs.sorted }.toMap
  }

  private def aggForm(k: Int, parts: Int): Map[String, Seq[(Long, Long)]] =
    docs.repartition(parts)
      .groupBy(col("source"))
      .agg(BottomKPairs.bottomkPairs(col("h"), col("doc_id"), k).as("sk"))
      .as[(String, Seq[(Long, Long)])].collect().toMap

  test("agg form equals the window form bit-for-bit (k=16)") {
    assert(aggForm(16, 8) === windowForm(16))
  }

  test("partitioning-invariant: 2, 7, and 32 input partitions agree") {
    val expected = aggForm(16, 2)
    assert(aggForm(16, 7) === expected)
    assert(aggForm(16, 32) === expected)
  }

  test("groups smaller than k return all pairs, sorted ascending") {
    val got = Seq(("g", 5L, 50L), ("g", 1L, 10L), ("g", 3L, 30L))
      .toDF("g", "h", "id")
      .groupBy($"g")
      .agg(BottomKPairs.bottomkPairs($"h", $"id", 16).as("sk"))
      .as[(String, Seq[(Long, Long)])].collect().head._2
    assert(got === Seq((1L, 10L), (3L, 30L), (5L, 50L)))
  }

  test("ties on ord break by id ascending, matching the window's (h, id) order") {
    val got = Seq(("g", 1L, 9L), ("g", 1L, 3L), ("g", 1L, 7L), ("g", 0L, 5L))
      .toDF("g", "h", "id")
      .groupBy($"g")
      .agg(BottomKPairs.bottomkPairs($"h", $"id", 3).as("sk"))
      .as[(String, Seq[(Long, Long)])].collect().head._2
    assert(got === Seq((0L, 5L), (1L, 3L), (1L, 7L)))
  }

  test("null ord or id rows are skipped, not kept as zeros") {
    val got = Seq(
      ("g", Some(2L), Some(20L)), ("g", None, Some(1L)), ("g", Some(1L), None))
      .toDF("g", "h", "id")
      .groupBy($"g")
      .agg(BottomKPairs.bottomkPairs($"h", $"id", 4).as("sk"))
      .as[(String, Seq[(Long, Long)])].collect().head._2
    assert(got === Seq((2L, 20L)))
  }

  test("merge identity: bottom-k of shard bottom-ks equals global bottom-k") {
    // the KMV union law the aggregate must enforce structurally
    val all = (1L to 200L).map(i => (i * 37 % 101, i))
    val global = all.sorted.take(16)
    val shards = all.grouped(23).toSeq
    val pooled = shards.flatMap(_.sorted.take(16)).sorted.take(16)
    assert(pooled === global)
    val viaAgg = all.toDF("h", "id").repartition(9)
      .agg(BottomKPairs.bottomkPairs($"h", $"id", 16).as("sk"))
      .as[Seq[(Long, Long)]].collect().head
    assert(viaAgg === global)
  }

  test("SQL registration: bottomk_pairs usable from spark.sql") {
    GraftFunctions.register(spark)
    docs.createOrReplaceTempView("bk_docs")
    val viaSql = spark.sql(
      """SELECT source, bottomk_pairs(h, doc_id, 16) AS sk
         FROM bk_docs GROUP BY source""")
      .as[(String, Seq[(Long, Long)])].collect().toMap
    assert(viaSql === windowForm(16))
  }

  test("SQL registration: out-of-range k is an analysis error, not an IAE") {
    GraftFunctions.register(spark)
    docs.createOrReplaceTempView("bk_docs")
    for (badK <- Seq(0, -3, 65537)) {
      val err = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(
          s"""SELECT bottomk_pairs(h, doc_id, $badK) FROM bk_docs""").collect()
      }
      assert(err.getMessage.contains("bottomk_pairs"),
        s"k=$badK should fail analysis with the operator named: ${err.getMessage}")
    }
  }
}
