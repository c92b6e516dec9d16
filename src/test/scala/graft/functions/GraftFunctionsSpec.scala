package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The SQL-registered native functions must resolve and agree with the
  * Column-API formulations (same builders feed the SparkSessionExtensions
  * inject path). */
class GraftFunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("all SQL-registered natives resolve and match the Column API") {
    GraftFunctions.register(spark)
    Seq((1L, "the quick brown fox", Seq(0.1f, 0.2f, 0.3f)),
        (2L, "the quick red fox", Seq(0.3f, 0.1f, 0.2f)))
      .toDF("id", "text", "vec").createOrReplaceTempView("gf_t")
    val got = spark.sql("""
      SELECT a.id,
        cosine_similarity(a.vec, b.vec) AS cos,
        jaccard_sim(split(a.text, ' '), split(b.text, ' ')) AS jac,
        sorted_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS sj,
        simhash64(split(a.text, ' ')) AS sh,
        minhash_sig(split(a.text, ' '), 4) AS mh,
        hyperplane_sig(a.vec, 8) AS hp,
        distinct_shingles(split(a.text, ' '), 2) AS ds
      FROM gf_t a JOIN gf_t b ON b.id = 2
      WHERE a.id = 1
    """).collect().head
    val viaApi = spark.table("gf_t").as("a")
      .join(spark.table("gf_t").as("b"), $"b.id" === 2)
      .where($"a.id" === 1)
      .select(
        graft.ext.Similarity.cosine($"a.vec", $"b.vec"),
        JaccardSim.jaccardSim(split($"a.text", " "), split($"b.text", " ")),
        SortedJaccard.sortedJaccard(
          array(lit(1L), lit(2L), lit(3L)), array(lit(2L), lit(3L), lit(4L))),
        SimHash64.simhash64(split($"a.text", " ")),
        MinHashSig.minhashSig(split($"a.text", " "), 4),
        HyperplaneSig.hyperplaneSig($"a.vec", 8),
        DistinctShingles.distinctShingles(split($"a.text", " "), 2))
      .collect().head
    assert(got.getDouble(1) === viaApi.getDouble(0))
    assert(got.getDouble(2) === viaApi.getDouble(1))
    assert(got.getDouble(3) === viaApi.getDouble(2))
    assert(got.getLong(4) === viaApi.getLong(3))
    assert(got.getSeq[Long](5) === viaApi.getSeq[Long](4))
    assert(got.get(6) === viaApi.get(5))
    assert(got.getSeq[String](7) === viaApi.getSeq[String](6))
  }

  test("non-literal k is rejected with a clear message") {
    GraftFunctions.register(spark)
    Seq(Tuple1("a b c")).toDF("t").createOrReplaceTempView("gf_bad")
    val ex = intercept[Exception](
      spark.sql("SELECT minhash_sig(split(t, ' '), length(t)) FROM gf_bad").collect())
    assert(ex.getMessage.contains("integer literal"))
  }
}
