package graft.functions

import graft.SparkSuite
import graft.functions.SimHash64.simhash64
import org.apache.spark.sql.functions._

class SimHashSpec extends SparkSuite {
  import spark.implicits._

  private def fp(text: String): Long =
    Seq(text).toDF("t").select(simhash64(split($"t", " "))).head.getLong(0)

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("identical token multisets hash identically") {
    assert(fp("a b c d e") === fp("a b c d e"))
  }

  test("token order does not matter (bag semantics)") {
    assert(fp("a b c d e") === fp("e d c b a"))
  }

  test("near-identical docs have small hamming distance, unrelated docs large") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away today"
    val near = base.replace("dog", "cat")
    val far = "completely unrelated content about distributed query engines and shuffles"
    assert(hamming(fp(base), fp(near)) < hamming(fp(base), fp(far)))
    assert(hamming(fp(base), fp(near)) <= 16)
    assert(hamming(fp(base), fp(far)) > 16)
  }

  test("null-safe and type-checked") {
    val r = Seq(Tuple1(null: String)).toDF("t").select(simhash64(split($"t", " "))).head
    assert(r.isNullAt(0))
    val err = intercept[Exception] {
      Seq(1).toDF("x").select(simhash64($"x")).head
    }
    assert(err.getMessage.toLowerCase.contains("simhash64") ||
      err.getMessage.contains("array<string>"))
  }

  test("works over testdata documents with banding-friendly dispersion") {
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val fps = d.select(simhash64(split(lower(trim($"text")), " ")).as("fp"))
      .as[Long].collect()
    assert(fps.distinct.length > fps.length / 2, "fingerprints should be well-dispersed")
  }
}
