package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins [[StringMetrics]] to the DuckDB oracle builtins' semantics — every
  * literal below was probed against DuckDB 1.0 (`jaro_similarity`,
  * `jaro_winkler_similarity`, `damerau_levenshtein`) before being written
  * down, so a drift from the oracle contract fails HERE, not in the driver's
  * q214 comparison.
  */
class StringMetricsSpec extends SparkSuite {
  import spark.implicits._

  private def jaro(a: String, b: String): Double =
    StringMetrics.jaro(a.getBytes("UTF-8"), b.getBytes("UTF-8"))
  private def jw(a: String, b: String): Double =
    StringMetrics.jaroWinkler(a.getBytes("UTF-8"), b.getBytes("UTF-8"))
  private def dl(a: String, b: String): Int =
    StringMetrics.damerauLevenshtein(a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  private def close(x: Double, want: Double): Boolean = math.abs(x - want) < 1e-9

  test("jaro matches DuckDB-probed values incl. edge semantics") {
    assert(jaro("", "") === 0.0, "both-empty is 0.0 in DuckDB (not rapidfuzz's 1.0)")
    assert(jaro("a", "") === 0.0)
    assert(jaro("", "a") === 0.0)
    assert(jaro("abc", "abc") === 1.0)
    assert(jaro("CA", "ABC") === 0.0)
    assert(jaro("ab", "ba") === 0.0, "window 0 at len 2 - no cross-position match")
    assert(close(jaro("martha", "marhta"), 0.9444444444444445))
    assert(close(jaro("dwayne", "duane"), 0.8222222222222223))
    assert(close(jaro("dixon", "dicksonx"), 0.7666666666666666))
    assert(close(jaro("kitten", "sitting"), 0.7460317460317460))
    assert(close(jaro("a", "ab"), 0.8333333333333334))
    assert(close(jaro("jellyfish", "smellyfish"), 0.8962962962962964))
    // 3 mismatched matched positions -> t = 3/2 = 1 (integer floor), not 1.5
    assert(close(jaro("abcdef", "bcadef"), 0.9444444444444445))
    // byte semantics: 'é' is two UTF-8 bytes (DuckDB probe: 0.8222...)
    assert(close(jaro("héllo", "hello"), 0.8222222222222223))
  }

  test("winkler boost: 0.1 weight, 4-byte prefix cap, gated on jaro > 0.7") {
    assert(close(jw("martha", "marhta"), 0.9611111111111111))
    assert(close(jw("dwayne", "duane"), 0.84))
    assert(close(jw("dixon", "dicksonx"), 0.8133333333333332))
    assert(close(jw("a", "ab"), 0.85))
    assert(close(jw("prefix", "prefixxxxx"), 0.92), "prefix capped at 4")
    assert(jw("abcdxxxxxx", "abcdyyyyyy") === 0.6, "jaro 0.6 <= 0.7 - no boost despite 4-byte prefix")
    assert(close(jw("kitten", "sitting"), 0.7460317460317460), "zero common prefix - boost is a no-op")
    assert(jw("", "") === 0.0)
  }

  test("damerau-levenshtein is the UNRESTRICTED variant, on bytes") {
    assert(dl("", "") === 0)
    assert(dl("a", "") === 1)
    assert(dl("", "abc") === 3)
    assert(dl("abc", "abc") === 0)
    assert(dl("ab", "ba") === 1)
    assert(dl("CA", "ABC") === 2, "true DL; OSA would give 3")
    assert(dl("martha", "marhta") === 1)
    assert(dl("kitten", "sitting") === 3)
    assert(dl("dixon", "dicksonx") === 4)
    assert(dl("jellyfish", "smellyfish") === 2)
    assert(dl("abcdef", "abcfed") === 2)
    assert(dl("héllo", "hello") === 2, "byte-level: 2-byte é vs 1-byte e")
  }

  test("document-sized inputs are rejected, not silently O(n^2)-allocated") {
    val big = "x" * 8000
    val err = intercept[IllegalArgumentException](dl(big, big))
    assert(err.getMessage.contains("short-string metric"))
  }

  test("expressions: null propagation and codegen/interpreted parity") {
    val df = Seq(
      (Option("martha"), Option("marhta")),
      (Option("CA"), Option("ABC")),
      (None: Option[String], Option("x")),
      (Option("x"), None: Option[String]),
      (Option(""), Option(""))
    ).toDF("a", "b")

    def run(): Seq[(Option[Double], Option[Double], Option[Int])] =
      df.select(
          StringMetrics.jaroSim($"a", $"b").as("j"),
          StringMetrics.jaroWinklerSim($"a", $"b").as("w"),
          StringMetrics.damerauLevenshtein($"a", $"b").as("d"))
        .as[(Option[Double], Option[Double], Option[Int])]
        .collect().toSeq

    val oldMode = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted =
      try run()
      finally oldMode.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))

    val oldFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    val codegen =
      try run()
      finally {
        oldFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
          spark.conf.set("spark.sql.codegen.fallback", _))
        oldMode.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
          spark.conf.set("spark.sql.codegen.factoryMode", _))
      }

    assert(codegen === interpreted)
    assert(codegen(2) === ((None, None, None)), "null left -> null out")
    assert(codegen(3) === ((None, None, None)), "null right -> null out")
    assert(codegen(0)._3 === Some(1))
    assert(codegen(1) === ((Some(0.0), Some(0.0), Some(2))))
  }

  test("SQL registration: the three metrics are callable from SQL") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT jaro_sim('martha','marhta')         AS j,
               jaro_winkler_sim('martha','marhta') AS w,
               damerau_levenshtein('CA','ABC')     AS d""").head()
    assert(close(row.getDouble(0), 0.9444444444444445))
    assert(close(row.getDouble(1), 0.9611111111111111))
    assert(row.getInt(2) === 2)
  }
}
