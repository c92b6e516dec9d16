package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TextStatsSpec extends SparkSuite {
  import spark.implicits._

  val stops = Seq("the", "a", "of", "and", "is")

  test("token stats on a known sentence") {
    val df = Seq("the cat and the hat").toDF("text")
    val r = df.select(
      TextStats.nTokens($"text").as("n"),
      TextStats.nDistinctTokens($"text").as("d"),
      TextStats.avgTokenLen($"text").as("avg"),
      TextStats.stopwordRatio($"text", stops).as("swr")).head
    assert(r.getLong(0) === 5)
    assert(r.getLong(1) === 4)
    assert(r.getDouble(2) === 15.0 / 5) // the+cat+and+the+hat = 3*5 chars
    assert(r.getDouble(3) === 3.0 / 5) // the, and, the
  }

  test("fingerprint is order-insensitive, case-sensitive content hash") {
    val df = Seq(("b a c", "c b a", "b a d")).toDF("t1", "t2", "t3")
    val r = df.select(
      TextStats.fingerprint($"t1").as("f1"),
      TextStats.fingerprint($"t2").as("f2"),
      TextStats.fingerprint($"t3").as("f3")).head
    assert(r.getString(0) === r.getString(1))
    assert(r.getString(0) !== r.getString(2))
  }

  test("langId votes deterministically") {
    val df = Seq(
      ("the cat is here", "en"),
      ("der hund ist da", "de"),
      ("le chat est la", "fr"),
      ("xyz qrs", "und")).toDF("text", "expected")
    val bad = df.filter(TextStats.langId($"text") =!= $"expected").count()
    assert(bad === 0)
  }

  test("quality score is bounded and additive") {
    val good = Seq("the spark engine is a fast table scan and the join is quick here").toDF("text")
    assert(good.select(TextStats.qualityScore($"text", stops)).head.getInt(0) === 100)
    val bad = Seq("x x x x x x x x x x").toDF("text")
    assert(bad.select(TextStats.qualityScore($"text", stops)).head.getInt(0) <= 25)
  }

  test("repetitionRatio flags looping text, passes diverse text") {
    val df = Seq(
      "a b c a b c a b c a b c",  // 10 trigrams, 3 distinct -> 0.7
      "one two three four five six",  // all trigrams distinct -> 0.0
      "xy"                            // < w tokens -> single shingle -> 0.0
    ).toDF("text")
    val got = df.select(TextStats.repetitionRatio($"text", 3)).as[Double].collect()
    assert(math.abs(got(0) - 0.7) < 1e-12)
    assert(got(1) === 0.0)
    assert(got(2) === 0.0)
  }

  test("scrubPii masks emails, SSNs, phones; leaves near-misses alone") {
    val df = Seq(
      ("mail bob.smith+x@sub.example.co.uk now", "mail <EMAIL> now"),
      ("ssn 123-45-6789.", "ssn <SSN>."),
      ("call 555-123-4567!", "call <PHONE>!"),
      // near-misses: wrong digit grouping, no TLD, digit-adjacent boundary
      ("code 12-345-6789 x@y 1555-123-45678", "code 12-345-6789 x@y 1555-123-45678"),
      ("all: a@b.io 000-00-0000 999-999-9999", "all: <EMAIL> <SSN> <PHONE>")
    ).toDF("text", "expected")
    val bad = df.filter(TextStats.scrubPii($"text") =!= $"expected")
      .select("text").as[String].collect()
    assert(bad.isEmpty, s"mis-scrubbed: ${bad.mkString("; ")}")
  }
}
