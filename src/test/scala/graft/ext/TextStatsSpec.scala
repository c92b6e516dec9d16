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
}
