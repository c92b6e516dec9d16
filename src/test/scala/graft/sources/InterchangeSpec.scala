package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class InterchangeSpec extends SparkSuite {
  import spark.implicits._

  test("toRows/fromRows round-trip preserves rows and schema") {
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, null.asInstanceOf[String], 3.5))
      .toDF("id", "name", "score")
    val rows = Interchange.toRows(df)
    assert(rows.length === 3)
    val back = Interchange.fromRows(spark, rows, df.schema)
    assert(back.schema === df.schema)
    assert(back.as[(Long, Option[String], Double)].collect().toSet ===
      df.as[(Long, Option[String], Double)].collect().toSet)
    // the lifted frame is a real distributed table: joins back to itself
    assert(back.join(df, "id").count() === 3)
  }

  test("toRows refuses results beyond the cap with the actual guidance") {
    val big = spark.range(100)
    val e = intercept[IllegalArgumentException] {
      Interchange.toRows(big.toDF(), maxRows = 10)
    }
    assert(e.getMessage.contains("driver cap"))
    // at or under the cap, collects fine
    assert(Interchange.toRows(big.limit(10).toDF(), maxRows = 10).length === 10)
  }

  test("Arrow interchange round-trips typed data and joins back distributed") {
    import org.apache.spark.sql.functions._
    // mixed types incl. timestamp, decimal, array — the shapes toPandas ships
    val df = spark.range(1, 501).select(
      $"id",
      concat(lit("n"), $"id").as("name"),
      ($"id" * 1.5).as("score"),
      to_timestamp(lit("2024-06-01 12:00:00")).as("ts"),
      $"id".cast("decimal(18,2)").as("amount"),
      array($"id", $"id" * 2).as("pair"),
      when($"id" % 7 === 0, lit(null)).otherwise($"id" % 7).as("maybe"))
    val (batches, schema) = Interchange.toArrowBatches(df)
    assert(batches.nonEmpty && batches.forall(_.nonEmpty),
      "each partition ships genuine Arrow batch bytes")
    assert(schema === df.schema)
    val back = Interchange.fromArrowBatches(spark, batches, schema)
    assert(back.schema === df.schema)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty,
      "Arrow round-trip must be value-exact, nulls included")
    // the lifted frame is a real table: joins back to the original
    assert(back.join(df.select($"id"), "id").count() === 500)
  }

  test("toArrowBatches refuses over-cap results before serializing anything") {
    val huge = spark.range(1000000000L).toDF()
    val e = intercept[IllegalArgumentException] {
      Interchange.toArrowBatches(huge, maxRows = 100)
    }
    assert(e.getMessage.contains("100-row driver cap"))
  }

  test("the cap probe pushes the limit: no full materialization before failing") {
    // a 1e9-row range would OOM any full collect; the guard must finish
    // fast because limit(k+1) stops after k+1 rows
    val huge = spark.range(1000000000L).toDF()
    val e = intercept[IllegalArgumentException] {
      Interchange.toRows(huge, maxRows = 100)
    }
    assert(e.getMessage.contains("100-row driver cap"))
  }
}
