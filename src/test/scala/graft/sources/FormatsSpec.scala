package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class FormatsSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-fmt").toString

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  private val tricky = Seq(
    (1L, "plain", 1.5),
    (2L, "comma, quote \" and\nnewline", 2.5),
    (3L, null.asInstanceOf[String], 3.5)
  ).toDF("id", "name", "score")

  test("CSV round-trip preserves quotes, embedded newlines, and nulls (multiLine opt-in)") {
    val dir = tmp() + "/csv"
    Formats.writeCsv(tricky, dir)
    // embedded newlines need the opt-in multiLine mode (non-splittable read)
    val back = Formats.readCsv(spark, dir, schema, multiLine = true)
    assert(back.columns.contains(Formats.CorruptCol))
    val rows = back.select("id", "name", "score")
      .as[(Long, Option[String], Double)].collect().toSet
    assert(rows === Set(
      (1L, Some("plain"), 1.5),
      (2L, Some("comma, quote \" and\nnewline"), 2.5),
      (3L, None, 3.5)))
  }

  test("CSV default read (splittable, multiLine off) round-trips newline-free data") {
    val plain = Seq((1L, "plain", 1.5), (2L, "comma, and \"quote\"", 2.5),
      (3L, null.asInstanceOf[String], 3.5)).toDF("id", "name", "score")
    val dir = tmp() + "/csv-plain"
    Formats.writeCsv(plain, dir)
    val back = Formats.readCsv(spark, dir, schema)
    val rows = back.select("id", "name", "score")
      .as[(Long, Option[String], Double)].collect().toSet
    assert(rows === Set(
      (1L, Some("plain"), 1.5),
      (2L, Some("comma, and \"quote\""), 2.5),
      (3L, None, 3.5)))
  }

  test("JSONL round-trip preserves values; corrupt line quarantined, not fatal") {
    val dir = tmp() + "/jsonl"
    Formats.writeJsonl(tricky, dir)
    // cache first: Spark refuses corrupt-column-only queries on raw files
    val back = Formats.readJsonl(spark, dir, schema).cache()
    back.count()
    assert(back.filter(back(Formats.CorruptCol).isNotNull).count() === 0)
    val rows = back.select("id", "name", "score")
      .as[(Long, Option[String], Double)].collect().toSet
    assert(rows.map(_._1) === Set(1L, 2L, 3L))
    // hand-broken line: quarantined into _corrupt_record, other rows parse
    val dirtyDir = tmp() + "/jsonl-dirty"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dirtyDir))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dirtyDir, "part-0.json"),
      "{\"id\": 7, \"name\": \"ok\", \"score\": 0.5}\n{not json at all\n".getBytes)
    // cache first: Spark refuses corrupt-column-only queries on raw files
    val dirty = Formats.readJsonl(spark, dirtyDir, schema).cache()
    assert(dirty.count() === 2)
    assert(dirty.filter(dirty(Formats.CorruptCol).isNotNull).count() === 1)
    assert(dirty.filter(dirty("id") === 7L).count() === 1)
  }
}
