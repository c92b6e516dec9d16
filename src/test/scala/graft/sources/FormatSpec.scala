package graft.sources

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond parquet: CSV, JSON, ORC round-trips
  * preserve the data (modulo each format's type model — CSV/JSON need
  * schema-on-read to restore types).
  */
class FormatSpec extends SparkSuite {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$name").toString + "/t"

  lazy val src = Tables.load(spark, "/root/testdata/sf0.001", "customer")

  test("orc round-trip is lossless") {
    val p = tmp("orc")
    src.write.orc(p)
    val back = spark.read.orc(p)
    assert(back.schema === src.schema)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("csv round-trip with explicit schema restores values") {
    val p = tmp("csv")
    src.write.option("header", "true").csv(p)
    val back = spark.read.option("header", "true").schema(src.schema).csv(p)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("json round-trip with explicit schema restores values") {
    val p = tmp("json")
    src.write.json(p)
    val back = spark.read.schema(src.schema).json(p)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("partitioned parquet write prunes partitions on read") {
    val p = tmp("part")
    val o = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .withColumn("status", col("o_orderstatus"))
    graft.plans.Layout.writePartitioned(o, p, Seq("status"))
    val pruned = spark.read.parquet(p).filter(col("status") === "F")
    pruned.collect() // drive THIS query execution so its scan metrics fill
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head
    val files = scan.metrics.get("numFiles").map(_.value).getOrElse(-1L)
    val all = spark.read.parquet(p)
    all.collect()
    val allFiles = all.queryExecution.executedPlan.collectLeaves().head
      .metrics.get("numFiles").map(_.value).getOrElse(-1L)
    assert(files > 0 && files < allFiles,
      s"partition pruning should cut files read: $files vs $allFiles")
  }
}
