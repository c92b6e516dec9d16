package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's parquet testdata (TESTDATA.md / FIXTURES.md).
  *
  * All tables are plain parquet directories; at cluster scale these would be
  * partitioned table paths — the loaders stay identical because Spark's
  * `DataSourceV2` file index handles partition discovery/pruning transparently.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables — always broadcast-join these (a few KB..MB even
    * at 100 TB scale; TPC-H `nation`/`region` are constant-size).
    */
  val broadcastableDims: Set[String] = Set("region", "nation")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" => events(spark, dir)
    case n        => spark.read.parquet(s"$dir/$n.parquet")
  }

  /** `events.ts` is nanosecond-precision INT64 parquet, which Spark rejects
    * ([PARQUET_TYPE_ILLEGAL]). Read it as raw nanos and floor-convert to a
    * microsecond TimestampType — same truncation DuckDB applies when casting
    * TIMESTAMP_NS → TIMESTAMP, so oracle comparisons line up exactly.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
}
