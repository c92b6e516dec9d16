package graft

import graft.gen.TxnGen
import graft.gold.TxnGold
import graft.sources.VersionedTable
import graft.streaming.StreamPipes
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The reference's full medallion pipeline end-to-end through the streaming
  * APIs: raw stream → Bronze (checkpointed availableNow parquet sink) →
  * Silver (foreachBatch DQ + mask + keyed merge) → Gold (the three
  * aggregate tables), asserting the reference's published cardinality
  * invariants (/root/reference/README.md:20-31) at each stage.
  */
class MedallionSpec extends SparkSuite {
  import spark.implicits._

  test("stream → bronze → silver → gold reproduces the reference pipeline shape") {
    val dir = Files.createTempDirectory("graft-medallion").toString
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    val clock = java.sql.Timestamp.valueOf("2024-06-02 00:00:00")
    val nRows = 2000L

    // Raw source: value+timestamp parquet standing in for the rate stream
    // (same derivation; deterministic for assertions — RateSourceSpec covers
    // the literal rate source)
    val rawPath = s"$dir/raw"
    spark.range(nRows).toDF("value")
      .withColumn("event_timestamp",
        timestamp_micros(lit(t0.getTime * 1000L) + col("value") * 50000L))
      .write.parquet(rawPath)

    // Bronze: streaming derivation + partitioned checkpointed sink
    val bronzePath = s"$dir/bronze"
    val rawStream = spark.readStream
      .schema("value LONG, event_timestamp TIMESTAMP").parquet(rawPath)
    StreamPipes.bronzeSink(TxnGen.derive(rawStream, clock), bronzePath, s"$dir/ckpt-bronze")
      .awaitTermination()
    val bronze = spark.read.parquet(bronzePath)
    assert(bronze.count() === nRows, "bronze row count (README:24 analogue)")

    // Silver: stream the bronze table through foreachBatch DQ + merge
    StreamPipes.silverForeachBatch(
      StreamPipes.tableStream(spark, bronzePath, bronze.schema),
      s"$dir/silver", s"$dir/quarantine", s"$dir/ckpt-silver",
      clock, TxnGen.ValidMcc)
      .awaitTermination()
    val silver = VersionedTable.read(spark, s"$dir/silver").get
    assert(silver.count() === nRows, "silver rows, 0 quarantined (README:25)")
    assert(!new java.io.File(s"$dir/quarantine").exists() ||
      spark.read.parquet(s"$dir/quarantine").isEmpty)
    assert(!silver.columns.contains("card_number"), "raw PII dropped")

    // Gold: the three reference tables
    assert(TxnGold.cardholderFeatures(silver).count() === 10, "README:26")
    assert(TxnGold.merchantRiskSummary(silver).count() === 500, "README:27")
    val hourly = TxnGold.hourlyVolumeStats(silver)
    assert(hourly.agg(sum($"txn_count")).head.getLong(0) === nRows)

    // Exactly-once: replaying silver with a fresh checkpoint (same bronze)
    // leaves the keyed table unchanged
    StreamPipes.silverForeachBatch(
      StreamPipes.tableStream(spark, bronzePath, bronze.schema),
      s"$dir/silver", s"$dir/quarantine", s"$dir/ckpt-silver-replay",
      clock, TxnGen.ValidMcc)
      .awaitTermination()
    val silver2 = VersionedTable.read(spark, s"$dir/silver").get
    assert(silver2.count() === nRows, "keyed merge makes replay a no-op (ST6)")
  }
}
