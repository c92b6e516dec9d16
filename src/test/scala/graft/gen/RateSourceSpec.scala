package graft.gen

import graft.SparkSuite
import org.apache.spark.sql.streaming.Trigger

/** S1: the literal rate-source streaming path of the reference (01:78-83). */
class RateSourceSpec extends SparkSuite {

  test("TxnGen.stream ingests from the rate source with full derivation") {
    val clock = java.sql.Timestamp.valueOf("2024-06-02 00:00:00")
    val stream = TxnGen.stream(spark, rowsPerSecond = 500, clock = clock)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("rate_bronze")
      .outputMode("append").trigger(Trigger.ProcessingTime("250 milliseconds")).start()
    try {
      // let the rate source emit for a moment, then drain
      Thread.sleep(1500)
      q.processAllAvailable()
      val out = spark.table("rate_bronze")
      assert(out.count() > 0, "rate source should have emitted rows")
      assert(out.columns.contains("transaction_id") && !out.columns.contains("value"))
      assert(q.recentProgress.nonEmpty) // ST5 progress introspection
    } finally q.stop()
  }
}
