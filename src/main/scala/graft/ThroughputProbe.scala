package graft
import org.apache.spark.sql.functions._

/** Single-node throughput probe for the medallion pipeline (BASELINE.md's
  * throughput comparison): generates N bronze rows, runs the full ref-02
  * DQ/mask/enrich silver transform and a ref-03 gold aggregate, reports
  * end-to-end rows/s. The reference's only published ingest number is its
  * rate-limited 20 rows/s demo stream (README:24); this measures the
  * engine, not a rate limiter. Run:
  * `sbt "runMain graft.ThroughputProbe"` (local[32], 1M rows).
  */
object ThroughputProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    val clock = java.sql.Timestamp.valueOf("2024-06-02 00:00:00")
    val n = 1000000
    // warmup
    gen.TxnGen.batch(spark, 10000, t0, clock).count()
    val start = System.nanoTime()
    val bronze = gen.TxnGen.batch(spark, n, t0, clock)
    val (silverReady, _) = silver.TxnSilver.processBatch(bronze, clock, gen.TxnGen.ValidMcc)
    // Execute gen->DQ->enrich EXACTLY ONCE inside the timed window: the
    // checkpoint materializes the silver output; the gold aggregate and the
    // silver count then read the materialized blocks. Three separate counts
    // over the uncached pipeline would re-execute it per count and
    // understate rows/s ~3x. DQ is a partition of the batch, so the
    // quarantine count is n - silverRows — no second pass.
    val silverDone = silverReady.localCheckpoint()
    val goldRows = gold.TxnGold.merchantRiskSummary(silverDone).count()
    val silverRows = silverDone.count()
    val qRows = n - silverRows
    val sec = (System.nanoTime() - start) / 1e9
    System.err.println(f"[tp] $n rows gen->DQ->silver->gold in $sec%.2f s = ${n / sec}%.0f rows/s (silver=$silverRows quarantine=$qRows gold=$goldRows)")
    spark.stop()
  }
}
