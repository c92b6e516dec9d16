package graft
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement tool: execute named catalog queries under
  * the bench's session config and write each one's FULL post-execution
  * `.explain("formatted")` (AQE-final plan) to a file.
  *
  * Usage: runMain graft.PlanSnap <outDir> <suffix> <query-substring>[,...]
  * e.g. `runMain graft.PlanSnap plans/r18 before q130,q207` writes
  * plans/r18/q130_pagerank_before.txt etc. SF dir and core count come from
  * the same env vars as the bench (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS).
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanSnap <outDir> <suffix> <filters>")
    val Array(outDir, suffix, filters) = args
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fs = filters.split(',').toSeq
    val names = SparkEntry.queries.keys.toSeq.sorted.filter(n => fs.exists(n.contains))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      spark.sparkContext.setJobDescription(s"plansnap: $name")
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.count() // execute so AQE settles on the final plan
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plansnap] wrote $outDir/${name}_$suffix.txt")
      Housekeeping.releaseAndSettle(spark)
    }
    spark.stop()
  }
}
