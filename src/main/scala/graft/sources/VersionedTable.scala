package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.charset.StandardCharsets

/** Minimal copy-on-write table: versioned parquet directories under a base
  * path with an atomically swapped `_CURRENT` pointer file — the core of
  * what Delta's transaction log provides for MERGE rewrites, without the
  * Delta jar (SURVEY §2.10 M1/M2 gap).
  *
  * Why not overwrite in place: Spark cannot overwrite a path it is reading
  * from in the same job (and caching the intermediate is not viable at
  * 100 TB). Writing `v<N+1>` and flipping the pointer gives lock-free
  * readers snapshot isolation and makes replayed merges idempotent at the
  * storage layer too. Old versions are retained for time-travel-style reads
  * until [[vacuum]].
  */
object VersionedTable {

  private def fs(spark: SparkSession, base: String): FileSystem =
    new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pointer(base: String) = new Path(base, "_CURRENT")

  def currentVersion(spark: SparkSession, base: String): Option[Long] = {
    val f = fs(spark, base)
    if (!f.exists(pointer(base))) None
    else {
      val in = f.open(pointer(base))
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8).trim.toLong)
      finally in.close()
    }
  }

  def versionPath(base: String, v: Long): String = s"$base/v$v"

  /** Snapshot read of the current version (None if never committed). */
  def read(spark: SparkSession, base: String): Option[DataFrame] =
    currentVersion(spark, base).map(v => spark.read.parquet(versionPath(base, v)))

  /** Read a specific historical version (time-travel analogue, M1). */
  def readVersion(spark: SparkSession, base: String, v: Long): DataFrame =
    spark.read.parquet(versionPath(base, v))

  /** Write `df` as the next version, then atomically flip `_CURRENT`
    * (write temp pointer + rename — atomic on HDFS/local posix). */
  def commit(spark: SparkSession, base: String, df: DataFrame): Long = {
    val next = currentVersion(spark, base).map(_ + 1).getOrElse(0L)
    df.write.mode("overwrite").parquet(versionPath(base, next))
    val f = fs(spark, base)
    val tmp = new Path(base, s"_CURRENT.tmp$next")
    val out = f.create(tmp, true)
    try out.write(next.toString.getBytes(StandardCharsets.UTF_8)) finally out.close()
    if (f.exists(pointer(base))) f.delete(pointer(base), false)
    if (!f.rename(tmp, pointer(base)))
      throw new java.io.IOException(s"pointer swap failed for $base v$next")
    next
  }

  /** Drop all versions older than the current one. */
  def vacuum(spark: SparkSession, base: String): Unit = {
    val f = fs(spark, base)
    currentVersion(spark, base).foreach { cur =>
      f.listStatus(new Path(base)).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith("v") && name.drop(1).forall(_.isDigit)
            && name.drop(1).toLong < cur)
          f.delete(st.getPath, true)
      }
    }
  }
}
