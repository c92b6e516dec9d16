package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.execution.arrow.ArrowConverters

/** Minimal accessor for Spark's `private[sql]` Arrow machinery — the same
  * serialization `toPandas()`/`collectAsArrowToPython` ride, exposed for
  * JVM-side interchange without a Python bridge in the loop.
  */
object ArrowBridge {

  /** One Arrow record-batch stream per plan partition (bytes are Arrow
    * RecordBatch messages in the session timezone; schema travels
    * separately — Spark's own toPandas framing). */
  def toArrowBatchRdd(df: DataFrame): RDD[Array[Byte]] =
    df.asInstanceOf[ClassicDataset[Row]].toArrowBatchRdd

  /** Inverse: Arrow record batches + the schema's json back to a
    * DataFrame. Spark plans a LocalRelation under its local-relation
    * threshold and a parallelized RDD scan above it — driver-local data
    * becomes a genuinely distributed table either way. */
  def fromArrowBatches(spark: SparkSession, batches: Iterator[Array[Byte]],
      schemaJson: String): DataFrame =
    ArrowConverters.toDataFrame(batches, schemaJson,
      spark.asInstanceOf[ClassicSparkSession])
}
