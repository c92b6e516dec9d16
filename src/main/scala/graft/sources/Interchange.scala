package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Driver interchange (SURVEY §2 S10) — the `toPandas()` /
  * `createDataFrame(pdf)` analogue pair (reference
  * `04_MLflow_Fraud_Detection.py:43,311,322`): materialize a bounded result
  * on the driver for a local library, and lift driver-local rows back into
  * a distributed DataFrame.
  *
  * The cap is the contract, not a convenience: `toPandas` is the single
  * most common way a working pipeline dies at scale (the driver OOMs on a
  * result that fit fine at dev scale). [[toRows]] therefore REFUSES
  * unbounded collects — it counts up to `maxRows + 1` first (a cheap
  * limit-pushed job; never materializes more than the cap) and fails with
  * the actual row count rather than buffering an arbitrarily large result.
  * Callers who want a sample, an aggregate, or a top-k should express that
  * in the query — the engine-side reduction is the scale-correct fix, and
  * the error message says so.
  */
object Interchange {

  val DefaultMaxRows = 100000

  /** Collect a DataFrame to driver-local rows, refusing results larger
    * than `maxRows`. The guard runs `limit(maxRows + 1)` — the limit is
    * pushed into the scan/exchange, so an over-sized result costs one
    * partial scan, not a full materialization, before failing. */
  def toRows(df: DataFrame, maxRows: Int = DefaultMaxRows): Seq[Row] = {
    val probe = df.limit(maxRows + 1).collect()
    require(probe.length <= maxRows,
      s"toRows: result exceeds the $maxRows-row driver cap; " +
        "aggregate, sample, or top-k on the cluster side instead of collecting")
    probe.toSeq
  }

  /** Lift driver-local rows back into a distributed DataFrame with an
    * explicit schema (the `createDataFrame(pdf)` direction). Rows are
    * parallelized across the default parallelism so the result takes part
    * in distributed plans like any table. */
  def fromRows(spark: SparkSession, rows: Seq[Row], schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toList), schema)

  /** ARROW-FORMAT interchange — the columnar twin of [[toRows]] and the
    * faithful analogue of what `toPandas()` actually ships (reference
    * `04:43,311`): the result crosses the driver boundary as Arrow
    * RECORD BATCHES (the representation pandas/polars/arrow-rs consume
    * zero-copy) instead of deserialized JVM `Row` objects. Rides Spark's
    * own Arrow serialization ([[org.apache.spark.sql.graft.ArrowBridge]]
    * → the machinery under `collectAsArrowToPython`), so types, timezone
    * handling, and nullability match `toPandas` exactly. Same cap
    * contract as [[toRows]], enforced by the same limit-pushed probe
    * BEFORE any batch is serialized. Returns the per-partition batch
    * byte arrays plus the schema needed to reconstruct. */
  def toArrowBatches(df: DataFrame, maxRows: Int = DefaultMaxRows): (Seq[Array[Byte]], StructType) = {
    // limit + cache makes the underlying plan execute ONCE: the probe
    // count materializes the capped result into the cache and the Arrow
    // collect reads it back. A probe-then-recompute pair would run the
    // plan twice — paying the query cost twice and, for nondeterministic
    // plans, letting the second execution exceed the cap the first one
    // passed. Cache size is bounded by the cap itself (≤ maxRows + 1 rows).
    val capped = df.limit(maxRows + 1).cache()
    try {
      val n = capped.count()
      require(n <= maxRows,
        s"toArrowBatches: result exceeds the $maxRows-row driver cap; " +
          "aggregate, sample, or top-k on the cluster side instead of collecting")
      (org.apache.spark.sql.graft.ArrowBridge.toArrowBatchRdd(capped).collect().toSeq,
        df.schema)
    } finally capped.unpersist(blocking = false)
  }

  /** Lift Arrow record batches back into a DataFrame (the
    * `createDataFrame(pdf)` direction for Arrow payloads — also the
    * ingest point for batches produced by an external Arrow-native
    * library). Small payloads plan as a LocalRelation, large ones as a
    * parallelized scan — distributed either way. */
  def fromArrowBatches(spark: SparkSession, batches: Seq[Array[Byte]],
      schema: StructType): DataFrame =
    org.apache.spark.sql.graft.ArrowBridge.fromArrowBatches(
      spark, batches.iterator, schema.json)
}
