package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV / JSON-lines ingest and egress — the interchange formats every
  * Databricks-style pipeline reads at the bronze edge (the reference's
  * Auto-Loader surface is cloudFiles over exactly these).
  *
  * Scale rules encoded here rather than left to callers:
  *  - EXPLICIT schema always. `inferSchema` scans the data once before the
  *    real job — at 100 TB that is a full extra pass, and a sampled
  *    inference can silently widen/narrow types between runs.
  *  - PERMISSIVE parsing with a quarantine column: a malformed record
  *    lands in `_corrupt_record` instead of killing the job (DQ handles it
  *    downstream, same as the silver quarantine path).
  *  - Both formats are splittable uncompressed — with one trade: CSV
  *    quoted-newline support (`multiLine`) forces one task per file, so it
  *    is OPT-IN here, not the default. gzip is also non-splittable (one
  *    task per file) — callers compress with codecs that split (or rely on
  *    many files). Parquet remains the canonical internal format; these
  *    are edge formats only.
  */
object Formats {

  val CorruptCol = "_corrupt_record"

  /** Schema + quarantine column for permissive reads. */
  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else schema.add(CorruptCol, org.apache.spark.sql.types.StringType, nullable = true)

  /** `multiLine = true` keeps quoted fields spanning newlines as one
    * record, but makes each CSV file single-task (non-splittable) — only
    * enable it for data that actually embeds newlines. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ",",
      multiLine: Boolean = false): DataFrame =
    spark.read.format("csv")
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("multiLine", multiLine.toString)
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(withCorrupt(schema))
      .load(path)

  /** NOTE: quoted embedded newlines are written as-is — data containing
    * them must be read back with `readCsv(..., multiLine = true)`; the
    * splittable default read would split such records mid-field and
    * PERMISSIVE mode would quarantine/null-fill the fragments silently. */
  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite")
      .option("header", header.toString)
      .option("escape", "\"")
      .format("csv").save(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.format("json")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(withCorrupt(schema))
      .load(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").format("json").save(path)
}
