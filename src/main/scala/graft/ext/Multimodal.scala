package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * as opaque `binary` columns with typed metadata, plus decode/feature/
  * frame-sample operators.
  *
  * The Spark-side shapes (schema, partitioning, per-partition batch
  * processing, output contracts) are real and tested; the codec step itself
  * is STUBBED with a deterministic fake (`fakeDecodeFeatures`) because no
  * image/audio libraries ship in this environment — swap `decodeStub` for a
  * real decoder (JNI/ffmpeg/ImageIO) without touching any plumbing.
  *
  * Scale notes: binary payloads ride the columnar format untouched
  * (parquet stores them as BYTE_ARRAY); `mapPartitions` gives the decoder
  * one JVM-local iterator per partition — the Scala analogue of
  * `mapInPandas` batching — so a native decoder amortizes init per
  * partition, not per row. Feature extraction emits fixed-width float
  * arrays ready for [[Similarity]].
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))), nullable = false)))

  /** Deterministic synthetic media table (payload bytes derived from id) —
    * stands in for a real ingest; executors synthesize their own partitions. */
  def synthesize(spark: SparkSession, n: Long): DataFrame = {
    val kinds = array(lit("image"), lit("audio"), lit("video"))
    spark.range(n)
      .withColumn("media_id", col("id"))
      .withColumn("kind", element_at(kinds, (col("id") % 3 + 1).cast("int")))
      .withColumn("payload", sha2(col("id").cast("string"), 256).cast("binary"))
      .withColumn("meta", struct(
        when(col("kind") === "image", (col("id") % 1024 + 64).cast("int")).as("width"),
        when(col("kind") === "image", (col("id") % 768 + 64).cast("int")).as("height"),
        when(col("kind") === "audio", lit(16000)).as("sample_rate"),
        when(col("kind") === "video", (col("id") % 300 + 30).cast("int")).as("n_frames")))
      .select("media_id", "kind", "payload", "meta")
  }

  /** STUB decoder: deterministic pseudo-features from payload bytes.
    * ??? -- replace with a real codec (ImageIO / javacv / soundfile JNI);
    * the signature `(bytes, kind) => Array[Float]` is the swap point. */
  def decodeStub(payload: Array[Byte], kind: String, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (payload != null) {
      var h = kind.hashCode.toLong & 0xffffffffL
      var i = 0
      while (i < dim) {
        h = h * 6364136223846793005L + 1442695040888963407L + payload(i % payload.length)
        out(i) = ((h >>> 33).toInt % 1000) / 1000.0f
        i += 1
      }
    }
    out
  }

  /** Per-partition feature extraction: one decoder instance per partition
    * (the `mapInPandas` batching analogue), fixed-dim output contract. */
  def featurize(media: DataFrame, dim: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "kind", "payload").mapPartitions { rows =>
      // decoder init happens HERE, once per partition:
      rows.map { r =>
        Row(r.getLong(0), r.getString(1),
          decodeStub(r.getAs[Array[Byte]]("payload"), r.getString(1), dim).toSeq)
      }
    }(enc)
  }

  /** Frame sampling plumbing for video rows: one output row per sampled
    * frame index (every `stride`-th frame) — the explode-shaped generator a
    * real frame extractor plugs into. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), coalesce(col("meta.n_frames"), lit(1)) - 1,
          lit(stride))))
      .select(col("media_id"), col("frame_idx"), col("payload"))

  /** Metadata-only resize op: proves nested-struct column surgery without
    * touching payloads (the real resize replaces payload too). */
  def resizeMeta(media: DataFrame, maxDim: Int): DataFrame = {
    val w = col("meta.width")
    val h = col("meta.height")
    val scale = when(greatest(w, h) > maxDim,
      lit(maxDim).cast("double") / greatest(w, h)).otherwise(lit(1.0))
    media.withColumn("meta", struct(
      (w * scale).cast("int").as("width"),
      (h * scale).cast("int").as("height"),
      col("meta.sample_rate").as("sample_rate"),
      col("meta.n_frames").as("n_frames")))
  }
}
