package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  lazy val media = Multimodal.synthesize(spark, 300).cache()

  test("synthesized media table matches the declared schema") {
    assert(media.schema === Multimodal.mediaSchema)
    assert(media.count() === 300)
    assert(media.select("kind").distinct().count() === 3)
  }

  test("featurize emits fixed-dim deterministic features per row") {
    val f1 = Multimodal.featurize(media, dim = 16)
    assert(f1.count() === 300)
    assert(f1.filter(size($"features") =!= 16).count() === 0)
    val a = f1.orderBy("media_id").limit(5).collect().map(_.getSeq[Float](2))
    val b = Multimodal.featurize(media, dim = 16)
      .orderBy("media_id").limit(5).collect().map(_.getSeq[Float](2))
    assert(a.zip(b).forall { case (x, y) => x == y }, "features must be deterministic")
  }

  test("featurized output feeds Similarity operators") {
    val f = Multimodal.featurize(media, dim = 16)
      .select($"media_id".as("id"), $"features".as("vec"))
    val q = f.filter($"id" < 2).select($"id".as("qid"), $"vec".as("qvec"))
    val nn = Similarity.bruteForceTopK(f, q, 3)
    assert(nn.count() === 6)
  }

  test("frame sampling explodes every stride-th frame of videos only") {
    val frames = Multimodal.sampleFrames(media, stride = 10)
    val perVideo = frames.groupBy("media_id").count()
    val videos = media.filter($"kind" === "video")
    assert(perVideo.count() === videos.count())
    val checked = frames.join(videos.select($"media_id", $"meta.n_frames".as("nf")), "media_id")
      .groupBy($"media_id", $"nf").agg(count(lit(1)).as("n"), max($"frame_idx").as("maxidx"))
      .filter($"n" =!= ceil($"nf" / 10.0) || $"maxidx" >= $"nf")
    assert(checked.count() === 0)
  }

  test("resizeMeta caps dimensions preserving aspect, leaves others null") {
    val resized = Multimodal.resizeMeta(media, maxDim = 256)
    val bad = resized.filter($"kind" === "image" &&
      (coalesce($"meta.width", lit(0)) > 256 || coalesce($"meta.height", lit(0)) > 256))
    assert(bad.count() === 0)
    assert(resized.filter($"kind" === "audio" && $"meta.sample_rate" =!= 16000).count() === 0)
  }
}
