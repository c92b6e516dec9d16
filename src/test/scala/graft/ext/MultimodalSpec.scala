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

  test("image payloads are genuine PNG bytes") {
    val pngs = media.filter($"kind" === "image").select("payload").collect()
      .map(_.getAs[Array[Byte]](0))
    assert(pngs.nonEmpty)
    // PNG magic: 0x89 'P' 'N' 'G'
    assert(pngs.forall(p => (p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G'))
    // and each decodes via a plain ImageIO read to the synthesized dims
    val rows = media.filter($"kind" === "image").select("media_id", "payload").collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
      assert(img != null)
      assert(img.getWidth === (id % 16 + 4).toInt && img.getHeight === (id % 12 + 4).toInt)
    }
  }

  test("decodeImage yields a real pixel histogram, not the stub") {
    val r = media.filter($"kind" === "image").orderBy("media_id").limit(1)
      .select("media_id", "payload").head
    val payload = r.getAs[Array[Byte]]("payload")
    val feats = Multimodal.decodeImage(payload, 16).get
    // normalized histogram: non-negative bins summing to 1 over the pixels
    assert(feats.forall(f => f >= 0f && f <= 1f))
    assert(math.abs(feats.sum - 1f) < 1e-4)
    // pixel-derived: recomputing from the decoded image matches exactly
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    val expect = new Array[Float](16)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val rgb = img.getRGB(x, y)
      val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
      expect(lum * 16 / 256) += 1f
    }
    val n = (img.getWidth * img.getHeight).toFloat
    assert(feats.toSeq === expect.map(_ / n).toSeq)
    // and it is NOT the stub's output
    assert(feats.toSeq !== Multimodal.decodeStub(payload, "image", 16).toSeq)
  }

  test("decodeImage sniffs formats: the same pixels round-trip through BMP") {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.synthImagePng(7L)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val viaBmp = Multimodal.decodeImage(bos.toByteArray, 16).get
    val viaPng = Multimodal.decodeImage(Multimodal.synthImagePng(7L), 16).get
    assert(viaBmp.toSeq === viaPng.toSeq, "lossless formats must decode to identical features")
  }

  test("featurize routes image+audio through real decoders, video through the stub") {
    val feats = Multimodal.featurize(media, dim = 16)
      .join(media.select($"media_id", $"payload"), "media_id")
      .collect()
    feats.foreach { r =>
      val kind = r.getString(1)
      val got = r.getSeq[Float](2)
      val payload = r.getAs[Array[Byte]]("payload")
      kind match {
        case "image" =>
          assert(got === Multimodal.decodeImage(payload, 16).get.toSeq)
        case "audio" =>
          assert(got === Multimodal.decodeAudio(payload, 16).get.toSeq)
          assert(got !== Multimodal.decodeStub(payload, kind, 16).toSeq,
            "real WAV decode must not silently fall back to the stub")
        case _ =>
          assert(got === Multimodal.decodeStub(payload, kind, 16).toSeq)
      }
    }
  }

  test("decodeAudio reads real PCM frames: envelope matches a serial WAV parse") {
    val wav = Multimodal.synthAudioWav(7L)
    val got = Multimodal.decodeAudio(wav, 8).get
    // serial reference: skip the 44-byte canonical RIFF header, little-
    // endian 16-bit mono samples, mean |amplitude| per of 8 bins
    val data = wav.drop(44)
    val n = data.length / 2
    val samples = (0 until n).map { i =>
      (((data(2 * i + 1) & 0xff) << 8) | (data(2 * i) & 0xff)).toShort
    }
    val ref = (0 until 8).map { b =>
      val bin = samples.zipWithIndex.filter { case (_, i) => i.toLong * 8 / n == b }
      (bin.map(s => math.abs(s._1.toLong)).sum.toFloat / bin.size) / 32768f
    }
    assert(got.toSeq === ref)
    // non-WAV bytes decode to None (and dispatch falls back to the stub)
    assert(Multimodal.decodeAudio(Array[Byte](9, 9, 9, 9), 8).isEmpty)
    assert(Multimodal.decodeAudio(null, 8).isEmpty)
  }

  test("resizeImages bounds the longest side, preserves perceptual content, passes non-images through") {
    val media = Multimodal.synthesize(spark, 40)
    val resized = Multimodal.resizeImages(media, maxDim = 16)
    val rows = resized.collect()
    assert(rows.length === 40, "row-preserving op")
    for (r <- rows if r.getString(1) == "image") {
      val p = r.getAs[Array[Byte]]("payload")
      assert(p != null, "synthetic PNGs must resize")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
      assert(math.max(img.getWidth, img.getHeight) <= 16,
        s"longest side bounded: ${img.getWidth}x${img.getHeight}")
      assert(math.min(img.getWidth, img.getHeight) >= 1)
    }
    // non-image payloads pass through byte-identical
    val orig = media.select("media_id", "kind", "payload").collect()
      .filter(_.getString(1) != "image")
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload").toSeq).toMap
    for (r <- rows if r.getString(1) != "image")
      assert(r.getAs[Array[Byte]]("payload").toSeq === orig(r.getLong(0)))
    // perceptual content survives: aHash of the resized image stays within
    // the near-dup band of the original (aHash is resolution-invariant)
    val one = media.filter($"kind" === "image").select("payload").head()
      .getAs[Array[Byte]]("payload")
    val small = Multimodal.resizeImage(one, 16).get
    val (h1, h2) = (Multimodal.aHash(one).get, Multimodal.aHash(small).get)
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 12,
      s"perceptual fingerprint must survive a resize (hamming ${java.lang.Long.bitCount(h1 ^ h2)})")
    // never upscale: an already-small image keeps its dimensions
    val sm = Multimodal.resizeImage(small, 64).get
    val smImg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(sm))
    val smallImg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(small))
    assert(smImg.getWidth === smallImg.getWidth && smImg.getHeight === smallImg.getHeight)
  }

  test("undecodable image payload falls back to the stub, never throws") {
    val junk = Array[Byte](1, 2, 3, 4)
    assert(Multimodal.decodeImage(junk, 16).isEmpty)
    assert(Multimodal.decode(junk, "image", 16).toSeq ===
      Multimodal.decodeStub(junk, "image", 16).toSeq)
    assert(Multimodal.decodeImage(null, 16).isEmpty)
    // valid PNG signature + corrupted body: the JDK readers throw from
    // DEEP inside (not always IOException) — must yield None, not a
    // task-killing escape
    val png = Multimodal.synthImagePng(3L)
    val corrupt = png.clone()
    var i = 16
    while (i < corrupt.length) { corrupt(i) = (i * 37).toByte; i += 1 }
    assert(Multimodal.decodeImage(corrupt, 16).isEmpty ||
      Multimodal.decodeImage(corrupt, 16).get.length === 16,
      "corrupt body must decode-or-None, never throw")
    val truncated = java.util.Arrays.copyOf(png, 20)
    assert(Multimodal.decodeImage(truncated, 16).isEmpty)
  }

  test("resizeMeta caps dimensions preserving aspect, leaves others null") {
    val resized = Multimodal.resizeMeta(media, maxDim = 256)
    val bad = resized.filter($"kind" === "image" &&
      (coalesce($"meta.width", lit(0)) > 256 || coalesce($"meta.height", lit(0)) > 256))
    assert(bad.count() === 0)
    assert(resized.filter($"kind" === "audio" && $"meta.sample_rate" =!= 8000).count() === 0)
  }

  /** Gray 8×8-patterned PNG: `pattern` bit (r·8+c) dark/light, each cell
    * `scale`×`scale` pixels. */
  private def patternPng(pattern: Long, scale: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      8 * scale, 8 * scale, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8 * scale; x <- 0 until 8 * scale) {
      val bit = (pattern >>> ((y / scale) * 8 + (x / scale))) & 1L
      val v = if (bit == 1L) 230 else 20
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("aHash is resolution-invariant and recovers the planted cell pattern") {
    val p = 0x0F0F00FFCCAA3355L
    val h1 = Multimodal.aHash(patternPng(p, 1)).get
    val h4 = Multimodal.aHash(patternPng(p, 4)).get
    assert(h1 === h4, "average pooling must erase resolution")
    assert(h1 === p, "bright cells sit above the global mean exactly at the pattern bits")
    assert(Multimodal.aHash(null).isEmpty)
    assert(Multimodal.aHash(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("imageNearDupPairs: banding is lossless at hamming <= 3, verify filter exact") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val base = 0x0F0F00FFCCAA3355L
    val twoOff = base ^ 0x0000000000000009L // flip cells 0 and 3: hamming 2
    val farOff = ~base // hamming 64
    val rows = Seq(
      Row(1L, "image", patternPng(base, 2), Row(null, null, null, null)),
      Row(2L, "image", patternPng(base, 3), Row(null, null, null, null)), // same hash, diff res
      Row(3L, "image", patternPng(twoOff, 2), Row(null, null, null, null)),
      Row(4L, "image", patternPng(farOff, 2), Row(null, null, null, null)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
    val pairs = Multimodal.imageNearDupPairs(df, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L, 0L), (1L, 3L, 2L), (2L, 3L, 2L)),
      "exact dup at 0, two-bit pair at 2, far image excluded")
    // tighter dial drops the hamming-2 pairs but keeps the exact dup
    val tight = Multimodal.imageNearDupPairs(df, maxHamming = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(tight === Set((1L, 2L, 0L)))
  }

  test("audio fingerprints: duration/gain-invariant construction, planted dups recovered") {
    // identical payload -> identical fingerprint, distinct ids -> (almost
    // surely) distinct waveforms
    val f1 = Multimodal.audioFingerprint(Multimodal.synthAudioWav(5L)).get
    val f1b = Multimodal.audioFingerprint(Multimodal.synthAudioWav(5L)).get
    val f2 = Multimodal.audioFingerprint(Multimodal.synthAudioWav(6L)).get
    assert(f1 === f1b)
    assert(f1 !== f2)
    assert(Multimodal.audioFingerprint(Array[Byte](1, 2, 3)).isEmpty)
    val media = Multimodal.synthesize(spark, 300L)
    val dups = media.filter($"kind" === "audio" && $"media_id" % 30 === 1)
      .withColumn("media_id", $"media_id" + 1000000L)
    val pairs = Multimodal.audioNearDupPairs(media.unionByName(dups), maxHamming = 3)
      .as[(Long, Long, Long)].collect()
    val planted = pairs.filter(p => p._2 == p._1 + 1000000L)
    assert(planted.length === 10 && planted.forall(_._3 === 0L))
  }

  test("q147 corpus: every planted duplicate id is recovered at hamming 0") {
    val media = Multimodal.synthesize(spark, 300L)
    val dups = media.filter($"kind" === "image" && $"media_id" % 30 === 0)
      .withColumn("media_id", $"media_id" + 1000000L)
    val pairs = Multimodal.imageNearDupPairs(media.unionByName(dups), maxHamming = 3)
      .as[(Long, Long, Long)].collect()
    val planted = pairs.filter(p => p._2 == p._1 + 1000000L)
    assert(planted.length === 10, "300 rows -> ids 0,30,...,270 planted")
    assert(planted.forall(_._3 === 0L), "identical payloads must hash identically")
  }

  test("q189 canonical selection: re-ingests always lose the keeper slot; components account for every image") {
    val out = graft.QueryCatalog.queries("q189_image_canonical")(spark, "unused")
      .select($"keep_media_id", $"n_members").as[(Long, Long)].collect()
    // a planted re-ingest (id ≥ 1e6) has identical payload to its original
    // ⇒ equal bytes ⇒ the id tiebreak keeps the ORIGINAL, every time
    assert(out.forall(_._1 < 1000000L), "a re-ingest must never be the keeper")
    // component membership accounts for the whole image corpus exactly
    val media = Multimodal.synthesize(spark, 3000L)
    val nImages = media.filter($"kind" === "image").count()
    val nDups = media.filter($"kind" === "image" && $"media_id" % 30 === 0).count()
    assert(out.map(_._2).sum === nImages + nDups)
    // dups create no new components: keeper count ≤ distinct images, and
    // at least nDups memberships collapsed into multi-member components
    assert(out.length <= nImages)
    assert(out.filter(_._2 >= 2).map(_._2 - 1).sum >= nDups,
      "every planted re-ingest must land in a multi-member component")
  }
}
