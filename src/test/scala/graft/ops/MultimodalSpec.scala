package graft.ops

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("fakeFeatures is deterministic, bounded, fixed-dim") {
    val b = "hello multimodal world".getBytes("UTF-8")
    val f1 = Multimodal.fakeFeatures(b)
    val f2 = Multimodal.fakeFeatures(b)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == Multimodal.featureDim)
    assert(f1.forall(v => v >= 0f && v <= 1f))
    assert(Multimodal.fakeFeatures(Array.emptyByteArray).toSeq ==
      Seq.fill(Multimodal.featureDim)(0f))
  }

  test("asMedia + decodeFeatures preserves ids and byte counts") {
    val docs = Seq((7L, "abc"), (8L, "a much longer payload with more bytes"))
      .toDF("media_id", "payload")
    val out = Multimodal.decodeFeatures(
      Multimodal.asMedia(docs, "media_id", "payload")).collect()
    assert(out.length == 2)
    val byId = out.map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(byId == Map(
      7L -> "abc".getBytes("UTF-8").length,
      8L -> "a much longer payload with more bytes".getBytes("UTF-8").length))
  }

  test("PNG round-trip through ImageIO recovers known dimensions and stats") {
    // constant-byte payload → every channel of every pixel is that
    // byte → channel means are exactly the byte value
    val gray = Array.fill[Byte](192)(100.toByte)
    val png = Multimodal.encodePng(Multimodal.synthPixels(gray, 8, 8))
    // PNG magic
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte)
    val docs = Seq((1L, "d" * 64), (2L, "x")).toDF("doc_id", "text")
    val media = Multimodal.asPngMedia(docs, "doc_id", "text", w = 8, h = 8)
    val stats = Multimodal.decodeImageStats(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (r <- stats.values) {
      assert(r.getInt(1) == 8 && r.getInt(2) == 8, "decoded dimensions")
      assert(r.getInt(3) == 3, "RGB channels")
      assert(r.getBoolean(8), "decoded flag")
    }
    // doc 1 is all 'd' (0x64 = 100): every byte is 100 → means == 100.0
    val d = stats(1L)
    assert(d.getDouble(4) == 100.0 && d.getDouble(5) == 100.0 && d.getDouble(6) == 100.0)
    // undecodable payload yields a visible false flag, not a crash
    val bogus = Seq((9L, Array[Byte](1, 2, 3))).toDF("media_id", "bin")
    val out = Multimodal.decodeImageStats(bogus).collect().head
    assert(!out.getBoolean(8) && out.getInt(1) == 0)
  }

  test("WAV round-trip through javax.sound recovers format, frames, and RMS") {
    val docs = Seq((1L, "a" * 100), (2L, "b" * 300)).toDF("doc_id", "text")
    val media = Multimodal.asWavMedia(docs, "doc_id", "text")
    // RIFF magic on the payload
    val firstBin = media.orderBy("media_id").collect().head.getAs[Array[Byte]]("bin")
    assert(new String(firstBin.take(4), "US-ASCII") == "RIFF")
    val stats = Multimodal.decodeAudioStats(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    for ((id, r) <- stats) {
      assert(r.getInt(1) == 8000 && r.getInt(2) == 1 && r.getInt(3) == 16,
        s"clip $id format")
      assert(r.getBoolean(7), s"clip $id decoded flag")
      // a sine at amplitude 12000 has RMS ≈ 12000/√2 ≈ 8485
      assert(math.abs(r.getDouble(6) - 8485.0) < 300.0, s"clip $id rms ${r.getDouble(6)}")
    }
    // frame counts follow 400 + len(text) % 400
    assert(stats(1L).getLong(4) == 500L && stats(2L).getLong(4) == 700L)
    // undecodable payload yields a visible false flag, not a crash
    val bogus = Seq((9L, Array[Byte](1, 2, 3, 4))).toDF("media_id", "bin")
    val out = Multimodal.decodeAudioStats(bogus).collect().head
    assert(!out.getBoolean(7) && out.getInt(1) == 0)
  }

  test("resizeImages: box-filter averages exact 2x2 blocks and re-encodes a real PNG") {
    import spark.implicits._
    // hand-built 4x4: left half pure red, right half pure blue →
    // resized 2x2 must be exactly (255,0,0) left column, (0,0,255) right
    val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0xff0000 else 0x0000ff)
    val png = Multimodal.encodePng(img)
    val media = Seq((1L, png)).toDF("media_id", "bin")
    val r = Multimodal.resizeImages(media, 2, 2).collect().head
    assert(r.getAs[Int]("width_in") == 4 && r.getAs[Int]("width_out") == 2)
    assert(r.getAs[Boolean]("decoded"))
    assert(r.getAs[Double]("mean_r") == 127.5 && r.getAs[Double]("mean_b") == 127.5,
      s"means ${r.getAs[Double]("mean_r")}/${r.getAs[Double]("mean_b")}")
    // the output payload is a genuine PNG: decode it back and check pixels
    val out = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bin")))
    assert(out.getWidth == 2 && out.getHeight == 2)
    assert((out.getRGB(0, 0) & 0xffffff) == 0xff0000 &&
      (out.getRGB(1, 1) & 0xffffff) == 0x0000ff)
    // undecodable payload: visible flag, empty output
    val bogus = Seq((9L, Array[Byte](9, 9, 9))).toDF("media_id", "bin")
    val b = Multimodal.resizeImages(bogus, 2, 2).collect().head
    assert(!b.getAs[Boolean]("decoded") && b.getAs[Array[Byte]]("bin").isEmpty)
  }

  test("sampleFrames explodes one row per sampled frame") {
    val docs = Seq((1L, "x" * 256)).toDF("media_id", "payload")
    val media = Multimodal.asMedia(docs, "media_id", "payload")
    val frames = Multimodal.sampleFrames(media, stride = 4).collect()
    assert(frames.length == 4) // 256 bytes / 16 per frame / stride 4
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
  }

  test("imagePhash: deterministic, constant image collapses, garbage flags") {
    val docs = Seq((1L, "some repeated text " * 8), (2L, "q"))
      .toDF("doc_id", "text")
    val media = Multimodal.asPngMedia(docs, "doc_id", "text", w = 16, h = 16)
    val h1 = Multimodal.imagePhash(media).orderBy("media_id").collect()
    val h2 = Multimodal.imagePhash(media).orderBy("media_id").collect()
    assert(h1.map(_.getLong(1)).toSeq == h2.map(_.getLong(1)).toSeq)
    assert(h1.forall(_.getBoolean(2)))
    // a single-byte payload renders a CONSTANT image: no cell exceeds
    // the mean, hash must be exactly 0
    assert(h1.find(_.getLong(0) == 2L).get.getLong(1) == 0L)
    // an unparseable payload flags decoded = false with hash 0
    val junk = Seq((9L, Array[Byte](1, 2, 3))).toDF("media_id", "bin")
    val bad = Multimodal.imagePhash(junk).collect().head
    assert(!bad.getBoolean(2) && bad.getLong(1) == 0L)
  }

  test("imageNearDup surfaces exact copies at Hamming 0, not random pairs") {
    val texts = (0L until 40L).map(i =>
      i -> s"document body number $i ${"filler " * (i % 7).toInt}")
    val docs = (texts ++ Seq(1000L -> texts(3)._2, 1001L -> texts(17)._2))
      .toDF("doc_id", "text")
    val media = Multimodal.asPngMedia(docs, "doc_id", "text", w = 16, h = 16)
    val pairs = Multimodal.imageNearDup(media, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // both planted copies found at distance 0
    assert(pairs.contains((3L, 1000L, 0)))
    assert(pairs.contains((17L, 1001L, 0)))
    // every reported pair honors the verify bound
    assert(pairs.forall(_._3 == 0))
  }

  test("imageNearDup candidate volume stays bounded under a mega-cluster") {
    // 500 identical images: uncapped banding would emit ~125k pairs
    // from ONE bucket; the capped generator must drop it entirely
    val docs = (0L until 500L).map(i => i -> "the same text every time")
      .toDF("doc_id", "text")
    val media = Multimodal.asPngMedia(docs, "doc_id", "text", w = 8, h = 8)
    val n = Multimodal.imageNearDup(media, maxHamming = 0, maxBucket = 100)
      .count()
    assert(n == 0L, s"capped mega-cluster bucket must drop, got $n pairs")
  }
}
