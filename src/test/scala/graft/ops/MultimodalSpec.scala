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

  test("sampleFrames explodes one row per sampled frame") {
    val docs = Seq((1L, "x" * 256)).toDF("media_id", "payload")
    val media = Multimodal.asMedia(docs, "media_id", "payload")
    val frames = Multimodal.sampleFrames(media, stride = 4).collect()
    assert(frames.length == 4) // 256 bytes / 16 per frame / stride 4
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
  }
}
