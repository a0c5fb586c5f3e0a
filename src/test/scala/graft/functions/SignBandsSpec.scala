package graft.functions

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.functions._

class SignBandsSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val planes = Similarity.hyperplanes(dim, nBits = 64, seed = 7L)
    .map(_.map(_.toDouble).toArray).toArray

  test("band keys are r-bit bounded and direction-invariant") {
    val v = Array.tabulate(dim)(i => (math.sin(i + 1)).toFloat)
    val scaled = v.map(x => x * 3.0f)
    val df = Seq((1L, v.toSeq), (2L, scaled.toSeq)).toDF("id", "e")
      .select(col("id"),
        SignBands.sign_bands(col("e").cast("array<float>"), planes, bands = 4).as("k"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows(1L).length == 4)
    // 64 bits / 4 bands = 16-bit keys
    assert(rows(1L).forall(k => k >= 0 && k < 65536))
    // positive rescaling preserves every sign → identical keys
    assert(rows(1L) == rows(2L))
    // and a sign flip lands elsewhere (probability 2^-64 of agreeing)
    val flipped = Seq((3L, v.map(x => -x).toSeq)).toDF("id", "e")
      .select(SignBands.sign_bands(col("e").cast("array<float>"), planes, 4).as("k"))
      .head().getSeq[Long](0)
    assert(flipped != rows(1L))
  }

  test("interpreted eval matches the codegen path") {
    val v = Array.tabulate(dim)(i => (math.cos(i) * (i % 3 - 1)).toFloat)
    val viaDf = Seq(Tuple1(v.toSeq)).toDF("e")
      .select(SignBands.sign_bands(col("e").cast("array<float>"), planes, 8).as("k"))
      .head().getSeq[Long](0)
    val direct = SignBands.compute(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        v.map(x => x: Any)), planes, 8)
    assert(viaDf == direct.toLongArray().toSeq)
  }
}
