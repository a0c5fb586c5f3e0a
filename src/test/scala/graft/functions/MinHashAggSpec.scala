package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class MinHashAggSpec extends SparkSpec {
  import spark.implicits._

  private def expectedSig(values: Seq[String], k: Int): Seq[Long] =
    (0 until k).map { seed =>
      values.map { s =>
        val u = UTF8String.fromString(s)
        XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), seed.toLong)
      }.min
    }

  test("aggregate equals the per-seed minimum computed directly") {
    val vals = Seq("alpha", "beta", "gamma", "delta")
    val df = vals.map(("d1", _)).toDF("id", "s")
    val sig = df.groupBy("id")
      .agg(MinHashAgg.minhash(col("s"), 16).as("sig"))
      .select("sig").as[Seq[Long]].head()
    assert(sig == expectedSig(vals, 16))
  }

  test("signature is partition-order independent (merge correctness)") {
    val vals = (1 to 500).map(i => ("d1", s"shingle_$i"))
    val df = vals.toDF("id", "s")
    val a = df.repartition(1).groupBy("id")
      .agg(MinHashAgg.minhash(col("s"), 32).as("sig")).select("sig").as[Seq[Long]].head()
    val b = df.repartition(7).groupBy("id")
      .agg(MinHashAgg.minhash(col("s"), 32).as("sig")).select("sig").as[Seq[Long]].head()
    assert(a == b)
  }

  test("identical shingle sets give identical signatures; estimate tracks jaccard") {
    val s1 = (1 to 200).map(i => ("a", s"sh_$i"))
    val s2 = (1 to 200).map(i => ("b", s"sh_$i"))             // identical set
    val s3 = (101 to 300).map(i => ("c", s"sh_$i"))           // jaccard 1/3
    val df = (s1 ++ s2 ++ s3).toDF("id", "s")
    val sigs = df.groupBy("id")
      .agg(MinHashAgg.minhash(col("s"), 128).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(sigs("a") == sigs("b"))
    val est = sigs("a").zip(sigs("c")).count { case (x, y) => x == y } / 128.0
    assert(est > 0.15 && est < 0.55, s"estimate $est for true jaccard 1/3")
  }

  test("row-local MinHashArray is bit-identical to aggregating the exploded stream") {
    val hashes = (1 to 300).map(i => XXH64.hashLong(i.toLong, 7L))
    val arrDf = Seq(("d1", hashes)).toDF("id", "sset")
    val rowLocal = arrDf
      .select(MinHashArray.minhash_array(col("sset"), 32).as("sig"))
      .as[Seq[Long]].head()
    val aggregated = arrDf.select(col("id"), explode(col("sset")).as("s"))
      .repartition(5)
      .groupBy("id").agg(MinHashAgg.minhash(col("s"), 32).as("sig"))
      .select("sig").as[Seq[Long]].head()
    assert(rowLocal == aggregated)
  }

  test("MinHashArray yields NULL on an empty array (doc drops out of banding)") {
    val df = Seq(("d1", Seq.empty[Long]), ("d2", Seq(1L, 2L, 3L)))
      .toDF("id", "sset")
      .select(col("id"), MinHashArray.minhash_array(col("sset"), 8).as("sig"))
    assert(df.filter(col("sig").isNull).select("id").as[String].collect().toSeq == Seq("d1"))
    assert(df.filter(col("sig").isNotNull).select("id").as[String].collect().toSeq == Seq("d2"))
  }
}
