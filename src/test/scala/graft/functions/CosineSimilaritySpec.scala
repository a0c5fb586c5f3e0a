package graft.functions

import graft.SparkSpec
import graft.ops.Tables
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("native expression matches the higher-order-function formula exactly") {
    val emb = Tables.t(spark, sfDir, "embeddings").limit(100)
      .withColumn("e2", reverse(col("embedding")).cast("array<float>"))
    val hof = expr(
      """aggregate(zip_with(embedding, e2, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)
         / (sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (acc, v) -> acc + v))
          * sqrt(aggregate(transform(e2, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (acc, v) -> acc + v)))""")
    val rows = emb.select(
        GraftFunctions.cosine_sim(col("embedding"), col("e2")).as("native"),
        hof.as("hof"))
      .as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, h) => assert(math.abs(n - h) < 1e-12, s"$n vs $h") }
  }

  test("self-similarity is 1, zero vector yields 0, null propagates") {
    val df = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f)),
      (Array(0f, 0f, 0f), Array(1f, 2f, 3f)))
      .toDF("a", "b")
    val out = df.select(GraftFunctions.cosine_sim(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(out(0) - 1.0) < 1e-12)
    assert(out(1) == 0.0)
    val withNull = Seq((Some(Array(1f, 2f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(GraftFunctions.cosine_sim(col("a"), col("b")))
    assert(withNull.collect().head.isNullAt(0))
  }

  test("norm-hoisted cosine_from_norms is BIT-identical to the fused kernel " +
      "on uniform-dim vectors (the r12 batch-scoring hoist)") {
    // the real corpus (uniform 64-dim) plus adversarial synthetics:
    // zero vectors on either side, and denormal-ish magnitudes — any
    // difference in accumulation order would surface as a last-ulp
    // mismatch that == catches and |a-b|<eps would mask
    val emb = Tables.t(spark, sfDir, "embeddings").limit(200)
      .select(col("embedding").as("a"),
        reverse(col("embedding")).cast("array<float>").as("b"))
      .unionAll(Seq(
        (Array(0f, 0f, 0f, 1e-30f), Array(1f, 2f, 3f, 4f)),
        (Array(1e20f, -1e20f, 3f, 1f), Array(1e-20f, 1e20f, -2f, 0f)),
        (Array(0f, 0f, 0f, 0f), Array(0f, 0f, 0f, 0f))).toDF("a", "b"))
    val rows = emb.select(
        GraftFunctions.cosine_sim(col("a"), col("b")).as("fused"),
        GraftFunctions.cosine_from_norms(col("a"), col("b"),
          GraftFunctions.vec_norm(col("a")),
          GraftFunctions.vec_norm(col("b"))).as("hoisted"))
      .as[(Double, Double)].collect()
    assert(rows.length > 200)
    rows.foreach { case (f, h) =>
      assert(f == h, s"fused $f != hoisted $h (bit-identity broken)") }
    // and the driver-side query-norm accumulation (bruteForceTopK's
    // hoist) matches vec_norm of the same vector
    val q = Seq(0.3f, -1.7f, 2.5f, 1e-8f, 42f)
    var qsq = 0.0
    q.foreach { x => val xd = x.toDouble; qsq += xd * xd }
    val vn = Seq(Tuple1(q.toArray)).toDF("v")
      .select(GraftFunctions.vec_norm(col("v"))).as[Double].head()
    assert(math.sqrt(qsq) == vn, s"driver ${math.sqrt(qsq)} != plan $vn")
  }

  test("SQL registration works: SELECT cosine_sim(a, b)") {
    GraftFunctions.register(spark)
    Seq((Array(1f, 0f), Array(0f, 1f))).toDF("a", "b").createOrReplaceTempView("cs_t")
    val v = spark.sql("SELECT cosine_sim(a, b) AS s FROM cs_t").as[Double].head()
    assert(v == 0.0)
  }

  test("rejects non-float-array inputs at analysis time") {
    val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(GraftFunctions.cosine_sim(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("cosine_sim") ||
      e.getMessage.toLowerCase.contains("data type"))
  }
}
