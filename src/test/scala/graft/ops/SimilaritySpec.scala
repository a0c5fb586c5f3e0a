package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.t(spark, sfDir, "embeddings").cache()
  private lazy val q: Seq[Float] =
    emb.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0)

  test("cosine of a vector with itself is 1") {
    val self = emb.filter($"vec_id" === 0)
      .select(Similarity.cosineToQuery($"embedding", q).as("sim"))
      .as[Double].head()
    assert(math.abs(self - 1.0) < 1e-9)
  }

  test("brute-force top-k is ordered and bounded") {
    val top = Similarity.bruteForceTopK(
      emb.filter($"vec_id" =!= 0), "vec_id", "embedding", q, 10)
      .select("sim").as[Double].collect()
    assert(top.length == 10)
    assert(top.sameElements(top.sorted.reverse))
    assert(top.forall(s => s >= -1.0 && s <= 1.0))
  }

  test("LSH top-k recall vs brute force is reasonable") {
    val exact = Similarity.bruteForceTopK(
      emb.filter($"vec_id" =!= 0), "vec_id", "embedding", q, 10)
      .select("vec_id").as[Long].collect().toSet
    val approx = Similarity.lshTopK(
      emb.filter($"vec_id" =!= 0), "vec_id", "embedding", q,
      k = 10, nBits = 8, probes = 2)
      .select("vec_id").as[Long].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall")
  }

  test("IVF top-k recall vs brute force is reasonable and deterministic") {
    val exact = Similarity.bruteForceTopK(
      emb.filter($"vec_id" =!= 0), "vec_id", "embedding", q, 10)
      .select("vec_id").as[Long].collect().toSet
    def run() = Similarity.ivfTopK(
      emb.filter($"vec_id" =!= 0), "vec_id", "embedding", q,
      k = 10, nCentroids = 16, nProbe = 6)
      .select("vec_id").as[Long].collect().toSeq
    val approx = run()
    assert(approx == run()) // deterministic
    val recall = exact.intersect(approx.toSet).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall")
  }

  test("ivfAssign puts a centroid vector in its own cell") {
    val centroids = emb.orderBy($"vec_id").limit(4)
      .select("embedding").collect().toIndexedSeq.map(_.getSeq[Float](0))
    val assigned = Similarity.ivfAssign(emb, "vec_id", "embedding", centroids)
    val cellOfC2 = assigned.filter($"vec_id" === 2).select("cell").head().getInt(0)
    assert(cellOfC2 == 2) // vec 2 IS centroid 2 → self-similarity 1 wins
  }

  test("LSH is deterministic across runs (seeded hyperplanes)") {
    def run() = Similarity.lshTopK(
      emb.filter($"vec_id" =!= 0), "vec_id", "embedding", q,
      k = 5, nBits = 8, probes = 1).select("vec_id").as[Long].collect().toSeq
    assert(run() == run())
  }
}
