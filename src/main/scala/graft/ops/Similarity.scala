package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.util.Random

/** Similarity search over embedding columns (Array[Float]).
  *
  * Brute-force cosine is the exact baseline (one scan + TakeOrdered —
  * fine when the query side is a handful of vectors). The scale path
  * is random-hyperplane LSH: a deterministic seeded set of hyperplanes
  * maps each vector to a sign-bit bucket key; searching probes the
  * query's bucket (and optionally near buckets), turning top-k into a
  * bucketed scan of a small fraction of the corpus.
  */
object Similarity {

  /** Cosine similarity column between an embedding column and a fixed
    * query vector (folded into the plan as a literal array — no UDF,
    * stays inside whole-stage codegen via higher-order functions).
    */
  def cosineToQuery(embCol: Column, q: Seq[Float]): Column = {
    val qNorm = math.sqrt(q.map(v => v.toDouble * v.toDouble).sum)
    val qArr = array(q.map(lit(_)): _*)
    val dot = aggregate(
      zip_with(embCol, qArr, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val nrm = sqrt(aggregate(
      transform(embCol, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    dot / (nrm * lit(qNorm))
  }

  /** Exact top-k by cosine: score scan → TakeOrderedAndProject. */
  def bruteForceTopK(emb: DataFrame, idCol: String, embCol: String,
                     q: Seq[Float], k: Int): DataFrame =
    emb.withColumn("sim", cosineToQuery(col(embCol), q))
      .select(col(idCol), col("sim"))
      .orderBy(desc("sim"), asc(idCol))
      .limit(k)

  /** Deterministic pseudo-random hyperplanes (seeded). */
  def hyperplanes(dim: Int, nBits: Int, seed: Long = 42L): Seq[Seq[Float]] = {
    val rnd = new Random(seed)
    Seq.fill(nBits)(Seq.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
  }

  /** Sign-bit LSH bucket key for an embedding column. */
  def lshKey(embCol: Column, planes: Seq[Seq[Float]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val pArr = array(p.map(lit(_)): _*)
      val dot = aggregate(
        zip_with(embCol, pArr, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** IVF (inverted-file) cell assignment: each vector goes to its
    * most-cosine-similar coarse centroid. Centroids are index
    * metadata (driver-side, like a query vector); here they are the
    * first `nCentroids` corpus vectors — a production build would
    * k-means them, the plumbing is identical. At scale the assigned
    * table is written partitioned by `cell`, so probing is partition
    * pruning.
    */
  def ivfAssign(emb: DataFrame, idCol: String, embCol: String,
                centroids: Seq[Seq[Float]]): DataFrame = {
    val cellStructs = centroids.zipWithIndex.map { case (c, i) =>
      struct(graft.functions.GraftFunctions
        .cosine_sim(col(embCol), array(c.map(lit(_)): _*).cast("array<float>"))
        .as("sim"), lit(i).as("cid"))
    }
    // array_max on (sim, cid) structs picks the best cell per row
    emb.withColumn("cell", array_max(array(cellStructs: _*)).getField("cid"))
  }

  /** Approximate top-k via IVF: score the query against the
    * centroids, scan only the `nProbe` best cells brute-force.
    */
  def ivfTopK(emb: DataFrame, idCol: String, embCol: String,
              q: Seq[Float], k: Int, nCentroids: Int = 16,
              nProbe: Int = 4): DataFrame = {
    val centroids: Seq[Seq[Float]] = emb
      .orderBy(col(idCol)).limit(nCentroids)
      .select(embCol).collect().toIndexedSeq
      .map(_.getSeq[Float](0))
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    val probeCells = centroids.zipWithIndex
      .map { case (c, i) => (cos(c, q), i) }
      .sortBy(-_._1).take(nProbe).map(_._2).toSet
    val assigned = ivfAssign(emb, idCol, embCol, centroids)
    bruteForceTopK(
      assigned.filter(col("cell").isin(probeCells.toSeq: _*)),
      idCol, embCol, q, k)
  }

  /** Approximate top-k: probe the buckets whose keys are within
    * Hamming distance `probes` of the query's key (multi-probe LSH).
    * At corpus scale the bucketed table would be written partitioned
    * by key so a probe is a partition-pruned scan.
    */
  def lshTopK(emb: DataFrame, idCol: String, embCol: String,
              q: Seq[Float], k: Int, nBits: Int = 12,
              probes: Int = 1, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(q.size, nBits, seed)
    val qKey: Long = planes.zipWithIndex.map { case (p, i) =>
      val dot = p.zip(q).map { case (a, b) => a.toDouble * b.toDouble }.sum
      if (dot >= 0) 1L << i else 0L
    }.sum
    val keyed = emb.withColumn("lsh_key", lshKey(col(embCol), planes))
    val candidates = keyed.filter(
      expr(s"bit_count(lsh_key ^ ${qKey}L)") <= probes)
    bruteForceTopK(candidates, idCol, embCol, q, k)
  }
}
