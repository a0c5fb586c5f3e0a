package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dev probe (VERDICT r12 item 4 evidence): the IVF cell-assignment
  * kernel at INDEX-BUILD volume — nCentroids cosines over every corpus
  * row. r12's `transform(typedLit(centroids), ...)` HOF evaluated
  * cosine_sim through interpreted nullSafeEval (ArrayTransform is
  * CodegenFallback); r13's CentroidCellScores runs the same loop
  * compiled. Both formulations are timed here side by side on a
  * synthetic 100k x 64-dim corpus with 64 centroids (the bench index's
  * shape), and their assignments are asserted identical. Timings print
  * for the optimization notes; the assertion is equality, not speed,
  * so host load can never flake the suite.
  */
class IvfAssignPerfProbe extends SparkSpec {

  test("compiled cell assignment matches the HOF form; timings printed") {
    val dim = 64
    val nCentroids = 64
    val rnd = new scala.util.Random(11)
    val centroids: Seq[Seq[Float]] =
      Seq.fill(nCentroids)(Seq.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
    val emb = spark.range(100000)
      .select(col("id"),
        array((1 to dim).map(j => cos(col("id") * j)): _*)
          .cast("array<float>").as("emb"))
    val hof = emb.withColumn("cell",
      array_max(transform(typedLit(centroids), (c, i) =>
        struct(graft.functions.GraftFunctions.cosine_sim(col("emb"), c)
          .as("sim"), i.as("cid")))).getField("cid"))
    val compiled = emb.withColumn("cell",
      array_max(graft.functions.CentroidCellScores
        .centroid_cell_scores(col("emb"), centroids)).getField("cid"))

    def time(label: String, df: org.apache.spark.sql.DataFrame): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        // noop sink (guide §1.4): computes every column of every row,
        // discards the result — no aggregate to prune into or overflow
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] ivfAssign $label: min ${runs.min}%.2f s (runs ${runs.map(r => f"$r%.2f").mkString(", ")})")
      runs.min
    }
    val tHof = time("HOF/interpreted", hof)
    val tNew = time("compiled       ", compiled)
    println(f"[probe] ivfAssign speedup ${tHof / tNew}%.2fx at 100k x $dim, $nCentroids centroids")

    val diff = hof.select("id", "cell")
      .exceptAll(compiled.select("id", "cell")).count()
    assert(diff == 0, s"cell assignment diverges on $diff rows")
  }
}
