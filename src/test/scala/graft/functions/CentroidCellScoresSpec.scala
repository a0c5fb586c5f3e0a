package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the compiled centroid cell-scoring expression to the HOF
  * formulation it replaced (`transform(typedLit(centroids), (c, i) ->
  * struct(cosine_sim(emb, c), i))`): bit-identical sims, identical
  * struct shape/order, identical null handling — and NO
  * CodegenFallback in the consuming plan, which is the point (the HOF
  * ran interpreted over the full corpus on the index-build path).
  */
class CentroidCellScoresSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private def vec(dim: Int): Seq[Float] =
    Seq.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)

  private val centroids: Seq[Seq[Float]] =
    Seq.fill(16)(vec(8)) :+ Seq.fill(8)(0.0f) // incl. one zero centroid

  private def hof(embCol: org.apache.spark.sql.Column) =
    transform(typedLit(centroids), (c, i) =>
      struct(GraftFunctions.cosine_sim(embCol, c).as("sim"), i.as("cid")))

  private val rows: Seq[Option[Seq[Float]]] =
    Seq.fill(50)(Some(vec(8))) ++ Seq(
      Some(Seq.fill(8)(0.0f)),        // zero embedding → sim 0.0 everywhere
      Some(vec(5)),                   // shorter than centroids (min-len truncation)
      Some(vec(12)),                  // longer than centroids
      None,                           // null embedding → (null, cid) structs
      Some(Seq(1e-30f, 1e20f, -1e20f, 1e-20f, 3.4e38f, -1f, 0f, 2f)))

  test("bit-identical to the transform/cosine_sim formulation, including " +
      "null/zero/ragged embeddings") {
    val df = rows.toDF("emb")
      .select(col("emb").cast("array<float>").as("emb"))
      .select(
        hof(col("emb")).as("expected"),
        CentroidCellScores.centroid_cell_scores(col("emb"), centroids)
          .as("actual"))
    val got = df.collect()
    got.foreach { r =>
      val e = r.getSeq[org.apache.spark.sql.Row](0)
      val a = r.getSeq[org.apache.spark.sql.Row](1)
      assert(e.size == a.size)
      e.zip(a).foreach { case (x, y) =>
        assert(x.isNullAt(0) == y.isNullAt(0), s"null mismatch: $x vs $y")
        if (!x.isNullAt(0))
          // == on doubles: BIT identity, not approximate
          assert(x.getDouble(0) == y.getDouble(0), s"sim mismatch: $x vs $y")
        assert(x.getInt(1) == y.getInt(1))
      }
    }
  }

  test("dataType matches the HOF form field-for-field") {
    val df = Seq(Some(vec(8))).toDF("emb")
      .select(col("emb").cast("array<float>").as("emb"))
    val hofType = df.select(hof(col("emb")).as("x")).schema("x").dataType
    val exprType = df.select(CentroidCellScores
      .centroid_cell_scores(col("emb"), centroids).as("x"))
      .schema("x").dataType
    // the HOF's array is element-nullable=false and struct fields are
    // (sim double nullable, cid int non-null) — downstream getField
    // and comparators depend on the exact shape
    assert(exprType.catalogString == hofType.catalogString,
      s"$exprType vs $hofType")
  }

  test("ivfAssign-shaped plan stays inside whole-stage codegen (no " +
      "CodegenFallback / ArrayTransform)") {
    // a non-local source (range) so ConvertToLocalRelation cannot fold
    // the projection away before the physical plan exists
    val df = spark.range(100)
      .select(array((1 to 8).map(j => cos(col("id") * j)): _*)
        .cast("array<float>").as("emb"))
      .withColumn("cell",
        array_max(CentroidCellScores.centroid_cell_scores(col("emb"), centroids))
          .getField("cid"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("transform(typedlit"),
      s"interpreted ArrayTransform still in plan:\n$plan")
    // the scoring Project must carry the `*(n)` whole-stage-codegen
    // marker (the HOF form printed an unstarred Project: ArrayTransform
    // is CodegenFallback and evicted the operator from codegen)
    val scoringLine = plan.linesIterator
      .find(_.contains("centroid_cell_scores")).get
    assert(scoringLine.trim.startsWith("*("),
      s"cell assignment fell out of codegen:\n$plan")
    // and the assignment itself agrees with the HOF form
    val both = Seq.fill(20)(Some(vec(8))).toDF("emb")
      .select(col("emb").cast("array<float>").as("emb"))
      .select(
        array_max(hof(col("emb"))).getField("cid").as("expected"),
        array_max(CentroidCellScores.centroid_cell_scores(col("emb"), centroids))
          .getField("cid").as("actual"))
      .collect()
    both.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }
}
