package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-row (sim, cid) struct array over a fixed centroid set — the
  * COMPILED form of the IVF cell-scoring expression
  * (`transform(typedLit(centroids), (c, i) -> struct(cosine_sim(emb, c), i))`).
  *
  * Why an Expression and not the HOF: ArrayTransform is
  * CodegenFallback, so the lambda body evaluated through cosine_sim's
  * interpreted `nullSafeEval` with per-element boxing, and the
  * enclosing projection fell out of whole-stage codegen. Harmless at
  * PROBE volume (nCentroids evals per probe row), but [[graft.ops
  * .Similarity.ivfAssign]] shares the expression and runs it over the
  * FULL corpus at index-build/append time — ~nCentroids interpreted
  * evals per corpus row on the scale-critical build path. This
  * expression computes all centroid cosines in one fused compiled
  * loop per row (interpreted eval and codegen share the static
  * helper, planes attached as a codegen reference object — the
  * [[SignBands]] pattern) and keeps the operator inside
  * WholeStageCodegen.
  *
  * Exact-equivalence contract with the HOF form (pinned by
  * CentroidCellScoresSpec):
  *  - per-centroid sim is the fused [[CosineSimilarity]] kernel
  *    verbatim: min-length truncation, index-order double
  *    accumulation, 0.0 on either zero norm;
  *  - a NULL embedding yields an array of (null, cid) structs — NOT a
  *    null array — because the HOF transformed the non-null centroid
  *    literal and cosine_sim(null, c) nulled only the sim field;
  *  - element order is centroid index order and the struct field
  *    names/types ((sim double, cid int)) are identical, so
  *    array_max / array_sort comparisons are bit-identical.
  *
  * `centroids` is a Seq (structural equality), so two plans scoring
  * the same centroid set canonicalize identically — cache and
  * exchange reuse behave exactly as with the literal form.
  */
case class CentroidCellScores(child: Expression, centroids: Seq[Seq[Float]])
    extends UnaryExpression {

  @transient private lazy val centArr: Array[Array[Float]] =
    centroids.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) =>
      if (centroids.nonEmpty) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("centroid set must be non-empty")
    case other => TypeCheckResult.TypeCheckFailure(
      s"centroid_cell_scores expects array<float>, got ${other.sql}")
  }

  override def dataType: DataType = CentroidCellScores.arrayType
  // the ARRAY is never null (the HOF transformed a non-null literal);
  // a null embedding nulls the sim FIELDS instead
  override def nullable: Boolean = false
  override def prettyName: String = "centroid_cell_scores"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    CentroidCellScores.compute(
      if (v == null) null else v.asInstanceOf[ArrayData], centArr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val centRef = ctx.addReferenceObj("centroids", centArr, "float[][]")
    val resultCode =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.CentroidCellScores.compute(
            ${childGen.isNull} ? null :
              (org.apache.spark.sql.catalyst.util.ArrayData) ${childGen.value},
            $centRef);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CentroidCellScores {
  /** array<struct<sim: double, cid: int>> — field names/types must
    * match the HOF form exactly (downstream getField("cid") and the
    * struct comparator depend on them). */
  val structType: StructType = StructType(Seq(
    StructField("sim", DoubleType, nullable = true),
    StructField("cid", IntegerType, nullable = false)))
  val arrayType: ArrayType = ArrayType(structType, containsNull = false)

  /** Shared by interpreted eval and generated code (static forwarder).
    * `emb == null` → array of (null, cid) structs (see class doc). */
  def compute(emb: ArrayData, cents: Array[Array[Float]]): ArrayData = {
    val out = new Array[Any](cents.length)
    var c = 0
    while (c < cents.length) {
      var sim: java.lang.Double = null
      if (emb != null) {
        // the fused CosineSimilarity kernel, verbatim: identical
        // accumulation order so cell scores are bit-identical
        val cent = cents(c)
        val n = math.min(emb.numElements(), cent.length)
        var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
        while (i < n) {
          val xi = emb.getFloat(i).toDouble
          val yi = cent(i).toDouble
          dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
        }
        sim = if (nx == 0.0 || ny == 0.0) 0.0
              else dot / (math.sqrt(nx) * math.sqrt(ny))
      }
      out(c) = new GenericInternalRow(Array[Any](sim, c))
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def centroid_cell_scores(c: Column, centroids: Seq[Seq[Float]]): Column =
    GraftColumnBridge.column(
      CentroidCellScores(GraftColumnBridge.expression(c), centroids))
}
