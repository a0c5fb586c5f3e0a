package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Sign-LSH band keys of an embedding, as one `array<bigint>` —
  * element `b` is the `r = nBits/bands`-bit key of band `b` (bit `j`
  * = sign of the dot product with hyperplane `b·r + j`).
  *
  * Why an Expression and not SQL: the HOF formulation needs one
  * `aggregate(zip_with(...))` lambda PER hyperplane. Band keys only
  * defeat bucket saturation when they carry ≥16 bits each (a 4-bit
  * key has 16 possible values — at corpus scale every bucket
  * overflows any cap and capped candidate generation silently drops
  * everything), and 16-bit keys across 32 bands need 512 planes —
  * ~500 lambdas blows the codegen budget into interpreted fallback.
  * This expression computes all nBits dot products in one fused loop
  * per row; interpreted eval and codegen share the static helper,
  * with the plane matrix attached as a codegen reference object.
  */
case class SignBands(child: Expression, planes: Array[Array[Double]], bands: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) =>
      if (bands < 1) TypeCheckResult.TypeCheckFailure(
        s"bands must be >= 1, got $bands")
      else if (planes.isEmpty || planes.length % bands != 0)
        TypeCheckResult.TypeCheckFailure(
          s"bands ($bands) must divide the plane count (${planes.length})")
      else if (planes.length / bands > 64)
        // a band key is ONE long: more than 64 bits per band would
        // silently alias through the 6-bit shift mask (1L << 65 ==
        // 1L << 1), merging buckets and losing recall with no error
        TypeCheckResult.TypeCheckFailure(
          s"bits per band (${planes.length / bands}) exceeds 64 — " +
            "raise bands or lower nBits")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_bands expects array<float>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_bands"

  override def nullSafeEval(v: Any): Any =
    SignBands.compute(v.asInstanceOf[ArrayData], planes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SignBands.compute($c, $planesRef, $bands)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignBands {

  /** Shared by interpreted eval and generated code (static forwarder). */
  def compute(emb: ArrayData, planes: Array[Array[Double]], bands: Int): ArrayData = {
    val n = emb.numElements()
    val nBits = planes.length
    val r = nBits / bands
    val out = new Array[Long](bands)
    var bi = 0
    while (bi < nBits) {
      val p = planes(bi)
      val m = math.min(n, p.length)
      var dot = 0.0
      var i = 0
      while (i < m) { dot += emb.getFloat(i) * p(i); i += 1 }
      if (dot >= 0) out(bi / r) |= 1L << (bi % r)
      bi += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. `planes` must have `bands · r` rows. */
  def sign_bands(c: Column, planes: Array[Array[Double]], bands: Int): Column =
    GraftColumnBridge.column(
      SignBands(GraftColumnBridge.expression(c), planes, bands))
}
