package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native codegen cosine similarity over two float-array columns.
  *
  * The higher-order-function formulation
  * (aggregate(zip_with(...)) / sqrt(...)) allocates three intermediate
  * arrays per row and evaluates lambdas interpretively; this
  * expression compiles to a single fused Java loop inside whole-stage
  * codegen — the right shape for scoring billions of embeddings.
  * Interpreted eval is kept in sync for non-codegen paths.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<float>, array<float>), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $x.getFloat($i);
         |  double $yi = (double) $y.getFloat($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0)
         |  ? 0.0 : $dot / (Math.sqrt($nx) * Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native codegen dot product over two float-array columns — the
  * norm-hoisted companion of [[CosineSimilarity]]. Batch scoring
  * (probes × corpus pairs) recomputed BOTH vectors' norms inside every
  * pair with the fused cosine kernel even though each norm depends on
  * one row only; hoisting `sqrt(dot_product(x, x))` to a once-per-row
  * column and dividing the pair's dot by the norm product does a third
  * of the flops per pair. Bit-compatibility with the fused kernel: the
  * accumulation sequence of each norm (`nx += xi*xi` in index order,
  * double arithmetic) is identical whether or not it is interleaved
  * with the dot loop, PROVIDED both vectors have the same length — the
  * fused kernel truncates norms to min(len). Callers hoisting norms
  * must therefore be uniform-dim corpora (every ANN path here already
  * requires that; fixtures are all 64-dim).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects (array<float>, array<float>), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  /** Column-API entry point. */
  def cosine_sim(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimilarity(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def dot_product(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Euclidean norm of a float-array column via the fused dot kernel —
    * bit-identical to the `nx`/`ny` accumulators inside
    * [[CosineSimilarity]] for same-length pairs (see [[DotProduct]]). */
  def vec_norm(a: Column): Column = {
    val e = GraftColumnBridge.expression(a)
    org.apache.spark.sql.functions.sqrt(
      GraftColumnBridge.column(DotProduct(e, e)))
  }

  /** Norm-hoisted cosine: `dot / (normA * normB)` with the zero-norm
    * guard of the fused kernel. `normA`/`normB` must be [[vec_norm]] of
    * the same columns (callers hoist them to once-per-row/side). */
  def cosine_from_norms(a: Column, b: Column,
                        normA: Column, normB: Column): Column =
    org.apache.spark.sql.functions.when(
      normA === 0.0 || normB === 0.0, org.apache.spark.sql.functions.lit(0.0))
      .otherwise(dot_product(a, b) / (normA * normB))

  /** SQL registration: SELECT cosine_sim(a, b) — session-scoped.
    * Arity-guarded like the GraftNativeFunctions path (this temp
    * registration SHADOWS it session-wide, so it must not be weaker).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"cosine_sim expects 2 arguments, got ${exprs.length}")
        CosineSimilarity(exprs(0), exprs(1))
      }, "scala_udf")
}
