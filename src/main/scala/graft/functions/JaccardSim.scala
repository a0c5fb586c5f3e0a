package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen Jaccard similarity over two SORTED-DISTINCT
  * `array<bigint>` columns (the invariant [[ShingleHashes]] output
  * carries by construction).
  *
  * The built-in composition `size(array_intersect(a, b)) /
  * size(array_union(a, b))` builds two hash tables and materializes
  * two intermediate arrays per pair; dedup verification evaluates this
  * for every LSH candidate pair, which at corpus scale is the hot
  * loop after banding. On sorted inputs one merge pass with zero
  * allocation computes the same value: |∩| counts equal heads,
  * |∪| = n₁ + n₂ − |∩|. Interpreted eval and codegen share the
  * algorithm; both sides MUST be sorted distinct or results are
  * undefined (enforced by construction at the call sites, asserted in
  * the spec against the built-in formulation).
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    // containsNull arrays are REJECTED, not mis-summed: the merge loop
    // would read a null slot as 0L and count phantom matches. A caller
    // with a nullable-element column must filter/construct nulls away
    // first — an analysis error here beats a silently wrong similarity.
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, false) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaccard_sim expects (array<bigint>, array<bigint>) with " +
        s"non-nullable elements (sorted distinct), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { inter += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    val union = nx + ny - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter"); val union = ctx.freshName("union")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      s"""
         |int $nx = $x.numElements(); int $ny = $y.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xi = $x.getLong($i); long $yj = $y.getLong($j);
         |  if ($xi == $yj) { $inter++; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; } else { $j++; }
         |}
         |int $union = $nx + $ny - $inter;
         |${ev.value} = ($union == 0) ? 0.0 : ((double) $inter) / $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaccardSim {
  /** Column-API entry point. */
  def jaccard_sim(a: Column, b: Column): Column =
    GraftColumnBridge.column(JaccardSim(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** SQL registration: SELECT jaccard_sim(a, b) — session-scoped.
    * Arity-guarded like the GraftNativeFunctions path (this temp
    * registration SHADOWS it session-wide, so it must not be weaker).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaccard_sim", exprs => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"jaccard_sim expects 2 arguments, got ${exprs.length}")
        JaccardSim(exprs(0), exprs(1))
      }, "scala_udf")
}
