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
  * algorithm; both sides MUST be sorted distinct. Internal call sites
  * satisfy that by construction (ShingleHashes output), but the
  * function is also exposed to ad-hoc SQL where e.g. collect_list()
  * output passes the type check while violating the invariant — so a
  * runtime guard validates monotonicity over BOTH full arrays and
  * throws on violation (one extra compare per element; a silently
  * undercounted similarity is the alternative).
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
    // runtime sortedness guard: the function is exposed to ad-hoc SQL
    // (register/GraftNativeFunctions) where the type check alone can't
    // see ordering — e.g. collect_list output type-checks but is
    // unsorted and would silently undercount the intersection. One
    // compare per consumed element catches that instead.
    var px = 0L; var py = 0L
    while (i < nx && j < ny) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (i > 0 && xi <= px) JaccardSim.failUnsorted(xi, px, i)
      if (j > 0 && yj <= py) JaccardSim.failUnsorted(yj, py, j)
      if (xi == yj) { inter += 1; px = xi; py = yj; i += 1; j += 1 }
      else if (xi < yj) { px = xi; i += 1 }
      else { py = yj; j += 1 }
    }
    // validate the unconsumed tails too: an inversion there proves the
    // input unsorted, which invalidates the prefix the value was
    // computed from (e.g. [3,1,2] vs [1,2,3] exits after matching 3
    // without ever reading the descending tail)
    var k = math.max(i, 1)
    while (k < nx) {
      if (x.getLong(k) <= x.getLong(k - 1))
        JaccardSim.failUnsorted(x.getLong(k), x.getLong(k - 1), k)
      k += 1
    }
    k = math.max(j, 1)
    while (k < ny) {
      if (y.getLong(k) <= y.getLong(k - 1))
        JaccardSim.failUnsorted(y.getLong(k), y.getLong(k - 1), k)
      k += 1
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
      val px = ctx.freshName("px"); val py = ctx.freshName("py")
      // hygiene: ALL locals via freshName — a raw `k` would shadow (or
      // collide with) enclosing whole-stage-codegen locals and Janino
      // would reject the fused method, silently dropping to interpreted
      val kx = ctx.freshName("kx"); val ky = ctx.freshName("ky")
      s"""
         |int $nx = $x.numElements(); int $ny = $y.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |long $px = 0L; long $py = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $xi = $x.getLong($i); long $yj = $y.getLong($j);
         |  if ($i > 0 && $xi <= $px) graft.functions.JaccardSim.failUnsorted($xi, $px, $i);
         |  if ($j > 0 && $yj <= $py) graft.functions.JaccardSim.failUnsorted($yj, $py, $j);
         |  if ($xi == $yj) { $inter++; $px = $xi; $py = $yj; $i++; $j++; }
         |  else if ($xi < $yj) { $px = $xi; $i++; } else { $py = $yj; $j++; }
         |}
         |for (int $kx = Math.max($i, 1); $kx < $nx; $kx++) {
         |  if ($x.getLong($kx) <= $x.getLong($kx - 1))
         |    graft.functions.JaccardSim.failUnsorted($x.getLong($kx), $x.getLong($kx - 1), $kx);
         |}
         |for (int $ky = Math.max($j, 1); $ky < $ny; $ky++) {
         |  if ($y.getLong($ky) <= $y.getLong($ky - 1))
         |    graft.functions.JaccardSim.failUnsorted($y.getLong($ky), $y.getLong($ky - 1), $ky);
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
  /** Runtime sortedness violation — shared by interpreted eval and the
    * generated code. A merge-pass Jaccard on unsorted input undercounts
    * silently; a visible error here is the whole point of the guard.
    */
  def failUnsorted(cur: Long, prev: Long, pos: Int): Unit =
    throw new IllegalArgumentException(
      s"jaccard_sim requires sorted-distinct array<bigint> inputs " +
        s"(ascending, no duplicates): saw $cur after $prev at position $pos. " +
        s"Wrap the argument in array_sort(array_distinct(...)) or use " +
        s"shingle_hashes(), whose output is sorted distinct by construction.")

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
