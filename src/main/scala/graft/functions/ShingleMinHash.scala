package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** FUSED shingle → hot-subtract → MinHash signature of a string: one
  * kernel computes what the three-stage pipeline
  * `minhash_array(array_except(shingle_hashes(text, k), hot), n)` did,
  * without materializing the distinct-shingle array into the row.
  *
  * Why fuse (guide §1.2 per-task work / §2.3 narrower intermediates):
  * the MinHash dedup entry point used to cache (id, sset, sig) per
  * corpus — building and storing every document's full shingle-hash
  * ARRAY (~8 B × shingles per doc through the projection, the cache,
  * and the array_except/minhash evals) even though only the handful of
  * docs that reach candidate VERIFICATION ever need their set again.
  * With this kernel the cached projection narrows to (id, sig) — a
  * fixed numHashes longs per doc — and verification recomputes sets
  * for the semi-join-pruned candidate sliver only.
  *
  * Equivalence with the staged form (pinned by ShingleMinHashSpec):
  *  - windowing/hashing is [[ShingleHashes.computeRaw]] itself (the
  *    same static helper — they cannot diverge);
  *  - `array_except(sset, hot)` removes hot hashes from the distinct
  *    set; here each distinct hash is skipped on a sorted-array binary
  *    search against the same hot list — identical surviving set;
  *  - the per-seed min over a SET is order-independent, so folding the
  *    mins in sorted-distinct order equals [[MinHashArray.compute]]
  *    over the except'ed array;
  *  - an empty surviving set yields NULL, exactly as minhash_array
  *    over an empty array (all-hot docs drop out of banding).
  *
  * The hot list normally arrives as a one-row scalar-subquery result,
  * i.e. THE SAME ArrayData instance on every row of a partition — the
  * sorted copy is cached per thread by reference, so the per-row cost
  * is numShingles × (binary search + numHashes seeded mixes). If a
  * caller passes a per-row-varying hot array the cache misses and
  * re-sorts per row (correct, just slow) — not a supported pattern.
  */
case class ShingleMinHash(left: Expression, right: Expression,
                          shingleLen: Int, numHashes: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(LongType, false)) =>
        if (shingleLen < 1) TypeCheckResult.TypeCheckFailure(
          s"shingleLen must be >= 1, got $shingleLen")
        else if (numHashes < 1) TypeCheckResult.TypeCheckFailure(
          s"numHashes must be >= 1, got $numHashes")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "shingle_minhash expects (string, array<bigint> with non-nullable " +
          s"elements), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_minhash"

  override def nullSafeEval(t: Any, h: Any): Any =
    ShingleMinHash.compute(t.asInstanceOf[UTF8String],
      h.asInstanceOf[ArrayData], shingleLen, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, h) => s"""
      ${ev.value} = graft.functions.ShingleMinHash.compute($t, $h, $shingleLen, $numHashes);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ShingleMinHash {
  // per-thread (hot ArrayData ref → sorted copy): the hot list is a
  // scalar-subquery literal, one instance per plan, so the sort runs
  // once per task thread, not once per row
  private val hotCache = new ThreadLocal[(AnyRef, Array[Long])]()

  /** Matches the census LIMIT in [[graft.ops.Dedup.minHashPairs]]: a
    * hot list AT this size was probably truncated there, i.e. shingles
    * beyond the cap silently remain in signatures. The former
    * driver-side census logged this over-cap condition; the in-plan
    * census cannot, so the consuming kernel restores the signal (ADVICE
    * r12) — once per task thread, no plan or per-row cost. */
  private val CensusCap = 10000

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def sortedHot(hot: ArrayData): Array[Long] = {
    val cached = hotCache.get()
    if (cached != null && (cached._1 eq hot)) cached._2
    else {
      val arr = hot.toLongArray()
      if (arr.length >= CensusCap)
        log.warn(s"hot-shingle removal list has ${arr.length} entries — at " +
          "the census cap, so hotter shingles beyond it remain in " +
          "signatures (raise the cap or lower maxShingleDf)")
      java.util.Arrays.sort(arr)
      hotCache.set((hot, arr))
      arr
    }
  }

  /** Shared by interpreted eval and generated code (static forwarder).
    * Returns null when no non-hot shingle survives (see class doc). */
  def compute(s: UTF8String, hot: ArrayData, shingleLen: Int,
              numHashes: Int): ArrayData = {
    val distinct = ShingleHashes.computeRaw(s, shingleLen)
    val nHot = hot.numElements()
    val hotSorted = if (nHot == 0) null else sortedHot(hot)
    val buf = Array.fill(numHashes)(Long.MaxValue)
    var any = false
    var j = 0
    while (j < distinct.length) {
      val x = distinct(j)
      if (hotSorted == null ||
          java.util.Arrays.binarySearch(hotSorted, x) < 0) {
        any = true
        var i = 0
        while (i < numHashes) {
          val h = XXH64.hashLong(x, i.toLong)
          if (h < buf(i)) buf(i) = h
          i += 1
        }
      }
      j += 1
    }
    if (!any) null else new GenericArrayData(buf)
  }

  /** Column-API entry point; `hot` is the removal set (pass an empty
    * array<bigint> literal for no hot-shingle subtraction). */
  def shingle_minhash(text: Column, hot: Column, shingleLen: Int,
                      numHashes: Int): Column =
    GraftColumnBridge.column(ShingleMinHash(
      GraftColumnBridge.expression(text), GraftColumnBridge.expression(hot),
      shingleLen, numHashes))
}
