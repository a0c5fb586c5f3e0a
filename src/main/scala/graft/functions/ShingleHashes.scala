package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character-shingle HASHES of a string, as one
  * `array<bigint>` — the compact shingle representation for MinHash
  * dedup at corpus scale.
  *
  * The SQL formulation (`array_distinct(transform(sequence(...),
  * i -> substring(t, i, k)))`) materializes one k-char string per
  * position per row — at 100 TB that is ~k× the corpus in transient
  * strings, then shuffles/caches STRING sets. Near-dup candidate
  * generation and Jaccard verification only ever compare shingles for
  * EQUALITY, so a 64-bit content hash carries the same information in
  * 8 bytes: this expression emits the distinct XXH64 of every k-char
  * window in one fused loop (zero substring allocation on the ASCII
  * fast path — windows are hashed straight off the backing bytes).
  * Collisions (~n²/2⁶⁴) are negligible against any realistic shingle
  * count. Interpreted eval and codegen share the same static helper.
  */
case class ShingleHashes(child: Expression, shingleLen: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) {
      if (shingleLen >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"shingleLen must be >= 1, got $shingleLen")
    } else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects a string, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(v: Any): Any =
    ShingleHashes.compute(v.asInstanceOf[UTF8String], shingleLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashes.compute($c, $shingleLen)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  private val Seed = 42L

  /** Shared by interpreted eval and generated code (static forwarder). */
  def compute(s: UTF8String, shingleLen: Int): ArrayData =
    new GenericArrayData(computeRaw(s, shingleLen))

  /** The sorted-distinct shingle hashes as a raw `long[]` — shared by
    * [[compute]] and the fused shingle→MinHash kernel
    * ([[ShingleMinHash]]), so the two can never diverge on windowing
    * or hashing. */
  def computeRaw(s: UTF8String, shingleLen: Int): Array[Long] = {
    val nChars = s.numChars()
    if (nChars < shingleLen) return Array.emptyLongArray
    val out = new Array[Long](nChars - shingleLen + 1)
    val nBytes = s.numBytes()
    if (nBytes == nChars) {
      // pure ASCII: char windows == byte windows — hash in place
      val base = s.getBaseObject
      val off = s.getBaseOffset
      var i = 0
      while (i < out.length) {
        out(i) = XXH64.hashUnsafeBytes(base, off + i, shingleLen, Seed)
        i += 1
      }
    } else {
      // multi-byte path: windows advance one CODE POINT at a time —
      // parity with Spark SQL substring semantics (numChars counts
      // code points; surrogate pairs count once and are never split),
      // per-window UTF-8 encode
      val str = s.toString
      var start = 0 // UTF-16 char index of the window start
      var end = str.offsetByCodePoints(0, shingleLen)
      var i = 0
      while (i < out.length) {
        val b = str.substring(start, end)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out(i) = XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, Seed)
        i += 1
        if (i < out.length) {
          start = str.offsetByCodePoints(start, 1)
          end = str.offsetByCodePoints(end, 1)
        }
      }
    }
    // distinct via sort + in-place unique (also a deterministic order)
    java.util.Arrays.sort(out)
    var w = 0
    var i = 1
    while (i < out.length) {
      if (out(i) != out(w)) { w += 1; out(w) = out(i) }
      i += 1
    }
    if (w + 1 == out.length) out else java.util.Arrays.copyOf(out, w + 1)
  }

  /** Column-API entry point. */
  def shingle_hashes(c: Column, shingleLen: Int): Column =
    GraftColumnBridge.column(
      ShingleHashes(GraftColumnBridge.expression(c), shingleLen))
}
