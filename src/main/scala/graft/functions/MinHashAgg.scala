package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature aggregate: for each input shingle —
  * a string, or a pre-hashed 64-bit shingle from
  * [[ShingleHashes]] — k seeded 64-bit hashes are computed and the
  * buffer keeps the per-seed minimum. Output: array<bigint> of
  * length k.
  *
  * This replaces k separate `min(xxhash64(i, s))` aggregate columns —
  * one imperative buffer instead of k codegen'd aggregates, one hash
  * of the input per seed, and mergeable partials (the buffer is
  * an element-wise min semilattice), so partial aggregation works
  * exactly like sum/min at 100 TB. The long-input path re-mixes the
  * shingle hash with each seed via `XXH64.hashLong` — 8 bytes hashed
  * per seed instead of the whole shingle's bytes.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  private lazy val isLongInput: Boolean = child.dataType == LongType

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      if (isLongInput) {
        val x = v.asInstanceOf[Long]
        var i = 0
        while (i < numHashes) {
          val h64 = XXH64.hashLong(x, i.toLong)
          if (h64 < buf(i)) buf(i) = h64
          i += 1
        }
      } else {
        val s = v.asInstanceOf[UTF8String]
        val base = s.getBaseObject
        val off = s.getBaseOffset
        val len = s.numBytes()
        var i = 0
        while (i < numHashes) {
          val h64 = XXH64.hashUnsafeBytes(base, off, len, i.toLong)
          if (h64 < buf(i)) buf(i) = h64
          i += 1
        }
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** Column API: minhash(col, k) as an aggregate expression. */
  def minhash(c: Column, numHashes: Int): Column =
    GraftColumnBridge.column(
      MinHashAgg(GraftColumnBridge.expression(c), numHashes)
        .toAggregateExpression())
}
