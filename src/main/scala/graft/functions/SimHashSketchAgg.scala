package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** One-pass SimHash: a `TypedImperativeAggregate` whose buffer is the
  * per-bit vote array (`bits` ints, +1 for a set bit, -1 for a clear
  * bit per input hash) and whose eval folds the votes straight into
  * the signature long (bit j set iff votes(j) > 0).
  *
  * Replaces the declarative 60-column `sum(CASE ...)` formulation:
  * identical signatures by construction (same vote rule, same
  * strictly-positive threshold — property-tested in DedupSketchSpec),
  * but one in-place int-array update per row instead of 60 independent
  * sum buffers, and the partial-aggregate shuffle row shrinks from 60
  * longs to one serialized int array.
  */
case class SimHashSketchAgg(
    child: Expression,
    bits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Int] = new Array[Int](bits)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < bits) {
        buf(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var j = 0
    while (j < bits) { buf(j) += other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (buf(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bits * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bits)(bb.getInt)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_sig"

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashSketchAgg =
    copy(child = newChild)
}

object SimHashSketchAgg {
  /** `simhashSig(hashCol, bits)` — aggregate Column producing the
    * SimHash signature long over the group's hashes. */
  def simhashSig(hash: Column, bits: Int): Column =
    ColumnBridge.column(
      SimHashSketchAgg(ColumnBridge.expression(hash), bits)
        .toAggregateExpression())
}
