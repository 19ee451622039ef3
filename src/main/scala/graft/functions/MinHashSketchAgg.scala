package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass MinHash sketch: a custom Catalyst
  * `TypedImperativeAggregate` whose buffer is the signature itself —
  * `numHashes` running minima of universal hashes
  * `(a_i * h + b_i) mod p` over the group's input hashes.
  *
  * Why a custom aggregate instead of `numHashes` separate `min()`
  * columns (the declarative form in
  * [[graft.dedup.Dedup.minHashLshPairs]]'s original shape): one
  * buffer update touches a primitive long array in place, instead of
  * routing every row through `numHashes` independent aggregate
  * buffers and their codegen'd null/compare scaffolding. Map-side
  * partial aggregation still applies — `merge` is the elementwise
  * min — so shuffle volume stays one `numHashes`-long array per
  * (partition, group).
  *
  * Hash parametrization is IDENTICAL to the declarative form (a_i =
  * 2i+1, b_i = 1013904223·(i+1) mod p, p = 4294967311 > 2^32), so the
  * two paths produce bit-equal signatures — property-tested in
  * DedupSketchSpec and relied on by the q19 oracle argument.
  */
case class MinHashSketchAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression]
  with ImplicitCastInputTypes {

  // SQL-registered: a non-bigint hash column must fail analysis (or
  // coerce), not die per-row on asInstanceOf[Long] mid-job.
  override def inputTypes: Seq[DataType] = Seq(LongType)

  private val p = MinHashSketchAgg.Prime

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val a = 2L * i + 1
        val b = 1013904223L * (i + 1) % p
        val m = (a * h + b) % p // h >= 0 (caller pmods), a,b > 0: no negative mod
        if (m < buf(i)) buf(i) = m
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (other(i) < buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(numHashes * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashSketchAgg =
    copy(child = newChild)
}

object MinHashSketchAgg {
  /** Prime > 2^32 shared with the declarative minhash form. */
  val Prime: Long = 4294967311L

  /** `minhashSketch(hashCol, k)` — aggregate Column producing the
    * k-long signature array. `hashCol` must be a non-negative long
    * (pmod'ed into [0, 2^32)). */
  def minhashSketch(hash: Column, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashSketchAgg(ColumnBridge.expression(hash), numHashes)
        .toAggregateExpression())
}
