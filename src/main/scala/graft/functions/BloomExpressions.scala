package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_any_contain(array<long>) -> boolean`: true iff ANY element
  * of the hash array might be in the Bloom filter baked into the
  * expression at plan-construction time.
  *
  * This is the broadcast-decontamination kernel
  * ([[graft.dedup.Dedup.crossNgramOverlapBloom]]): the held-out
  * benchmark's n-gram hash set is folded into a Bloom filter
  * (`DataFrame.stat.bloomFilter`, built distributed), serialized into
  * this expression, and shipped once per stage inside the task
  * binary — Spark broadcasts task binaries, so a multi-MB filter
  * costs one transfer per executor, exactly like an explicit
  * broadcast variable. Each corpus document then answers "could any
  * of my grams be benchmark grams?" in a single narrow, codegen'd
  * pass with NO shuffle and NO per-gram row explosion; only the
  * (tiny) candidate fraction ever reaches the exact confirm join.
  * No false negatives by Bloom-filter construction, so
  * prefilter + exact confirm ≡ exact — false positives cost a
  * wasted confirm probe, never a wrong answer.
  *
  * Null semantics: null array -> null (standard unary null
  * propagation); null ELEMENTS are skipped — a null gram hash can
  * never be a benchmark gram. Empty array -> false.
  *
  * The filter rides along as `bloomBytes` (the sketch's canonical
  * `writeTo` wire format) rather than the live `BloomFilter` object so
  * the expression's serialized form is stable; deserialization happens
  * once per JVM via the transient lazy val below.
  */
case class BloomAnyContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_any_contain"

  @transient private lazy val bloom: BloomFilter = BloomFilter.readFrom(bloomBytes)

  /** Codegen/eval kernel: short-circuits on the first hit. */
  def anyContain(arr: ArrayData): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && bloom.mightContainLong(arr.getLong(i))) return true
      i += 1
    }
    false
  }

  override protected def nullSafeEval(input: Any): Any =
    anyContain(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomAnyContain", this, classOf[BloomAnyContain].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.anyContain($c);")
  }

  // Array[Byte] compares by reference under case-class equality, which
  // would make two plan nodes with byte-equal filters compare unequal
  // (breaking subexpression elimination / canonicalization, never
  // correctness). Compare the payload by value instead.
  override def equals(other: Any): Boolean = other match {
    case BloomAnyContain(c, b) => c == child && java.util.Arrays.equals(b, bloomBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloomBytes)

  override protected def withNewChildInternal(newChild: Expression): BloomAnyContain =
    copy(child = newChild)
}

object BloomAnyContain {
  def apply(hashes: Column, bloom: BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    ColumnBridge.column(BloomAnyContain(ColumnBridge.expression(hashes), bos.toByteArray))
  }
}
