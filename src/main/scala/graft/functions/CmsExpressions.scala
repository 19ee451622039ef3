package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** `cms_at_least(long) -> boolean`: true iff the Count–Min sketch
  * baked into the expression estimates the key's frequency at or
  * above `threshold`.
  *
  * This is the heavy-hitter prefilter kernel
  * ([[graft.ops.CorpusStats.heavyHitters]]): a Count–Min sketch of
  * the full token stream (built distributed by Spark's own
  * `count_min_sketch` partial aggregate — the map-side partials
  * merge, only `depth × width` counters ever cross the wire) is
  * serialized into this expression and shipped once per executor in
  * the task binary. Each token row then answers "could this token's
  * corpus count reach the threshold?" in a narrow, codegen'd pass,
  * so the exact-confirm `groupBy` that follows shuffles only
  * candidate tokens — a keyspace bounded by the number of true heavy
  * hitters plus the sketch's (tunable) false-positive fringe, not by
  * |vocabulary|. CMS estimates only ever OVER-count, so the filter
  * has no false negatives: prefilter + exact confirm ≡ exact, the
  * same contract as [[BloomAnyContain]]'s decontamination pass.
  *
  * Null semantics: null key -> null (standard unary propagation).
  */
case class CmsAtLeast(child: Expression, cmsBytes: Array[Byte], threshold: Long)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "cms_at_least"

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(cmsBytes))

  /** Codegen/eval kernel. `estimateCount` on a boxed Long routes to
    * the sketch's long-hash path — the same path Spark's
    * `count_min_sketch` aggregate used to build it, so probe and
    * build hash identically. */
  def atLeast(key: Long): Boolean =
    cms.estimateCount(java.lang.Long.valueOf(key)) >= threshold

  override protected def nullSafeEval(input: Any): Any =
    atLeast(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsAtLeast", this, classOf[CmsAtLeast].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.atLeast($c);")
  }

  // Byte-array payloads compare by reference under case-class
  // equality; compare by value so byte-equal sketches canonicalize
  // (see BloomAnyContain).
  override def equals(other: Any): Boolean = other match {
    case CmsAtLeast(c, b, t) =>
      c == child && t == threshold && java.util.Arrays.equals(b, cmsBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + java.util.Arrays.hashCode(cmsBytes)) +
      java.lang.Long.hashCode(threshold)

  override protected def withNewChildInternal(newChild: Expression): CmsAtLeast =
    copy(child = newChild)
}

object CmsAtLeast {
  def apply(key: Column, cms: CountMinSketch, threshold: Long): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    cms.writeTo(bos)
    ColumnBridge.column(CmsAtLeast(ColumnBridge.expression(key), bos.toByteArray, threshold))
  }

  def fromBytes(key: Column, cmsBytes: Array[Byte], threshold: Long): Column =
    ColumnBridge.column(CmsAtLeast(ColumnBridge.expression(key), cmsBytes, threshold))
}
