package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels callable from generated code (plain object, no
  * companion class, so Java static forwarders exist for codegen).
  */
object HashKernels {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits of md5(s) as a non-negative long (< 2^60).
    *
    * Bit-identical to `conv(substring(md5(s), 1, 15), 16, 10)::long`
    * — the engine-portable 64-bit string hash every dedup oracle
    * transcribes — but computed straight from the digest bytes: no
    * 32-char hex string, no base-16 re-parse, one thread-local digest
    * instead of a per-row `MessageDigest.getInstance`.
    */
  def md5Prefix64(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var k = 0
    while (k < 7) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }
}

/** `md5_prefix64(string) -> long`: codegen'd 60-bit md5-derived hash.
  *
  * This is the hasher under every dedup/fingerprint operator (gram
  * hashes, MinHash input, winnowing, hash-bucket splits). The
  * composed-builtin form (`conv(substring(md5(c),1,15),16,10)`)
  * allocates a hex string and re-parses it per value — at 100 TB that
  * is billions of needless allocations on the hottest path. Result is
  * bit-equal to the composed form (property-tested in
  * ExpressionParitySpec), so DuckDB oracles written against
  * `substr(md5(x),1,15)` still match.
  */
case class Md5Prefix64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  // SQL-registered: wrong-typed arguments must fail analysis (or
  // coerce), never reinterpret memory at runtime.
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix64"

  override protected def nullSafeEval(input: Any): Any =
    HashKernels.md5Prefix64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.md5Prefix64($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix64 =
    copy(child = newChild)
}

object Md5Prefix64 {
  def apply(c: Column): Column =
    ColumnBridge.column(Md5Prefix64(ColumnBridge.expression(c)))
}
