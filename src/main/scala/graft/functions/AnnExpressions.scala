package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native ANN kernels: the hyperplane-LSH signature and the IVF
  * nearest-cell probe as single codegen-friendly expression nodes.
  *
  * Both replace higher-order-function compositions whose plan trees
  * grow with the model size: the HOF signature inlines a `bits × dim`
  * plane literal (a 384-node array for 6 × 64; ~12k at real 768-dim
  * embeddings) and evaluates its lambdas interpreted per row; the HOF
  * nearest-cell probe inlines an `nlist × dim` centroid literal and
  * allocates an intermediate array per centroid per row. Here the
  * matrix lives in the expression as one reference object — the plan
  * node count is O(1) in dim/bits/nlist, analysis and codegen stay
  * fast, and the per-row work is a fused primitive loop.
  *
  * Results are BIT-IDENTICAL to the HOF forms (same IEEE operation
  * order; property-tested in ExpressionParitySpec), so the DuckDB
  * oracles that transcribe the HOF arithmetic (q45) keep matching.
  */
object AnnKernels {

  /** Deterministic pseudo-random hyperplanes: component j of plane i
    * (table t) derives from md5("plane_t_i_j") mapped to [-1, 1). No
    * RNG — reproducible across runs, engines and cluster sizes.
    * (Reference point: xena-GDC-ETL has no ANN surface; this is part
    * of the LLM-pipeline extension layer.)
    */
  def planeComponent(table: Int, plane: Int, j: Int): Double = {
    val h = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s"plane_${table}_${plane}_$j")
        .substring(0, 15), 16)
    (h.toDouble / (1L << 59).toDouble) - 1.0
  }

  /** Flattened (bits × dim) plane matrix for one table, cached — the
    * md5 derivation runs once per (table, dim, bits), not per plan.
    */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()

  def planes(table: Int, dim: Int, bits: Int): Array[Double] =
    planeCache.computeIfAbsent((table, dim, bits), { key =>
      val (t, d, b) = key
      val arr = new Array[Double](b * d)
      var i = 0
      while (i < b) {
        var j = 0
        while (j < d) { arr(i * d + j) = planeComponent(t, i, j); j += 1 }
        i += 1
      }
      arr
    })
}

/** `sign bit i = (v · plane_i >= 0)` packed into a long — the
  * random-hyperplane LSH signature as ONE plan node. Input must be
  * `array<double>` (callers cast explicitly).
  *
  * Matches the HOF form exactly, INCLUDING ragged inputs: a vector
  * whose length differs from `dim` signs to 0L — in the HOF,
  * `zip_with` pads the shorter side with nulls, nulling every dot, so
  * every bit falls to the `otherwise(0)` branch (a partial-sum sign
  * would diverge). For equal lengths the per-plane dot is a
  * sequential left-to-right IEEE sum; a NaN dot contributes a 0 bit
  * (Java `>=` on NaN is false; the HOF's `when(d >= 0, …)` yields
  * null → otherwise(0)).
  */
case class HyperplaneSignature(child: Expression, table: Int, dim: Int, bits: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))

  require(bits > 0 && bits < 63, s"bits must be in [1, 62], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  @transient private lazy val planes: Array[Double] = AnnKernels.planes(table, dim, bits)

  def compute(a: ArrayData): Long = {
    if (a.numElements() != dim) return 0L // ragged: HOF nulls every dot
    val p = planes
    var sig = 0L
    var i = 0
    while (i < bits) {
      var dot = 0.0
      val base = i * dim
      var j = 0
      while (j < dim) { dot += a.getDouble(j) * p(base + j); j += 1 }
      if (dot >= 0) sig |= 1L << i
      i += 1
    }
    sig
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneSig", this, classOf[HyperplaneSignature].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)
}

object HyperplaneSignature {
  def apply(vec: Column, dim: Int, bits: Int, table: Int): Column =
    ColumnBridge.column(
      HyperplaneSignature(ColumnBridge.expression(vec), table, dim, bits))
}

/** The `limit` nearest IVF cells of a quantized vector (`array<long>`)
  * against a fixed `nlist × dim` centroid matrix, ordered by
  * (squared-L2 distance, cell) ascending — ONE plan node per probe
  * instead of an `nlist × dim` literal + per-centroid zip/aggregate
  * chain + struct sort.
  *
  * Distances are the HOF `intDist`'s exact integer arithmetic
  * (Java long ops == Catalyst long ops, wrap-around and all), and the
  * (dist, cell) tie-break matches `array_sort` on a (dist, cell)
  * struct, so cell assignments — and therefore the q45 oracle's pruned
  * candidate set — are unchanged.
  */
case class IvfNearestCells(child: Expression, centroids: Array[Array[Long]], limit: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))

  require(limit >= 1 && limit <= centroids.length,
    s"limit must be in [1, nlist=${centroids.length}], got $limit")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_nearest_cells"

  def compute(qv: ArrayData): ArrayData = {
    val nlist = centroids.length
    val dists = new Array[Long](nlist)
    var c = 0
    while (c < nlist) {
      val cent = centroids(c)
      val n = math.min(cent.length, qv.numElements())
      var s = 0L
      var j = 0
      while (j < n) {
        val d = qv.getLong(j) - cent(j)
        s += d * d
        j += 1
      }
      dists(c) = s
      c += 1
    }
    // Selection sort of the first `limit` cells by (dist, cell) asc:
    // nlist is small by contract (coarse quantizer), so O(limit·nlist)
    // beats sorting machinery.
    val order = Array.tabulate(nlist)(identity)
    val out = new Array[Int](limit)
    var k = 0
    while (k < limit) {
      var best = k
      var i = k + 1
      while (i < nlist) {
        val a = order(i); val b = order(best)
        if (dists(a) < dists(b) || (dists(a) == dists(b) && a < b)) best = i
        i += 1
      }
      val tmp = order(k); order(k) = order(best); order(best) = tmp
      out(k) = order(k)
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfNearestCells", this, classOf[IvfNearestCells].getName)
    defineCodeGen(ctx, ev, c => s"(${classOf[ArrayData].getName}) $ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfNearestCells =
    copy(child = newChild)
}

object IvfNearestCells {
  def apply(qv: Column, centroids: Seq[Seq[Long]], limit: Int): Column =
    ColumnBridge.column(IvfNearestCells(
      ColumnBridge.expression(qv), centroids.map(_.toArray).toArray, limit))
}
