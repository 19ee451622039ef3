package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{BandBuckets, DotProduct, HyperplaneSignature, Md5Prefix64, MinHashSketchAgg, RollingHashes, WinnowMinima, WordNgrams}

/** Catalyst extension point: registers graft's native expressions in
  * the SQL function registry, so pure-SQL users (spark.sql, JDBC,
  * notebooks) get the same codegen'd kernels the DataFrame API exposes
  * through [[graft.functions.VectorFunctions]].
  *
  * Install via config — no code changes in the consuming app:
  * {{{
  *   spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  * or programmatically: `SparkSession.builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotProductDescriptor)
    ext.injectFunction(GraftExtensions.minhashSketchDescriptor)
    ext.injectFunction(GraftExtensions.md5Prefix64Descriptor)
    ext.injectFunction(GraftExtensions.hyperplaneSigDescriptor)
    ext.injectFunction(GraftExtensions.wordNgramsDescriptor)
    ext.injectFunction(GraftExtensions.rollingHashesDescriptor)
    ext.injectFunction(GraftExtensions.winnowMinimaDescriptor)
    ext.injectFunction(GraftExtensions.bandBucketsDescriptor)
    ext.injectOptimizerRule(_ => CollapseJsonExtracts)
  }
}

object GraftExtensions {

  /** `dot_product(array<double>, array<double>) -> double` — the
    * codegen'd fused-loop kernel behind the similarity operators. */
  val dotProductDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getCanonicalName, null, "dot_product"),
    { args =>
      require(args.length == 2, s"dot_product expects 2 arguments, got ${args.length}")
      DotProduct(args.head, args(1))
    })

  /** `minhash_sketch(hash_long, k) -> array<long>` — the one-pass
    * MinHash signature aggregate (k must be a literal int). */
  val minhashSketchDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sketch"),
    new ExpressionInfo(classOf[MinHashSketchAgg].getCanonicalName, null, "minhash_sketch"),
    { args =>
      require(args.length == 2, s"minhash_sketch expects 2 arguments, got ${args.length}")
      val k = args(1) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"minhash_sketch: k must be an int literal, got $other")
      }
      MinHashSketchAgg(args.head, k).toAggregateExpression()
    })

  /** `md5_prefix64(string) -> long` — the engine's portable 60-bit
    * string hash (first 15 hex digits of md5). */
  val md5Prefix64Descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("md5_prefix64"),
    new ExpressionInfo(classOf[Md5Prefix64].getCanonicalName, null, "md5_prefix64"),
    { args =>
      require(args.length == 1, s"md5_prefix64 expects 1 argument, got ${args.length}")
      Md5Prefix64(args.head)
    })

  /** `hyperplane_sig(array<double>, dim, bits[, table]) -> long` — the
    * random-hyperplane LSH signature (dim/bits/table must be int
    * literals). */
  val hyperplaneSigDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hyperplane_sig"),
    new ExpressionInfo(classOf[HyperplaneSignature].getCanonicalName, null, "hyperplane_sig"),
    { args =>
      require(args.length == 3 || args.length == 4,
        s"hyperplane_sig expects 3 or 4 arguments, got ${args.length}")
      val table = if (args.length == 4) intLitArg(args(3), "hyperplane_sig", "table") else 0
      HyperplaneSignature(args.head, table,
        intLitArg(args(1), "hyperplane_sig", "dim"),
        intLitArg(args(2), "hyperplane_sig", "bits"))
    })

  private def intLitArg(e: Expression, fn: String, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an int literal, got $other")
  }

  /** `word_ngrams(array<string>, n) -> array<string>`. */
  val wordNgramsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("word_ngrams"),
    new ExpressionInfo(classOf[WordNgrams].getCanonicalName, null, "word_ngrams"),
    { args =>
      require(args.length == 2, s"word_ngrams expects 2 arguments, got ${args.length}")
      WordNgrams(args.head, intLitArg(args(1), "word_ngrams", "n"))
    })

  /** `rolling_hashes(string, k) -> array<long>`. */
  val rollingHashesDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("rolling_hashes"),
    new ExpressionInfo(classOf[RollingHashes].getCanonicalName, null, "rolling_hashes"),
    { args =>
      require(args.length == 2, s"rolling_hashes expects 2 arguments, got ${args.length}")
      RollingHashes(args.head, intLitArg(args(1), "rolling_hashes", "k"))
    })

  /** `band_buckets(array<long>, numHashes, bands) -> array<struct<band,bucket>>`. */
  val bandBucketsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("band_buckets"),
    new ExpressionInfo(classOf[BandBuckets].getCanonicalName, null, "band_buckets"),
    { args =>
      require(args.length == 3, s"band_buckets expects 3 arguments, got ${args.length}")
      BandBuckets(args.head,
        intLitArg(args(1), "band_buckets", "numHashes"),
        intLitArg(args(2), "band_buckets", "bands"))
    })

  /** `winnow_minima(array<long>, w) -> array<long>`. */
  val winnowMinimaDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("winnow_minima"),
    new ExpressionInfo(classOf[WinnowMinima].getCanonicalName, null, "winnow_minima"),
    { args =>
      require(args.length == 2, s"winnow_minima expects 2 arguments, got ${args.length}")
      WinnowMinima(args.head, intLitArg(args(1), "winnow_minima", "w"))
    })
}
