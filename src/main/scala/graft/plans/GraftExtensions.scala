package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.DotProduct

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
}
