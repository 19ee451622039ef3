package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column <-> Catalyst Expression
  * conversions (Spark 4 moved them behind the Connect column-node
  * API). Living under `org.apache.spark.sql` grants the access; this
  * is the standard pattern for libraries that ship custom codegen
  * expressions against classic Spark.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
