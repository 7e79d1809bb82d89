package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column <-> catalyst Expression converters.
  * Spark 4 wraps Column around ColumnNode; building a Column from a custom
  * Catalyst Expression goes through `classic.ExpressionUtils`, which is
  * package-private — this shim (in the sql package, as Spark extensions
  * conventionally do) re-exports the two conversions the engine needs.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
