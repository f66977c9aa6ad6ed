package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and catalyst Expressions.
  *
  * Spark 4 made `Column` backend-agnostic and hid the Expression
  * constructors behind `private[sql]` (`classic.ExpressionUtils`,
  * spark/sql/core/.../classic/columnNodeSupport.scala). A library shipping
  * custom codegen expressions needs exactly these two conversions, so this
  * shim re-exports them from inside the `org.apache.spark.sql` package —
  * the standard pattern for Spark extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
