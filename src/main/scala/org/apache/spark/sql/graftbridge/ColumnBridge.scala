package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column⇄Expression converters —
  * Spark 4's unified `Column` wraps a ColumnNode, and the classic
  * converters live behind the sql package boundary. Residing in a
  * subpackage of `org.apache.spark.sql` grants access; this is the
  * standard extension-point pattern for libraries shipping custom
  * Catalyst expressions.
  */
object ColumnBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
