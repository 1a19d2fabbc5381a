// Bridge into Spark's `private[sql]` Column↔Expression converters.
// Spark 4 made Column ColumnNode-backed; extension libraries that
// define custom Catalyst Expressions need this two-liner in the
// org.apache.spark.sql namespace (same approach as other public
// Spark-extension projects, e.g. connector libraries).
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object SqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
