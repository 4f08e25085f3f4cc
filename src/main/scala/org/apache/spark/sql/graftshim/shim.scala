package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4.x `Column` wraps an opaque `ColumnNode`; the classic (non-Connect)
  * conversion utilities live in `org.apache.spark.sql.classic` and are
  * `private[sql]`, so this shim sits inside the `org.apache.spark.sql`
  * package to expose just the two conversions the graft engine needs.
  */
object graftshim {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
