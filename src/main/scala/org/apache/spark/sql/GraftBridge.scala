package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column <-> Expression conversion that
  * Spark 4.x hides behind `classic.ExpressionUtils`. Declared inside
  * `package org.apache.spark.sql` so graft's custom Catalyst expressions
  * (RollingHash, CosineSimilarity, ...) can be exposed as Columns without
  * going through the string-based function registry.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
