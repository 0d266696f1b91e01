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

  /** Bridge into `private[sql] classic.Dataset.ofRows` — a V1
    * streaming Source's `getBatch` must hand the engine a DataFrame
    * over a plan it built itself (an `isStreaming` relation over the
    * micro-batch's files, the FileStreamSource discipline), which is
    * exactly what `ofRows` constructs.
    */
  def ofRows(s: classic.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame = classic.Dataset.ofRows(s, plan)
}
