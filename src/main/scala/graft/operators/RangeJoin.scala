package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range join: pairs (l, r) with equal key and
  * `r.time in [l.time - range, l.time)`.
  *
  * A naive inequality join degenerates to a nested-loop (or, with an
  * equi-key, a hash join whose post-filter discards almost everything when
  * keys are hot). This implementation *bands* time into `range`-sized
  * buckets and equi-joins on (key, bucket): every right row lands in one
  * bucket, every left row probes exactly two (its own and the previous),
  * and an exact post-filter trims the edges. That keeps the join a hash
  * join with bounded fan-out at any scale — the standard interval-banding
  * trick used by range-join optimizers.
  */
object RangeJoin {

  /** Range-sized bucket of a timestamp column. True integer division
    * (SQL `div` via Catalyst IntegralDivide), so the bucketing is exact by
    * construction — a double `/` would only be correct while epoch-µs
    * values stay under 2^53.
    */
  private def bucket(t: Column, rangeSeconds: Long): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      GraftBridge.expression(unix_micros(t)),
      GraftBridge.expression(lit(rangeSeconds * 1000000L))))
  }

  /** Inner-join pairs; caller projects/aggregates. Left columns keep their
    * names, right columns get `rightPrefix`.
    */
  def bandedPairs(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rangeSeconds: Long,
      rightPrefix: String = "r_"): DataFrame = {
    val l = left.withColumn("__lb",
      explode(array(bucket(col(leftTime), rangeSeconds) - 1,
        bucket(col(leftTime), rangeSeconds))))
    val renamed = right.columns.foldLeft(right) { (df, c) =>
      df.withColumnRenamed(c, s"$rightPrefix$c")
    }
    val r = renamed.withColumn("__rb",
      bucket(col(s"$rightPrefix$rightTime"), rangeSeconds))
    l.join(r,
        col(leftKey) === col(s"$rightPrefix$rightKey") &&
        col("__lb") === col("__rb") &&
        col(s"$rightPrefix$rightTime") >=
          col(leftTime) - expr(s"INTERVAL $rangeSeconds SECONDS") &&
        col(s"$rightPrefix$rightTime") < col(leftTime))
      .drop("__lb", "__rb")
  }
}
