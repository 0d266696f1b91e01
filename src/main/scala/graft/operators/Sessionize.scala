package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (batch): consecutive events of one key belong
  * to the same session while the gap between neighbors is <= `gapSeconds`;
  * a larger gap starts a new session.
  *
  * Classic two-window formulation: flag session starts with `lag`, then a
  * running sum of flags numbers the sessions — one shuffle on the key,
  * one per-partition sort, both windows share the same ordering so
  * Catalyst plans a single Window exec. The streaming analogue (true
  * unbounded input) is `session_window` / `flatMapGroupsWithState` in
  * graft.streaming.
  *
  * Gap comparison is done in integer microseconds (`unix_micros`) — exact,
  * no truncation to seconds.
  */
object Sessionize {

  /** Adds a `session_id` column (1-based per key, in time order). */
  def byGap(
      df: DataFrame,
      key: String,
      time: String,
      gapSeconds: Long,
      tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(time), col(tieBreak))
    val prev = lag(col(time), 1).over(w)
    val newSession = when(
      prev.isNull ||
        (unix_micros(col(time)) - unix_micros(prev)) > gapSeconds * 1000000L,
      1).otherwise(0)
    df.withColumn("__new_session", newSession)
      .withColumn("session_id",
        sum(col("__new_session"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("int"))
      .drop("__new_session")
  }
}
