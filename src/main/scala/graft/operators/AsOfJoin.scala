package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the latest right row with
  * `rightTime <= leftTime` and an equal key (inclusive at equality; ties on
  * `rightTime` broken by the largest `tieBreak`).
  *
  * Spark has no built-in as-of join, so this composes existing operators
  * (preference (a) of the extension ladder): tag both inputs, union them,
  * and carry the most recent right-side payload forward with
  * `last(..., ignoreNulls)` over a key-partitioned time-ordered window.
  *
  * Scale behavior (the reason for this shape over a per-row probe or an
  * inequality join): ONE shuffle of |L|+|R| rows on the key, then a
  * single per-partition sort — no range explosion, no nested-loop, no
  * broadcast requirement on either side. Skew is bounded by key
  * cardinality like any windowed computation; a running `last` is O(1)
  * per row within the frame.
  */
object AsOfJoin {

  /** Forward as-of join: for each left row, the EARLIEST right row with
    * `rightTime >= leftTime` and an equal key. Same single-shuffle
    * shape as `backward`, with the time axis reversed (ties on equal
    * rightTime break to the largest `tieBreak`, as in `backward`).
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      tieBreak: String): DataFrame = {
    // Reverse time ordering by negating epoch-µs on both inputs, reuse
    // the backward machinery, then restore the original left columns.
    val negL = left.withColumn("__negt",
      -unix_micros(col(leftTime)))
    val negR = right.withColumn("__negt",
      -unix_micros(col(rightTime)))
    backward(negL, negR, leftKey, rightKey, "__negt", "__negt",
      rightPayload, tieBreak)
      .drop("__negt")
  }

  /** @param rightPayload right columns to attach (null when no match)
    * @param tieBreak     right column ordering ties on equal rightTime
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      tieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq

    // Right rows carry their payload as one struct; left rows carry null.
    // At equal time, `__side` orders right (0) before left (1), which makes
    // the match inclusive; among right ties `tieBreak` ascending makes
    // `last` pick the largest.
    val taggedRight = right.select(
      Seq(
        col(rightKey).as("__key"),
        col(rightTime).as("__t"),
        lit(0).as("__side"),
        col(tieBreak).as("__tb"),
        struct(rightPayload.map(col): _*).as("__payload")): _*)

    val tbType = taggedRight.schema("__tb").dataType
    val payloadType = taggedRight.schema("__payload").dataType

    val taggedLeft = left.select(
      (Seq(
        col(leftKey).as("__key"),
        col(leftTime).as("__t"),
        lit(1).as("__side"),
        lit(null).cast(tbType).as("__tb"),
        lit(null).cast(payloadType).as("__payload")) ++
        leftCols.map(col)): _*)

    val rightPadded = taggedRight.select(
      (Seq(col("__key"), col("__t"), col("__side"), col("__tb"),
        col("__payload")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // NULL-key contract: this is an equi-join on the key, so a NULL key
    // matches nothing (SQL equality semantics — the t04 oracle's
    // `e.user_id = o.o_custkey` never matches NULL). Window.partitionBy
    // groups NULL keys into one partition, so without the guard a
    // NULL-key left row would inherit a NULL-key right row's payload.
    taggedLeft.unionByName(rightPadded)
      .withColumn("__match",
        when(col("__key").isNotNull,
          last(col("__payload"), ignoreNulls = true).over(w)))
      .where(col("__side") === 1)
      .select((leftCols.map(col) ++
        rightPayload.map(c => col("__match").getField(c).as(c))): _*)
  }
}
