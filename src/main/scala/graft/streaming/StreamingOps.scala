package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming faces of the engine's time-series operators
  * (SURVEY.md §7.2 M4). Each takes a STREAMING DataFrame (`readStream`)
  * with an event-time column and returns a streaming plan; the batch
  * equivalents live in `graft.queries.TimeSeriesQueries` (t01-t03) and
  * define the expected results the tests check against.
  *
  * The watermark is the streaming analogue of the reference's
  * time-validity rule (index.js:235-239): rows whose event time is
  * missing/too-late are dropped by the engine rather than erroring —
  * there, a null check per row; here, bounded-lateness state eviction.
  *
  * Scale stance: every op below is keyed state over (window|session, key)
  * — Spark partitions state by key across executors, watermarks bound
  * state size, and nothing ever collects to the driver.
  */
object StreamingOps {

  /** Tumbling event-time counts/sums per event_type — streaming face of
    * t01. Late rows beyond `lateness` are dropped (watermark), mirroring
    * the skip-don't-fail contract.
    */
  def tumblingAgg(events: DataFrame, lateness: String = "1 hour",
      windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"),
        col("sum_value"))

  /** Sliding-window aggregate — streaming face of t02. */
  def slidingAgg(events: DataFrame, lateness: String = "1 hour",
      windowLen: String = "2 hours", slide: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen, slide).as("w"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("bucket"), col("n"), col("sum_value"))

  /** Gap-based sessionization via `session_window` — streaming face of
    * t03 (which composes lag/cumsum windows; streaming uses the native
    * session operator, whose state merges windows within the gap).
    */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
      lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Streaming exact dedup on a key, with watermark-bounded state —
    * the streaming face of `Dedup.exactGroups`' keep-first semantics.
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Stream-static enrichment: the streaming analogue of the per-row
    * prepare transform looking up a dimension — each micro-batch joins
    * against the (broadcastable) static table; no state, no watermark
    * requirement, the static side is re-read per batch.
    */
  def enrich(events: DataFrame, dim: DataFrame, keys: Seq[String],
      joinType: String = "left"): DataFrame =
    events.join(dim, keys, joinType)
}
