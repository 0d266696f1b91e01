package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.{AsOfJoin, RangeJoin, Sessionize}
import graft.queries.Gates.mismatches
import graft.queries.QuerySpec.decSum

/** Time-series operators over `events` (SURVEY.md §7.2 M4) — the batch
  * faces of the reference's time-series domain. Streaming equivalents
  * (watermarks, late data) live in graft.streaming.StreamingOps; t06-t08
  * drive them through the REAL streaming engine (file source ->
  * Trigger.AvailableNow -> memory sink, run to completion) so the driver
  * grades streaming results against the batch oracles, and
  * StreamingOpsSpec covers the unbounded-only behaviors (late-row drops,
  * incremental state) MemoryStream-style.
  */
object TimeSeriesQueries {

  /** DuckDB-side cosine between two list(float) expressions — the same
    * sequential left-fold LlmQueries' oracles use, bit-equal to
    * `VectorFunctions.cosineSim` (t42's eval-proximity replay).
    */
  private def cosEvalSql(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, len($a) + 1),
       |    i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x,y) -> x+y)
       |  / (sqrt(list_reduce(list_transform($a, x -> CAST(x AS DOUBLE)*x), (x,y) -> x+y))
       |   * sqrt(list_reduce(list_transform($b, x -> CAST(x AS DOUBLE)*x), (x,y) -> x+y)))""".stripMargin

  /** Run a streaming plan to completion on currently-available data and
    * return the result table. Memory sink is the bounded-harness surface
    * only (the aggregate results are small); production plans point the
    * same writeStream at a real sink.
    */
  private[queries] def runBounded(s: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.DataFrame, name: String, mode: String,
      statePartitions: Option[Int] = None,
      extraConf: Map[String, String] = Map.empty)
      : org.apache.spark.sql.DataFrame = {
    // Streaming state partitioning is pinned from shuffle.partitions at
    // query START (into the checkpoint); every state store instance pays
    // per-batch snapshot/delta file IO, and a stream-stream join keeps
    // FOUR stores per partition — size the partition count to the state
    // volume, exactly as a production job would, and restore after start.
    // extraConf covers the same start-pinned class of settings (e.g. the
    // state store provider transformWithState requires).
    val overrides = statePartitions
      .map(n => "spark.sql.shuffle.partitions" -> n.toString).toMap ++
      extraConf
    val prev = overrides.keys.map(k => k -> s.conf.getOption(k)).toMap
    val q =
      try {
        overrides.foreach { case (k, v) => s.conf.set(k, v) }
        plan.writeStream.format("memory").queryName(name)
          .outputMode(mode)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
      } finally prev.foreach { case (k, vOpt) =>
        vOpt.fold(s.conf.unset(k))(v => s.conf.set(k, v))
      }
    q.awaitTermination()
    q.stop() // deregister so re-runs in the same session can reuse the name
    s.table(name)
  }

  val specs: Seq[QuerySpec] = Seq(

    QuerySpec(
      "t01_tumbling_window",
      "tumbling event-time window aggregate (batch face of streaming groupBy(window(...)))",
      (s, dir) => Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), decSum(col("value"), 6).as("sum_value"))
        .select(col("w.start").as("bucket"), col("event_type"), col("n"),
          col("sum_value")),
      Some("""SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS bucket,
             |  event_type, count(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2""".stripMargin)),

    QuerySpec(
      "t02_sliding_window",
      "sliding window (2h window, 1h slide): each event lands in two buckets",
      (s, dir) => Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
        .agg(count(lit(1)).as("n"), decSum(col("value"), 6).as("sum_value"))
        .select(col("w.start").as("bucket"), col("n"), col("sum_value")),
      Some("""WITH b AS (
             |  SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS h, value
             |  FROM events),
             |x AS (
             |  SELECT h AS bucket, value FROM b
             |  UNION ALL
             |  SELECT h - INTERVAL 1 HOUR AS bucket, value FROM b)
             |SELECT bucket, count(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM x GROUP BY bucket""".stripMargin)),

    QuerySpec(
      "t03_sessionize",
      "gap-based sessionization (30 min) + per-session aggregate",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        Sessionize.byGap(e, "user_id", "ts", 1800L, "event_id")
          .groupBy(col("user_id"), col("session_id"))
          .agg(
            min(col("ts")).as("session_start"),
            max(col("ts")).as("session_end"),
            count(lit(1)).as("n_events"),
            (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
              .as("duration_us"),
            decSum(col("value"), 6).as("sum_value"))
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
             |f AS (
             |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
             |      OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000
             |    THEN 1 ELSE 0 END AS new_s
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |g AS (
             |  SELECT *, CAST(SUM(new_s) OVER (
             |    PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS UNBOUNDED PRECEDING) AS INT) AS session_id
             |  FROM f)
             |SELECT user_id, session_id,
             |  min(ts) AS session_start, max(ts) AS session_end,
             |  count(*) AS n_events,
             |  date_diff('microsecond', min(ts), max(ts)) AS duration_us,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM g GROUP BY user_id, session_id""".stripMargin)),

    QuerySpec(
      "t04_asof_join",
      "backward as-of join: each event picks the latest order of its user at event time",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("ts"))
        val o = Tables.load(s, dir, "orders")
        AsOfJoin.backward(e, o,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          rightPayload = Seq("o_orderkey", "o_totalprice"),
          tieBreak = "o_orderkey")
      },
      Some("""SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
             |  o_orderkey, o_totalprice
             |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events) e
             |LEFT JOIN orders o
             |  ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
             |QUALIFY row_number() OVER (
             |  PARTITION BY event_id
             |  ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) = 1""".stripMargin)),

    QuerySpec(
      "t05_range_join",
      "banded range join: per event, count same-user events in the preceding hour",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("ts"))
        val pairs = RangeJoin.bandedPairs(
          e, e.select(col("event_id"), col("user_id"), col("ts")),
          leftKey = "user_id", rightKey = "user_id",
          leftTime = "ts", rightTime = "ts",
          rangeSeconds = 3600L)
        val counts = pairs.groupBy(col("event_id"))
          .agg(count(lit(1)).as("n_prev_hour"))
        e.select(col("event_id"))
          .join(counts, Seq("event_id"), "left")
          .select(col("event_id"),
            coalesce(col("n_prev_hour"), lit(0L)).as("n_prev_hour"))
      },
      Some("""SELECT e.event_id, count(b.event_id) AS n_prev_hour
             |FROM events e
             |LEFT JOIN events b ON e.user_id = b.user_id
             |  AND CAST(b.ts AS TIMESTAMP) >= CAST(e.ts AS TIMESTAMP) - INTERVAL 1 HOUR
             |  AND CAST(b.ts AS TIMESTAMP) < CAST(e.ts AS TIMESTAMP)
             |GROUP BY e.event_id""".stripMargin)),

    QuerySpec(
      "t06_stream_tumbling",
      "Structured Streaming tumbling aggregate run end-to-end (parquet file source -> watermark -> groupBy(window) -> AvailableNow -> memory sink); must equal the batch t01 oracle exactly",
      (s, dir) => runBounded(s,
        graft.streaming.StreamingOps.tumblingAgg(
          Tables.loadStream(s, dir, "events"),
          aggs = Seq(count(lit(1)).as("n"),
            decSum(col("value"), 6).as("sum_value"))),
        "t06_stream_tumbling_mem", "complete", statePartitions = Some(8)),
      Some("""SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS bucket,
             |  event_type, count(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2""".stripMargin)),

    QuerySpec(
      "t07_stream_sessionize",
      "Structured Streaming native session_window aggregation run end-to-end; must equal the batch gap-sessionization (session_end = last event + gap, per the session_window contract)",
      (s, dir) => runBounded(s,
        graft.streaming.StreamingOps.sessionAgg(
          Tables.loadStream(s, dir, "events"),
          aggs = Seq(count(lit(1)).as("n_events"),
            decSum(col("value"), 6).as("sum_value"))),
        "t07_stream_sessionize_mem", "complete", statePartitions = Some(8)),
      Some("""WITH e AS (
             |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
             |f AS (
             |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
             |      OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000
             |    THEN 1 ELSE 0 END AS new_s
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |g AS (
             |  SELECT *, SUM(new_s) OVER (
             |    PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM f)
             |SELECT user_id,
             |  min(ts) AS session_start,
             |  max(ts) + INTERVAL 30 MINUTE AS session_end,
             |  count(*) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM g GROUP BY user_id, sid""".stripMargin)),

    QuerySpec(
      "t08_stream_enrich",
      "stream-static enrichment join run end-to-end (stateless append mode): each event looks up its user's market segment from the static customer dim",
      (s, dir) => runBounded(s,
        graft.streaming.StreamingOps.enrich(
          Tables.loadStream(s, dir, "events")
            .select(col("event_id"), col("user_id")),
          Tables.load(s, dir, "customer")
            .select(col("c_custkey").as("user_id"), col("c_mktsegment")),
          Seq("user_id"), "left"),
        "t08_stream_enrich_mem", "append"),
      Some("""SELECT event_id, user_id, c_mktsegment
             |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey""".stripMargin)),

    QuerySpec(
      "t09_stream_stream_join",
      "stream-stream interval join run end-to-end (both sides watermarked, state bounded by the interval): same-user event pairs within the preceding hour for a 1-in-10 user subset — the streaming face of t05; pair totals checked against the batch join oracle",
      (s, dir) => {
        // user_id % 10 = 0 on both sides: the state store must absorb
        // every input row of a side, so the harness query bounds the
        // subset (the join machinery — watermarks, cross-side interval
        // condition, state eviction — is identical at any rate).
        def side(prefix: String) = Tables.loadStream(s, dir, "events")
          .where(col("user_id").isNotNull && col("user_id") % 10 === 0)
          .select(col("event_id").as(s"${prefix}event_id"),
            col("user_id").as(s"${prefix}user_id"),
            col("ts").as(s"${prefix}ts"))
        val pairs = graft.streaming.StreamingOps.intervalJoin(
          side("a_"), side("b_"),
          leftKey = "a_user_id", rightKey = "b_user_id",
          leftTime = "a_ts", rightTime = "b_ts")
          .select(col("a_event_id"), col("b_event_id"))
        runBounded(s, pairs, "t09_stream_stream_join_mem", "append",
            statePartitions = Some(4))
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct(col("a_event_id")).as("n_events_with_prev"))
      },
      Some("""SELECT count(*) AS n_pairs,
             |  count(DISTINCT e.event_id) AS n_events_with_prev
             |FROM events e JOIN events b ON e.user_id = b.user_id
             |  AND CAST(b.ts AS TIMESTAMP) >= CAST(e.ts AS TIMESTAMP) - INTERVAL 1 HOUR
             |  AND CAST(b.ts AS TIMESTAMP) < CAST(e.ts AS TIMESTAMP)
             |WHERE e.user_id IS NOT NULL AND e.user_id % 10 = 0""".stripMargin)),

    QuerySpec(
      "t10_windowed_dedup",
      "windowed deduplication: keep the earliest event per (hour, user, type) — the batch face of dropDuplicatesWithinWatermark (StreamingOps.dedupStream); fully tie-broken by event_id",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.load(s, dir, "events")
          .select(window(col("ts"), "1 hour").getField("start").as("bucket"),
            col("user_id"), col("event_type"), col("event_id"), col("ts"))
        val w = Window.partitionBy(col("bucket"), col("user_id"),
            col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        e.withColumn("rk", row_number().over(w))
          .where(col("rk") === 1)
          .select(col("bucket"), col("user_id"), col("event_type"),
            col("event_id").as("keep_event_id"))
      },
      Some("""SELECT bucket, user_id, event_type, event_id AS keep_event_id
             |FROM (
             |  SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
             |      AS bucket,
             |    user_id, event_type, event_id,
             |    row_number() OVER (
             |      PARTITION BY date_trunc('hour', CAST(ts AS TIMESTAMP)),
             |        user_id, event_type
             |      ORDER BY ts, event_id) AS rk
             |  FROM events) WHERE rk = 1""".stripMargin)),

    QuerySpec(
      "t11_stream_dedup",
      "streaming exact dedup run end-to-end (dropDuplicatesWithinWatermark on (user_id, event_type), watermark-bounded state): WHICH row survives per key is arrival-order-dependent, so the checked output is the deterministic kept-key census per event_type",
      (s, dir) => {
        // Watermark delay must cover the dedup horizon: the fixture
        // spans ~30 days, so a 1-hour delay would evict a key's state
        // mid-run if the source were ever chopped into multiple
        // micro-batches and re-emit late duplicates. 90 days = dedup
        // over the whole span regardless of batch boundaries.
        val kept = runBounded(s,
          graft.streaming.StreamingOps.dedupStream(
            Tables.loadStream(s, dir, "events")
              .where(col("ts").isNotNull && col("user_id").isNotNull &&
                col("event_type").isNotNull),
            Seq("user_id", "event_type"), lateness = "90 days"),
          "t11_stream_dedup_mem", "append", statePartitions = Some(8))
        kept.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_kept"))
      },
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_kept
             |FROM events
             |WHERE ts IS NOT NULL AND user_id IS NOT NULL
             |  AND event_type IS NOT NULL
             |GROUP BY 1""".stripMargin)),

    QuerySpec(
      "t12_stream_stateful",
      "custom keyed state via mapGroupsWithState run end-to-end (per-user running event ledger, Update mode): per-key counts are exact and batch-count-invariant (max per key over emissions), checked as (n_users, total, max-per-user); FP sums are excluded by design (per-key fold order is shuffle-dependent)",
      (s, dir) => {
        val emitted = runBounded(s,
          graft.streaming.StreamingOps.runningTotals(
            Tables.loadStream(s, dir, "events")
              .where(col("user_id").isNotNull && col("value").isNotNull),
            "user_id", "value"),
          "t12_stream_stateful_mem", "update", statePartitions = Some(8))
        // one row per (key, micro-batch) in update mode; counts are
        // monotone, so max-per-key is the final ledger regardless of how
        // AvailableNow chopped the input into batches
        emitted.groupBy(col("key"))
          .agg(max(col("n_events")).as("n"))
          .agg(count(lit(1)).as("n_users"),
            sum(col("n")).as("n_events_total"),
            max(col("n")).as("max_events_per_user"))
      },
      Some("""WITH c AS (
             |  SELECT user_id, count(*) AS c FROM events
             |  WHERE user_id IS NOT NULL AND value IS NOT NULL
             |  GROUP BY 1)
             |SELECT count(*) AS n_users,
             |  CAST(sum(c) AS BIGINT) AS n_events_total,
             |  CAST(max(c) AS BIGINT) AS max_events_per_user
             |FROM c""".stripMargin)),

    QuerySpec(
      "t13_stream_upsert",
      "continuous CDC-style migration: readStream -> foreachBatch -> last-writer-wins upsert into a parquet state table (latest event per (user, type), versioned by (ts, event_id)) — the deployment shape for incremental re-migration; final state checked against the batch LWW oracle",
      (s, dir) => {
        val out =
          java.nio.file.Files.createTempDirectory("graft_cdc_").toString
        val stateDir = s"$out/state"
        val mergeBatch: (org.apache.spark.sql.DataFrame, Long) => Unit =
          (batch, _) => {
            val sp = batch.sparkSession
            val fs = graft.pipeline.SinkFiles.fileSystem(
              new org.apache.hadoop.fs.Path(stateDir))
            val withV = batch
              .withColumn("__v", struct(col("ts"), col("event_id")))
            val base =
              if (fs.exists(new org.apache.hadoop.fs.Path(stateDir)))
                sp.read.parquet(stateDir)
                  .withColumn("__v", struct(col("ts"), col("event_id")))
              else withV.limit(0)
            val merged = graft.pipeline.Maintenance
              .upsert(base, withV, Seq("user_id", "event_type"), "__v")
              .drop("__v")
            // rewrite via a temp dir + swap: upsert reads the same files
            // it replaces, and parquet overwrite would clobber its input
            val tmp = s"$out/state_next"
            merged.write.mode("overwrite").parquet(tmp)
            graft.pipeline.SinkFiles.deleteRecursive(stateDir)
            require(fs.rename(new org.apache.hadoop.fs.Path(tmp),
              new org.apache.hadoop.fs.Path(stateDir)), "state swap failed")
          }
        val q = Tables.loadStream(s, dir, "events")
          .where(col("event_id").isNotNull && col("user_id").isNotNull &&
            col("event_type").isNotNull && col("ts").isNotNull)
          .writeStream
          .foreachBatch(mergeBatch)
          .option("checkpointLocation", s"$out/_ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        q.stop()
        s.read.parquet(stateDir)
          .select(col("user_id"), col("event_type"), col("ts"),
            col("event_id"), col("value"))
      },
      Some("""SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
             |  event_id, value
             |FROM (
             |  SELECT *, row_number() OVER (
             |      PARTITION BY user_id, event_type
             |      ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST) AS rk
             |  FROM events
             |  WHERE event_id IS NOT NULL AND user_id IS NOT NULL
             |    AND event_type IS NOT NULL AND ts IS NOT NULL)
             |WHERE rk = 1""".stripMargin)),

    QuerySpec(
      "t14_stream_blocklist",
      "streaming blocklist filter: a bloom of blocked user_ids (built batch-side at stream start, shipped as a codegen'd probe constant) routes the LIVE stream — bloom-negative rows pass with no join at all, bloom-maybes are exactly verified by a broadcast stream-static left-outer join; run end-to-end with AvailableNow, census must equal the batch anti-join",
      (s, dir) => {
        val blocked = Tables.load(s, dir, "events")
          .where(col("user_id").isNotNull && col("user_id") % 17 === 0)
          .select(col("user_id").as("bk")).distinct()
        val bloom = graft.functions.BloomFunctions.buildBloom(
          blocked, "bk", 2000L, 0.05)
        val stream = Tables.loadStream(s, dir, "events")
          .where(col("user_id").isNotNull)
          .select(col("user_id"), col("event_type"))
        val hit = graft.functions.BloomFunctions
          .mightContain(bloom, col("user_id"))
        // Route: definite negatives bypass the join (the 100 TB win —
        // almost every row, no broadcast lookup); maybes verify exactly
        // so bloom false positives cannot drop rows.
        val negatives = stream.where(!hit)
        val verified = stream.where(hit)
          .join(broadcast(blocked), col("user_id") === col("bk"), "left_outer")
          .where(col("bk").isNull)
          .select(col("user_id"), col("event_type"))
        val kept = runBounded(s, negatives.union(verified),
          "t14_stream_blocklist_mem", "append")
        kept.groupBy(col("event_type")).agg(count(lit(1)).as("n_kept"))
      },
      Some("""SELECT event_type, count(*) AS n_kept
             |FROM events
             |WHERE user_id IS NOT NULL AND user_id % 17 <> 0
             |GROUP BY 1""".stripMargin)),

    QuerySpec(
      "t15_stream_outer_join",
      "stream-stream LEFT OUTER interval join end-to-end — the watermark-closed null-emission semantics: matched pairs emit on match, while an unmatched left row emits its null-extended result only once the watermark (max event time - 1h delay) proves no matching right row can still arrive; rows inside the final watermark horizon never emit, and the oracle encodes exactly that horizon (boundary INCLUSIVE: a row exactly at the watermark can only match strictly-earlier rights, which would all be late — MemoryStream-probe-verified that Spark emits it)",
      (s, dir) => {
        def side(prefix: String) = Tables.loadStream(s, dir, "events")
          .where(col("user_id").isNotNull && col("user_id") % 10 === 0)
          .select(col("event_id").as(s"${prefix}event_id"),
            col("user_id").as(s"${prefix}user_id"),
            col("ts").as(s"${prefix}ts"))
        val joined = graft.streaming.StreamingOps.intervalJoin(
          side("a_"), side("b_"),
          leftKey = "a_user_id", rightKey = "b_user_id",
          leftTime = "a_ts", rightTime = "b_ts",
          joinType = "left_outer")
          .select(col("a_event_id"), col("b_event_id"))
        runBounded(s, joined, "t15_stream_outer_join_mem", "append",
            statePartitions = Some(4))
          .agg(count(col("b_event_id")).as("n_pairs"),
            count(when(col("b_event_id").isNull, 1)).as("n_null_left"))
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
             |  FROM events WHERE user_id IS NOT NULL AND user_id % 10 = 0),
             |wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM e),
             |p AS (
             |  SELECT a.event_id AS a_id, b.event_id AS b_id
             |  FROM e a JOIN e b ON a.user_id = b.user_id
             |    AND b.ts >= a.ts - INTERVAL 1 HOUR AND b.ts < a.ts)
             |SELECT
             |  (SELECT count(*) FROM p) AS n_pairs,
             |  (SELECT count(*) FROM e a, wm
             |   WHERE a.ts <= wm.w
             |     AND NOT EXISTS (SELECT 1 FROM e b
             |       WHERE b.user_id = a.user_id
             |         AND b.ts >= a.ts - INTERVAL 1 HOUR AND b.ts < a.ts))
             |    AS n_null_left""".stripMargin)),

    QuerySpec(
      "t16_stream_tws",
      "Spark-4-native typed keyed state (transformWithState) run end-to-end: per-user running (count, max event id) census via a named ValueState handle under the REQUIRED RocksDB provider — the spill-to-disk state backend 100 TB streaming state needs; both stats integer+monotone so max-per-key over Update-mode emissions is batch-count-invariant, checked against the batch census oracle",
      (s, dir) => {
        val emitted = runBounded(s,
          graft.streaming.StreamingOps.runningCensusTws(
            Tables.loadStream(s, dir, "events")
              .where(col("user_id").isNotNull && col("event_id").isNotNull),
            "user_id", "event_id"),
          "t16_stream_tws_mem", "update", statePartitions = Some(8),
          extraConf = Map(
            "spark.sql.streaming.stateStore.providerClass" ->
              ("org.apache.spark.sql.execution.streaming.state." +
                "RocksDBStateStoreProvider")))
        emitted.groupBy(col("key"))
          .agg(max(col("n_events")).as("n"), max(col("max_id")).as("mx"))
          .agg(count(lit(1)).as("n_users"),
            sum(col("n")).as("n_events_total"),
            max(col("n")).as("max_events_per_user"),
            max(col("mx")).as("max_event_id"))
      },
      Some("""WITH c AS (
             |  SELECT user_id, count(*) AS c, max(event_id) AS mx
             |  FROM events
             |  WHERE user_id IS NOT NULL AND event_id IS NOT NULL
             |  GROUP BY 1)
             |SELECT count(*) AS n_users,
             |  CAST(sum(c) AS BIGINT) AS n_events_total,
             |  CAST(max(c) AS BIGINT) AS max_events_per_user,
             |  max(mx) AS max_event_id
             |FROM c""".stripMargin)),

    QuerySpec(
      "t17_stream_tws_map",
      "keyed MAP state (transformWithState + MapState) run end-to-end: per-user per-event-type running counts in one state handle — the per-entity feature-ledger shape; each batch emits the key's full current map, counts are integer+monotone so max-per-(user, type) over Update-mode emissions is batch-count-invariant; per-type totals checked against the batch oracle",
      (s, dir) => {
        val emitted = runBounded(s,
          graft.streaming.StreamingOps.typeCensusTws(
            Tables.loadStream(s, dir, "events")
              .where(col("user_id").isNotNull && col("event_type").isNotNull),
            "user_id", "event_type"),
          "t17_stream_tws_map_mem", "update", statePartitions = Some(8),
          extraConf = Map(
            "spark.sql.streaming.stateStore.providerClass" ->
              ("org.apache.spark.sql.execution.streaming.state." +
                "RocksDBStateStoreProvider")))
        emitted.groupBy(col("key"), col("event_type"))
          .agg(max(col("n")).as("n"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_users"), sum(col("n")).as("n_events"))
      },
      Some("""SELECT event_type,
             |  count(DISTINCT user_id) AS n_users,
             |  count(*) AS n_events
             |FROM events
             |WHERE user_id IS NOT NULL AND event_type IS NOT NULL
             |GROUP BY 1""".stripMargin)),

    QuerySpec(
      "t18_stream_incr_dedup",
      "the streaming face of l56 (continual-ingestion dedup as documents ARRIVE): every-5th-source docs stream in, a stream-static LEFT ANTI join on SHA-256 digests drops anything already in the standing corpus, then streaming dropDuplicates on the digest removes within-stream repeats — only the census (n_kept) is checked because WHICH duplicate row survives is arrival-order-dependent. State = one digest set (no watermark by design: document digests never expire; at 100 TB the standing side stays the batch l56/l58 path and stream state holds only the current ingest window)",
      (s, dir) => {
        val isNew = substring(col("source"), 4, 10).cast("int") % 5 === 0
        val corpusDigests = Tables.load(s, dir, "documents")
          .where(!isNew)
          .select(sha2(col("text"), 256).as("dig")).distinct()
        val batch = Tables.loadStream(s, dir, "documents")
          .where(isNew)
          .select(col("doc_id"), sha2(col("text"), 256).as("dig"))
        val kept = runBounded(s,
          batch.join(corpusDigests, Seq("dig"), "left_anti")
            .dropDuplicates("dig"),
          "t18_stream_incr_dedup_mem", "append", statePartitions = Some(8))
        kept.agg(count(lit(1)).as("n_kept"))
      },
      // NOT EXISTS, not NOT IN (l56's convention): the stream-static anti
      // join KEEPS a NULL-text row (NULL digest never equi-matches) and
      // dropDuplicates("dig") then collapses all kept NULLs to one row —
      // hence the CASE term; NOT IN would empty the result on one corpus
      // NULL.
      Some("""SELECT count(DISTINCT text)
             |    + CASE WHEN count(*) FILTER (WHERE text IS NULL) > 0
             |           THEN 1 ELSE 0 END AS n_kept
             |FROM documents b
             |WHERE CAST(b.source[4:] AS INT) % 5 = 0
             |  AND NOT EXISTS (
             |    SELECT 1 FROM documents r
             |    WHERE CAST(r.source[4:] AS INT) % 5 <> 0
             |      AND r.text = b.text)""".stripMargin)),

    QuerySpec(
      "t19_stream_quality_bands",
      "the streaming face of l63's quality banding — the live curation monitor (which quality mix is arriving NOW): per-row scoring + fixed floor(quality*10) banding run stateless on the document stream, a complete-mode band census accumulates as batches arrive; state = one row per band (<= ~16 plus NULL), no watermark — a global census never expires",
      (s, dir) => {
        val stream = Tables.loadStream(s, dir, "documents")
        val banded = graft.operators.TextAnalysis.qualityFeatures(
            stream.select(col("doc_id"), col("text")), "text")
          .select(floor(col("quality_score") * 10).as("band"),
            col("n_tokens"))
        val census = banded.groupBy(col("band"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).cast("long").as("tok_total"))
        runBounded(s, census, "t19_stream_quality_bands_mem", "complete",
          statePartitions = Some(8))
      },
      Some("""WITH f AS (
             |  SELECT doc_id,
             |    len(string_split(trim(text), ' ')) AS n_tokens,
             |    CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
             |      / length(text) AS punct_ratio,
             |    CAST(len(regexp_extract_all(text, '\b(the|a|of|and|is)\b')) AS DOUBLE)
             |      / len(string_split(trim(text), ' ')) AS stopword_ratio
             |  FROM documents),
             |q AS (
             |  SELECT doc_id, n_tokens,
             |    (1.0 - punct_ratio) * (0.5 + stopword_ratio)
             |      * (CASE WHEN n_tokens >= 5 THEN 1.0 ELSE 0.25 END)
             |      AS quality_score
             |  FROM f)
             |SELECT CAST(floor(quality_score * 10) AS BIGINT) AS band,
             |  count(*) AS n_docs,
             |  CAST(sum(n_tokens) AS BIGINT) AS tok_total
             |FROM q GROUP BY 1""".stripMargin)),

    QuerySpec(
      "t20_stream_temperature",
      "the streaming face of l67's temperature resampling — the standing-pipeline shape: the per-language rate table is computed ONCE from the corpus census (static side, `temperatureRates`) and the document STREAM is filtered per-row against it (stream-static broadcast join on lang + the content-hash basis-point window — stateless); a complete-mode census accumulates (lang, n_seen, n_kept); state = one row per language",
      (s, dir) => {
        val rates = graft.operators.TextAnalysis.temperatureRates(
            Tables.load(s, dir, "documents"), "lang", budget = 600L)
          .select(col("group").as("lang"), col("rate_bp"))
        val stream = Tables.loadStream(s, dir, "documents")
        val tagged = stream
          .select(col("lang"),
            graft.functions.TextFunctions.rollingHash(col("text")).as("__fp"))
          .join(broadcast(rates), Seq("lang"))
          .select(col("lang"),
            (expr("__fp div 100") % 10000 < col("rate_bp")).as("__kept"))
        val census = tagged.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_seen"),
            count(when(col("__kept"), 1)).as("n_kept"))
        runBounded(s, census, "t20_stream_temperature_mem", "complete",
          statePartitions = Some(8))
      },
      Some(s"""WITH c AS (
              |  SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
              |w AS (
              |  SELECT list_reduce(
              |    list_prepend(CAST(0.0 AS DOUBLE),
              |      list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY lang NULLS FIRST)),
              |    (a, b) -> a + b) AS sumw FROM c),
              |r AS (
              |  SELECT lang, n_docs,
              |    least(10000, CAST(floor(CAST(600 AS DOUBLE)
              |      * sqrt(CAST(n_docs AS DOUBLE)) * 10000.0
              |      / (sumw * CAST(n_docs AS DOUBLE))) AS BIGINT)) AS rate_bp
              |  FROM c, w),
              |f AS (SELECT lang,
              |        ${QuerySpec.fpSql} AS fp
              |      FROM documents)
              |SELECT f.lang, count(*) AS n_seen,
              |  count(*) FILTER (WHERE (fp // 100) % 10000 < rate_bp)
              |    AS n_kept
              |FROM f JOIN r ON f.lang = r.lang
              |GROUP BY 1""".stripMargin)),

    QuerySpec(
      "t21_stream_quota",
      "the streaming face of l73's exact-quota sampler — a standing per-source hard-cap admission pipeline: per stratum the state is the quota-bounded bottom-k (fingerprint, doc_id) buffer, so a new doc is admitted by DISPLACING the current quota-th pair, never by arrival order — the final state is a pure function of the SET of rows seen, identical however the stream is micro-batched (naive first-N admission is not). Emissions carry (n_seen, n_admitted, fp_threshold = the live admission bar); n_seen strictly increases per emission so max-n_seen-per-stratum is the drained answer, and the oracle's window formulation only matches if displacement is exact",
      (s, dir) => {
        val res = graft.streaming.StreamingOps.quotaAdmission(
          Tables.loadStream(s, dir, "documents"), "source", "doc_id",
          "text", quota = 40)
        val emitted = runBounded(s, res, "t21_stream_quota_mem", "update",
          statePartitions = Some(8))
        emitted.groupBy(col("stratum"))
          .agg(max(struct(col("n_seen"), col("n_admitted"),
            col("fp_threshold"))).as("fin"))
          .select(col("stratum"), col("fin.n_seen").as("n_seen"),
            col("fin.n_admitted").as("n_admitted"),
            col("fin.fp_threshold").as("fp_threshold"))
      },
      Some(s"""WITH f AS (
              |  SELECT source AS stratum, doc_id, ${QuerySpec.fpSql} AS fp
              |  FROM documents),
              |r AS (
              |  SELECT stratum, doc_id, fp,
              |    ROW_NUMBER() OVER (PARTITION BY stratum
              |      ORDER BY fp, doc_id) AS rn
              |  FROM f)
              |SELECT stratum, count(*) AS n_seen,
              |  count(*) FILTER (WHERE rn <= 40) AS n_admitted,
              |  max(fp) FILTER (WHERE rn <= 40) AS fp_threshold
              |FROM r GROUP BY 1""".stripMargin)),

    QuerySpec(
      "t22_stream_ann_serve",
      "the streaming face of l72's persisted-index ANN serve — query vectors ARRIVE as a stream and are answered top-10 with zero training jobs and zero windows (Structured Streaming forbids them): the index is the SAME standing AnnIndexStore build l72 persists and l82 maintains (built once per application, not retrained per query), its tiny artifacts (centroids, codebook) driver-collected once at serve start — an ANN server loading its codebook file at boot — so probing and ADC become per-row expressions; the big artifacts (lists, codes-as-arrays, norms) stay tables reached by stream-static equi-joins; the per-query top-10 is bounded displacement state (annTopKState, the t21 discipline). Gate: the drained stream answer agrees >= 90% with the batch pqTopKFromIndex ranking over the SAME index (the two paths sum partial dots in different orders, so agreement not hash is the contract); oracle = top-k-completeness count + literal true",
      (s, dir) => {
        val S = graft.operators.Similarity
        val e = Tables.load(s, dir, "embeddings")
        // the SHARED standing build (AnnIndexStore): same artifacts as
        // l72's persisted tables and l82's maintenance base — built once
        // per application, already checkpointed
        val idx = graft.operators.AnnIndexStore.sharedIndex(s, dir)
        val cents = idx.centroids
        val lists = idx.lists
        val norms = idx.norms
        val (meta, codesArr) = graft.operators.AnnIndexStore.sharedServe(s, dir)
        val served = graft.streaming.StreamingOps.annTopKState(
          S.annServeScore(
            Tables.loadStream(s, dir, "embeddings")
              .where(col("vec_id") % 25 === 0),
            "vec_id", "embedding", meta, lists, codesArr, norms,
            nProbe = 6),
          k = 10)
        val qB = e.where(col("vec_id") % 25 === 0)
        // the batch agreement arm depends only on the standing index —
        // not on the stream drain — so its jobs run CONCURRENTLY with
        // the engine spin from a driver future and back-fill the
        // micro-batches' idle capacity (guide §2.6); the checkpoint
        // makes the materialization eager, inside this run
        val batchTopF = scala.concurrent.Future {
          S.pqTopKFromIndex(qB, e, "vec_id", "embedding",
              k = 10, m = graft.operators.AnnIndexStore.DefaultM,
              codebook = idx.codebook, codes = idx.codes,
              norms = norms,
              candidates = S.indexCandidates(qB, "vec_id", "embedding",
                cents, lists, nProbe = 6),
              rerank = 0,
              // the serve meta is already boot-collected above — don't
              // re-pay the codebook collect per arm (r17)
              cbLocalOpt = Some(meta.cb))
            .select(col("q_id"), col("c_id"), lit(1).as("__b"))
            .localCheckpoint(eager = true)
        }(scala.concurrent.ExecutionContext.global)
        val emitted = runBounded(s, served, "t22_stream_ann_serve_mem",
          "update", statePartitions = Some(8))
        val streamTop = emitted.groupBy(col("q_id"))
          .agg(max_by(col("topk"), col("n_seen")).as("topk"))
          .select(col("q_id"), explode(col("topk")).as("p"))
          .select(col("q_id"), col("p._2").as("c_id"), lit(1).as("__s"))
        val batchTop = scala.concurrent.Await.result(batchTopF,
          scala.concurrent.duration.Duration.Inf)
        streamTop.join(batchTop, Seq("q_id", "c_id"), "full_outer")
          .agg(count(col("__b")).as("n_topk"),
            count(when(col("__b").isNotNull && col("__s").isNotNull, 1))
              .as("__hit"))
          .select(col("n_topk"),
            (col("__hit") * 100 >= col("n_topk") * 90).as("stream_ok"))
      },
      Some("""SELECT 10 * count(*) AS n_topk, TRUE AS stream_ok
             |FROM embeddings WHERE vec_id % 25 = 0""".stripMargin)),

    QuerySpec(
      "t23_stream_pii",
      "the streaming face of l74's PII redaction — ingest-time scrubbing as a standing pipeline: the document STREAM passes through the identical per-row regex chain (stateless, no shuffle before the census) and a complete-mode GLOBAL census accumulates (n_docs, per-type redaction counts, post-redaction char mass) — the one-row audit dashboard an ingest job publishes; same l66/l71-style deterministic PII injection from doc_id as l74, oracle replays injection + the sequential count+redact chain and aggregates",
      (s, dir) => {
        val injected = Tables.loadStream(s, dir, "documents")
          .select(col("doc_id"),
            concat(col("text"),
              when(col("doc_id") % 3 === 0,
                concat(lit(" mail u"), col("doc_id").cast("string"),
                  lit("@ex.com"))).otherwise(lit("")),
              when(col("doc_id") % 4 === 0,
                concat(lit(" host 10.0."), (col("doc_id") % 256).cast("string"),
                  lit(".7"))).otherwise(lit("")),
              when(col("doc_id") % 5 === 0,
                concat(lit(" tel 555-01"), (col("doc_id") % 10).cast("string"),
                  lit("-0199"))).otherwise(lit(""))).as("text"))
        val red = graft.operators.TextAnalysis.redactPii(
          injected, "doc_id", "text")
        val census = red.agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_email")).as("n_email"),
          sum(col("n_ip")).as("n_ip"),
          sum(col("n_phone")).as("n_phone"),
          sum(length(col("text_clean")).cast("long")).as("n_clean_chars"))
        runBounded(s, census, "t23_stream_pii_mem", "complete",
          statePartitions = Some(1))
      },
      Some("""WITH inj AS (
             |  SELECT doc_id, text
             |    || CASE WHEN doc_id % 3 = 0 THEN ' mail u'
             |         || CAST(doc_id AS VARCHAR) || '@ex.com' ELSE '' END
             |    || CASE WHEN doc_id % 4 = 0 THEN ' host 10.0.'
             |         || CAST(doc_id % 256 AS VARCHAR) || '.7' ELSE '' END
             |    || CASE WHEN doc_id % 5 = 0 THEN ' tel 555-01'
             |         || CAST(doc_id % 10 AS VARCHAR) || '-0199' ELSE '' END
             |    AS t FROM documents),
             |s1 AS (
             |  SELECT doc_id,
             |    len(regexp_extract_all(t,
             |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
             |    regexp_replace(t,
             |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
             |      '<EMAIL>', 'g') AS t
             |  FROM inj),
             |s2 AS (
             |  SELECT doc_id, n_email,
             |    len(regexp_extract_all(t,
             |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
             |    regexp_replace(t,
             |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t
             |  FROM s1),
             |s3 AS (
             |  SELECT doc_id, n_email, n_ip,
             |    len(regexp_extract_all(t,
             |      '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS n_phone,
             |    regexp_replace(t,
             |      '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS t
             |  FROM s2)
             |SELECT count(*) AS n_docs,
             |  CAST(sum(n_email) AS BIGINT) AS n_email,
             |  CAST(sum(n_ip) AS BIGINT) AS n_ip,
             |  CAST(sum(n_phone) AS BIGINT) AS n_phone,
             |  CAST(sum(length(t)) AS BIGINT) AS n_clean_chars
             |FROM s3""".stripMargin)),

    QuerySpec(
      "t24_stream_decontam",
      "the streaming face of l36's eval-set decontamination — the pre-training leak check as an ingest quarantine: the benchmark set's distinct word 4-shingles are a STATIC broadcast side, arriving documents explode their shingles into the equi-join (self-matches excluded), and the per-document shared-shingle count accumulates as complete-mode state (one row per FLAGGED doc only — clean docs hold no state); distinct-eval-doc attribution stays on the batch face (l36), distinct aggregation being unsupported over streams",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val evalSh = docs.where(col("doc_id") % 50 === 0)
          .select(col("doc_id").as("eval_id"),
            explode(graft.functions.TextFunctions.shingles(col("text"), 4))
              .as("g2"))
        val streamSh = Tables.loadStream(s, dir, "documents")
          .select(col("doc_id"),
            explode(graft.functions.TextFunctions.shingles(col("text"), 4))
              .as("g"))
        val flagged = streamSh
          .join(broadcast(evalSh),
            col("g") === col("g2") && col("doc_id") =!= col("eval_id"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shared_shingles"))
        runBounded(s, flagged, "t24_stream_decontam_mem", "complete",
          statePartitions = Some(8))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split(trim(text), ' ') AS t
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id,
             |    CASE WHEN len(t) >= 4
             |      THEN list_distinct([array_to_string(t[i:i+3], ' ')
             |                          for i in range(1, len(t)-2)])
             |      ELSE [] END AS s
             |  FROM toks),
             |ev AS (SELECT doc_id AS eval_id, unnest(s) AS g FROM sh
             |       WHERE doc_id % 50 = 0),
             |co AS (SELECT doc_id, unnest(s) AS g FROM sh)
             |SELECT co.doc_id, count(*) AS n_shared_shingles
             |FROM co JOIN ev ON co.g = ev.g AND co.doc_id <> ev.eval_id
             |GROUP BY 1""".stripMargin)),

    QuerySpec(
      "t25_stream_domain_filter",
      "the streaming face of l78's domain scorer — the fastText-style quality/domain filter AT INGEST: the weight table is trained batch-side (domainWeights, the frozen artifact), driver-collected at serve start into ONE typed map literal (the t22 codebook-at-boot discipline, <=4096 entries), and every arriving document scores STATELESSLY per row (sequential fold over its tokens' bucket weights — no join, no per-doc state); the only stream state is the <=|langs|-row complete-mode admission census (n_seen, n_admitted with score > 0)",
      (s, dir) => {
        val wMap = graft.operators.TextAnalysis.domainWeights(
            Tables.load(s, dir, "documents"), "text",
            col("lang") === "en", buckets = 4096)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val mapLit = typedLit(wMap)
        val scored = Tables.loadStream(s, dir, "documents")
          .select(col("lang"),
            aggregate(
              transform(graft.functions.TextFunctions.tokens(col("text")),
                t => coalesce(element_at(mapLit,
                  pmod(graft.functions.TextFunctions.rollingHash(t),
                    lit(4096L))), lit(0L))),
              lit(0L), (acc, x) => acc + x).as("score"))
        val census = scored.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_seen"),
            count(when(col("score") > 0, 1)).as("n_admitted"))
        runBounded(s, census, "t25_stream_domain_filter_mem", "complete",
          statePartitions = Some(8))
      },
      Some("""WITH tk AS (
             |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_t,
             |    unnest(string_split(trim(text), ' ')) AS tok
             |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
             |b AS (
             |  SELECT doc_id, is_t,
             |    list_reduce([unicode(c) for c in regexp_split_to_array(tok, '')],
             |      (a, x) -> (CAST(a AS BIGINT) * 31 + x) % 1000000007) % 4096
             |      AS bkt
             |  FROM tk),
             |tot AS (SELECT CAST(sum(is_t) AS BIGINT) AS nt,
             |               CAST(sum(1 - is_t) AS BIGINT) AS nb FROM b),
             |w AS (
             |  SELECT bkt,
             |    CAST(sum(is_t) AS BIGINT) * (SELECT nb FROM tot)
             |      - CAST(sum(1 - is_t) AS BIGINT) * (SELECT nt FROM tot) AS w
             |  FROM b GROUP BY bkt),
             |sc AS (
             |  SELECT b.doc_id, CAST(sum(w.w) AS BIGINT) AS score
             |  FROM b JOIN w USING (bkt) GROUP BY b.doc_id)
             |SELECT d.lang, count(*) AS n_seen,
             |  count(CASE WHEN sc.score > 0 THEN 1 END) AS n_admitted
             |FROM documents d LEFT JOIN sc USING (doc_id)
             |GROUP BY d.lang""".stripMargin)),

    QuerySpec(
      "t26_stream_mm_decode",
      "the streaming face of l13's batched multimodal decode — media ingest as a standing pipeline: blobs arrive on the stream and flow through the SAME batched mapPartitions decode path (per-batch codec setup amortized inside each micro-batch partition, narrow, no shuffle before the census), accumulating the per-format media census (n_items, byte mass, max frame count) an ingest dashboard publishes; complete mode, state = one row per format",
      (s, dir) => {
        val dec = graft.multimodal.Multimodal.decodeMetaBatched(
          graft.multimodal.Multimodal.withBlob(
            Tables.loadStream(s, dir, "documents"), "text"),
          "doc_id")
        val census = dec
          .groupBy(col("meta.format").as("format"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("meta.n_bytes")).as("n_bytes"),
            max(col("meta.n_frames")).cast("long").as("max_frames"))
        runBounded(s, census, "t26_stream_mm_decode_mem", "complete",
          statePartitions = Some(4))
      },
      Some("""WITH m AS (
             |  SELECT CAST(strlen(text) AS BIGINT) AS nb,
             |    CAST(1 + strlen(text) % 8 AS INT) AS nf,
             |    CASE WHEN strlen(text) % 3 = 0 THEN 'img'
             |         WHEN strlen(text) % 3 = 1 THEN 'audio'
             |         ELSE 'video' END AS format
             |  FROM documents)
             |SELECT format, count(*) AS n_items,
             |  CAST(sum(nb) AS BIGINT) AS n_bytes,
             |  CAST(max(nf) AS BIGINT) AS max_frames
             |FROM m GROUP BY format""".stripMargin)),

    QuerySpec(
      "t27_stream_passage_scrub",
      "the streaming face of l59's repeated-passage scrub — the boilerplate QUARANTINE signal at ingest: the hot 6-gram table (windows shared by >=2 docs) is computed batch-side as the static broadcast side, arriving documents explode their positional shingles into the equi-join, and the per-document count of DISTINCT covered token positions accumulates (collect_set — the streaming-legal distinct; state bounded by doc length, held only for FLAGGED docs) — exactly l59's n_removed, so ops can route heavy-boilerplate docs to the batch scrub; the rebuild itself stays on the batch face",
      (s, dir) => {
        def positional(df: org.apache.spark.sql.DataFrame) = df
          .select(col("doc_id"), split(trim(col("text")), " ").as("t"))
          .where(size(col("t")) >= 6)
          .select(col("doc_id"),
            explode(transform(sequence(lit(0), size(col("t")) - 6),
              i => struct(i.as("i"),
                concat_ws(" ", slice(col("t"), i + 1, lit(6))).as("g"))))
              .as("sh"))
          .select(col("doc_id"), col("sh.i").as("i"), col("sh.g").as("g"))
        val hot = positional(Tables.load(s, dir, "documents"))
          .groupBy(col("g"))
          .agg(countDistinct(col("doc_id")).as("nd"))
          .where(col("nd") >= 2)
          .select(col("g"))
        val cov = positional(Tables.loadStream(s, dir, "documents"))
          .join(broadcast(hot), "g")
          .select(col("doc_id"),
            explode(sequence(col("i"), col("i") + 5)).as("p"))
          .groupBy(col("doc_id"))
          .agg(size(collect_set(col("p"))).cast("long").as("n_removed"))
        runBounded(s, cov, "t27_stream_passage_scrub_mem", "complete",
          statePartitions = Some(8))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split(trim(text), ' ') AS t
             |  FROM documents),
             |ps0 AS (
             |  SELECT doc_id, t, unnest(range(1, len(t) - 4)) AS i
             |  FROM toks WHERE len(t) >= 6),
             |ps AS (
             |  SELECT doc_id, i, array_to_string(t[i:i+5], ' ') AS g
             |  FROM ps0),
             |hot AS (
             |  SELECT g FROM ps GROUP BY g
             |  HAVING count(DISTINCT doc_id) >= 2),
             |cov AS (
             |  SELECT DISTINCT ps.doc_id, ps.i + off AS p
             |  FROM ps JOIN hot USING (g), range(0, 6) o(off))
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed
             |FROM cov GROUP BY doc_id""".stripMargin)),

    QuerySpec(
      "t28_stream_perplexity",
      "the streaming face of l83's bigram-LM quality filter — score-at-ingest against a FROZEN model: the count tables train batch-side on the clean slice and are driver-collected once at serve start (NgramLm.collectServeModel, bounded — the t25 codebook-at-boot discipline; big-vocab corpora stay on l83's broadcast-join batch path), so each arriving document's bits-per-token is a pure per-row fold (map-literal lookups + integer bit-length arithmetic, no join, no window) and the only state is the complete-mode perplexity-band census — one row per band. The oracle recomputes the bands through the JOIN formulation, so the hash only matches if fold-scoring ≡ join-scoring token-for-token",
      (s, dir) => {
        val serve = graft.operators.NgramLm.collectServeModel(
          graft.operators.NgramModelStore.sharedBigram(s, dir))
        // two-step projection ON PURPOSE: the fold reads the token
        // array as a materialized attribute (CollapseProject keeps the
        // boundary for a multiply-referenced non-cheap alias); inlining
        // tokens(text) would re-split the text inside every lambda
        // element_at — see NgramLm.foldBits
        val census = Tables.loadStream(s, dir, "documents")
          .select(graft.functions.TextFunctions.tokens(col("text"))
            .as("toks"))
          .select(graft.operators.NgramLm
            .surprisalBandLocal(serve, col("toks")).as("k"))
          .groupBy(col("k"))
          .agg(count(lit(1)).as("n_docs"))
        runBounded(s, census, "t28_stream_perplexity_mem", "complete",
          statePartitions = Some(8))
      },
      Some("""WITH tk AS (
             |  SELECT doc_id, string_split(trim(text), ' ') AS t
             |  FROM documents),
             |ap AS (
             |  SELECT doc_id,
             |    unnest([{'prev': t[i], 'cur': t[i+1]}
             |            for i in range(1, len(t))], recursive := true)
             |  FROM tk),
             |v AS (
             |  SELECT count(DISTINCT tok) AS v FROM (
             |    SELECT unnest(t) AS tok FROM tk WHERE doc_id % 7 = 0)),
             |pc AS (
             |  SELECT prev, cur, count(*) AS pair_c FROM ap
             |  WHERE doc_id % 7 = 0 GROUP BY 1, 2),
             |ctx AS (
             |  SELECT prev, CAST(sum(pair_c) AS BIGINT) AS ctx_c
             |  FROM pc GROUP BY 1),
             |sc AS (
             |  SELECT ap.doc_id,
             |    length(bin(coalesce(ctx.ctx_c, 0) + (SELECT v FROM v)))
             |      - length(bin(coalesce(pc.pair_c, 0) + 1)) AS bits
             |  FROM ap
             |  LEFT JOIN pc ON ap.prev = pc.prev AND ap.cur = pc.cur
             |  LEFT JOIN ctx ON ap.prev = ctx.prev),
             |pd AS (
             |  SELECT d.doc_id, count(sc.bits) AS n_scored,
             |    CAST(sum(sc.bits) AS BIGINT) AS total_bits
             |  FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
             |  GROUP BY 1)
             |SELECT CAST(floor(CASE WHEN n_scored > 0
             |    THEN CAST(total_bits AS DOUBLE) / n_scored END)
             |    AS BIGINT) AS k,
             |  count(*) AS n_docs
             |FROM pd GROUP BY 1""".stripMargin)),

    QuerySpec(
      "t29_stream_bpe_fertility",
      "the streaming face of l81's frozen-tokenizer fertility census — the live 'is our tokenizer drifting off this corpus' monitor: arriving documents are encoded per-row with the FROZEN 4-merge artifact (the sentinel-replace chain is stateless column arithmetic, so the batch operator runs verbatim on the stream) and the per-language (n_words, n_chars, n_tokens, fertility) census accumulates in complete mode — state is one row per language. Shares l81's oracle, so the streaming path is hash-checked against DuckDB directly, not just gate-compared to the batch face",
      (s, dir) => {
        val census = graft.operators.Bpe.encodeCensus(
          Tables.loadStream(s, dir, "documents"), "text", "lang",
          Seq("e" -> "r", "i" -> "n", "o" -> "w", "o" -> "r"))
        runBounded(s, census, "t29_stream_bpe_fertility_mem", "complete",
          statePartitions = Some(8))
      },
      Some("""WITH w AS (
             |  SELECT lang, unnest(string_split(trim(text), ' ')) AS word
             |  FROM documents),
             |f AS (
             |  SELECT lang, length(word) AS nc,
             |    array_to_string(regexp_split_to_array(word, ''), chr(1))
             |      || chr(1) AS s0
             |  FROM w WHERE length(word) > 0),
             |e AS (
             |  SELECT lang, nc,
             |    replace(replace(replace(replace(s0,
             |      'e' || chr(1) || 'r' || chr(1), 'er' || chr(1)),
             |      'i' || chr(1) || 'n' || chr(1), 'in' || chr(1)),
             |      'o' || chr(1) || 'w' || chr(1), 'ow' || chr(1)),
             |      'o' || chr(1) || 'r' || chr(1), 'or' || chr(1)) AS s
             |  FROM f)
             |SELECT lang AS grp, count(*) AS n_words,
             |  CAST(sum(nc) AS BIGINT) AS n_chars,
             |  CAST(sum(length(s) - length(replace(s, chr(1), '')))
             |    AS BIGINT) AS n_tokens,
             |  CAST(sum(length(s) - length(replace(s, chr(1), '')))
             |    AS DOUBLE) / count(*) AS fertility
             |FROM e GROUP BY lang ORDER BY grp""".stripMargin)),

    QuerySpec(
      "t30_stream_mm_quarantine",
      "the streaming ingest face of l85's quarantine codec — corrupt media COUNTED at ingest, never fatal: the poisoned mixed-format blob stream decodes through the same batched quarantine tier (mapPartitions is a stateless narrow transform, streaming-legal; one reader per format per batch) and a complete-mode per-format census accumulates — n_items plus exact width/height mass, with the 'corrupt' bucket's dimension sums NULL; the oracle replays the poison predicate and both codecs' dimension arithmetic, so the hash only matches if quarantine isolates exactly the poisoned rows on a live stream too",
      (s, dir) => {
        val M = graft.multimodal.Multimodal
        val census = M.decodeImageQuarantine(
            M.corruptBlobs(
              M.withMixedImageBlob(
                Tables.loadStream(s, dir, "documents")
                  .select(col("doc_id")), "doc_id"),
              "doc_id", modulo = 11),
            "doc_id")
          .groupBy(col("format"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("width")).cast("long").as("w_sum"),
            sum(col("height")).cast("long").as("h_sum"))
        runBounded(s, census, "t30_stream_mm_quarantine_mem", "complete",
          statePartitions = Some(4))
      },
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 11 = 0 THEN 'corrupt'
             |         WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END
             |      AS format,
             |    CASE WHEN doc_id % 11 = 0 THEN NULL
             |         ELSE 8 + doc_id % 16 END AS w,
             |    CASE WHEN doc_id % 11 = 0 THEN NULL
             |         ELSE 8 + (doc_id * 3) % 16 END AS h
             |  FROM documents)
             |SELECT format, count(*) AS n_items,
             |  CAST(sum(w) AS BIGINT) AS w_sum,
             |  CAST(sum(h) AS BIGINT) AS h_sum
             |FROM m GROUP BY format""".stripMargin)),

    QuerySpec(
      "t31_stream_backoff",
      "the streaming face of l87's interpolated backoff scorer — the deployable LM filter at ingest: bigram/context/unigram count maps plus the (N, V) scalars are driver-collected once at serve start (unlike t28's pure-bigram model the surprisal of an unseen-pair/seen-continuation event depends on BOTH sides, so bits cannot be precomputed — the per-row fold carries the maps and does the exact BIGINT rational per pair, single-pass over a materialized token column), and the only state is the complete-mode perplexity-band census. The oracle recomputes the bands through l87's join formulation, so the hash only matches if the fold's rational arithmetic is token-for-token identical",
      (s, dir) => {
        val serve = graft.operators.NgramLm.collectBackoffServeModel(
          graft.operators.NgramModelStore.sharedBackoff(s, dir))
        val census = Tables.loadStream(s, dir, "documents")
          .select(graft.functions.TextFunctions.tokens(col("text"))
            .as("toks"))
          .select(graft.operators.NgramLm
            .backoffBandLocal(serve, col("toks")).as("k"))
          .groupBy(col("k"))
          .agg(count(lit(1)).as("n_docs"))
        runBounded(s, census, "t31_stream_backoff_mem", "complete",
          statePartitions = Some(8))
      },
      Some("""WITH tk AS (
             |  SELECT doc_id, string_split(trim(text), ' ') AS t
             |  FROM documents),
             |ap AS (
             |  SELECT doc_id,
             |    unnest([{'prev': t[i], 'cur': t[i+1]}
             |            for i in range(1, len(t))], recursive := true)
             |  FROM tk),
             |trtok AS (
             |  SELECT unnest(t) AS tok FROM tk WHERE doc_id % 7 = 0),
             |v AS (SELECT count(DISTINCT tok) AS v FROM trtok),
             |tot AS (SELECT count(*) AS n FROM trtok),
             |uni AS (SELECT tok AS cur, count(*) AS uni_c
             |        FROM trtok GROUP BY 1),
             |pc AS (
             |  SELECT prev, cur, count(*) AS pair_c FROM ap
             |  WHERE doc_id % 7 = 0 GROUP BY 1, 2),
             |ctx AS (
             |  SELECT prev, CAST(sum(pair_c) AS BIGINT) AS ctx_c
             |  FROM pc GROUP BY 1),
             |sc AS (
             |  SELECT ap.doc_id,
             |    length(bin(2 * (coalesce(ctx.ctx_c, 0) + (SELECT v FROM v))
             |                 * ((SELECT n FROM tot) + (SELECT v FROM v))))
             |    - length(bin(
             |        (coalesce(pc.pair_c, 0) + 1)
             |          * ((SELECT n FROM tot) + (SELECT v FROM v))
             |        + (coalesce(uni.uni_c, 0) + 1)
             |          * (coalesce(ctx.ctx_c, 0) + (SELECT v FROM v))))
             |      AS bits
             |  FROM ap
             |  LEFT JOIN pc ON ap.prev = pc.prev AND ap.cur = pc.cur
             |  LEFT JOIN ctx ON ap.prev = ctx.prev
             |  LEFT JOIN uni ON ap.cur = uni.cur),
             |pd AS (
             |  SELECT d.doc_id, count(sc.bits) AS n_scored,
             |    CAST(sum(sc.bits) AS BIGINT) AS total_bits
             |  FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
             |  GROUP BY 1)
             |SELECT CAST(floor(CASE WHEN n_scored > 0
             |    THEN CAST(total_bits AS DOUBLE) / n_scored END)
             |    AS BIGINT) AS k,
             |  count(*) AS n_docs
             |FROM pd GROUP BY 1""".stripMargin)),

    QuerySpec(
      "t32_stream_winnow",
      "the streaming face of l89 — span-level contamination flagging at ingest: the standing corpus (non-every-5th sources) publishes its winnowing fingerprint set ONCE (the persisted index l89's scaladoc describes), every-5th docs STREAM in, each row's fingerprints come from the same fused per-row `WinnowFromText` expression (winnowing is stateless per document — streaming-safe anywhere a column is), exploded and stream-static equi-joined against the index; streaming dropDuplicates keeps only the FIRST hit per document (state = flagged doc ids, the t27 discipline — not per-fingerprint), and the census counts documents provably sharing a >= w+k-1-token run with the corpus. The winnowing guarantee makes the flag deterministic, so unlike a bloom-probe face the count is oracle-exact",
      (s, dir) => {
        val isNew = substring(col("source"), 4, 10).cast("int") % 5 === 0
        val corpusFps = graft.operators.Dedup.winnowFingerprintSets(
            Tables.load(s, dir, "documents").where(!isNew),
            "doc_id", "text", k = 4, w = 5)
          .select(explode(col("fps")).as("fp")).distinct()
          .localCheckpoint(eager = false)
        val hits = Tables.loadStream(s, dir, "documents")
          .where(isNew)
          .select(col("doc_id"),
            explode(graft.functions.SketchFunctions.winnowFromText(
              col("text"), 4, 5)).as("fp"))
          .join(corpusFps, Seq("fp"))
          .dropDuplicates("doc_id")
        val flagged = runBounded(s, hits.select(col("doc_id")),
          "t32_stream_winnow_mem", "append", statePartitions = Some(8))
        flagged.agg(count(lit(1)).as("n_flagged"))
      },
      Some("""WITH tk AS (
             |  SELECT doc_id,
             |    CAST(source[4:] AS INT) % 5 = 0 AS is_new,
             |    string_split(trim(text), ' ') AS t
             |  FROM documents),
             |gh AS (
             |  SELECT doc_id, is_new,
             |    CASE WHEN len(t) >= 4 THEN
             |      [list_reduce([unicode(c) for c in
             |          regexp_split_to_array(
             |            array_to_string(t[i:i+3], ' '), '')],
             |        (a, b) -> (CAST(a AS BIGINT) * 31 + b) % 1000000007)
             |       for i in range(1, len(t) - 2)]
             |    ELSE CAST([] AS BIGINT[]) END AS gh
             |  FROM tk),
             |fpt AS (
             |  SELECT doc_id, is_new,
             |    CASE WHEN len(gh) >= 5 THEN
             |      list_distinct([list_min(gh[j:j+4])
             |                     for j in range(1, len(gh) - 3)])
             |    WHEN len(gh) > 0 THEN [list_min(gh)]
             |    ELSE CAST([] AS BIGINT[]) END AS fps
             |  FROM gh),
             |corpus_fp AS (
             |  SELECT DISTINCT fp FROM (
             |    SELECT unnest(fps) AS fp FROM fpt WHERE NOT is_new)),
             |hits AS (
             |  SELECT DISTINCT b.doc_id FROM (
             |    SELECT doc_id, unnest(fps) AS fp FROM fpt WHERE is_new) b
             |  JOIN corpus_fp USING (fp))
             |SELECT count(*) AS n_flagged FROM hits""".stripMargin)),

    QuerySpec(
      "t33_stream_nb_filter",
      "the streaming face of l90's dedup-bootstrapped boilerplate classifier — and t32's cheap complement: t32 flags PROVEN contamination by joining every arriving document against the standing corpus fingerprint index; t33 flags boilerplate-LIKE documents with NO corpus artifact in the stream at all. The winnowing dedup pass labels the corpus batch-side, Naive Bayes trains on word-bigram features, and the frozen model is driver-collected ONCE at serve start (NbClassifier.collectNbServeModel, bounded, margins PRECOMPUTED per feature — the t25 codebook-at-boot discipline), so each arriving document's keep decision is a pure per-row fold (map-literal lookups + one sum, no join, no window) and the only state is the complete-mode keep census. The oracle recomputes the census through the broadcast-JOIN formulation, so the hash only matches if fold-scoring ≡ join-scoring feature-for-feature",
      (s, dir) => {
        // the frozen model is the STANDING artifact NbModelStore owns:
        // labeled + trained once per application, collected once here
        val serve = graft.operators.NbModelStore.sharedServeModel(s, dir)
        // two-step projection ON PURPOSE: the fold reads the token
        // array as a materialized attribute (the t28 lesson)
        val census = Tables.loadStream(s, dir, "documents")
          .select(graft.functions.TextFunctions.tokens(col("text"))
            .as("toks"))
          .select(graft.operators.NbClassifier.keepLocal(serve,
            graft.operators.NbClassifier.bigramFeats(col("toks")))
            .as("k"))
          .groupBy(col("k"))
          .agg(count(lit(1)).as("n_docs"))
        runBounded(s, census, "t33_stream_nb_filter_mem", "complete",
          statePartitions = Some(8))
      },
      Some("""WITH tk AS (
             |  SELECT doc_id, string_split(trim(text), ' ') AS t
             |  FROM documents),
             |gh AS (
             |  SELECT doc_id,
             |    CASE WHEN len(t) >= 4 THEN
             |      [list_reduce([unicode(c) for c in
             |          regexp_split_to_array(
             |            array_to_string(t[i:i+3], ' '), '')],
             |        (a, b) -> (CAST(a AS BIGINT) * 31 + b) % 1000000007)
             |       for i in range(1, len(t) - 2)]
             |    ELSE CAST([] AS BIGINT[]) END AS gh
             |  FROM tk),
             |fpt AS (
             |  SELECT doc_id,
             |    CASE WHEN len(gh) >= 5 THEN
             |      list_distinct([list_min(gh[j:j+4])
             |                     for j in range(1, len(gh) - 3)])
             |    WHEN len(gh) > 0 THEN [list_min(gh)]
             |    ELSE CAST([] AS BIGINT[]) END AS fps
             |  FROM gh),
             |ex AS (SELECT doc_id, unnest(fps) AS fp FROM fpt),
             |cold AS (
             |  SELECT fp FROM ex GROUP BY 1
             |  HAVING count(*) BETWEEN 2 AND 64),
             |po AS (SELECT ex.doc_id, ex.fp FROM ex JOIN cold USING (fp)),
             |pr AS (
             |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
             |  FROM po a JOIN po b ON a.fp = b.fp AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2 HAVING count(*) >= 2),
             |lab AS (
             |  SELECT DISTINCT doc_id FROM (
             |    SELECT a_id AS doc_id FROM pr
             |    UNION ALL SELECT b_id FROM pr)),
             |bg AS (
             |  SELECT doc_id, unnest(
             |    [t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS feat
             |  FROM tk),
             |tc AS (
             |  SELECT feat,
             |    CAST(count(*) FILTER (WHERE lab.doc_id IS NULL) AS BIGINT)
             |      AS pos_c,
             |    CAST(count(*) FILTER (WHERE lab.doc_id IS NOT NULL)
             |      AS BIGINT) AS neg_c
             |  FROM bg LEFT JOIN lab USING (doc_id) GROUP BY 1),
             |tot AS (
             |  SELECT CAST(sum(pos_c) AS BIGINT) AS n_pos,
             |    CAST(sum(neg_c) AS BIGINT) AS n_neg,
             |    count(*) AS v FROM tc),
             |sc AS (
             |  SELECT bg.doc_id,
             |    (length(bin((SELECT n_neg FROM tot) + (SELECT v FROM tot)))
             |      - length(bin(coalesce(tc.neg_c, 0) + 1)))
             |    - (length(bin((SELECT n_pos FROM tot) + (SELECT v FROM tot)))
             |      - length(bin(coalesce(tc.pos_c, 0) + 1))) AS bits
             |  FROM bg LEFT JOIN tc USING (feat)),
             |pd AS (
             |  SELECT d.doc_id, count(sc.bits) AS n_scored,
             |    CAST(sum(sc.bits) AS BIGINT) AS total_bits
             |  FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
             |  GROUP BY 1)
             |SELECT CASE WHEN total_bits IS NULL THEN NULL
             |    WHEN total_bits >= 0 THEN 1 ELSE 0 END AS k,
             |  count(*) AS n_docs
             |FROM pd GROUP BY 1""".stripMargin)),

    QuerySpec(
      "t34_stream_image_neardup",
      "the streaming face of l91 — perceptual image dedup at ingest: the standing corpus (every doc except whole every-5th GROUPS, which arrive later, plus one lone straggler variant per 20) publishes its dHash band index ONCE; arriving blobs are decoded and hashed per row by the SAME batched mapPartitions path (mapPartitions composes with streaming datasets — the codec tier needs no separate streaming implementation), band-joined against the index (a match is only a CANDIDATE), verified by exact Hamming <= 7 over the band arrays, and streaming dropDuplicates keeps the first hit per document (state = flagged doc ids). The whole-group arrivals have no corpus twin and pass; the lone variants are recompressed-duplicate lookalikes and flag — both branches live at every sf. Pigeonhole completeness makes the count deterministic, so the face is oracle-exact against a brute-force pixel-formula replay",
      (s, dir) => {
        val mm = graft.multimodal.Multimodal
        val isNew = expr("(doc_id div 4) % 5 = 0 OR doc_id % 20 = 7")
        val d = Tables.load(s, dir, "documents")
        val index = mm.dHashBands(
            mm.withNearDupPngBlob(d.where(!isNew), "doc_id"), "doc_id")
          .selectExpr("bands as cbands", "posexplode(bands) as (b, v)")
          .dropDuplicates("b", "v", "cbands")
          .localCheckpoint(eager = false)
        val hits = mm.dHashBands(
            mm.withNearDupPngBlob(
              Tables.loadStream(s, dir, "documents").where(isNew),
              "doc_id"), "doc_id")
          .selectExpr("doc_id", "bands", "posexplode(bands) as (b, v)")
          .join(index, Seq("b", "v"))
          .where(aggregate(zip_with(col("bands"), col("cbands"),
              (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
            lit(0L), (acc, e) => acc + e) <= 7)
          .dropDuplicates("doc_id")
        val flagged = runBounded(s, hits.select(col("doc_id")),
          "t34_stream_image_neardup_mem", "append",
          statePartitions = Some(8))
        flagged.agg(count(lit(1)).as("n_flagged"))
      },
      Some("""WITH ids AS (
             |  SELECT doc_id, doc_id // 4 AS grp, doc_id % 4 AS v,
             |    (doc_id // 4) % 5 = 0 OR doc_id % 20 = 7 AS is_new
             |  FROM documents),
             |dims AS (
             |  SELECT doc_id, is_new, v,
             |    16 + grp % 8 AS w, 16 + (grp * 3) % 8 AS h,
             |    (grp * 2654435761) % 16777216 AS seed
             |  FROM ids),
             |pt AS (
             |  SELECT doc_id, is_new, v, w, h, xs.x AS x, ys.y AS y,
             |    (seed + xs.x * 7349 + ys.y * 131071) * 2654435761 AS t
             |  FROM dims
             |  CROSS JOIN range(0, 23) xs(x) CROSS JOIN range(0, 23) ys(y)
             |  WHERE xs.x < w AND ys.y < h),
             |px AS (
             |  SELECT doc_id, is_new,
             |    (9 * x + 8) // w AS i, (8 * y + 7) // h AS j,
             |    CASE WHEN x = v AND y = 3 * v
             |      THEN xor(xor(t >> 8, t >> 24) % 16777216, 16777215)
             |      ELSE xor(t >> 8, t >> 24) % 16777216 END AS p
             |  FROM pt),
             |blk AS (
             |  SELECT doc_id, is_new, i, j,
             |    CAST(sum(((p >> 16) & 255) + ((p >> 8) & 255)
             |      + (p & 255)) AS BIGINT) AS s,
             |    CAST(count(*) AS BIGINT) AS a
             |  FROM px GROUP BY 1, 2, 3, 4),
             |bnd AS (
             |  SELECT l.doc_id, l.is_new, l.j,
             |    CAST(sum(CASE WHEN l.s * r.a > r.s * l.a
             |      THEN 1 << l.i ELSE 0 END) AS BIGINT) AS band
             |  FROM blk l JOIN blk r
             |    ON l.doc_id = r.doc_id AND l.j = r.j AND r.i = l.i + 1
             |  GROUP BY 1, 2, 3),
             |hv AS (
             |  SELECT doc_id, is_new, list(band ORDER BY j) AS bands
             |  FROM bnd GROUP BY 1, 2),
             |hits AS (
             |  SELECT DISTINCT n.doc_id
             |  FROM hv n JOIN hv c ON n.is_new AND NOT c.is_new
             |  WHERE CAST(list_sum([bit_count(xor(n.bands[k], c.bands[k]))
             |                       for k in range(1, 9)]) AS BIGINT) <= 7)
             |SELECT count(*) AS n_flagged FROM hits""".stripMargin)),

    QuerySpec(
      "t35_stream_dsir",
      "the streaming face of l94's DSIR importance resampler — data SELECTION at ingest: the hashed-bigram importance table and the mean-anchored threshold are trained batch-side and driver-collected at serve start (collectDsirServeModel, the t25 codebook-at-boot discipline: <=4096 map entries + two scalars), and every arriving document decides its own fate STATELESSLY per row — bigrams hashed, importance summed in one fold, acceptance = the content-hash basis-point window vs the integer-shift rate, no join and no per-doc state; the only stream state is the O(sources)-row complete-mode admission census. Row-for-row equal to the batch acceptance (pinned in DsirSpec), so the census is oracle-exact",
      (s, dir) => {
        val serve = graft.operators.Dsir.collectDsirServeModelFrom(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          graft.operators.MixtureModelStore.sharedDsirBuckets(s, dir))
        val scored = Tables.loadStream(s, dir, "documents")
          .select(col("source"),
            graft.functions.TextFunctions.tokens(col("text")).as("t"),
            graft.functions.TextFunctions.rollingHash(col("text"))
              .as("fp"))
          .select(col("source"),
            graft.operators.Dsir.acceptLocal(serve, col("t"), col("fp"))
              .as("acc"))
        val census = scored.groupBy(col("source"))
          .agg(count(lit(1)).as("n_seen"),
            sum(col("acc")).as("n_selected"))
        runBounded(s, census, "t35_stream_dsir_mem", "complete",
          statePartitions = Some(8))
      },
      Some(s"""WITH tk AS (
              |  SELECT doc_id, string_split(trim(text), ' ') AS t
              |  FROM documents
              |  WHERE text IS NOT NULL AND trim(text) <> ''),
              |bg AS (
              |  SELECT doc_id,
              |    CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS is_t,
              |    unnest(CASE WHEN len(t) >= 2
              |      THEN [t[i] || ' ' || t[i+1] for i in range(1, len(t))]
              |      ELSE CAST([] AS VARCHAR[]) END) AS g
              |  FROM tk),
              |hb AS (
              |  SELECT doc_id, is_t,
              |    list_reduce([unicode(c) for c in
              |        regexp_split_to_array(g, '')],
              |      (a, b) -> (CAST(a AS BIGINT) * 31 + b) % 1000000007)
              |      % 4096 AS bkt
              |  FROM bg),
              |tc AS (
              |  SELECT bkt, CAST(sum(is_t) AS BIGINT) AS ct,
              |    count(*) AS cr
              |  FROM hb GROUP BY 1),
              |tot AS (
              |  SELECT CAST(sum(ct) AS BIGINT) AS nt,
              |    CAST(sum(cr) AS BIGINT) AS nr
              |  FROM tc),
              |w AS (
              |  SELECT bkt,
              |    (length(bin(nr + 4096)) - length(bin(cr + 1)))
              |      - (length(bin(nt + 4096)) - length(bin(ct + 1))) AS imp
              |  FROM tc, tot),
              |sc AS (SELECT hb.doc_id, w.imp FROM hb JOIN w USING (bkt)),
              |dd AS (SELECT doc_id, source, ${QuerySpec.fpSql} AS fp FROM documents),
              |pd AS (
              |  SELECT dd.doc_id, dd.source, dd.fp,
              |    coalesce(CAST(sum(sc.imp) AS BIGINT), 0) AS imp
              |  FROM dd LEFT JOIN sc USING (doc_id)
              |  GROUP BY 1, 2, 3),
              |th AS (
              |  SELECT CAST((CAST(sum(imp) AS BIGINT)
              |      - ((CAST(sum(imp) AS BIGINT) % count(*)) + count(*))
              |        % count(*)) // count(*) AS BIGINT) AS thr
              |  FROM pd),
              |acc AS (
              |  SELECT source, imp, (fp // 100) % 10000 AS win,
              |    CASE WHEN imp >= thr THEN 10000
              |         WHEN imp <= thr - 14 THEN 0
              |         ELSE 10000 >> CAST(thr - imp AS INT) END AS rate
              |  FROM pd, th)
              |SELECT source, count(*) AS n_seen,
              |  CAST(sum(CASE WHEN win IS NULL THEN 0
              |    WHEN win < rate THEN 1 ELSE 0 END) AS BIGINT)
              |    AS n_selected
              |FROM acc GROUP BY 1""".stripMargin)),

    QuerySpec(
      "t36_stream_mixture_admit",
      "the streaming face of l95's DoReMi reweighter — the mixture weights APPLIED at ingest as per-source admission rates (the standard proportional-sampling reading: the top-weight domain passes whole, every other domain at weight_bp/max ratio, a zero-weight domain never): rates are derived batch-side from the PUBLISHED weight ledger — the artifact a downstream consumer actually holds — and driver-collected at serve start (collectMixtureRates, the t25 codebook-at-boot discipline: O(sources) entries), and every arriving document decides its own fate STATELESSLY per row — one map-literal rate lookup, acceptance = the l67 content-hash basis-point window vs the rate, no join and no per-doc state; the only stream state is the O(sources)-row complete-mode admission census. Row-for-row equal to the batch replay (pinned in DoremiSpec), so the census is oracle-exact",
      (s, dir) => {
        val serve = graft.operators.Doremi.collectMixtureRatesFrom(
          graft.operators.MixtureModelStore.sharedJoint(s, dir),
          Tables.load(s, dir, "documents"), "source")
        val admitted = Tables.loadStream(s, dir, "documents")
          .select(col("source"),
            graft.functions.TextFunctions.rollingHash(col("text"))
              .as("fp"))
          .select(col("source"),
            graft.operators.Doremi.admitLocal(serve, col("source"),
              col("fp")).as("acc"))
        val census = admitted.groupBy(col("source"))
          .agg(count(lit(1)).as("n_seen"),
            sum(col("acc")).as("n_admitted"))
        runBounded(s, census, "t36_stream_mixture_mem", "complete",
          statePartitions = Some(8))
      },
      Some(s"""WITH tk AS (
              |  SELECT doc_id, source, string_split(trim(text), ' ') AS t
              |  FROM documents),
              |ap AS (
              |  SELECT source,
              |    CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS is_r,
              |    unnest([{'prev': t[i], 'cur': t[i+1]}
              |            for i in range(1, len(t))], recursive := true)
              |  FROM tk),
              |pc AS (
              |  SELECT prev, cur, count(*) AS pair_f,
              |    CAST(sum(is_r) AS BIGINT) AS pair_r
              |  FROM ap GROUP BY 1, 2),
              |ctx AS (
              |  SELECT prev, CAST(sum(pair_f) AS BIGINT) AS ctx_f,
              |    CAST(sum(pair_r) AS BIGINT) AS ctx_r
              |  FROM pc GROUP BY 1),
              |v AS (
              |  SELECT count(DISTINCT tok) AS v_f,
              |    count(DISTINCT CASE WHEN is_r = 1 THEN tok END) AS v_r
              |  FROM (SELECT CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END
              |          AS is_r, unnest(t) AS tok FROM tk)),
              |sb AS (
              |  SELECT ap.source, count(*) AS n_pairs,
              |    CAST(sum(length(bin(ctx.ctx_r + v.v_r))
              |      - length(bin(pc.pair_r + 1))) AS BIGINT) AS ref_bits,
              |    CAST(sum(length(bin(ctx.ctx_f + v.v_f))
              |      - length(bin(pc.pair_f + 1))) AS BIGINT) AS self_bits
              |  FROM ap
              |  JOIN pc ON ap.prev = pc.prev AND ap.cur = pc.cur
              |  JOIN ctx ON ap.prev = ctx.prev, v
              |  GROUP BY 1),
              |led AS (
              |  SELECT ds.source,
              |    coalesce(sb.n_pairs, 0) AS n_pairs,
              |    sb.ref_bits, sb.self_bits,
              |    CASE WHEN sb.n_pairs > 0 THEN
              |      (1000 * (sb.self_bits - sb.ref_bits)
              |       - ((1000 * (sb.self_bits - sb.ref_bits)) % sb.n_pairs
              |          + sb.n_pairs) % sb.n_pairs) // sb.n_pairs
              |    END AS dom_milli
              |  FROM (SELECT source, count(*) AS n_docs FROM documents
              |        GROUP BY 1) ds
              |  LEFT JOIN sb ON ds.source = sb.source),
              |an AS (
              |  SELECT CASE WHEN np > 0 THEN
              |      (1000 * (sbt - rbt) - ((1000 * (sbt - rbt)) % np + np)
              |       % np) // np
              |    ELSE 0 END AS anchor_milli
              |  FROM (SELECT CAST(sum(self_bits) AS BIGINT) AS sbt,
              |          CAST(sum(ref_bits) AS BIGINT) AS rbt,
              |          CAST(sum(n_pairs) AS BIGINT) AS np FROM led)),
              |ww AS (
              |  SELECT led.*,
              |    CASE WHEN dom_milli IS NOT NULL
              |      THEN greatest(0, dom_milli - an.anchor_milli)
              |    END AS excess_milli
              |  FROM led, an),
              |ww2 AS (
              |  SELECT *, CASE WHEN excess_milli IS NULL THEN 0
              |    ELSE (CAST(1000 AS BIGINT) + excess_milli % 1000)
              |         << CAST(least(excess_milli // 1000, 30) AS INT)
              |    END AS w_raw
              |  FROM ww),
              |tot AS (
              |  SELECT CAST(coalesce(sum(w_raw), 0) AS BIGINT) AS w_tot
              |  FROM ww2),
              |wbp AS (
              |  SELECT source,
              |    CASE WHEN w_tot > 0 THEN (10000 * w_raw) // w_tot
              |         ELSE 0 END AS weight_bp
              |  FROM ww2, tot),
              |mx AS (SELECT max(weight_bp) AS mw FROM wbp),
              |rt AS (
              |  SELECT source,
              |    CASE WHEN mw > 0 THEN (10000 * weight_bp) // mw
              |         ELSE 0 END AS rate
              |  FROM wbp, mx),
              |dd AS (SELECT source, ${QuerySpec.fpSql} AS fp
              |       FROM documents)
              |SELECT dd.source, count(*) AS n_seen,
              |  CAST(sum(CASE WHEN dd.fp IS NULL THEN 0
              |    WHEN (dd.fp // 100) % 10000 < rt.rate THEN 1 ELSE 0
              |    END) AS BIGINT) AS n_admitted
              |FROM dd JOIN rt ON dd.source = rt.source
              |GROUP BY 1""".stripMargin)),

    QuerySpec(
      "t37_stream_rho_select",
      "the streaming face of l97's RHO learnability selector — excess-loss data selection at ingest: the per-pair surprisal DIFFERENCE table (bits_proxy - bits_ref, nested prev->cur maps with context and unknown defaults) and the corpus-mean anchor are trained batch-side and driver-collected at serve start (collectRhoServeModel, the t25 codebook-at-boot discipline), and every arriving document decides its own fate STATELESSLY per row: ONE single-pass (sum,count) fold over its pairs' precomputed diffs emitting a single 0/1 scalar (the t28 interpreted-HOF discipline — no struct re-extraction, tokens materialized first), no join, no per-doc state; the only stream state is the O(sources)-row complete-mode selection census. Row-for-row equal to l97's batch threshold rel >= anchor (pinned in DoremiSpec), so the census is oracle-exact — the oracle is l97's source section verbatim",
      (s, dir) => {
        val serve = graft.operators.Doremi.collectRhoServeModelFrom(
          graft.operators.MixtureModelStore.sharedJoint(s, dir))
        val scored = Tables.loadStream(s, dir, "documents")
          .select(col("source"),
            graft.functions.TextFunctions.tokens(col("text")).as("t"))
          .select(col("source"),
            graft.operators.Doremi.selectLocal(serve, col("t")).as("acc"))
        val census = scored.groupBy(col("source"))
          .agg(count(lit(1)).as("n_seen"),
            sum(col("acc")).as("n_selected"))
        runBounded(s, census, "t37_stream_rho_mem", "complete",
          statePartitions = Some(8))
      },
      Some("""WITH tk AS (
             |  SELECT doc_id, source, string_split(trim(text), ' ') AS t
             |  FROM documents),
             |ap AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS is_r,
             |    unnest([{'prev': t[i], 'cur': t[i+1]}
             |            for i in range(1, len(t))], recursive := true)
             |  FROM tk),
             |pc AS (
             |  SELECT prev, cur, count(*) AS pair_f,
             |    CAST(sum(is_r) AS BIGINT) AS pair_r
             |  FROM ap GROUP BY 1, 2),
             |ctx AS (
             |  SELECT prev, CAST(sum(pair_f) AS BIGINT) AS ctx_f,
             |    CAST(sum(pair_r) AS BIGINT) AS ctx_r
             |  FROM pc GROUP BY 1),
             |v AS (
             |  SELECT count(DISTINCT tok) AS v_f,
             |    count(DISTINCT CASE WHEN is_r = 1 THEN tok END) AS v_r
             |  FROM (SELECT CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END
             |          AS is_r, unnest(t) AS tok FROM tk)),
             |sb AS (
             |  SELECT ap.doc_id, count(*) AS n_pairs,
             |    CAST(sum(length(bin(ctx.ctx_r + v.v_r))
             |      - length(bin(pc.pair_r + 1))) AS BIGINT) AS ref_bits,
             |    CAST(sum(length(bin(ctx.ctx_f + v.v_f))
             |      - length(bin(pc.pair_f + 1))) AS BIGINT) AS self_bits
             |  FROM ap
             |  JOIN pc ON ap.prev = pc.prev AND ap.cur = pc.cur
             |  JOIN ctx ON ap.prev = ctx.prev, v
             |  GROUP BY 1),
             |led AS (
             |  SELECT d.source, coalesce(sb.n_pairs, 0) AS n_pairs,
             |    sb.ref_bits, sb.self_bits,
             |    CASE WHEN sb.n_pairs > 0 THEN
             |      (1000 * (sb.self_bits - sb.ref_bits)
             |       - ((1000 * (sb.self_bits - sb.ref_bits)) % sb.n_pairs
             |          + sb.n_pairs) % sb.n_pairs) // sb.n_pairs
             |    END AS doc_milli
             |  FROM documents d LEFT JOIN sb ON d.doc_id = sb.doc_id),
             |an AS (
             |  SELECT CASE WHEN np > 0 THEN
             |      (1000 * (sbt - rbt) - ((1000 * (sbt - rbt)) % np + np)
             |       % np) // np
             |    ELSE 0 END AS anchor_milli
             |  FROM (SELECT CAST(sum(self_bits) AS BIGINT) AS sbt,
             |          CAST(sum(ref_bits) AS BIGINT) AS rbt,
             |          CAST(sum(n_pairs) AS BIGINT) AS np FROM led)),
             |sc AS (
             |  SELECT led.source, doc_milli - an.anchor_milli AS rel
             |  FROM led, an)
             |SELECT source, count(*) AS n_seen,
             |  CAST(sum(CASE WHEN rel >= 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_selected
             |FROM sc GROUP BY 1""".stripMargin)),

    QuerySpec(
      "t38_stream_unimax_admit",
      "the streaming face of l96's UniMax plan — the single-epoch allocation APPLIED at ingest: at epochCap=1 the plan's effective-epoch fractions (epochs_bp = 10000*alloc div capacity) ARE per-source admission rates — capped sources pass whole, level sources at alloc/capacity — so the planner's output becomes the ingest gate with no further arithmetic (only the epochCap=1 plan is realizable this way; a multi-epoch allocation needs a repeating sampler, which is why collectUnimaxRates requires it). Rates driver-collected at serve start (the t25 boot discipline, O(sources) entries) and every arriving document decides statelessly per row through the SAME Doremi.admitLocal decision t36 uses (one map-literal lookup vs the l67 content-hash basis-point window); the only stream state is the complete-mode admission census, row-for-row equal to the batch replay, oracle-exact",
      (s, dir) => {
        val serve = graft.operators.Curation.collectUnimaxRates(
          Tables.load(s, dir, "documents"), "text", "source",
          budgetBp = 9000)
        val admitted = Tables.loadStream(s, dir, "documents")
          .select(col("source"),
            graft.functions.TextFunctions.rollingHash(col("text"))
              .as("fp"))
          .select(col("source"),
            graft.operators.Doremi.admitLocal(serve, col("source"),
              col("fp")).as("acc"))
        val census = admitted.groupBy(col("source"))
          .agg(count(lit(1)).as("n_seen"),
            sum(col("acc")).as("n_admitted"))
        runBounded(s, census, "t38_stream_unimax_mem", "complete",
          statePartitions = Some(8))
      },
      Some(s"""WITH ps AS (
              |  SELECT source,
              |    CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT)
              |      AS c_toks
              |  FROM documents GROUP BY 1),
              |tot AS (
              |  SELECT (CAST(sum(c_toks) AS BIGINT) * 9000) // 10000
              |      AS budget,
              |    count(*) AS n_src
              |  FROM ps),
              |rk AS (
              |  SELECT ps.*, c_toks AS cap,
              |    row_number() OVER (ORDER BY c_toks ASC, source)
              |      AS rank,
              |    coalesce(CAST(sum(c_toks) OVER (
              |      ORDER BY c_toks ASC, source
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              |      AS BIGINT), 0) AS cap_before
              |  FROM ps),
              |fl AS (
              |  SELECT rk.*, tot.budget, tot.n_src,
              |    (cap * (tot.n_src - rank + 1) <= tot.budget - cap_before)
              |      AS capped
              |  FROM rk, tot),
              |lv AS (
              |  SELECT CASE WHEN n_src > k THEN (budget - cap_k)
              |      // (n_src - k) ELSE 0 END AS share
              |  FROM (SELECT max(n_src) AS n_src, max(budget) AS budget,
              |      CAST(coalesce(sum(CASE WHEN capped THEN 1 END), 0)
              |        AS BIGINT) AS k,
              |      CAST(coalesce(sum(CASE WHEN capped THEN cap END), 0)
              |        AS BIGINT) AS cap_k
              |    FROM fl)),
              |rt AS (
              |  SELECT source,
              |    least((10000 * (CASE WHEN capped THEN cap
              |                    ELSE lv.share END))
              |      // greatest(c_toks, 1), 10000) AS rate
              |  FROM fl, lv),
              |dd AS (SELECT source, ${QuerySpec.fpSql} AS fp
              |       FROM documents)
              |SELECT dd.source, count(*) AS n_seen,
              |  CAST(sum(CASE WHEN dd.fp IS NULL THEN 0
              |    WHEN (dd.fp // 100) % 10000 < rt.rate THEN 1 ELSE 0
              |    END) AS BIGINT) AS n_admitted
              |FROM dd JOIN rt ON dd.source = rt.source
              |GROUP BY 1""".stripMargin)),

    QuerySpec(
      "t39_stream_kl_drift",
      "the streaming face of l100's divergence census — the live 'is this source drifting off the reference mixture' monitor: the frozen reference is the pre-ingest snapshot's (l69's source%5<>0 convention) BUCKETED unigram distribution (rollingHash % 512, the l78 bucket discipline, so the standing artifact is <= 512 rows however big the corpus); the stream only COUNTS per (source, bucket) — complete-mode state = sources x buckets, bounded — and the divergence is computed from the drained state against the add-one-smoothed reference with l100's exact bitlen quantization, so the whole frame hash-matches. Bucketing trades word-level resolution for bounded state; the batch census (l100) is the word-exact companion",
      (s, dir) => {
        val b = 512L
        val docs = Tables.load(s, dir, "documents")
          .where(col("text").isNotNull && trim(col("text")) =!= "")
        val ref = docs
          .where(substring(col("source"), 4, 10).cast("int") % 5 =!= 0)
          .select(explode(graft.functions.TextFunctions.tokens(col("text")))
            .as("tok"))
          .select(pmod(graft.functions.TextFunctions.rollingHash(col("tok")),
            lit(b)).as("bkt"))
          .groupBy(col("bkt")).agg(count(lit(1)).as("c_r"))
          .localCheckpoint(eager = true)
        val counts = Tables.loadStream(s, dir, "documents")
          .where(col("text").isNotNull && trim(col("text")) =!= "")
          .select(col("source"),
            explode(graft.functions.TextFunctions.tokens(col("text")))
              .as("tok"))
          .select(col("source"),
            pmod(graft.functions.TextFunctions.rollingHash(col("tok")),
              lit(b)).as("bkt"))
          .groupBy(col("source"), col("bkt"))
          .agg(count(lit(1)).as("c_s"))
        val emitted = runBounded(s, counts, "t39_stream_kl_mem",
          "complete", statePartitions = Some(8))
        val nr = ref.agg(sum(col("c_r")).as("n_r"))
        // Per-source totals via a window over the drained O(sources x
        // buckets) state — a groupBy would self-join the memory-sink
        // view, whose attribute ids collide.
        val srcW = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))
        emitted.withColumn("n_s", sum(col("c_s")).over(srcW))
          .join(ref, Seq("bkt"), "left")
          .crossJoin(broadcast(nr))
          .select(col("source"), col("n_s"), col("c_s"),
            ((length(bin(col("c_s"))) + length(bin(col("n_r") + lit(b))))
              - (length(bin(col("n_s")))
                + length(bin(coalesce(col("c_r"), lit(0L)) + lit(1L)))))
              .cast("long").as("__qb"))
          .groupBy(col("source"), col("n_s"))
          .agg(count(lit(1)).as("n_buckets"),
            sum(col("c_s") * col("__qb")).as("kl_qbits"))
          .select(col("source"), col("n_s").as("n_tokens"),
            col("n_buckets"), col("kl_qbits"))
      },
      Some(s"""WITH tok AS (
              |  SELECT source, unnest(string_split(trim(text), ' ')) AS tok
              |  FROM documents
              |  WHERE text IS NOT NULL AND trim(text) <> ''),
              |bk AS (
              |  SELECT source,
              |    ${QuerySpec.fpSql.replace("(text", "(tok")} % 512 AS bkt
              |  FROM tok),
              |sb AS (
              |  SELECT source, bkt, count(*) AS c_s FROM bk GROUP BY 1, 2),
              |rf AS (
              |  SELECT bkt, CAST(count(*) AS BIGINT) AS c_r FROM bk
              |  WHERE CAST(source[4:] AS INT) % 5 <> 0 GROUP BY 1),
              |nr AS (
              |  SELECT CAST(coalesce(sum(c_r), 0) AS BIGINT) AS n_r FROM rf),
              |ns AS (
              |  SELECT source, CAST(sum(c_s) AS BIGINT) AS n_s
              |  FROM sb GROUP BY 1)
              |SELECT sb.source, ns.n_s AS n_tokens,
              |  count(*) AS n_buckets,
              |  CAST(sum(c_s * ((length(bin(c_s)) + length(bin(n_r + 512)))
              |    - (length(bin(n_s)) + length(bin(coalesce(c_r, 0) + 1)))))
              |    AS BIGINT) AS kl_qbits
              |FROM sb
              |LEFT JOIN rf ON sb.bkt = rf.bkt
              |JOIN ns ON sb.source = ns.source
              |CROSS JOIN nr
              |GROUP BY 1, 2""".stripMargin)),

    QuerySpec(
      "t40_stream_d4_admit",
      "the serve face of l99's diversification stage — D4 prototype pruning as an INGEST decision: the standing artifact is <= nClusters centroids plus <= nClusters per-cluster admission BARS (the (proto_cos, doc_id) of the quota-th most-prototypical row, `prototypeThresholds`); arriving vectors are argmax-assigned against the boot-collected centroid literals (bit-identical cosine fold, the t22 codebook-at-boot discipline), bar-compared per row — stateless — into a complete-mode per-cluster (n_seen, n_core) census. Gate: the drained census EQUALS the batch flags' census exactly (same frozen artifacts, same IEEE folds, (cos,-id)>=bar is rank<=quota for a fixed row set — equality, not agreement-%); oracle = exact vector count + literal true",
      (s, dir) => {
        val sim = graft.operators.Similarity
        val e = Tables.load(s, dir, "embeddings")
        // The one shared build (training means are shuffled doubles —
        // materialize once, every consumer reads the same floats).
        val cents = sim.trainCentroids(e, "vec_id", "embedding",
          nClusters = 8, trainIters = 1).localCheckpoint(eager = true)
        val scored = sim.prototypeScore(e, "vec_id", "embedding", cents)
          .localCheckpoint(eager = true)
        val thr = sim.prototypeThresholds(scored, pruneBp = 2500L)
          .localCheckpoint(eager = true)
        def core(cos: org.apache.spark.sql.Column,
            id: org.apache.spark.sql.Column) =
          col("thr_cos").isNotNull &&
            (struct(cos.as("a"), (-id).as("b")) >=
              struct(col("thr_cos").as("a"), (-col("thr_id")).as("b")))
        val batch = scored.join(broadcast(thr), Seq("cent_id"), "left")
          .groupBy(col("cent_id"))
          .agg(count(lit(1)).as("n_b"),
            count(when(core(col("proto_cos"), col("doc_id")), 1)).as("c_b"))
        val centsLocal = cents.collect()
          .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq)
          .sortBy(_._1).toSeq
        val decisions = Tables.loadStream(s, dir, "embeddings")
          .select(col("vec_id"),
            sim.prototypeAssignLocal(centsLocal, col("embedding")).as("__a"))
          .select(col("vec_id"), col("__a.cent_id").as("cent_id"),
            (-col("__a.nc")).as("proto_cos"))
          .join(broadcast(thr), Seq("cent_id"), "left")
          .groupBy(col("cent_id"))
          .agg(count(lit(1)).as("n_s"),
            count(when(core(col("proto_cos"), col("vec_id")), 1)).as("c_s"))
        val emitted = runBounded(s, decisions, "t40_stream_d4_mem",
          "complete", statePartitions = Some(8))
        emitted.join(batch, Seq("cent_id"), "full_outer")
          .agg(sum(col("n_s")).as("n_vecs"),
            every(col("n_s").isNotNull && col("n_b").isNotNull &&
              col("n_s") === col("n_b") && col("c_s") === col("c_b"))
              .as("census_match"))
      },
      Some("SELECT count(*) AS n_vecs, TRUE AS census_match FROM embeddings")),

    QuerySpec(
      "t41_stream_pca_whiten",
      "the serve face of l101 — PCA whitening applied at INGEST: the model (64 means + 16x64 whitened axes, fitted once batch-side by the one-pass treeAggregate + driver Jacobi) is baked into the stream plan as broadcast literals, every arriving vector projected by per-row folds (stateless — `projectExpr` contains no window or aggregation by construction) into a whitened-energy band census (floor of the squared norm, ~chi-square(16) so a handful of bands); complete-mode state = one row per band. Gate: drained census EQUALS the batch census on the same rows (identical literals, identical IEEE folds); oracle = exact vector count + literal true",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val model = graft.operators.Pca.fit(e, "embedding")
        def band: org.apache.spark.sql.Column =
          floor(aggregate(
            graft.operators.Pca.projectExpr(model, col("embedding"), 16,
              whiten = true),
            lit(0.0), (acc, x) => acc + x * x))
        val batch = e.select(band.as("band"))
          .groupBy(col("band")).agg(count(lit(1)).as("n_b"))
        val census = Tables.loadStream(s, dir, "embeddings")
          .select(band.as("band"))
          .groupBy(col("band")).agg(count(lit(1)).as("n_s"))
        val emitted = runBounded(s, census, "t41_stream_pca_mem",
          "complete", statePartitions = Some(8))
        emitted.join(batch, Seq("band"), "full_outer")
          .agg(sum(col("n_s")).as("n_vecs"),
            every(col("n_s").isNotNull && col("n_b").isNotNull &&
              col("n_s") === col("n_b")).as("census_match"))
      },
      Some("SELECT count(*) AS n_vecs, TRUE AS census_match FROM embeddings")),

    QuerySpec(
      "t42_stream_semantic_decontam",
      "l103's semantic decontamination at INGEST — the benchmark-proximity gate a streaming corpus build runs on every arriving embedding: the eval slice (vec_id%25=0) is collected ONCE at serve start (eval benches are boot-artifact-sized — the t25/t22 codebook-at-boot discipline) and baked in as literals; each arriving corpus vector counts its eval neighbors at cos >= 0.4 by a per-row HOF filter over the literal vectors (stateless, the same sequential cosine fold as the batch side); the only state is the one-row complete-mode census (n_corpus, n_flagged, n_hits). Fully HASH-exact — the oracle replays the census from SQL, no batch-agreement indirection needed",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val evalVecs: Seq[Seq[Float]] = e.where(col("vec_id") % 25 === 0)
          .select(col("embedding")).collect()
          .map(_.getSeq[Float](0).toSeq).toSeq
        val hits = size(filter(typedLit(evalVecs), q =>
          graft.functions.VectorFunctions.cosineSim(col("embedding"), q)
            >= 0.4))
        val census = Tables.loadStream(s, dir, "embeddings")
          .where(col("vec_id") % 25 =!= 0)
          .select(hits.as("__h"))
          .agg(count(lit(1)).as("n_corpus"),
            count(when(col("__h") > 0, 1)).as("n_flagged"),
            sum(col("__h")).cast("long").as("n_hits"))
        runBounded(s, census, "t42_stream_decontam_mem", "complete",
          statePartitions = Some(8))
      },
      Some(s"""WITH q AS (
              |  SELECT embedding AS q_emb FROM embeddings
              |  WHERE vec_id % 25 = 0),
              |c AS (
              |  SELECT vec_id AS doc_id, embedding AS c_emb
              |  FROM embeddings WHERE vec_id % 25 <> 0),
              |h AS (
              |  SELECT doc_id, count(*) AS nh
              |  FROM c JOIN q ON TRUE
              |  WHERE ${cosEvalSql("c_emb", "q_emb")} >= 0.4
              |  GROUP BY 1)
              |SELECT (SELECT count(*) FROM c) AS n_corpus,
              |  count(*) AS n_flagged,
              |  CAST(coalesce(sum(nh), 0) AS BIGINT) AS n_hits
              |FROM h""".stripMargin)),

    QuerySpec(
      "t44_stream_k_anonymity",
      "l102's k-anonymity census as a LIVE release-risk monitor — the privacy number that must hold continuously while a corpus ingests, not just at release time: the stream accumulates the (lang, source, token-length band) equivalence-class census in complete mode (state = one row per class — the t39 count-only discipline; class sizes only ever grow at ingest, so below-k mass shrinking to zero is the release-readiness signal), and the drained state reduces to the same (n_classes, below-k, min/max) summary as the batch census. Fully hash-exact against l102's oracle",
      (s, dir) => {
        // null/empty guard matching l102 (legacy sizeOfNull is -1 in
        // Spark where the oracle bands NULL — filter on both engines)
        val g = Tables.loadStream(s, dir, "documents")
          .where(col("text").isNotNull && trim(col("text")) =!= "")
          .groupBy(col("lang"), col("source"),
            floor(size(split(trim(col("text")), " ")) / 32).as("len_band"))
          .agg(count(lit(1)).as("k"))
        val emitted = runBounded(s, g, "t44_stream_kanon_mem",
          "complete", statePartitions = Some(8))
        emitted.agg(count(lit(1)).as("n_classes"),
          sum(when(col("k") < 5, 1L).otherwise(0L)).as("classes_below_k"),
          sum(when(col("k") < 5, col("k")).otherwise(0L)).as("docs_below_k"),
          min(col("k")).as("min_class"),
          max(col("k")).as("max_class"))
      },
      Some("""WITH g AS (
             |  SELECT lang, source,
             |    CAST(floor(len(string_split(trim(text), ' ')) / 32)
             |      AS BIGINT) AS len_band,
             |    count(*) AS k
             |  FROM documents
             |  WHERE text IS NOT NULL AND trim(text) <> ''
             |  GROUP BY 1, 2, 3)
             |SELECT count(*) AS n_classes,
             |  CAST(sum(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS classes_below_k,
             |  CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
             |    AS docs_below_k,
             |  min(k) AS min_class, max(k) AS max_class
             |FROM g""".stripMargin)),

    QuerySpec(
      "t45_stream_audio_census",
      "the streaming ingest face of l111's REAL WAV quarantine codec — audio media health monitored live, corrupt files counted, never fatal (the t30 discipline on the audio tier): the poisoned WAV blob stream decodes through the same batched quarantine tier (mapPartitions is a stateless narrow transform, streaming-legal) and a complete-mode per-(format, sample_rate) census accumulates — item count, exact sample mass and the max observed peak amplitude, with the 'corrupt' bucket's audio columns NULL; the oracle replays the synthesis formulas and poison predicate, so the hash only matches if the in-JDK codec round-trips exactly on a live stream too",
      (s, dir) => {
        val M = graft.multimodal.Multimodal
        val census = M.decodeAudioQuarantine(
            M.corruptBlobs(
              M.withWavBlob(
                Tables.loadStream(s, dir, "documents")
                  .select(col("doc_id")), "doc_id"),
              "doc_id", modulo = 13),
            "doc_id")
          .groupBy(col("format"), col("sample_rate"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("n_samples")).cast("long").as("samples_sum"),
            max(col("peak_amp")).cast("long").as("peak_max"))
        runBounded(s, census, "t45_stream_audio_mem", "complete",
          statePartitions = Some(4))
      },
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 13 = 0 THEN 'corrupt'
             |      ELSE 'wave' END AS format,
             |    CASE WHEN doc_id % 13 = 0 THEN NULL
             |      ELSE CAST(8000 + (doc_id % 4) * 4000 AS INT)
             |      END AS sample_rate,
             |    CASE WHEN doc_id % 13 = 0 THEN NULL
             |      ELSE 40 + doc_id % 60 END AS n,
             |    CASE WHEN doc_id % 13 = 0 THEN NULL
             |      ELSE 1000 + (doc_id * 7) % 9000 END AS p
             |  FROM documents)
             |SELECT format, sample_rate, count(*) AS n_items,
             |  CAST(sum(n) AS BIGINT) AS samples_sum,
             |  CAST(max(p) AS BIGINT) AS peak_max
             |FROM m GROUP BY 1, 2""".stripMargin)),

    QuerySpec(
      "t46_stream_deflate",
      "the streaming ingest face of l114's compressibility funnel — the template-spam alarm live at ingest (a crawl suddenly dominated by one boilerplate family moves the low-ratio bands before any token heuristic reacts): the document stream runs through the same batched one-Deflater-per-batch codec (stateless narrow transform, streaming-legal) and a complete-mode per-ratio-decile census accumulates (state = one row per band). Deflate bytes are not SQL-replayable (the l114 contract), so the oracle-checkable gate is EXACT AGREEMENT with the batch census over the same corpus — band-for-band identical doc counts and byte masses (deflate at a fixed level is a pure function of the input bytes, so stream and batch must agree bit-for-bit) — plus the SQL-exact total doc count",
      (s, dir) => {
        val TA = graft.operators.TextAnalysis
        // band coalesced to a -1 sentinel (ratio_bp >= 0, so no real
        // band collides): the NULL band (empty/NULL-text docs) must
        // MATCH ITSELF across the stream/batch equi-join below — a
        // nullable join key would leave both sides unmatched and fail
        // the gate even when the censuses agree
        def census(pd: org.apache.spark.sql.DataFrame) = pd
          .groupBy(coalesce((col("ratio_bp") / 1000).cast("long"),
            lit(-1L)).as("band"))
          .agg(count(lit(1)).as("n_docs"), sum(col("len_in")).as("b_in"))
        val batch = census(TA.deflateRatio(
            Tables.load(s, dir, "documents"), "doc_id", "text"))
          .localCheckpoint(eager = true)
        val streamed = runBounded(s,
          census(TA.deflateRatio(
            Tables.loadStream(s, dir, "documents"), "doc_id", "text")),
          "t46_stream_deflate_mem", "complete", statePartitions = Some(4))
        val st = streamed.select(col("band"),
          col("n_docs").as("__sn"), col("b_in").as("__sb"))
        val bt = batch.select(col("band"),
          col("n_docs").as("__bn"), col("b_in").as("__bb"))
        // coalesce(false): a band present on only ONE side must fail
        // the gate, not vanish into every()'s null-skipping
        st.join(bt, Seq("band"), "full_outer")
          .agg(sum(col("__sn")).as("n_docs"),
            every(coalesce(col("__sn") === col("__bn") &&
                col("__sb") === col("__bb"), lit(false)))
              .as("stream_eq_batch_ok"))
      },
      Some("""SELECT count(*) AS n_docs, TRUE AS stream_eq_batch_ok
             |FROM documents""".stripMargin)),

    QuerySpec(
      "t47_stream_video_census",
      "the streaming ingest face of l119's REAL MJPEG video tier — container health live at ingest (the t30/t45 discipline on the video rung): the poisoned AVI stream demuxes + frame-decodes through the same batched quarantine tier (stateless narrow transform) and a complete-mode per-format census accumulates — item count, exact frame mass and pixel-dimension mass, the corrupt bucket's video columns NULL; the oracle replays the synthesis formulas and poison predicate, so the hash only matches if demux, frame decode and the container-consistency cross-check behave identically on a live stream",
      (s, dir) => {
        val M = graft.multimodal.Multimodal
        val census = M.decodeVideoQuarantine(
            M.corruptBlobs(
              M.withAviBlob(
                Tables.loadStream(s, dir, "documents")
                  .select(col("doc_id")), "doc_id"),
              "doc_id", modulo = 17),
            "doc_id")
          .groupBy(col("format"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("n_frames")).cast("long").as("frames_sum"),
            sum(col("width")).cast("long").as("w_sum"),
            sum(col("height")).cast("long").as("h_sum"))
        runBounded(s, census, "t47_stream_video_mem", "complete",
          statePartitions = Some(4))
      },
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 17 = 0 THEN 'corrupt'
             |      ELSE 'mjpeg' END AS format,
             |    CASE WHEN doc_id % 17 = 0 THEN NULL
             |      ELSE 2 + doc_id % 4 END AS nf,
             |    CASE WHEN doc_id % 17 = 0 THEN NULL
             |      ELSE 8 + doc_id % 16 END AS w,
             |    CASE WHEN doc_id % 17 = 0 THEN NULL
             |      ELSE 8 + (doc_id * 3) % 16 END AS h
             |  FROM documents)
             |SELECT format, count(*) AS n_items,
             |  CAST(sum(nf) AS BIGINT) AS frames_sum,
             |  CAST(sum(w) AS BIGINT) AS w_sum,
             |  CAST(sum(h) AS BIGINT) AS h_sum
             |FROM m GROUP BY 1""".stripMargin)),

    QuerySpec(
      "t48_stream_dict_deflate",
      "the streaming ingest face of l126's dictionary-deflate family signal — the template-spam alarm with the source's preset dictionary live at ingest (a crawl suddenly dominated by one source's boilerplate moves the high-gain bands before any token heuristic): the document stream runs through the same batched dictionary codec (the per-source dictionaries are the batch-trained BOOT artifact, broadcast; the transform is stateless and narrow, streaming-legal) and a complete-mode per-gain-band census accumulates. Deflate bytes are not SQL-replayable (the l114 contract), so the oracle-checkable gate is EXACT AGREEMENT with the batch census over the same corpus — band-for-band identical doc counts, input byte masses and dictionary output masses (the codec is a pure function of input bytes + dictionary, so stream and batch must agree bit-for-bit) — plus the SQL-exact total doc count",
      (s, dir) => {
        val TA = graft.operators.TextAnalysis
        val dicts = graft.operators.DeflateDictStore.sharedDicts(s, dir)
        // NULL band (empty/NULL text) coalesced to a sentinel below
        // every real band (gain bands can be negative, so -1 would
        // collide): both sides must match it, not drop it (t46's
        // nullable-join-key lesson)
        def census(pd: org.apache.spark.sql.DataFrame) = pd
          .groupBy(coalesce(floor(col("dict_gain_bp") / 1000),
            lit(-1000L)).as("band"))
          .agg(count(lit(1)).as("n_docs"), sum(col("len_in")).as("b_in"),
            sum(col("len_out_dict")).as("b_dict"))
        val batch = census(TA.deflateDictRatio(
            Tables.load(s, dir, "documents"), "doc_id", "text", "source",
            dicts))
          .localCheckpoint(eager = true)
        val streamed = runBounded(s,
          census(TA.deflateDictRatio(
            Tables.loadStream(s, dir, "documents"), "doc_id", "text",
            "source", dicts)),
          "t48_stream_dict_deflate_mem", "complete",
          statePartitions = Some(4))
        val st = streamed.select(col("band"), col("n_docs").as("__sn"),
          col("b_in").as("__sb"), col("b_dict").as("__sd"))
        val bt = batch.select(col("band"), col("n_docs").as("__bn"),
          col("b_in").as("__bb"), col("b_dict").as("__bd"))
        // coalesce(false): a band present on only ONE side must fail
        // the gate, not vanish into every()'s null-skipping
        st.join(bt, Seq("band"), "full_outer")
          .agg(sum(col("__sn")).as("n_docs"),
            every(coalesce(col("__sn") === col("__bn") &&
                col("__sb") === col("__bb") &&
                col("__sd") === col("__bd"), lit(false)))
              .as("stream_eq_batch_ok"))
      },
      Some("""SELECT count(*) AS n_docs, TRUE AS stream_eq_batch_ok
             |FROM documents""".stripMargin)),

    QuerySpec(
      "t49_stream_dup_span_admission",
      "the streaming ingest face of the substring-dedup tier (l77/l124's standing side live at admission): the corpus's hot 6-gram table — every gram in >=2 documents, with its document frequency — is the STANDING batch artifact (one checkpointed prune, the l77 shape); the incoming document stream explodes its positional 6-grams (stateless narrow) and stream-static inner-joins the standing table, accumulating a complete-mode census per df-band (df clamped at 10; state = <=9 rows) of hit count and df mass — a crawl suddenly dominated by one boilerplate family moves the high-df bands immediately, before any whole-doc dedup pass runs. Exact and SQL-replayable: the oracle replays the prune, the join and the band arithmetic (no distinct aggregates on the stream — count and sum only, the streaming-legal pair)",
      (s, dir) => {
        val grams = (df: org.apache.spark.sql.DataFrame) => df
          .where(col("text").isNotNull && trim(col("text")) =!= "")
          .select(col("doc_id"), split(trim(col("text")), " ").as("t"))
          .where(size(col("t")) >= 6)
          .select(col("doc_id"),
            explode(transform(sequence(lit(0), size(col("t")) - 6),
              i => concat_ws(" ", slice(col("t"), i + 1, lit(6)))))
              .as("g"))
        // the standing artifact comes from the app-scoped store — reps
        // reuse one checkpointed table instead of re-aggregating
        val hot = graft.operators.DupSpanStore.sharedHotGrams(s, dir)
        val census = grams(Tables.loadStream(s, dir, "documents"))
          .join(hot, "g")
          .groupBy(least(col("nd"), lit(10L)).as("df_band"))
          .agg(count(lit(1)).as("n_hits"),
            sum(col("nd")).as("df_mass"))
        runBounded(s, census, "t49_stream_dup_admission_mem", "complete",
          statePartitions = Some(4))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split(trim(text), ' ') AS t
             |  FROM documents
             |  WHERE text IS NOT NULL AND trim(text) <> ''),
             |e AS (
             |  SELECT doc_id, array_to_string(t[i:i+5], ' ') AS g
             |  FROM toks, unnest(range(1, len(t) - 4)) AS ui(i)
             |  WHERE len(t) >= 6),
             |hot AS (
             |  SELECT g, count(DISTINCT doc_id) AS nd FROM e GROUP BY g
             |  HAVING count(DISTINCT doc_id) >= 2)
             |SELECT least(hot.nd, 10) AS df_band,
             |  count(*) AS n_hits,
             |  CAST(sum(hot.nd) AS BIGINT) AS df_mass
             |FROM e JOIN hot USING (g)
             |GROUP BY 1""".stripMargin)),

    QuerySpec(
      "t50_stream_cold_boot_serve",
      "COLD-BOOT streaming serve from the DURABLE store — the production stream-server restart t22 cannot prove (t22 boots from in-memory stores seeded by batch siblings): every in-memory ANN artifact is evicted and the registered tables dropped (the l122 fresh-application simulation), the server then boots EXCLUSIVELY from the durable layout — reload the five index tables (catalog DDL + footer reads), re-seed the store, collect the tiny serve meta (the codebook-file-at-boot cost, paid by this query and ledgered under ann_serve) — and answers the query-vector stream top-10 with stream-static joins against the reloaded tables. Gates, in-query and hash-enforced: the reload accrued ZERO durable build seconds AND zero ann_index TRAINING seconds across the entire boot+serve (the restart ran no training job — the durable tier's whole point), and the drained stream answer agrees >= 90% with the batch ranking over the same reloaded index (t22's agreement contract). Oracle = t22's top-k-completeness count + literal true gates",
      (s, dir) => {
        val S = graft.operators.Similarity
        val st = graft.operators.AnnIndexStore
        val ds = graft.operators.DurableStore
        val e = Tables.load(s, dir, "embeddings")
        val fp = st.corpusFp(s, dir)
        st.durableIndex(s, dir, fp)
        // fresh-application simulation: EVERYTHING in-memory goes —
        // unlike l123's scoped evict, the cold boot pays its own
        // serve-meta collect (that is the restart being modeled)
        st.evictAll()
        ds.dropRegistered(s, st.DurableFamily, fp, st.DurableParts)
        val beforeDurable = ds.buildSeconds(st.DurableFamily)
        val beforeTrain = graft.operators.StoreBuildLedger.snapshot
          .getOrElse("ann_index", 0.0)
        val idx = st.durableIndex(s, dir, fp)
        st.seedIndex(s, dir, idx)
        // boot: collect the tiny artifacts from the reloaded tables
        // (ann_serve ledger — the one cost a restart legitimately pays)
        val (meta, codesArr) = st.sharedServe(s, dir)
        val served = graft.streaming.StreamingOps.annTopKState(
          S.annServeScore(
            Tables.loadStream(s, dir, "embeddings")
              .where(col("vec_id") % 25 === 0),
            "vec_id", "embedding", meta, idx.lists, codesArr, idx.norms,
            nProbe = 6),
          k = 10)
        val qB = e.where(col("vec_id") % 25 === 0)
        // the batch agreement arm reads only the reloaded tables and
        // the collected meta — independent of the stream drain, so it
        // materializes concurrently with the engine spin (guide §2.6);
        // it touches no build ledger (cbLocalOpt skips the collect),
        // so the zero-build/zero-training gates below are unaffected
        val batchTopF = scala.concurrent.Future {
          S.pqTopKFromIndex(qB, e, "vec_id", "embedding",
              k = 10, m = graft.operators.AnnIndexStore.DefaultM,
              codebook = idx.codebook, codes = idx.codes,
              norms = idx.norms,
              candidates = S.indexCandidates(qB, "vec_id", "embedding",
                idx.centroids, idx.lists, nProbe = 6),
              rerank = 0,
              // the boot already collected the serve meta from the
              // reloaded tables (ledgered under ann_serve) — the batch
              // arm reuses it instead of re-collecting (r17)
              cbLocalOpt = Some(meta.cb))
            .select(col("q_id"), col("c_id"), lit(1).as("__b"))
            .localCheckpoint(eager = true)
        }(scala.concurrent.ExecutionContext.global)
        val emitted = runBounded(s, served, "t50_stream_cold_boot_mem",
          "update", statePartitions = Some(8))
        val batchTop = scala.concurrent.Await.result(batchTopF,
          scala.concurrent.duration.Duration.Inf)
        val buildFree =
          ds.buildSeconds(st.DurableFamily) == beforeDurable
        val trainFree = graft.operators.StoreBuildLedger.snapshot
          .getOrElse("ann_index", 0.0) == beforeTrain
        val streamTop = emitted.groupBy(col("q_id"))
          .agg(max_by(col("topk"), col("n_seen")).as("topk"))
          .select(col("q_id"), explode(col("topk")).as("p"))
          .select(col("q_id"), col("p._2").as("c_id"), lit(1).as("__s"))
        streamTop.join(batchTop, Seq("q_id", "c_id"), "full_outer")
          .agg(count(col("__b")).as("n_topk"),
            count(when(col("__b").isNotNull && col("__s").isNotNull, 1))
              .as("__hit"))
          .select(col("n_topk"),
            (col("__hit") * 100 >= col("n_topk") * 90).as("stream_ok"),
            lit(buildFree).as("cold_boot_build_free_ok"),
            lit(trainFree).as("cold_boot_train_free_ok"))
      },
      Some("""SELECT 10 * count(*) AS n_topk, TRUE AS stream_ok,
             |  TRUE AS cold_boot_build_free_ok,
             |  TRUE AS cold_boot_train_free_ok
             |FROM embeddings WHERE vec_id % 25 = 0""".stripMargin)),

    QuerySpec(
      "t51_stream_index_ingest",
      "the streaming INGEST loop of the standing vector index — the production face l82/l131 batch-append and t22/t50 serve leave open: vectors ARRIVE as a stream and are indexed continuously (readStream -> foreachBatch -> assignEncode each micro-batch against the FROZEN centroids/codebook -> append the three artifact slices to parquet state tables, the t13 CDC deployment shape with append instead of upsert — assignment and encoding are per-row functions, so batch boundaries cannot change the result). Zero training jobs anywhere in the loop: the frozen artifacts are the shared AnnIndexStore build (durable-reloaded on warm machines). Gate, hash-enforced: the drained state tables are multiset-equal (all columns + per-row multiplicity, floats bitwise — the l82 compare) to a single batch assignEncode over the whole corpus, across lists, codes AND norms, and every streamed vector is indexed. Oracle = deterministic count + literal true",
      (s, dir) => {
        val S = graft.operators.Similarity
        val idx = graft.operators.AnnIndexStore.sharedIndex(s, dir)
        val out = java.nio.file.Files
          .createTempDirectory("graft_ingest_").toString
        val ingestBatch: (org.apache.spark.sql.DataFrame, Long) => Unit =
          (batch, _) => {
            val (l, c, n) = S.assignEncode(idx.centroids, idx.codebook,
              batch, "vec_id", "embedding",
              m = graft.operators.AnnIndexStore.DefaultM)
            l.write.mode("append").parquet(s"$out/lists")
            c.write.mode("append").parquet(s"$out/codes")
            n.write.mode("append").parquet(s"$out/norms")
          }
        val q = Tables.loadStream(s, dir, "embeddings")
          .writeStream
          .foreachBatch(ingestBatch)
          .option("checkpointLocation", s"$out/_ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        q.stop()
        val e = Tables.load(s, dir, "embeddings")
        val (lR, cR, nR) = S.assignEncode(idx.centroids, idx.codebook,
          e, "vec_id", "embedding",
          m = graft.operators.AnnIndexStore.DefaultM)
        val res = e.agg(count(lit(1)).as("n_streamed"))
          .crossJoin(broadcast(s.read.parquet(s"$out/lists")
            .agg(count(lit(1)).as("n_indexed"))))
          .crossJoin(broadcast(mismatches(
            s.read.parquet(s"$out/lists"), lR, "__ml")))
          .crossJoin(broadcast(mismatches(
            s.read.parquet(s"$out/codes"), cR, "__mc")))
          .crossJoin(broadcast(mismatches(
            s.read.parquet(s"$out/norms"), nR, "__mn")))
          .select(col("n_streamed"), col("n_indexed"),
            (col("__ml") === 0 && col("__mc") === 0 &&
              col("__mn") === 0 &&
              col("n_indexed") === col("n_streamed")).as("ingest_ok"))
          .localCheckpoint(eager = true) // state dir is deleted below
        graft.pipeline.SinkFiles.deleteRecursive(out)
        res
      },
      Some("""SELECT count(*) AS n_streamed, count(*) AS n_indexed,
             |  TRUE AS ingest_ok
             |FROM embeddings""".stripMargin)),

    QuerySpec(
      "t52_stream_ingest_republish",
      "the ingest loop COMPOSED with the durable tier — the production cycle t51 (scratch state tables that die with the query) and t50 (cold boot of a batch-published layout) each prove half of: vectors ARRIVE as a stream, each micro-batch is assigned + PQ-encoded against the FROZEN base artifacts and lands as ONE immutable manifest SEGMENT recorded in the DURABLE batch ledger keyed by (runId, batchId) (foreachBatch is at-least-once along two axes — a same-run retry re-invokes under the SAME id, and a driver restart from checkpoint replays the last uncommitted batch into a fresh JVM — and writeBatchSegmentOnce makes both replays idempotent: one create-if-absent ledger file per batch, the kill-and-restart face proven end-to-end by t53; the O(delta)-write shape — writeSegment per batch, no training, no rename), and on drain the accumulated state is REPUBLISHED as a first-class durable fingerprint: one create-if-absent manifest naming base segments + the streamed segments. A cold boot then serves the UNION corpus exclusively from the published layout (marker + parquet-footer reads, serve-meta collect ledgered under ann_ingest_serve) answering the query-vector stream with >= 90% agreement against a frozen-model batch rebuild. The query opens with vacuum(keep = base) — prior runs' union generation and its streamed segments are swept while the standing base survives, exercising manifest-aware retention on a live family. Gates, in-query and hash-enforced: (1) the published union lists/codes/norms are multiset-equal to a frozen-artifact batch rebuild over the whole corpus and every base or streamed vector is indexed; (2) ZERO training seconds across ingest + publish + boot + serve (the deployment's durable build key and ann_index frozen after the base build); (3) O(delta) write — the published manifest is exactly base segments ++ the streamed segments and the base segment's files are byte-untouched; (4) the publish itself succeeded (create-if-absent won). Oracle = deterministic counts + literal true",
      (s, dir) => {
        val S = graft.operators.Similarity
        val ds = graft.operators.DurableStore
        val st = graft.operators.AnnIndexStore
        val parts = st.DurableParts
        val e = Tables.load(s, dir, "embeddings")
        val base = e.where(col("vec_id") % 5 =!= 0)
        val baseFp = ds.frameFingerprint(base, Seq("vec_id", "embedding"))
        val newFp = ds.frameFingerprint(e, Seq("vec_id", "embedding"))
        // the ingest deployment's family is scoped to its BASE corpus
        // generation (a production loop is scoped to its dataset): the
        // keep-set below names only THIS corpus's base, so an
        // unscoped shared family would thrash other corpora's standing
        // bases (verify at sf0.01 and bench at sf0.1 alternate over
        // one store root — each would sweep and re-train the other's)
        val fam = s"ann_ingest_$baseFp"
        // retention first: sweep prior runs' union generation (and its
        // now-unreferenced streamed segments) — the standing base
        // layout survives, so only the first run ever trains
        ds.vacuum(s, fam, keep = Set(baseFp))
        // the standing base: one-time training build per base-corpus
        // lifetime, a single-segment manifest (ledgered durable_<fam>)
        val baseT = ds.loadOrBuildManifest(s, fam, baseFp, parts) {
          val idx = S.buildAnnIndex(base, "vec_id", "embedding",
            st.DefaultNCentroids, st.DefaultTrainIters, st.DefaultM,
            st.DefaultNCodes, st.DefaultPqTrainIters)
          Seq(ds.writeSegment(s, fam, parts, Map(
            "cent" -> idx.centroids, "lists" -> idx.lists,
            "codebook" -> idx.codebook, "codes" -> idx.codes,
            "norms" -> idx.norms)))
        }
        val cent = baseT("cent").localCheckpoint(eager = true)
        val cb = baseT("codebook").localCheckpoint(eager = true)
        val segsBase = ds.manifestSegments(s, fam, baseFp)
        val statsBefore = Gates.manifestStats(s, fam, baseFp)
        // zero-training watermark AFTER the base build: nothing past
        // this line may train (writeSegment/publishManifest/
        // manifestTables never touch the build ledger)
        def trainSecs(): Double = ds.buildSeconds(fam) +
          graft.operators.StoreBuildLedger.snapshot
            .getOrElse("ann_index", 0.0)
        val trainBefore = trainSecs()
        // the EQUIVALENCE BASE (frozen-model batch rebuild over the
        // union + its top-k) depends only on the standing base
        // artifacts checkpointed above — not on the ingest, publish or
        // serve — so it materializes CONCURRENTLY with all three from
        // a driver future (guide §2.6), its jobs back-filling the
        // engine spins' idle capacity. assignEncode/indexCandidates/
        // pqTopKFromIndex write no build ledger, so the zero-training
        // gate is unaffected.
        val rebuildF = scala.concurrent.Future {
          val (lR0, cR0, nR0) = S.assignEncode(cent, cb, e,
            "vec_id", "embedding", m = st.DefaultM)
          val lR = lR0.localCheckpoint(eager = true)
          val cR = cR0.localCheckpoint(eager = true)
          val nR = nR0.localCheckpoint(eager = true)
          val qB = e.where(col("vec_id") % 25 === 0)
          val batchTop = S.pqTopKFromIndex(qB, e, "vec_id", "embedding",
              k = 10, m = st.DefaultM, codebook = cb, codes = cR,
              norms = nR,
              candidates = S.indexCandidates(qB, "vec_id", "embedding",
                cent, lR, nProbe = 6),
              rerank = 0)
            .select(col("q_id"), col("c_id"), lit(1).as("__b"))
            .localCheckpoint(eager = true)
          (lR, cR, nR, batchTop)
        }(scala.concurrent.ExecutionContext.global)
        // INGEST: the delta arrives as a stream; each micro-batch is
        // per-row encoded against the frozen artifacts and lands as
        // one immutable segment (the t13 CDC shape, durable form)
        val out = java.nio.file.Files
          .createTempDirectory("graft_ingest2_").toString
        // keyed by (runId, batchId) through the DURABLE batch ledger:
        // foreachBatch is at-least-once along TWO axes — a same-run
        // retry re-invokes under the same id in this JVM, and a driver
        // RESTART from checkpoint replays the last uncommitted batch
        // into a fresh JVM with empty memory. writeBatchSegmentOnce
        // covers both: the first attempt writes the segment and
        // records it with one create-if-absent ledger file; every
        // re-invocation returns the recorded segment without writing
        // (t53 proves the kill-and-restart face end to end). The runId
        // is the checkpoint's identity, so only attempts of THIS run
        // dedup against each other.
        val runId = "r" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(out))
        val ingestBatch: (org.apache.spark.sql.DataFrame, Long) => Unit =
          (batch, batchId) => {
            ds.writeBatchSegmentOnce(s, fam, runId, batchId, parts) {
              val (l, c, n) = S.assignEncode(cent, cb, batch,
                "vec_id", "embedding", m = st.DefaultM)
              Map("lists" -> l, "codes" -> c, "norms" -> n)
            }
            ()
          }
        val q = Tables.loadStream(s, dir, "embeddings")
          .where(col("vec_id") % 5 === 0)
          .writeStream
          .foreachBatch(ingestBatch)
          .option("checkpointLocation", s"$out/_ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        q.stop()
        // REPUBLISH: the drained state becomes a first-class durable
        // generation — one marker, zero data movement; the segment
        // list comes from the DURABLE ledger in batchId order (the
        // stream's arrival order), exactly what a restarted driver
        // would do — process memory holds nothing the publish needs
        val segsStreamed = ds.batchSegments(s, fam, runId).map(_._2)
        val published = ds.publishManifest(s, fam, newFp,
          segsBase ++ segsStreamed)
        // O(delta)-write gate: exactly base ++ streamed segments, base
        // bytes untouched
        val segsNew = ds.manifestSegments(s, fam, newFp)
        val odeltaOk = published && segsStreamed.nonEmpty &&
          segsNew == segsBase ++ segsStreamed &&
          segsBase.forall(g =>
            ds.segmentFileStats(s, fam, g) == statsBefore(g))
        // COLD BOOT: resolve the published layout fresh (marker +
        // footer reads) and collect the tiny serve meta — the one
        // cost a restart legitimately pays, ledgered
        val t = ds.manifestTables(s, fam, newFp, parts)
        // since r17 the published codes ARE the array-form serve
        // layout — boot is the tiny meta collect, zero reconstruction
        val meta =
          graft.operators.StoreBuildLedger.timed("ann_ingest_serve") {
            S.collectServeMeta(t("cent"), t("codebook"))
          }
        val codesArr = t("codes")
        // SERVE the query-vector stream against the published union
        val served = graft.streaming.StreamingOps.annTopKState(
          S.annServeScore(
            Tables.loadStream(s, dir, "embeddings")
              .where(col("vec_id") % 25 === 0),
            "vec_id", "embedding", meta, t("lists"), codesArr,
            t("norms"), nProbe = 6),
          k = 10)
        val emitted = runBounded(s, served, "t52_ingest_republish_mem",
          "update", statePartitions = Some(8))
        // the concurrently-materialized equivalence base (launched
        // before the ingest spin): an independent path from the
        // published segments
        val (lR, cR, nR, batchTop) = scala.concurrent.Await.result(
          rebuildF, scala.concurrent.duration.Duration.Inf)
        val trainFree = trainSecs() == trainBefore
        val streamTop = emitted.groupBy(col("q_id"))
          .agg(max_by(col("topk"), col("n_seen")).as("topk"))
          .select(col("q_id"), explode(col("topk")).as("p"))
          .select(col("q_id"), col("p._2").as("c_id"), lit(1).as("__s"))
        val res = streamTop
          .join(batchTop, Seq("q_id", "c_id"), "full_outer")
          .agg(count(col("__b")).as("n_topk"),
            count(when(col("__b").isNotNull && col("__s").isNotNull, 1))
              .as("__hit"))
          .crossJoin(broadcast(
            e.agg(count(when(col("vec_id") % 5 =!= 0, 1)).as("n_base"),
              count(when(col("vec_id") % 5 === 0, 1)).as("n_streamed"))))
          .crossJoin(broadcast(
            t("lists").agg(count(lit(1)).as("n_indexed"))))
          .crossJoin(broadcast(mismatches(t("lists"), lR, "__ml")))
          .crossJoin(broadcast(mismatches(t("codes"), cR, "__mc")))
          .crossJoin(broadcast(mismatches(t("norms"), nR, "__mn")))
          .select(col("n_base"), col("n_streamed"), col("n_indexed"),
            col("n_topk"),
            (col("__hit") * 100 >= col("n_topk") * 90).as("stream_ok"),
            (col("__ml") === 0 && col("__mc") === 0 &&
              col("__mn") === 0 &&
              col("n_indexed") === col("n_base") + col("n_streamed"))
              .as("ingest_exact_ok"),
            lit(trainFree).as("ingest_train_free_ok"),
            lit(odeltaOk).as("write_odelta_ok"))
          .localCheckpoint(eager = true) // ckpt dir is deleted below
        // the manifest now carries the references — drop the run's
        // batch ledgers so retention is free to retire this
        // generation later
        ds.dropBatchLedgers(s, fam, runId)
        graft.pipeline.SinkFiles.deleteRecursive(out)
        res
      },
      Some("""SELECT
             |  count(CASE WHEN vec_id % 5 <> 0 THEN 1 END) AS n_base,
             |  count(CASE WHEN vec_id % 5 = 0 THEN 1 END) AS n_streamed,
             |  count(*) AS n_indexed,
             |  10 * count(CASE WHEN vec_id % 25 = 0 THEN 1 END)
             |    AS n_topk,
             |  TRUE AS stream_ok, TRUE AS ingest_exact_ok,
             |  TRUE AS ingest_train_free_ok, TRUE AS write_odelta_ok
             |FROM embeddings""".stripMargin)),

    QuerySpec(
      "t53_stream_ingest_restart",
      "the RESTART face of the ingest->durable composition — the residual the r15 VERDICT named (t52 covers same-run retries; a driver restart from checkpoint replays the last uncommitted batch into a FRESH JVM whose dedup memory is empty, and without durable state the replay publishes a duplicate segment = duplicate rows in the published union): the batch ledger makes the replay idempotent, KILLED AND RESTARTED FOR REAL. Documents stage as exactly three files and stream maxFilesPerTrigger=1 (three deterministic micro-batches); each batch lands as one segment via writeBatchSegmentOnce; an injected fault kills the query inside foreachBatch of batch 1 AFTER its segment write and ledger record but BEFORE the batch commits to the checkpoint — the exact at-least-once window; a second query restarts from the SAME checkpoint dir, Structured Streaming replays batch 1 under the same id with the same file, and the replay finds the ledger and returns the recorded segment WITHOUT writing (gated: batch 1 was invoked at least twice while the ledger holds exactly one segment per batch); on drain the run publishes manifest = the ledgered segments in batch order — recovered from disk, as a restarted driver must — and a cold resolution serves the union MULTISET-EXACT against a batch read of the same staged files (no duplicate from the replay, nothing lost to the kill); ingest accrues zero build-ledger seconds (never a training job). Census = row/batch counts + replay/dedup/exactness gates",
      (s, dir) => {
        val ds = graft.operators.DurableStore
        val root = QuerySpec.tempSinkDir()
        val saved = s.conf.getOption("spark.graft.store.root")
        s.conf.set("spark.graft.store.root", root)
        val fam = "ingest_restart"
        val parts = Seq(ds.Part("t", None))
        val out = java.nio.file.Files
          .createTempDirectory("graft_restart_").toString
        val runId = "r" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(out))
        try {
          // stage the corpus as exactly three files -> three batches
          Tables.load(s, dir, "documents").select(col("doc_id"))
            .repartition(3).write.mode("overwrite")
            .parquet(s"$out/stage")
          val schema = s.read.parquet(s"$out/stage").schema
          val invocations =
            scala.collection.concurrent.TrieMap.empty[Long, Int]
          val crashArmed =
            new java.util.concurrent.atomic.AtomicBoolean(true)
          val ingest: (org.apache.spark.sql.DataFrame, Long) => Unit =
            (batch, batchId) => {
              invocations.updateWith(batchId)(o =>
                Some(o.getOrElse(0) + 1))
              ds.writeBatchSegmentOnce(s, fam, runId, batchId, parts)(
                Map("t" -> batch))
              // the kill: AFTER the durable write + ledger record,
              // BEFORE foreachBatch returns — the checkpoint never
              // commits batch 1, so the restart MUST replay it
              if (batchId == 1L && crashArmed.getAndSet(false))
                sys.error("injected driver crash after durable write")
            }
          def run(): Unit = {
            val q = s.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(s"$out/stage")
              .writeStream
              .foreachBatch(ingest)
              .option("checkpointLocation", s"$out/_ckpt")
              .trigger(
                org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .start()
            try q.awaitTermination()
            finally q.stop()
          }
          val crashed =
            try { run(); false }
            catch {
              case _: org.apache.spark.sql.streaming
                .StreamingQueryException => true
            }
          require(crashed, "the injected crash did not surface")
          // the restart: same checkpoint dir, fresh query — batch 1
          // replays under its id (ledger hit), batch 2 then drains
          run()
          val ledg = ds.batchSegments(s, fam, runId)
          val replayOk = invocations.getOrElse(1L, 0) >= 2 &&
            ledg.map(_._1) == Seq(0L, 1L, 2L) &&
            ledg.map(_._2).distinct.size == 3
          val fp = ds.frameFingerprint(
            s.read.parquet(s"$out/stage"), Seq("doc_id"))
          val published = ds.publishManifest(s, fam, fp, ledg.map(_._2))
          val buildFree = ds.buildSeconds(fam) == 0.0
          val served = ds.manifestTables(s, fam, fp, parts)("t")
          val res = served.agg(count(lit(1)).as("n_rows"))
            .crossJoin(broadcast(mismatches(served,
              s.read.parquet(s"$out/stage"), "__mm")))
            .select(col("n_rows"),
              lit(ledg.size).as("n_batches"),
              (col("__mm") === 0).as("restart_exact_ok"),
              lit(replayOk).as("replay_dedup_ok"),
              lit(published && buildFree).as("publish_train_free_ok"))
            .localCheckpoint(eager = true)
          ds.dropBatchLedgers(s, fam, runId)
          res
        } finally {
          saved.fold(s.conf.unset("spark.graft.store.root"))(v =>
            s.conf.set("spark.graft.store.root", v))
          graft.pipeline.SinkFiles.deleteRecursive(root)
          graft.pipeline.SinkFiles.deleteRecursive(out)
        }
      },
      Some("""SELECT count(*) AS n_rows, 3 AS n_batches,
             |  TRUE AS restart_exact_ok, TRUE AS replay_dedup_ok,
             |  TRUE AS publish_train_free_ok
             |FROM documents""".stripMargin)),

    QuerySpec(
      "t54_stream_ingest_headline",
      "the FULL continuous-ingest lifecycle composed from the round-16 primitives — t52/t53 publish each run as a sibling FINGERPRINT, which is right for one writer but leaves the family without a linear history: here the drained batches COMMIT ONTO THE HEAD LINE. Base corpus (documents m<5) publishes as one segment and becomes head v0; the delta (m in 5..7) streams in two deterministic micro-batches, each landing as a ledgered segment (writeBatchSegmentOnce — the t53 restart discipline); on drain each ledgered segment is appended with appendManifest in batch order (child fingerprints derived by COMBINING the per-segment fingerprints read back from the segment's own parquet — the restarted-driver shape: nothing comes from process memory), advancing the head to v2 whose fingerprint must equal the independently computed fingerprint of the whole m<8 slice (a commit that dropped or duplicated rows could not forge the three-fold combination); the 3-segment head chain then crosses the auto-compaction threshold (Maintenance.autoCompactManifest, maxSegments=2) and compacts WITHOUT moving the head (fingerprint identity is content, chains are layout), keep-latest-1 retention with the automatic head pin retires the base and intermediate generations plus the superseded chain segments, ledgers are dropped, and the head line serves MULTISET-EXACT against a batch read of the m<8 slice with zero build-ledger seconds anywhere. Census = served rows + head version + fingerprint-forgery/exactness/maintenance gates",
      (s, dir) => {
        val ds = graft.operators.DurableStore
        val root = QuerySpec.tempSinkDir()
        val saved = s.conf.getOption("spark.graft.store.root")
        s.conf.set("spark.graft.store.root", root)
        val fam = "ingest_head"
        val parts = Seq(ds.Part("t", None))
        val out = java.nio.file.Files
          .createTempDirectory("graft_headline_").toString
        val runId = "r" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(out))
        try {
          val docs = Tables.load(s, dir, "documents")
            .select(col("doc_id"))
          val base = docs.where(col("doc_id") % 10 < 5)
          val fp0 = ds.frameFingerprint(base, Seq("doc_id"))
          val seg0 = ds.writeSegment(s, fam, parts, Map("t" -> base))
          // ingest-loop publish, not a build: nothing in this query
          // may touch the build ledger (the buildFree gate below)
          require(ds.publishManifest(s, fam, fp0, Seq(seg0)),
            "base publish lost a race in a private root")
          require(ds.initHead(s, fam, fp0), "head init lost a race")
          // the delta arrives as two deterministic micro-batches,
          // each recorded through the durable batch ledger
          docs.where(col("doc_id") % 10 >= 5 && col("doc_id") % 10 < 8)
            .repartition(2).write.mode("overwrite")
            .parquet(s"$out/stage")
          val schema = s.read.parquet(s"$out/stage").schema
          val ingest: (org.apache.spark.sql.DataFrame, Long) => Unit =
            (batch, batchId) => {
              ds.writeBatchSegmentOnce(s, fam, runId, batchId, parts)(
                Map("t" -> batch))
              ()
            }
          val q = s.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(s"$out/stage")
            .writeStream
            .foreachBatch(ingest)
            .option("checkpointLocation", s"$out/_ckpt")
            .trigger(
              org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          try q.awaitTermination()
          finally q.stop()
          // COMMIT onto the head line, batch order, recovered purely
          // from durable state: segment list from the ledger, each
          // delta's fingerprint re-derived from the segment's own
          // files — a restarted driver could run this line unchanged
          val ledg = ds.batchSegments(s, fam, runId)
          ledg.foreach { case (_, seg) =>
            ds.appendManifest(s, fam, seg, ds.frameFingerprint(
              s.read.parquet(s"$root/$fam/$seg/t"), Seq("doc_id")))
          }
          val (vHead, fpHead) = ds.headState(s, fam).getOrElse(
            sys.error("no head after the ingest appends"))
          // forgery gate: the committed head fingerprint must equal
          // the independent fingerprint of the whole served slice
          val fpFull = ds.frameFingerprint(
            docs.where(col("doc_id") % 10 < 8), Seq("doc_id"))
          val headOk = vHead == ledg.size.toLong && fpHead == fpFull
          // maintenance: the 1+2-segment chain crosses the threshold;
          // compaction must not move the head
          val compacted = graft.pipeline.Maintenance
            .autoCompactManifest(s, fam, fpHead, parts,
              maxSegments = 2)(identity)
          val headStable =
            ds.headState(s, fam).contains((vHead, fpHead)) &&
            ds.manifestSegments(s, fam, fpHead).size == 1
          ds.dropBatchLedgers(s, fam, runId)
          ds.vacuumKeepLatest(s, fam, 1)
          val served = ds.manifestTables(s, fam, fpHead, parts)("t")
          val buildFree = ds.buildSeconds(fam) == 0.0
          served.agg(count(lit(1)).as("n_rows"))
            .crossJoin(broadcast(mismatches(served,
              docs.where(col("doc_id") % 10 < 8), "__mm")))
            .select(col("n_rows"),
              lit(vHead.toInt).as("head_version"),
              (col("__mm") === 0).as("headline_exact_ok"),
              lit(headOk).as("head_fp_combined_ok"),
              lit(compacted && headStable && buildFree)
                .as("maintenance_ok"))
            .localCheckpoint(eager = true)
        } finally {
          saved.fold(s.conf.unset("spark.graft.store.root"))(v =>
            s.conf.set("spark.graft.store.root", v))
          graft.pipeline.SinkFiles.deleteRecursive(root)
          graft.pipeline.SinkFiles.deleteRecursive(out)
        }
      },
      Some("""SELECT count(CASE WHEN doc_id % 10 < 8 THEN 1 END)
             |    AS n_rows,
             |  2 AS head_version, TRUE AS headline_exact_ok,
             |  TRUE AS head_fp_combined_ok, TRUE AS maintenance_ok
             |FROM documents""".stripMargin)),

    QuerySpec(
      "t55_stream_cdc_tail",
      "STREAMING CHANGE CAPTURE of the head line — the consumer side of t54's producer loop, and the shape the reference cannot express at all (its only change detection is re-scanning the source and re-sending everything, index.js:186-198; a downstream consumer here TAILS the commit log ingest already writes): spark.readStream.format(graft-store) turns the family's head versions into stream OFFSETS, so each micro-batch is one commit window read from ONLY the segments it appended. Proven in-query: base (m<4) publishes and becomes head v0; a snapshot-mode stream's FIRST batch must be the whole line as of stream start (the Delta starting-snapshot semantics, counted per phase through a memory sink); two appendManifest commits then land WHILE THE STREAM RUNS and each drains as EXACTLY its own slice (per-phase sink deltas equal the slice counts — a batch that re-read the standing corpus would surface as duplicates); the drained sink is multiset-exact against a batch read of the m<6 slice, the head sits at v2, and the whole tail accrues zero build-ledger seconds (serving changes is never a training job). Census = total/snapshot/tail row counts + head version + exactness/train-free gates",
      (s, dir) => {
        val ds = graft.operators.DurableStore
        val root = QuerySpec.tempSinkDir()
        val saved = s.conf.getOption("spark.graft.store.root")
        s.conf.set("spark.graft.store.root", root)
        val fam = "cdc_tail"
        val parts = Seq(ds.Part("t", None))
        val sink = "t55_cdc_sink"
        try {
          val docs = Tables.load(s, dir, "documents")
            .select(col("doc_id"))
          def slice(m: Long) = docs.where(col("doc_id") % 10 === m)
            .localCheckpoint(eager = true)
          val base = docs.where(col("doc_id") % 10 < 4)
            .localCheckpoint(eager = true)
          val fp0 = ds.frameFingerprint(base, Seq("doc_id"))
          val seg0 = ds.writeSegment(s, fam, parts, Map("t" -> base))
          require(ds.publishManifest(s, fam, fp0, Seq(seg0)),
            "base publish lost a race in a private root")
          require(ds.initHead(s, fam, fp0), "head init lost a race")
          s.sql(s"DROP VIEW IF EXISTS $sink")
          val q = s.readStream.format("graft-store")
            .option("family", fam).option("part", "t")
            .option("startingVersion", "snapshot")
            .load()
            .writeStream.format("memory").queryName(sink)
            .outputMode("append").start()
          try {
            q.processAllAvailable()
            val nSnap = s.table(sink).count()
            def append(m: Long): Long = {
              val d = slice(m)
              val seg = ds.writeSegment(s, fam, parts, Map("t" -> d))
              ds.appendManifest(s, fam, seg,
                ds.frameFingerprint(d, Seq("doc_id")))
              q.processAllAvailable()
              s.table(sink).count()
            }
            // each commit drains as exactly its own slice: the sink
            // grows by the slice count, never by a corpus re-read
            val n4 = append(4L)
            val n5 = append(5L)
            val tailOk = n4 - nSnap == slice(4L).count() &&
              n5 - n4 == slice(5L).count()
            val (vHead, _) = ds.headState(s, fam).getOrElse(
              sys.error("no head after the tailed appends"))
            val drained = s.table(sink).localCheckpoint(eager = true)
            val buildFree = ds.buildSeconds(fam) == 0.0
            drained.agg(count(lit(1)).as("n_total_rows"))
              .crossJoin(broadcast(mismatches(drained,
                docs.where(col("doc_id") % 10 < 6), "__mm")))
              .select(col("n_total_rows"),
                lit(nSnap).as("n_snapshot_rows"),
                lit(n5 - nSnap).as("n_tail_rows"),
                lit(vHead.toInt).as("head_version"),
                (col("__mm") === 0 && lit(tailOk))
                  .as("tail_exact_ok"),
                lit(buildFree).as("train_free_ok"))
              .localCheckpoint(eager = true)
          } finally {
            q.stop()
            s.sql(s"DROP VIEW IF EXISTS $sink")
          }
        } finally {
          saved.fold(s.conf.unset("spark.graft.store.root"))(v =>
            s.conf.set("spark.graft.store.root", v))
          graft.pipeline.SinkFiles.deleteRecursive(root)
        }
      },
      Some("""SELECT count(CASE WHEN doc_id % 10 < 6 THEN 1 END)
             |    AS n_total_rows,
             |  count(CASE WHEN doc_id % 10 < 4 THEN 1 END)
             |    AS n_snapshot_rows,
             |  count(CASE WHEN doc_id % 10 IN (4, 5) THEN 1 END)
             |    AS n_tail_rows,
             |  2 AS head_version, TRUE AS tail_exact_ok,
             |  TRUE AS train_free_ok
             |FROM documents""".stripMargin))
  )
}
