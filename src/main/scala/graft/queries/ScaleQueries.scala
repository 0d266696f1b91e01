package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.Skew
import graft.sources.{Bucketing, SchemaMerge}

/** The explicit 100×-scale levers (salting, bucketing, ragged-schema
  * merge), registered as driver-graded queries whose oracle is the PLAIN
  * formulation: each lever must be result-preserving, bit-for-bit, or it
  * is not a lever but a bug. (Unit tests in ScaleToolsSpec/SourcesSpec
  * check mechanics — no-Exchange plans, type-conflict errors; these
  * specs make the equivalence visible to the driver's DuckDB compare.)
  */
object ScaleQueries {

  val specs: Seq[QuerySpec] = Seq(

    QuerySpec(
      "s01_salted_agg",
      "two-stage salted aggregation (16 salt buckets off l_orderkey) over lineitem grouped by l_returnflag — the hot-key lever; must hash-match the plain one-stage group-by (oracle). Decimal partials keep the re-aggregation exact.",
      (s, dir) => Skew.saltedAgg(
        Tables.load(s, dir, "lineitem"),
        key = col("l_returnflag"),
        saltFrom = col("l_orderkey"),
        saltBuckets = 16,
        partial = Seq(
          sum(col("l_quantity").cast(DecimalType(18, 4))).as("__p_sum"),
          count(lit(1)).as("__p_n")),
        merge = Seq(
          sum(col("__p_sum")).cast("double").as("sum_qty"),
          sum(col("__p_n")).as("n"))),
      Some("""SELECT l_returnflag AS key,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    QuerySpec(
      "s02_bucketed_join",
      "bucketed co-located join: customer and orders pre-bucketed+sorted on custkey, joined with broadcast disabled — the join stage must plan with ZERO Exchange (asserted in-query) and the result must hash-match the plain join (oracle)",
      (s, dir) => {
        val cust = Tables.load(s, dir, "customer")
          .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
        val ord = Tables.load(s, dir, "orders")
          .select(col("o_custkey").as("custkey"), col("o_totalprice"))
        // Idempotence across JVMs: DROP TABLE clears this session's
        // in-memory catalog, but a previous run's managed-table LOCATION
        // survives on disk and saveAsTable refuses it
        // (LOCATION_ALREADY_EXISTS) — remove stray locations too.
        val warehouse = s.conf.get("spark.sql.warehouse.dir")
        Seq("graft_s02_cust", "graft_s02_ord").foreach { t =>
          s.sql(s"DROP TABLE IF EXISTS $t")
          graft.pipeline.SinkFiles.deleteRecursive(s"$warehouse/$t")
        }
        Bucketing.writeBucketed(cust, "graft_s02_cust", "custkey", 8,
          sortCol = Some("custkey"))
        Bucketing.writeBucketed(ord, "graft_s02_ord", "custkey", 8,
          sortCol = Some("custkey"))
        // Disable broadcast while PLANNING the join so the no-Exchange
        // assertion exercises the shuffle path bucketing is meant to
        // eliminate (a broadcast join has no Exchange trivially).
        val key = "spark.sql.autoBroadcastJoinThreshold"
        val prev = s.conf.get(key)
        val joined =
          try {
            s.conf.set(key, "-1")
            val j = Bucketing.bucketedJoin(
              s, "graft_s02_cust", "graft_s02_ord", "custkey")
            val plan = j.queryExecution.executedPlan.toString
            require(!plan.contains("Exchange"),
              s"bucketed join should not shuffle:\n$plan")
            j
          } finally s.conf.set(key, prev)
        // The aggregate on top shuffles on c_mktsegment as usual — the
        // lever removes the JOIN's two fact-table exchanges, not the
        // final small-cardinality agg.
        joined.groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"),
            QuerySpec.decSum(col("o_totalprice")).as("sum_price"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_mktsegment""".stripMargin)),

    QuerySpec(
      "s03_schema_merge",
      "ragged-schema union (union-of-fields, null-fill — SURVEY §7.4's schemaless-Mongo hard part): three different column subsets of customer re-merged; oracle = explicit null-filled UNION ALL",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        SchemaMerge.unionRagged(Seq(
          c.where(col("c_custkey") % 3 === 0)
            .select(col("c_custkey"), col("c_name")),
          c.where(col("c_custkey") % 3 === 1)
            .select(col("c_custkey"), col("c_acctbal")),
          c.where(col("c_custkey") % 3 === 2)
            .select(col("c_custkey"), col("c_name"), col("c_nationkey"))))
      },
      Some("""SELECT c_custkey, c_name, CAST(NULL AS DOUBLE) AS c_acctbal,
             |  CAST(NULL AS INTEGER) AS c_nationkey
             |FROM customer WHERE c_custkey % 3 = 0
             |UNION ALL
             |SELECT c_custkey, CAST(NULL AS VARCHAR), c_acctbal,
             |  CAST(NULL AS INTEGER)
             |FROM customer WHERE c_custkey % 3 = 1
             |UNION ALL
             |SELECT c_custkey, c_name, CAST(NULL AS DOUBLE), c_nationkey
             |FROM customer WHERE c_custkey % 3 = 2""".stripMargin)),

    QuerySpec(
      "s04_salted_join",
      "salted equi-join (8 salt buckets, right side replicated): lineitem x part on partkey then brand rollup — the hot-join-key lever; must hash-match the plain join (oracle)",
      (s, dir) => Skew.saltedJoin(
          Tables.load(s, dir, "lineitem"), "l_partkey", col("l_orderkey"),
          Tables.load(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          "p_partkey", 8)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          QuerySpec.decSum(col("l_quantity")).as("sum_qty")),
      Some("""SELECT p_brand, count(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY p_brand""".stripMargin)),

    QuerySpec(
      "s05_partitioned_sink",
      "time-partitioned sink layout: events migrated into a date-partitioned series, read back with a one-day filter that must prune at the partition level (asserted in-query via PartitionFilters); aggregate checked against the source-table oracle",
      (s, dir) => {
        val sinkDir =
          QuerySpec.tempSinkDir()
        val sink = new graft.pipeline.ParquetSink(sinkDir,
          partitionCols = Seq("p_date"))
        val e = ParityQueries.prepare(Tables.load(s, dir, "events"))
          .where(col("time").isNotNull)
          .withColumn("p_date", to_date(col("time")))
        sink.append(e, "events")
        val rd = s.read.parquet(s"$sinkDir/events")
          .where(col("p_date") === to_date(lit("2024-01-15")))
        val plan = rd.queryExecution.executedPlan.toString
        require(plan.contains("PartitionFilters: [") &&
          !plan.replace(" ", "").contains("PartitionFilters:[]"),
          s"date filter must prune partitions:\n$plan")
        rd.agg(count(lit(1)).as("n"),
          QuerySpec.decSum(col("value"), 6).as("sum_value"))
      },
      Some("""SELECT count(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events
             |WHERE ts IS NOT NULL AND CAST(ts AS DATE) = DATE '2024-01-15'""".stripMargin)),

    QuerySpec(
      "s06_compact_retain",
      "sink maintenance end-to-end: date-partitioned migrate -> small-file compaction of one partition (asserted fewer files) -> retention drop of days before 2024-01-16 (partition delete, no rewrite) -> remaining aggregate checked against the source oracle",
      (s, dir) => {
        val base =
          QuerySpec.tempSinkDir()
        val sink = new graft.pipeline.ParquetSink(base,
          partitionCols = Seq("p_date"))
        sink.append(
          ParityQueries.prepare(Tables.load(s, dir, "events"))
            .where(col("time").isNotNull)
            .withColumn("p_date", to_date(col("time")))
            .repartition(8), // force several files per partition
          "events")
        val (nBefore, nAfter) = graft.pipeline.Maintenance.compactParquet(
          s, s"$base/events/p_date=2024-01-20")
        require(nBefore > nAfter && nAfter == 1,
          s"compaction must shrink files: $nBefore -> $nAfter")
        graft.pipeline.Maintenance.dropPartitionsBelow(
          s"$base/events", "p_date", cutoff = "2024-01-16")
        s.read.parquet(s"$base/events")
          .agg(count(lit(1)).as("n"),
            QuerySpec.decSum(col("value"), 6).as("sum_value"))
      },
      Some("""SELECT count(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events
             |WHERE ts IS NOT NULL AND CAST(ts AS DATE) >= DATE '2024-01-16'""".stripMargin)),

    QuerySpec(
      "s07_upsert",
      "last-writer-wins upsert (the incremental re-migration the reference can only do as full rewrite): a changed-rows batch (every 10th event, value+1000, ts+1h) merges into the base keyed by event_id versioned by ts; one shuffle on the key",
      (s, dir) => {
        val base = Tables.load(s, dir, "events")
          .where(col("event_id").isNotNull)
        val updates = base.where(col("event_id") % 10 === 0)
          .withColumn("value", col("value") + 1000)
          .withColumn("ts", col("ts") + expr("INTERVAL 1 HOUR"))
        graft.pipeline.Maintenance.upsert(
          base, updates, Seq("event_id"), "ts")
      },
      Some("""WITH b AS (
             |  SELECT event_id, user_id, event_type, value, props,
             |    CAST(ts AS TIMESTAMP) AS ts, 0 AS src
             |  FROM events WHERE event_id IS NOT NULL),
             |u AS (
             |  SELECT event_id, user_id, event_type, value + 1000 AS value,
             |    props, CAST(ts AS TIMESTAMP) + INTERVAL 1 HOUR AS ts, 1 AS src
             |  FROM events
             |  WHERE event_id IS NOT NULL AND event_id % 10 = 0),
             |m AS (SELECT * FROM b UNION ALL SELECT * FROM u),
             |r AS (SELECT *, row_number() OVER (
             |    PARTITION BY event_id
             |    ORDER BY ts DESC NULLS LAST, src DESC) AS rk FROM m)
             |SELECT event_id, ts, user_id, event_type, value, props
             |FROM r WHERE rk = 1""".stripMargin)),

    QuerySpec(
      "s08_zorder_layout",
      "Z-order (Morton) layout key over (user_id, day): per z-range bucket, the (user, day) bounding box — each bucket covers a small rectangle in BOTH dimensions, the property that lets min/max file stats prune scans on either one; codegen'd bit-interleave expression, integer-exact oracle",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .where(col("user_id").isNotNull && col("ts").isNotNull)
          .select(col("user_id").cast("long").as("x"),
            datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
              .cast("long").as("y"))
          .where(col("y") >= 0 && col("x") < 65536 && col("y") < 65536)
        e.select(col("x"), col("y"),
            graft.functions.LayoutFunctions.zorder16(col("x"), col("y"))
              .as("z"))
          .groupBy(expr("z div 1024").as("z_bucket"))
          .agg(count(lit(1)).as("n"),
            min(col("x")).as("min_user"), max(col("x")).as("max_user"),
            min(col("y")).as("min_day"), max(col("y")).as("max_day"))
      },
      Some("""WITH e AS (
             |  SELECT CAST(user_id AS BIGINT) AS x,
             |    CAST(date_diff('day', DATE '2024-01-01',
             |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) AS y
             |  FROM events
             |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
             |f AS (SELECT x, y FROM e
             |      WHERE y >= 0 AND x < 65536 AND y < 65536),
             |z AS (
             |  SELECT x, y,
             |    list_reduce([((x >> k) & 1) * (CAST(1 AS BIGINT) << (2*k))
             |        + ((y >> k) & 1) * (CAST(1 AS BIGINT) << (2*k + 1))
             |      for k in range(0, 16)], (a, b) -> a + b) AS z
             |  FROM f)
             |SELECT z // 1024 AS z_bucket, count(*) AS n,
             |  min(x) AS min_user, max(x) AS max_user,
             |  min(y) AS min_day, max(y) AS max_day
             |FROM z GROUP BY 1""".stripMargin)),

    QuerySpec(
      "s09_skew_probe",
      "pre-join skew probe — the diagnostic run BEFORE choosing salting/AQE settings: per-key group-size distribution of the join key (key count, total rows, max/avg group size, skew factor = max/avg, and the top heavy-hitter key). Two tiny map-side-combinable aggregates; nothing wide beyond the key count itself",
      (s, dir) => {
        val g = Tables.load(s, dir, "events")
          .where(col("user_id").isNotNull)
          .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        g.agg(
            count(lit(1)).as("n_keys"),
            sum(col("n")).as("total_rows"),
            max(col("n")).as("max_group"),
            (sum(col("n")).cast("double") / count(lit(1))).as("avg_group"),
            // heaviest key, ties to smallest key — the row you'd salt
            max(struct(col("n"), (-col("user_id")).as("negk"))).as("m"))
          .select(col("n_keys"), col("total_rows"), col("max_group"),
            col("avg_group"),
            (col("max_group").cast("double") / col("avg_group"))
              .as("skew_factor"),
            (-col("m.negk")).as("top_key"))
      },
      Some("""WITH g AS (
             |  SELECT user_id, count(*) AS n FROM events
             |  WHERE user_id IS NOT NULL GROUP BY user_id)
             |SELECT count(*) AS n_keys,
             |  CAST(sum(n) AS BIGINT) AS total_rows,
             |  max(n) AS max_group,
             |  CAST(sum(n) AS DOUBLE) / count(*) AS avg_group,
             |  CAST(max(n) AS DOUBLE) / (CAST(sum(n) AS DOUBLE) / count(*))
             |    AS skew_factor,
             |  (SELECT user_id FROM g ORDER BY n DESC, user_id LIMIT 1)
             |    AS top_key
             |FROM g""".stripMargin)),

    QuerySpec(
      "s10_dynamic_pruning",
      "dynamic partition pruning — the star-schema scale lever: fact (date-partitioned sink) joined to a filtered dim whose qualifying dates are only known at RUN time, so the fact scan must prune via the broadcast-fed dynamicpruning subquery (asserted in-plan), never read all partitions; aggregate checked against the source-table oracle",
      (s, dir) => {
        val sinkDir =
          QuerySpec.tempSinkDir()
        val sink = new graft.pipeline.ParquetSink(sinkDir,
          partitionCols = Seq("p_date"))
        sink.append(
          ParityQueries.prepare(Tables.load(s, dir, "events"))
            .where(col("time").isNotNull)
            .withColumn("p_date", to_date(col("time"))),
          "events")
        // dim: the qualifying dates (first week of each month) — the
        // predicate is on a NON-partition dim attribute, so static
        // pruning is impossible and the fact scan must wait for the
        // dim's runtime row set
        val dim = Tables.load(s, dir, "events")
          .where(col("ts").isNotNull)
          .select(to_date(col("ts")).as("d_date"),
            dayofmonth(to_date(col("ts"))).as("dom"))
          .distinct()
          .where(col("dom") <= 7)
        val fact = s.read.parquet(s"$sinkDir/events")
        val joined = fact.join(broadcast(dim),
            col("p_date") === col("d_date"))
          .agg(count(lit(1)).as("n"),
            QuerySpec.decSum(col("value"), 6).as("sum_value"))
        val plan = joined.queryExecution.executedPlan.toString
        require(plan.toLowerCase.contains("dynamicpruning"),
          s"fact scan must carry a dynamic-pruning subquery:\n$plan")
        joined
      },
      Some("""SELECT count(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events
             |WHERE ts IS NOT NULL
             |  AND day(CAST(ts AS DATE)) <= 7""".stripMargin)),

    QuerySpec(
      "s11_jsonl_roundtrip",
      "schemaless file-format surface: events written as JSON Lines (the closest file shape to the reference's Mongo documents) and read back with a declared schema — timestamps pinned to an explicit microsecond format on BOTH sides (the default JSON format is ms-grained and would silently truncate), doubles survive via shortest-round-trip rendering; aggregates checked against the source table",
      (s, dir) => {
        val out = QuerySpec.tempSinkDir()
        val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
        val src = Tables.load(s, dir, "events")
        src.write.mode("overwrite").option("timestampFormat", tsFmt)
          .json(s"$out/events_json")
        // read back under the SOURCE's own schema — a hand-written schema
        // string would silently drift if the table ever changed shape
        val rd = s.read.schema(src.schema)
          .option("timestampFormat", tsFmt)
          .json(s"$out/events_json")
        val agg = rd.agg(count(lit(1)).as("n"),
          count(col("ts")).as("n_ts"),
          max(col("ts")).as("max_ts"),
          sum(col("event_id")).as("sum_id"),
          QuerySpec.decSum(col("value"), 6).as("sum_value"))
        // the JSON copy is the registry's largest uncompressed sink
        // payload: materialize the 1-row result eagerly, then delete the
        // temp copy instead of leaking it across bench rounds
        val row = agg.collect().toSeq
        graft.pipeline.SinkFiles.deleteRecursive(out)
        s.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(row).asJava),
          agg.schema)
      },
      Some("""SELECT count(*) AS n,
             |  count(ts) AS n_ts,
             |  max(CAST(ts AS TIMESTAMP)) AS max_ts,
             |  CAST(sum(event_id) AS BIGINT) AS sum_id,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events""".stripMargin)),

    QuerySpec(
      "s12_csv_roundtrip",
      "CSV file-format surface: events written with headers and read back under the source schema — the hard part is the JSON props column (embedded commas, quotes) surviving CSV quoting byte-for-byte, proven by a string-length checksum; timestamps µs-pinned as in s11, doubles survive via shortest-round-trip rendering",
      (s, dir) => {
        val out = QuerySpec.tempSinkDir()
        val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
        val src = Tables.load(s, dir, "events")
        src.write.mode("overwrite").option("header", "true")
          .option("timestampFormat", tsFmt)
          .csv(s"$out/events_csv")
        val rd = s.read.schema(src.schema)
          .option("header", "true").option("timestampFormat", tsFmt)
          .csv(s"$out/events_csv")
        val agg = rd.agg(count(lit(1)).as("n"),
          count(col("ts")).as("n_ts"),
          max(col("ts")).as("max_ts"),
          sum(col("event_id")).as("sum_id"),
          sum(length(col("props"))).as("props_chars"),
          QuerySpec.decSum(col("value"), 6).as("sum_value"))
        val row = agg.collect().toSeq
        graft.pipeline.SinkFiles.deleteRecursive(out)
        s.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(row).asJava),
          agg.schema)
      },
      Some("""SELECT count(*) AS n,
             |  count(ts) AS n_ts,
             |  max(CAST(ts AS TIMESTAMP)) AS max_ts,
             |  CAST(sum(event_id) AS BIGINT) AS sum_id,
             |  CAST(sum(length(props)) AS BIGINT) AS props_chars,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events""".stripMargin)),

    QuerySpec(
      "s13_orc_roundtrip",
      "columnar-format portability: events written as ORC (the other Hadoop columnar standard — a migration engine meets it as often as parquet) and read back under the source schema; timestamp/long/double/string survive NATIVELY typed (no text-format pinning, unlike s11/s12), proven by the same aggregate contract incl. the props string-length checksum",
      (s, dir) => {
        val out = QuerySpec.tempSinkDir()
        val src = Tables.load(s, dir, "events")
        src.write.mode("overwrite").orc(s"$out/events_orc")
        val rd = s.read.schema(src.schema).orc(s"$out/events_orc")
        val agg = rd.agg(count(lit(1)).as("n"),
          count(col("ts")).as("n_ts"),
          max(col("ts")).as("max_ts"),
          sum(col("event_id")).as("sum_id"),
          sum(length(col("props"))).as("props_chars"),
          QuerySpec.decSum(col("value"), 6).as("sum_value"))
        val row = agg.collect().toSeq
        graft.pipeline.SinkFiles.deleteRecursive(out)
        s.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(row).asJava),
          agg.schema)
      },
      Some("""SELECT count(*) AS n,
             |  count(ts) AS n_ts,
             |  max(CAST(ts AS TIMESTAMP)) AS max_ts,
             |  CAST(sum(event_id) AS BIGINT) AS sum_id,
             |  CAST(sum(length(props)) AS BIGINT) AS props_chars,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events""".stripMargin)),

    QuerySpec(
      "s14_store_vacuum",
      "durable-store retention end-to-end (the s06 maintenance discipline applied to the model-store warehouse): two corpus GENERATIONS publish under a scratch family in a private root, debris is planted (a crashed staging sibling and a marker-less fingerprint dir — exactly what a killed builder leaves), vacuum keeps only generation 2 — and the kept layout must then SERVE a reload whose build body is a poisoned tombstone (it would emit zero rows), so n_kept_rows only matches the oracle if the reload came from the persisted files, the stale generation is gone and both debris classes were swept. Census = kept-generation row count + deterministic debris/stale counts + the gone-assert",
      (s, dir) => {
        val ds = graft.operators.DurableStore
        val root = QuerySpec.tempSinkDir()
        val saved = s.conf.getOption("spark.graft.store.root")
        s.conf.set("spark.graft.store.root", root)
        val parts = Seq(ds.Part("t", None))
        try {
          def gen(fp: String, m: Long) =
            ds.loadOrBuild(s, "vac_demo", fp, parts) {
              Map("t" -> Tables.load(s, dir, "documents")
                .where(col("doc_id") % 10 === m)
                .select(col("doc_id")))
            }
          gen("gen1", 1L)
          gen("gen2", 2L)
          new java.io.File(s"$root/vac_demo/.stage_dead/t").mkdirs()
          new java.io.File(s"$root/vac_demo/genX/t").mkdirs()
          val rep = ds.vacuum(s, "vac_demo", keep = Set("gen2"))
          // reload with a TOMBSTONE body: if vacuum broke the kept
          // layout and this rebuilt, the row count would be 0 and the
          // hash would fail
          val served = ds.loadOrBuild(s, "vac_demo", "gen2", parts) {
            Map("t" -> Tables.load(s, dir, "documents")
              .where(lit(false)).select(col("doc_id")))
          }("t")
          served.agg(count(lit(1)).as("n_kept_rows"))
            .select(col("n_kept_rows"),
              lit(rep.debris.size).as("n_debris"),
              lit(rep.stale.size).as("n_stale"),
              lit(!ds.isBuilt(s, "vac_demo", "gen1")).as("stale_gone_ok"))
            .localCheckpoint(eager = true)
        } finally {
          Seq("gen1", "gen2").foreach(fp =>
            ds.dropRegistered(s, "vac_demo", fp, parts))
          saved.fold(s.conf.unset("spark.graft.store.root"))(v =>
            s.conf.set("spark.graft.store.root", v))
          graft.pipeline.SinkFiles.deleteRecursive(root)
        }
      },
      Some("""SELECT count(CASE WHEN doc_id % 10 = 2 THEN 1 END)
             |    AS n_kept_rows,
             |  2 AS n_debris, 1 AS n_stale, TRUE AS stale_gone_ok
             |FROM documents""".stripMargin)),

    QuerySpec(
      "s15_store_vacuum_generations",
      "GENERATION-AWARE retention (s14 proved mechanics with caller-enumerated fingerprints; production wants 'keep the newest N'): markers carry a publish stamp (ts=millis.seq, same-millis ties broken by per-JVM sequence), and vacuumKeepLatest(family, n) keeps the n newest COMPLETE layouts by stamp without the caller naming any fingerprint. Two scratch families in a private root prove the two hard cases end-to-end: (a) a plain family publishes three generations in order — keep-latest-2 must retire exactly the oldest, and the kept newest must then SERVE a reload whose build body is a poisoned tombstone (rows match the oracle only if the files survived); (b) a MANIFEST lineage publishes base and child generations — keep-latest-1 retires the base GENERATION but must PIN the base SEGMENT the kept child manifest still lists (reachability is through surviving manifests, the l131 O(delta) layout's retention contract), while sweeping a planted unreferenced complete segment (stale data) and a marker-less half-written one (debris); the kept child must serve the FULL union from disk with a tombstoned build body. Census = kept-generation row counts + deterministic stale/ordering/pinning gates",
      (s, dir) => {
        val ds = graft.operators.DurableStore
        val root = QuerySpec.tempSinkDir()
        val saved = s.conf.getOption("spark.graft.store.root")
        s.conf.set("spark.graft.store.root", root)
        val parts = Seq(ds.Part("t", None))
        try {
          // (a) plain family: three stamped generations
          def gen(fp: String, m: Long) =
            ds.loadOrBuild(s, "vacgen_plain", fp, parts) {
              Map("t" -> Tables.load(s, dir, "documents")
                .where(col("doc_id") % 10 === m).select(col("doc_id")))
            }
          gen("gen1", 1L); gen("gen2", 2L); gen("gen3", 3L)
          val repA = ds.vacuumKeepLatest(s, "vacgen_plain", 2)
          val orderingOk = repA.stale == Seq("gen1") &&
            ds.isBuilt(s, "vacgen_plain", "gen2") &&
            ds.isBuilt(s, "vacgen_plain", "gen3")
          // the kept newest serves from disk (tombstone build body)
          val servedA = ds.loadOrBuild(s, "vacgen_plain", "gen3", parts) {
            Map("t" -> Tables.load(s, dir, "documents")
              .where(lit(false)).select(col("doc_id")))
          }("t")
          // (b) manifest lineage: base + child generations
          val fam = "vacgen_manifest"
          def slice(m: Long) = Tables.load(s, dir, "documents")
            .where(col("doc_id") % 10 === m).select(col("doc_id"))
          val segBase = ds.writeSegment(s, fam, parts,
            Map("t" -> slice(4L)))
          ds.loadOrBuildManifest(s, fam, "fpBase", parts)(Seq(segBase))
          val segDelta = ds.writeSegment(s, fam, parts,
            Map("t" -> slice(5L)))
          ds.loadOrBuildManifest(s, fam, "fpChild", parts)(
            Seq(segBase, segDelta))
          // plant: an unreferenced COMPLETE segment (a crashed or
          // losing publisher's data — stale) and a marker-less
          // half-written one (debris)
          val orphan = ds.writeSegment(s, fam, parts,
            Map("t" -> slice(6L)))
          new java.io.File(s"$root/$fam/seg_halfwritten/t").mkdirs()
          val repB = ds.vacuumKeepLatest(s, fam, 1)
          val pinningOk = repB.stale.toSet == Set("fpBase", orphan) &&
            repB.debris == Seq("seg_halfwritten") &&
            !ds.isBuilt(s, fam, "fpBase") &&
            ds.segmentComplete(s, fam, segBase)
          // the kept child serves the FULL union from disk
          val servedB = ds.loadOrBuildManifest(s, fam, "fpChild",
            parts)(sys.error(
              "kept manifest rebuilt after vacuumKeepLatest"))("t")
          servedA.agg(count(lit(1)).as("n_kept_rows"))
            .crossJoin(broadcast(
              servedB.agg(count(lit(1)).as("n_union_rows"))))
            .select(col("n_kept_rows"), col("n_union_rows"),
              lit(repA.stale.size).as("n_stale_plain"),
              lit(orderingOk).as("ordering_ok"),
              lit(pinningOk).as("segment_pinning_ok"))
            .localCheckpoint(eager = true)
        } finally {
          Seq("gen1", "gen2", "gen3").foreach(fp =>
            ds.dropRegistered(s, "vacgen_plain", fp, parts))
          saved.fold(s.conf.unset("spark.graft.store.root"))(v =>
            s.conf.set("spark.graft.store.root", v))
          graft.pipeline.SinkFiles.deleteRecursive(root)
        }
      },
      Some("""SELECT
             |  count(CASE WHEN doc_id % 10 = 3 THEN 1 END)
             |    AS n_kept_rows,
             |  count(CASE WHEN doc_id % 10 IN (4, 5) THEN 1 END)
             |    AS n_union_rows,
             |  1 AS n_stale_plain, TRUE AS ordering_ok,
             |  TRUE AS segment_pinning_ok
             |FROM documents""".stripMargin)),

    QuerySpec(
      "s16_store_vacuum_grace",
      "WINDOW-FREE retention (s14/s15 prove the mechanics but require a maintenance window — deleting a layout a concurrent reader resolved paths through fails its scans mid-flight): vacuum/vacuumKeepLatest(graceMillis) age-gate the sweep, the Delta tombstone-retention discipline — a superseded generation sweeps only once its PUBLISH STAMP is older than the grace (a reader that resolved it has had the whole grace to drain), and debris/stale segments sweep only past the grace by mtime, which also protects an in-flight builder's complete-but-unpublished segments (the writeSegment->publishManifest window a grace-less sweep could race, permanently poisoning the publish — publishManifest additionally re-verifies and retracts on that race). Proven end-to-end on a scratch family in a private root: three stamped generations; a CONCURRENT READER resolves the middle one pre-vacuum; a graced keep-latest-1 (grace computed strictly between the two older generations' ages — no wall-clock luck) retires exactly the aged-out oldest while the freshly superseded middle SURVIVES and the reader still serves its rows (counted into the result AFTER the sweep); planted fresh in-flight state (one complete unreferenced segment, one half-written marker-less dir) survives the same graced pass; then the grace window closes (grace 0) and the leftovers sweep exactly — middle generation + orphan segment as stale, half-written dir as debris — while the kept newest serves from disk with a tombstoned build body. Census = reader/kept row counts + deterministic sweep gates",
      (s, dir) => {
        val ds = graft.operators.DurableStore
        val root = QuerySpec.tempSinkDir()
        val saved = s.conf.getOption("spark.graft.store.root")
        s.conf.set("spark.graft.store.root", root)
        val fam = "vacgrace"
        val parts = Seq(ds.Part("t", None))
        try {
          def slice(m: Long) = Tables.load(s, dir, "documents")
            .where(col("doc_id") % 10 === m).select(col("doc_id"))
          def gen(fp: String, m: Long) =
            ds.loadOrBuild(s, fam, fp, parts)(Map("t" -> slice(m)))
          gen("genAncient", 1L)
          // a measurable stamp gap (stamps are millis): everything
          // after this line is provably younger than genAncient
          Thread.sleep(120)
          gen("genOld", 2L)
          gen("genNew", 3L)
          // the concurrent reader: paths resolved NOW, pre-vacuum
          // (tombstone body — resolving must not rebuild)
          val reader = ds.loadOrBuild(s, fam, "genOld", parts)(
            sys.error("reader resolution rebuilt"))("t")
          // fresh in-flight builder state: a complete unpublished
          // segment and a half-written marker-less one
          val inflight = ds.writeSegment(s, fam, parts,
            Map("t" -> slice(4L)))
          new java.io.File(s"$root/$fam/seg_halfwritten/t").mkdirs()
          // grace strictly between the ages of genAncient and genOld:
          // computed from the layouts' own publish stamps, so the gate
          // cannot flake on build-time wall-clock variance
          val aMs = ds.publishStampOf(s, fam, "genAncient")._1
          val oMs = ds.publishStampOf(s, fam, "genOld")._1
          require(oMs > aMs, "stamp gap fixture is vacuous")
          val grace = System.currentTimeMillis() - (aMs + oMs) / 2
          val rep1 = ds.vacuumKeepLatest(s, fam, 1, graceMillis = grace)
          val graceOk = rep1.stale == Seq("genAncient") &&
            rep1.debris.isEmpty &&
            ds.isBuilt(s, fam, "genOld") &&
            ds.segmentComplete(s, fam, inflight) &&
            new java.io.File(s"$root/$fam/seg_halfwritten").exists()
          // the pre-resolved reader still serves AFTER the graced
          // sweep — counted eagerly, before the window closes below
          val nReader = reader.count()
          // the grace window closes: everything superseded sweeps
          val rep2 = ds.vacuumKeepLatest(s, fam, 1)
          val closedOk = rep2.stale.toSet == Set("genOld", inflight) &&
            rep2.debris == Seq("seg_halfwritten") &&
            !ds.isBuilt(s, fam, "genOld") &&
            ds.isBuilt(s, fam, "genNew")
          val served = ds.loadOrBuild(s, fam, "genNew", parts) {
            Map("t" -> Tables.load(s, dir, "documents")
              .where(lit(false)).select(col("doc_id")))
          }("t")
          served.agg(count(lit(1)).as("n_kept_rows"))
            .select(col("n_kept_rows"),
              lit(nReader).as("n_reader_rows"),
              lit(graceOk).as("grace_survive_ok"),
              lit(closedOk).as("window_closed_sweep_ok"))
            .localCheckpoint(eager = true)
        } finally {
          Seq("genAncient", "genOld", "genNew").foreach(fp =>
            ds.dropRegistered(s, fam, fp, parts))
          saved.fold(s.conf.unset("spark.graft.store.root"))(v =>
            s.conf.set("spark.graft.store.root", v))
          graft.pipeline.SinkFiles.deleteRecursive(root)
        }
      },
      Some("""SELECT
             |  count(CASE WHEN doc_id % 10 = 3 THEN 1 END)
             |    AS n_kept_rows,
             |  count(CASE WHEN doc_id % 10 = 2 THEN 1 END)
             |    AS n_reader_rows,
             |  TRUE AS grace_survive_ok,
             |  TRUE AS window_closed_sweep_ok
             |FROM documents""".stripMargin))
  )
}
