package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders over a scale-factor directory of parquet files.
  *
  * Plays the role of the reference's MongoDB database handle
  * (reference: index.js:105 binds one DB; index.js:356 enumerates its
  * collections): a namespace of named tables. In production this would be
  * the MongoDB Spark connector; for the harness each "collection" is one
  * parquet file under the scale-factor dir (TESTDATA.md).
  */
object Tables {
  /** All fixture tables (TESTDATA.md). */
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark has no native
    * type for ([PARQUET_TYPE_ILLEGAL]). We read nanos as long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and convert to TimestampType
    * via integer division ns -> us. Integer `div`, not `/`: a double
    * division would round (ns-since-epoch > 2^53). The fixture values are
    * us-grained, so the conversion is lossless.
    */
  /** Config key that swaps every table load from the parquet fixtures to
    * the MongoDB Spark connector — the production source of a mongo2x
    * engine (reference: index.js:99-105 opens the live DB). The swap is
    * config-only: no call site changes, `dir` is ignored, the collection
    * name is the table name. The connector jar is a deploy-time
    * dependency; when absent, Spark raises its standard
    * DATA_SOURCE_NOT_FOUND error at load (covered by SourcesSpec).
    */
  val mongoUriKey = "spark.graft.mongo.uri"
  val mongoDatabaseKey = "spark.graft.mongo.database"

  /** DSv2 format name the mongo swap resolves (default "mongodb", the
    * official connector's registered short name). Configurable because
    * the connector's name has varied across major versions ("mongo",
    * "mongodb", fully-qualified class) — and so the wiring is testable
    * against a registered double without the production jar
    * (SourcesSpec).
    */
  val mongoFormatKey = "spark.graft.mongo.format"

  /** Pass-through namespace for every other reader dial the production
    * connector takes: a session conf `spark.graft.mongo.option.<key> = v`
    * is forwarded verbatim as reader option `<key>` — e.g.
    * `readPreference.name`, `readConcern.level`, `sampleSize`,
    * `partitioner`, `authSource` / `authMechanism` variants not already
    * encoded in the URI's query string — so a new connector option never
    * needs a code change here. The three core options (connection.uri,
    * database, collection) are pinned AFTER the pass-throughs and cannot
    * be clobbered by them.
    */
  val mongoOptionPrefix = "spark.graft.mongo.option."

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.conf.getOption(mongoUriKey) match {
      case Some(uri) =>
        val extra = spark.conf.getAll
          .filter { case (k, _) => k.startsWith(mongoOptionPrefix) }
          .map { case (k, v) => k.stripPrefix(mongoOptionPrefix) -> v }
        spark.read
          .format(spark.conf.getOption(mongoFormatKey).getOrElse("mongodb"))
          .options(extra)
          .option("connection.uri", uri)
          .option("database",
            spark.conf.getOption(mongoDatabaseKey).getOrElse("graft"))
          .option("collection", name)
          .load()
      case None => loadParquet(spark, dir, name)
    }

  /** Streaming face of `load`: the same fixture table as an unbounded
    * `readStream` file source (schema pinned from the batch read, same
    * ns->µs ts conversion). In production the analogous swap is a Kafka /
    * Mongo change-stream source behind the same column contract.
    */
  def loadStream(spark: SparkSession, dir: String, name: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    if (!spark.conf.getOption(key).contains("true")) spark.conf.set(key, "true")
    val p = path(dir, name)
    // The fixture "table" is a single parquet file; the streaming file
    // source accepts a directory or a GLOB, not a bare file path — wrap
    // the file name in a brace-glob and anchor basePath at the parent.
    val df = spark.readStream
      .schema(spark.read.parquet(p).schema)
      .option("basePath", dir)
      .parquet(s"$dir/{$name.parquet}")
    normalizeTs(df)
  }

  /** Normalize the fixture `ts` column to TimestampType (µs, UTC instant)
    * regardless of how the generator wrote it: TIMESTAMP(NANOS) parquet
    * arrives as LongType under `nanosAsLong` (ns -> µs integer div);
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as TimestampNTZType
    * (cast reinterprets the wall-clock in the session timezone — UTC by
    * the Engine contract, so the µs value is unchanged and matches
    * DuckDB's naive read of the same file). Event-time streaming,
    * unix_micros(), and the influx sink all require plain TimestampType.
    */
  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        // The NTZ -> Timestamp cast reinterprets the wall-clock in the
        // SESSION timezone; only UTC leaves the µs value unchanged (the
        // DuckDB-naive-read contract above). Engine and the test harness
        // both pin UTC — fail loudly if a foreign session didn't, instead
        // of silently shifting every instant by the zone offset.
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "")
        require(tz == "UTC",
          s"normalizeTs: TIMESTAMP_NTZ 'ts' needs spark.sql.session.timeZone=UTC (got '$tz')")
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  private def loadParquet(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Guarded set: avoid re-writing session conf (and invalidating cached
    // plans) on every table load.
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    if (!spark.conf.getOption(key).contains("true")) spark.conf.set(key, "true")
    normalizeTs(spark.read.parquet(path(dir, name)))
  }
}
