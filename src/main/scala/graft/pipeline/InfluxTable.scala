package graft.pipeline

import java.nio.charset.StandardCharsets
import java.util

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 face of the line-protocol sink (SURVEY.md §7.3(c);
  * reference index.js:242-252 `writePoints` / index.js:321-336
  * `emptySeries`): `df.write.format("graft-influx")` with
  * `.mode("append")` mapping to the append contract and
  * `.mode("overwrite")` to DSv2 truncate-then-append — the engine-level
  * way to express the reference's emptyseries flag, so the sink composes
  * with everything that speaks the writer API instead of needing the
  * `graft.pipeline.Sink` trait.
  *
  * Options: `path` (base dir, required), `measurement` (series name,
  * required), `timecol` (TimestampType column rendered as the trailing
  * epoch-ns timestamp; default "time"), `insertlimit` (rows per flush
  * file = per simulated POST body; default 1000).
  *
  * Scale shape: each task writes its own `insertlimit`-sized flush files
  * through the Hadoop FileSystem API with the driver's captured Hadoop
  * conf (object-store credentials survive), no inter-task coordination,
  * no driver-side rows. Flushes land directly (a line-protocol POST is
  * not transactional either — the reference's writePoints has no
  * rollback); idempotent re-runs come from overwrite/truncate mode,
  * matching the reference's emptyseries-then-rewrite recovery story.
  */
final class InfluxDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-influx"

  /** Write-only source: the table schema is the written query's schema
    * (`supportsExternalMetadata` makes Spark pass it to `getTable`).
    */
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "graft-influx is write-only; reads go through spark.read.text on the flush files")

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new InfluxTable(schema, properties)
}

final class InfluxTable(tableSchema: StructType,
    props: util.Map[String, String]) extends SupportsWrite {

  private def opt(key: String): Option[String] = {
    // properties arrive lower-cased through the DSv2 option path, but be
    // tolerant of direct construction with mixed case
    val m = new CaseInsensitiveStringMap(props)
    Option(m.get(key))
  }

  private val baseDir = opt("path").getOrElse(
    throw new IllegalArgumentException("graft-influx requires option 'path'"))
  private val measurement = opt("measurement").getOrElse(
    throw new IllegalArgumentException("graft-influx requires option 'measurement'"))
  private val timeCol = opt("timecol").getOrElse("time")
  private val insertLimit = opt("insertlimit").map(_.toInt).getOrElse(1000)
  require(insertLimit > 0, "insertlimit must be positive")

  private def seriesDir = s"$baseDir/$measurement"

  override def name(): String = s"graft-influx:$seriesDir"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new InfluxWriteBuilder(info.schema(), seriesDir, measurement, timeCol,
      insertLimit, truncateFirst = false)
}

final class InfluxWriteBuilder(schema: StructType, seriesDir: String,
    measurement: String, timeCol: String, insertLimit: Int,
    truncateFirst: Boolean) extends WriteBuilder with SupportsTruncate {

  /** DSv2 truncate (= SaveMode.Overwrite): empty the series, then append —
    * the reference's emptyseries flag (index.js:321-336).
    */
  override def truncate(): WriteBuilder =
    new InfluxWriteBuilder(schema, seriesDir, measurement, timeCol,
      insertLimit, truncateFirst = true)

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new InfluxBatchWrite(schema, seriesDir, measurement, timeCol,
        insertLimit, truncateFirst)

    /** Continuous migration: `writeStream.format("graft-influx")` in
      * append mode — each micro-batch's tasks flush their own
      * epoch-stamped files. Delivery is at-least-once across task
      * retries (flushes are not transactional — neither are the
      * reference's line-protocol POSTs); truncate-at-start supports
      * a clean re-run.
      */
    override def toStreaming: streaming.StreamingWrite =
      new InfluxStreamingWrite(schema, seriesDir, measurement, timeCol,
        insertLimit, truncateFirst)
  }
}

final class InfluxStreamingWrite(schema: StructType, seriesDir: String,
    measurement: String, timeCol: String, insertLimit: Int,
    truncateFirst: Boolean) extends streaming.StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): streaming.StreamingDataWriterFactory = {
    // Driver-side at query start (called once per run, before epoch 0).
    if (truncateFirst) SinkFiles.deleteRecursive(seriesDir)
    InfluxStreamingWriterFactory(schema, seriesDir, measurement, timeCol,
      insertLimit, SinkFiles.captureConf())
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = ()
}

final case class InfluxStreamingWriterFactory(schema: StructType,
    seriesDir: String, measurement: String, timeCol: String,
    insertLimit: Int, conf: Option[SinkFiles.SerializableHadoopConf])
    extends streaming.StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new InfluxDataWriter(schema, seriesDir, measurement, timeCol,
      insertLimit, conf, partitionId, taskId, epochTag = s"e$epochId-")
}

final case class InfluxCommit(files: Long, rows: Long)
    extends WriterCommitMessage

final class InfluxBatchWrite(schema: StructType, seriesDir: String,
    measurement: String, timeCol: String, insertLimit: Int,
    truncateFirst: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    // Driver-side, before any task launches: truncate maps to a recursive
    // Hadoop-FS delete of the series dir (works on HDFS/object stores).
    if (truncateFirst) SinkFiles.deleteRecursive(seriesDir)
    InfluxWriterFactory(schema, seriesDir, measurement, timeCol, insertLimit,
      SinkFiles.captureConf())
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final case class InfluxWriterFactory(schema: StructType, seriesDir: String,
    measurement: String, timeCol: String, insertLimit: Int,
    conf: Option[SinkFiles.SerializableHadoopConf]) extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new InfluxDataWriter(schema, seriesDir, measurement, timeCol, insertLimit,
      conf, partitionId, taskId)
}

/** `graft.pipeline.Sink` adapter over the DSv2 writer, so
  * `Pipeline.migrate` (the reference's whole-catalog orchestration)
  * composes with the `format("graft-influx")` path unchanged: append maps
  * to a DSv2 append, truncate to the recursive series delete the DSv2
  * truncate also uses.
  */
final class InfluxDsv2Sink(baseDir: String, insertLimit: Int = 1000,
    timeCol: String = "time") extends Sink {

  override def truncate(table: String): Unit =
    SinkFiles.deleteRecursive(s"$baseDir/$table")

  override def append(df: org.apache.spark.sql.DataFrame, table: String): Unit =
    df.write.format("graft-influx")
      .option("path", baseDir).option("measurement", table)
      .option("timecol", timeCol).option("insertlimit", insertLimit.toString)
      .mode("append").save()
}

/** Runs ON THE EXECUTOR: buffers rendered lines and writes one flush file
  * per `insertLimit` rows — the moral equivalent of one POST body
  * (reference index.js:209-232 re-chunks pages into insertlimit-sized
  * writePoints calls). File names carry (epoch, partition, task,
  * flush-seq) so concurrent tasks, epochs, and speculative re-attempts
  * never collide.
  */
final class InfluxDataWriter(schema: StructType, seriesDir: String,
    measurement: String, timeCol: String, insertLimit: Int,
    conf: Option[SinkFiles.SerializableHadoopConf], partitionId: Int,
    taskId: Long, epochTag: String = "") extends DataWriter[InternalRow] {

  private val buf = new ArrayBuffer[String](insertLimit)
  private var flushSeq = 0
  private var files = 0L
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    buf += InfluxLineProtocol.renderInternal(measurement, schema, timeCol, row)
    rows += 1
    if (buf.size >= insertLimit) flush()
  }

  private def flush(): Unit = if (buf.nonEmpty) {
    val p = new Path(s"$seriesDir/flush-$epochTag$partitionId-$taskId-$flushSeq.lp")
    flushSeq += 1
    val out = SinkFiles.fileSystem(p, conf).create(p, false)
    try out.write(buf.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    files += 1
    buf.clear()
  }

  override def commit(): WriterCommitMessage = {
    flush()
    InfluxCommit(files, rows)
  }

  override def abort(): Unit = buf.clear()
  override def close(): Unit = ()
}
