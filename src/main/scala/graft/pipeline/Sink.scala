package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SaveMode}

/** Destination abstraction for the migration pipeline — the Spark face of
  * the reference's InfluxDB client surface: append a table's rows to a
  * series named after the source collection (reference: index.js:242
  * `writePoints(collectionName, data, ...)`) and optionally truncate the
  * series first (index.js:321-336 `emptySeries`).
  */
trait Sink extends Serializable {

  /** Remove existing contents of `table` (the `emptySeries` analogue). */
  def truncate(table: String): Unit

  /** Append all rows of `df` to `table`. Implementations decide batching. */
  def append(df: DataFrame, table: String): Unit
}

/** Bulk-file sink: one parquet dir per series. The idiomatic Spark write
  * path — executors write partition files in parallel; "micro-batching"
  * is the row-group/file structure parquet already has, so no re-chunking
  * layer is added (SURVEY.md §2 row 7: insertlimit exists only to bound a
  * single HTTP POST; a bulk columnar sink has no such constraint).
  */
final class ParquetSink(baseDir: String) extends Sink {
  private def path(table: String) = s"$baseDir/$table"

  override def truncate(table: String): Unit = {
    // SaveMode.Overwrite on the next append would also truncate, but the
    // reference exposes truncation as its own operation (index.js:321) —
    // mirror that so truncate-without-rewrite is expressible.
    val dir = new java.io.File(path(table))
    if (dir.exists()) {
      dir.listFiles().foreach(_.delete())
      dir.delete()
    }
  }

  override def append(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path(table))
}

/** Record-batch sink: `foreachPartition` + `grouped(insertLimit)` — the
  * shape a row-protocol destination (InfluxDB line protocol over HTTP, a
  * JDBC upsert, a message bus) needs: executors stream their partition
  * through fixed-size batches, amortizing one request per batch
  * (reference: index.js:209-232 re-chunks pages into insertlimit-sized
  * writePoints calls). `writeBatch` runs ON THE EXECUTOR — it must be
  * serializable and must not capture driver-only state.
  *
  * Empty batches are never issued (`grouped` emits no empty groups) —
  * deliberately diverging from the reference, which POSTs empty point
  * arrays (SURVEY.md §4.4.7).
  */
final class MicroBatchSink(
    insertLimit: Int,
    writeBatch: (String, Seq[Row]) => Unit,
    truncateFn: String => Unit = _ => ()) extends Sink {
  require(insertLimit > 0, "insertLimit must be positive")

  override def truncate(table: String): Unit = truncateFn(table)

  override def append(df: DataFrame, table: String): Unit = {
    val limit = insertLimit
    val fn = writeBatch
    df.foreachPartition { (rows: Iterator[Row]) =>
      rows.grouped(limit).foreach(batch => fn(table, batch))
    }
  }
}

/** InfluxDB line-protocol rendering for the fidelity path: one line per
  * row, `measurement field=value,... timestamp`. The reference's sink
  * speaks the 0.8-era JSON API (index.js:242); modern Influx ingests line
  * protocol, so that is what a production `MicroBatchSink.writeBatch`
  * would POST. Strings are quoted/escaped per the spec; the `time` column
  * becomes the trailing epoch-ns timestamp.
  */
object InfluxLineProtocol {

  private def escapeMeasurement(s: String): String =
    s.replace(",", "\\,").replace(" ", "\\ ")

  private def escapeFieldString(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  def renderField(v: Any): Option[String] = v match {
    case null => None
    case l: Long => Some(s"${l}i")
    case i: Int => Some(s"${i}i")
    case d: Double => Some(d.toString)
    case f: Float => Some(f.toString)
    case b: Boolean => Some(b.toString)
    case s: String => Some("\"" + escapeFieldString(s) + "\"")
    case t: java.sql.Timestamp => Some(s"${t.getTime}i")
    case other => Some("\"" + escapeFieldString(other.toString) + "\"")
  }

  /** Render one row; `timeCol` (TimestampType) becomes the ns timestamp. */
  def render(measurement: String, row: Row, timeCol: String = "time"): String = {
    val schema = row.schema
    val fields = schema.fieldNames.iterator.zipWithIndex
      .filter { case (n, _) => n != timeCol }
      .flatMap { case (n, i) =>
        renderField(row.get(i)).map(v => s"$n=$v")
      }
      .mkString(",")
    val ts = schema.fieldNames.indexOf(timeCol) match {
      case -1 => ""
      case i if row.isNullAt(i) => ""
      case i => " " + row.getAs[java.sql.Timestamp](i).getTime * 1000000L
    }
    s"${escapeMeasurement(measurement)} $fields$ts"
  }
}
