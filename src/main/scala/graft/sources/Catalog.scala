package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source-catalog enumeration — the Spark analogue of the reference's
  * "read ALL mongodb collections" entry point (reference: index.js:356
  * `mongodb.collections(...)`) plus its system-collection name filter
  * (reference: index.js:298, substring match on "system").
  *
  * For the harness a "database" is a directory of parquet files; in
  * production this would be `spark.catalog.listTables()` or the MongoDB
  * connector's collection listing. Listing is driver-side metadata work
  * (like any catalog lookup) — the data itself is never driver-resident.
  */
object Catalog {

  /** Names of all tables (parquet files/dirs) in a scale-factor
    * directory, sorted for determinism. Listed through the Hadoop
    * `FileSystem` API — a `java.io.File` walk would silently return
    * nothing for an `hdfs://`/`s3a://` catalog dir on a real cluster.
    */
  def listTables(dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = graft.pipeline.SinkFiles.fileSystem(p)
    val entries =
      if (fs.exists(p)) fs.listStatus(p) else Array.empty[org.apache.hadoop.fs.FileStatus]
    entries.iterator
      .map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet"))
      .toSeq
      .sorted
  }

  /** The reference skips any collection whose name CONTAINS "system"
    * (substring, not prefix — index.js:298; `ecosystem_metrics` would be
    * skipped too). Preserved faithfully, but configurable.
    */
  def nonSystem(names: Seq[String], marker: String = "system"): Seq[String] =
    names.filterNot(_.contains(marker))

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(spark, dir, name)
}
