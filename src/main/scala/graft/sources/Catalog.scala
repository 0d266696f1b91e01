package graft.sources

import java.io.File

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

  /** Names of all tables (parquet files) in a scale-factor directory,
    * sorted for determinism.
    */
  def listTables(dir: String): Seq[String] = {
    val fs = Option(new File(dir).listFiles()).getOrElse(Array.empty[File])
    fs.iterator
      .map(_.getName)
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
