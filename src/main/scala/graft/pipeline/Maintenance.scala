package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Sink-side maintenance: the two operations a file-backed time-series
  * destination needs at scale and the reference's one-shot migrator never
  * grew —
  *
  *   - **Compaction**: a micro-batching sink (DSv2 flushes, streaming
  *     epochs) accumulates many small files; readers then pay per-file
  *     open/footer costs and schedulers per-file tasks. Rewrite a series
  *     to ~`targetBytes` files.
  *   - **Retention**: for a date-partitioned series (ParquetSink
  *     partitionCols), dropping expired data is a partition delete —
  *     O(partitions) metadata work, no rewrite. This is the scalable
  *     form of the reference's `DELETE FROM <series> WHERE time < now()`
  *     (index.js:328), which on a real store is a full-series scan.
  *
  * Both go through the Hadoop FileSystem API (HDFS/object-store safe).
  * Compaction is NOT atomic for concurrent readers (swap-in-place); at
  * 100 TB you run it per-partition during quiet windows or move to a
  * table format with snapshot isolation — documented trade-off, same as
  * every raw-file layout.
  */
object Maintenance {

  /** Rewrite a parquet series dir into ~`targetBytes`-sized files.
    * Returns (filesBefore, filesAfter).
    */
  def compactParquet(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val p = new Path(dir)
    val fs = SinkFiles.fileSystem(p)
    def parquetFiles() =
      fs.listStatus(p).filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val before = parquetFiles()
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new Path(p.getParent, p.getName + "__compact_tmp")
    spark.read.parquet(dir).repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    // Swap: remove old data files + their .crc shadows, move new ones in.
    before.foreach(f => fs.delete(f.getPath, false))
    fs.listStatus(p).filter(f => f.getPath.getName.endsWith(".parquet.crc"))
      .foreach(f => fs.delete(f.getPath, false))
    fs.listStatus(tmp)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .foreach(f => fs.rename(f.getPath, new Path(p, f.getPath.getName)))
    fs.delete(tmp, true)
    (before.length, parquetFiles().length)
  }

  /** Drop partitions of a `col=value` hive layout whose VALUE is strictly
    * below `cutoff` (string comparison — ISO dates compare correctly).
    * Returns the dropped partition values.
    */
  def dropPartitionsBelow(dir: String, partitionCol: String,
      cutoff: String): Seq[String] = {
    val p = new Path(dir)
    val fs = SinkFiles.fileSystem(p)
    if (!fs.exists(p)) return Seq.empty
    val prefix = partitionCol + "="
    fs.listStatus(p).toIndexedSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .map(s => (s.getPath, s.getPath.getName.stripPrefix(prefix)))
      .filter { case (_, v) => v < cutoff }
      .map { case (path, v) =>
        fs.delete(path, true)
        v
      }
  }

  /** Auto-compaction policy for a durable MANIFEST lineage (the
    * operators-side counterpart of `compactParquet`): a segment chain
    * grows by one per append and every serve pays the merge-on-read
    * over the whole chain, so a standing deployment compacts past a
    * CHAIN-LENGTH threshold rather than on a calendar. Fires
    * `DurableStore.compactManifest` (crash-atomic swap, stamp-neutral)
    * exactly when the published chain is LONGER than `maxSegments`;
    * at or below the threshold it is a no-op — compaction is bounded
    * maintenance I/O, but it still rewrites the merged artifact, so
    * firing it on every append would reintroduce the O(corpus) write
    * amplification the manifest layout exists to avoid. `transform`
    * must be the lineage's own merge-on-read (e.g.
    * `NgramModelStore.compactInc`'s groupBy-sum/distinct) so serving
    * semantics are preserved by construction. Returns whether a
    * compaction ran. Threshold guidance is measured, not guessed:
    * `graft.ChainBench` records the serve cost at chain lengths
    * 1/4/16 (BASELINE.md's chain-length slope row).
    */
  def autoCompactManifest(spark: SparkSession, family: String,
      fp: String, parts: Seq[graft.operators.DurableStore.Part],
      maxSegments: Int)(
      transform: Map[String, org.apache.spark.sql.DataFrame] =>
        Map[String, org.apache.spark.sql.DataFrame]): Boolean = {
    require(maxSegments >= 1,
      s"autoCompactManifest: maxSegments must be >= 1, got $maxSegments")
    val chain = graft.operators.DurableStore
      .manifestSegments(spark, family, fp).size
    if (chain > maxSegments) {
      graft.operators.DurableStore
        .compactManifest(spark, family, fp, parts)(transform)
      true
    } else false
  }

  /** Last-writer-wins upsert: merge an updates batch into a base table
    * keyed by `keys` and versioned by `versionCol` (higher wins; on a
    * version tie the updates side wins). Null keys must be excluded by
    * the caller — a key is an identity, and SQL NULL is not one.
    *
    * The re-migration story the reference lacks (its only recovery is
    * emptySeries + full rewrite, index.js:321-336): changed source rows
    * merge into the already-migrated series without rewriting it all.
    *
    * 100 TB shape: one shuffle on the merge keys (the window's
    * partitioning), map-side-pruned by AQE; against a date-partitioned
    * sink, restrict the base scan to the partitions present in the
    * updates batch first (join on distinct partition values) so the
    * rewrite touches only affected partitions.
    */
  def upsert(base: org.apache.spark.sql.DataFrame,
      updates: org.apache.spark.sql.DataFrame, keys: Seq[String],
      versionCol: String): org.apache.spark.sql.DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val tagged = base.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc_nulls_last, col("__src").desc)
    tagged.withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1).drop("__rk", "__src")
  }
}
