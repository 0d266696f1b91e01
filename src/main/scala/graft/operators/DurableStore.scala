package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Durable (cross-application) layout for the standing model stores —
  * the missing rung above the app-scoped caches: AnnIndexStore/
  * NgramModelStore/NbModelStore/MixtureModelStore hold their trained
  * artifacts for ONE application, and the l107-l110/l116 serve queries
  * persist catalog tables but drop them per run — so every new
  * application still paid every build job. This module gives each
  * family a fixed on-disk warehouse layout keyed by a CORPUS
  * FINGERPRINT (the l27 content-hash discipline lifted to the corpus:
  * a changed corpus changes the fingerprint and invalidates the store,
  * a byte-identical corpus reuses it), so the SECOND application pays
  * zero training jobs — the daily standing pipeline's actual contract.
  *
  * Layout: `<root>/<family>/<fingerprint>/<part>` parquet dirs (buckets
  * preserved via re-registration DDL), with a `_GRAFT_STORE_COMPLETE`
  * marker inside. Builds STAGE into a private sibling dir (marker
  * written last, inside the staging dir) and PUBLISH with one atomic
  * rename — a crash mid-build leaves only an unreferenced staging dir
  * (the next builder starts fresh), and two concurrent builders race
  * on the rename alone: the loser's rename fails against the winner's
  * published dir, it discards its staging and serves the winner's
  * bytes — no interleaved part files, ever. Root defaults to
  * `spark-warehouse/graft_stores` under the launch dir and is
  * overridable with the `spark.graft.store.root` session conf (a
  * cluster deployment points it at shared storage; the rename must be
  * atomic there, which HDFS-like stores provide).
  *
  * Bucketed parts are written with `bucketBy(Buckets, key)` and
  * re-registered in later applications with `CREATE TABLE ...
  * CLUSTERED BY ... LOCATION ...` over the existing files — Spark
  * recovers the bucket id from the file names, so the serve-side
  * equi-joins stay exchange-free after reload (plan-probed in
  * DurableStoreSpec).
  */
object DurableStore {

  /** One persisted table of a family's layout. */
  final case class Part(name: String, bucket: Option[String])

  /** Bucket width shared by writer and re-registration DDL. */
  val Buckets = 8

  def root(s: SparkSession): String =
    s.conf.getOption("spark.graft.store.root")
      .getOrElse(new java.io.File("spark-warehouse/graft_stores")
        .getAbsolutePath)

  /** Content fingerprint of `dir`'s `table`: row count + order-
    * independent bit_xor of per-row xxhash64 over `hashCols` — one
    * narrow scan and a 16-byte aggregate, never a training job. Rows
    * are keyed (doc_id/vec_id), so xor cancellation needs two fully
    * identical rows, which the fixtures exclude.
    */
  def corpusFingerprint(s: SparkSession, dir: String, table: String,
      hashCols: Seq[String]): String = {
    val r = Tables.load(s, dir, table)
      .agg(count(lit(1)).as("n"),
        bit_xor(xxhash64(hashCols.map(col): _*)).as("x"))
      .head()
    val x = if (r.isNullAt(1)) 0L else r.getLong(1)
    s"n${r.getLong(0)}_x${java.lang.Long.toHexString(x)}"
  }

  private def tableName(family: String, fp: String, part: String) =
    s"graft_store_${family}_${fp}_$part"

  /** The catalog name a part registers under — exposed so plan probes
    * (l123, DurableStoreSpec) can assert the serve plan actually reads
    * the durable tables.
    */
  def registeredName(family: String, fp: String, part: String): String =
    tableName(family, fp, part)

  private def markerFile(s: SparkSession, family: String,
      fp: String): java.io.File =
    new java.io.File(s"${root(s)}/$family/$fp/_GRAFT_STORE_COMPLETE")

  /** True iff the family's durable layout for `fp` is complete on disk
    * (i.e. `loadOrBuild` would reload instead of building).
    */
  def isBuilt(s: SparkSession, family: String, fp: String): Boolean =
    markerFile(s, family, fp).isFile

  /** Serve the family's tables from the durable layout, building it
    * first only if the completion marker is absent. The build body
    * runs under the `durable_<family>` ledger key; a reload issues
    * only catalog DDL and a parquet-footer schema read — zero jobs
    * over the corpus, zero training aggregates (the l122/l123 gate).
    */
  def loadOrBuild(s: SparkSession, family: String, fp: String,
      parts: Seq[Part])(build: => Map[String, DataFrame])
      : Map[String, DataFrame] = synchronized {
    val base = new java.io.File(s"${root(s)}/$family/$fp")
    if (!isBuilt(s, family, fp)) StoreBuildLedger.timed(s"durable_$family") {
      // stage into a private dir (bucketBy requires saveAsTable, so
      // each part is written through a throwaway staging table whose
      // metadata is dropped immediately — only the files matter),
      // marker last, then publish with ONE atomic rename
      val stage = new java.io.File(base.getParentFile,
        s".stage_${fp}_${java.util.UUID.randomUUID().toString.take(8)}")
      java.nio.file.Files.createDirectories(base.getParentFile.toPath)
      // a marker-less base dir is an unpublished leftover (a crash
      // between the old scheme's writes, or manual tampering): it was
      // never served, so clear it for the atomic rename
      if (base.exists())
        graft.pipeline.SinkFiles.deleteRecursive(base.toString)
      val built = build
      try {
        parts.foreach { p =>
          val st = s"${tableName(family, fp, p.name)}_stage"
          s.sql(s"DROP TABLE IF EXISTS $st")
          val w = built(p.name).write.mode("overwrite")
            .option("path", new java.io.File(stage, p.name).toString)
          p.bucket.fold(w)(k => w.bucketBy(Buckets, k)).saveAsTable(st)
          s.sql(s"DROP TABLE IF EXISTS $st")
        }
        java.nio.file.Files.write(
          new java.io.File(stage, "_GRAFT_STORE_COMPLETE").toPath,
          fp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        try java.nio.file.Files.move(stage.toPath, base.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.FileSystemException
              if isBuilt(s, family, fp) =>
            // a concurrent builder published first — serve its bytes
            graft.pipeline.SinkFiles.deleteRecursive(stage.toString)
        }
      } finally {
        if (stage.exists() && !isBuilt(s, family, fp))
          graft.pipeline.SinkFiles.deleteRecursive(stage.toString)
      }
      require(isBuilt(s, family, fp),
        s"durable publish failed for $family/$fp")
    }
    parts.map { p =>
      val t = tableName(family, fp, p.name)
      if (!s.catalog.tableExists(t))
        register(s, t, new java.io.File(base, p.name).toString, p.bucket)
      p.name -> s.table(t)
    }.toMap
  }

  /** Re-register an existing part dir as an external table, restoring
    * the bucket spec so downstream equi-joins stay exchange-free. The
    * schema comes from the parquet footers (a metadata read, not a
    * scan); the files keep Spark's bucket-id naming, which the scan
    * recovers.
    */
  private def register(s: SparkSession, table: String, path: String,
      bucket: Option[String]): Unit = {
    val ddl = s.read.parquet(path).schema.toDDL
    val cluster = bucket
      .map(k => s"CLUSTERED BY ($k) INTO $Buckets BUCKETS")
      .getOrElse("")
    s.sql(s"CREATE TABLE $table ($ddl) USING PARQUET $cluster " +
      s"LOCATION '$path'")
  }

  /** Drop the family's REGISTERED tables (external — files stay). With
    * the family store's in-memory eviction this simulates a fresh
    * application, so a reload gate can assert the zero-rebuild
    * contract inside one process (l122/l123).
    */
  def dropRegistered(s: SparkSession, family: String, fp: String,
      parts: Seq[Part]): Unit = synchronized {
    parts.foreach(p =>
      s.sql(s"DROP TABLE IF EXISTS ${tableName(family, fp, p.name)}"))
  }

  /** Ledger seconds currently accumulated for a family's durable
    * build — the delta across a reload must be exactly zero.
    */
  def buildSeconds(family: String): Double =
    StoreBuildLedger.snapshot.getOrElse(s"durable_$family", 0.0)
}
