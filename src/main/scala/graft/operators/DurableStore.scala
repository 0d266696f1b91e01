package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
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
  * Layout: `<root>/<family>/<fingerprint>/...` parquet dirs (buckets
  * preserved via re-registration DDL), with a `_GRAFT_STORE_COMPLETE`
  * marker whose first line names the part-prefix directory. All paths
  * go through Hadoop `FileSystem`, so the root may be a local path, an
  * HDFS URI, or an object-store URI; `spark.graft.store.root`
  * overrides the default `spark-warehouse/graft_stores` under the
  * launch dir.
  *
  * TWO commit protocols, selected by the root's scheme (overridable
  * with `spark.graft.store.commit` = `rename` | `marker`):
  *
  *  - RENAME (default for local/HDFS-like stores with atomic directory
  *    rename): builds STAGE into a private sibling dir (marker written
  *    last, inside the staging dir) and PUBLISH with one atomic rename.
  *    A crash mid-build leaves only an unreferenced staging dir; two
  *    concurrent builders race on the rename alone — the loser's
  *    rename fails against the winner's published dir, it discards its
  *    staging and serves the winner's bytes. A marker-less leftover
  *    base dir (crash under an older layout) is moved ASIDE atomically
  *    and only then deleted — never deleted in place — and if the
  *    moved dir turns out to carry a completion marker (a concurrent
  *    JVM published between our check and the move), it is moved
  *    straight back and served: a published layout is never destroyed.
  *
  *  - MARKER (default for s3/gs/abfs-style object stores, where
  *    directory rename is copy+delete and not atomic): each builder
  *    writes its parts under a UNIQUE `attempt_<...>` prefix inside the
  *    final base dir (no two builders ever touch the same file), and
  *    publishing is ONE create-if-absent of the marker file naming the
  *    winning attempt. The loser's marker create fails, it deletes its
  *    attempt and serves the winner's. Readers resolve part paths
  *    through the marker, so a crash mid-build leaves only an
  *    unreferenced attempt prefix (never a half-readable store). The
  *    residual window is the conditional CREATE itself, provided by
  *    `createExclusive` on every store (HDFS namenode lease,
  *    object-store conditional PUT — S3 If-None-Match — and an O_EXCL
  *    slot reserve on local file systems, where Hadoop's
  *    overwrite=false create is only check-then-act); the protocol
  *    never depends on directory-rename atomicity. This is the
  *    InfluxTable staged-driver-commit discipline applied to the
  *    store layout.
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

  /** Completion-marker file name. First line routes the reader:
    * `.` (rename-mode parts at the base dir), `attempt_<...>`
    * (marker-mode parts under the named attempt dir), or `manifest`
    * (segment-lineage layout — the following `seg_` lines name the
    * ordered delta partitions, resolved by `manifestTables`). A
    * trailing `ts=<millis>.<seq>` line stamps the publish for
    * generation-ordered retention (`vacuumKeepLatest`); markers from
    * older layouts without the stamp sort as oldest.
    *
    * A layout may carry VERSIONED markers `_GRAFT_STORE_COMPLETE.g<k>`
    * (k >= 1; the bare name is generation 0): `compactManifest` swaps
    * the manifest by CREATING the next generation's marker (one
    * create-if-absent — atomic) and only then deleting the superseded
    * ones, so a crash anywhere in the swap leaves the layout serving
    * either the old or the new chain, never unbuilt. Readers resolve
    * the highest-numbered marker whose content is complete (a torn
    * higher generation falls back to the one below it).
    *
    * TEAR DETECTION (round 16): a marker candidate counts as complete
    * only when its content ends with the trailing `ts=` stamp line —
    * every marker format writes the stamp LAST, so a partially
    * visible marker (the create/write/close content-lag window on
    * HDFS/object stores, or a crash mid-write) whose prefix is e.g.
    * `manifest\nseg_a` can never resolve as a complete manifest and
    * silently serve a truncated segment union. The one grandfathered
    * form is the exact single-line `.` — the pre-round-14 rename-mode
    * marker standing layouts still carry, which is written inside the
    * staging dir BEFORE the atomic publish rename and therefore never
    * content-torn on the published side.
    */
  val Marker = "_GRAFT_STORE_COMPLETE"

  /** Marker content FORMAT version, carried as a `fmt=<n>` line (line
    * 2, after the routing head). Format 1 is everything written before
    * round 16 (no `fmt=` line); readers accept any format up to this
    * one and ERROR LOUDLY on a higher number — a layout written by a
    * newer engine must never be half-parsed, swept as debris, or
    * silently skipped in favor of an older generation. The migration
    * path for a retired format is `upgradeLayoutFormat`: re-emit the
    * effective marker's content in the current format as the NEXT
    * marker generation (the compaction swap discipline — one
    * create-if-absent, stamp carried verbatim, content untouched), so
    * an old layout upgrades in place under the same fingerprint.
    */
  val CurrentMarkerFormat = 2

  private def fmtLine: String = s"fmt=$CurrentMarkerFormat"

  /** Format version a marker's lines declare (absent line = 1; an
    * unparseable number = effectively-infinite, so the loud-error path
    * below fires rather than a silent misread).
    */
  private def formatOf(lines: Seq[String]): Int =
    lines.collectFirst { case l if l.startsWith("fmt=") =>
      l.stripPrefix("fmt=").toIntOption.getOrElse(Int.MaxValue)
    }.getOrElse(1)

  private def requireKnownFormat(lines: Seq[String], at: => String): Unit =
    require(formatOf(lines) <= CurrentMarkerFormat,
      s"marker at $at declares format ${formatOf(lines)} but this " +
        s"engine reads up to $CurrentMarkerFormat — written by a newer " +
        "engine; upgrade the engine (never sweep or re-serve this " +
        "layout from the old one)")

  /** Completeness of a marker candidate's CONTENT (see the tear-
    * detection note on `Marker`).
    */
  private def markerComplete(lines: Seq[String]): Boolean =
    lines.headOption.exists(_.nonEmpty) &&
      (lines.last.startsWith("ts=") || lines == Seq("."))

  /** `ts=<millis>.<seq>` parse, degrading: a hand-tampered or
    * corrupted stamp yields None instead of a MatchError, so sweeps
    * and retention ordering classify the layout (oldest / debris)
    * rather than aborting (the r15 VERDICT nit).
    */
  private def parseStamp(line: String): Option[(Long, Long)] =
    line.stripPrefix("ts=").split("\\.", 2) match {
      case Array(a, b) =>
        for (ms <- a.toLongOption; sq <- b.toLongOption) yield (ms, sq)
      case _ => None
    }

  private def stampOf(lines: Seq[String]): (Long, Long) =
    lines.find(_.startsWith("ts=")).flatMap(parseStamp)
      .getOrElse((0L, 0L))

  /** Marker generation encoded in a marker FILE name (0 for the bare
    * name, k for `.g<k>`; -1 = not a marker of ours).
    */
  private def markerGen(name: String): Long =
    if (name == Marker) 0L
    else if (name.startsWith(Marker + ".g"))
      name.stripPrefix(Marker + ".g").toLongOption.getOrElse(-1L)
    else -1L

  /** Test-only fault injection for the protocol specs (the
    * kill-at-every-interleaving compaction-swap spec): called with a
    * step name at each crash-window boundary; a spec swaps in a
    * throwing hook to simulate a crash exactly there. A no-op in
    * production — never set outside src/test.
    */
  private[graft] var faultHook: String => Unit = _ => ()

  /** Per-JVM tiebreak for publish stamps minted on the same
    * millisecond; cross-JVM same-millis ties fall back to the
    * fingerprint name (any total order works for retention).
    */
  private val stampSeq = new java.util.concurrent.atomic.AtomicLong()

  private def stampLine(): String =
    s"ts=${System.currentTimeMillis()}.${stampSeq.incrementAndGet()}"

  def root(s: SparkSession): String =
    s.conf.getOption("spark.graft.store.root")
      .getOrElse(new java.io.File("spark-warehouse/graft_stores")
        .getAbsolutePath)

  /** Commit protocol for the session's store root: explicit conf wins;
    * otherwise object-store schemes default to `marker`, everything
    * else (local, HDFS, viewfs — atomic dir rename) to `rename`.
    */
  def commitMode(s: SparkSession): String =
    s.conf.getOption("spark.graft.store.commit").getOrElse {
      val scheme = Option(new Path(root(s)).toUri.getScheme)
        .getOrElse("file").toLowerCase
      if (Set("s3", "s3a", "s3n", "gs", "oss", "cos", "swift",
          "wasb", "wasbs", "abfs", "abfss").contains(scheme)) "marker"
      else "rename"
    }

  private def fsOf(s: SparkSession, p: Path): FileSystem =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  /** ATOMIC create-if-absent of a small control file (marker, head,
    * batch ledger) — THE commit primitive every race here reduces to.
    * On HDFS `FileSystem.create(overwrite = false)` is atomic (a
    * namenode lease), and object stores provide conditional PUT — but
    * on the LOCAL file system it is CHECK-THEN-ACT
    * (`RawLocalFileSystem` tests existence and then opens a plain
    * truncating `FileOutputStream`), so two same-instant creators can
    * BOTH "win" and the second silently overwrites the first — found
    * by the round-16 forced-collision append race; every prior
    * in-sandbox race survived only because the window is
    * microseconds. Local stores therefore RESERVE the slot first with
    * an O_EXCL `java.nio` createFile (atomic at the OS level) and
    * only then write the content — and its `.crc` shadow — through
    * the Hadoop stream; losers get FileAlreadyExistsException on the
    * reserve. The reserved-but-unwritten window reads as a TORN
    * marker, which resolution already skips or waits out (the tear
    * discipline). Returns false when the file already existed.
    */
  private def createExclusive(f: FileSystem, p: Path,
      content: String): Boolean = {
    val bytes = content.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val isLocal = f.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
      f.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]
    if (isLocal) {
      val io = new java.io.File(p.toUri.getPath)
      io.getParentFile.mkdirs()
      try java.nio.file.Files.createFile(io.toPath)
      catch {
        case _: java.nio.file.FileAlreadyExistsException => return false
      }
      val out = f.create(p, true) // the slot is ours by the reserve
      try out.write(bytes) finally out.close()
      true
    } else {
      try {
        val out = f.create(p, false)
        try out.write(bytes) finally out.close()
        true
      } catch {
        case _: java.io.IOException if f.exists(p) => false
      }
    }
  }

  private def basePath(s: SparkSession, family: String, fp: String): Path =
    new Path(new Path(root(s), family), fp)

  /** Content fingerprint of `dir`'s `table` — one narrow scan and a
    * 24-byte aggregate, never a training job. Three order-independent
    * folds over the per-row xxhash64 of `hashCols`: row count, bit_xor,
    * and the SUM (exact via decimal, reduced mod 2^64 on the driver).
    * xor alone cancels on duplicate rows — two different corpora each
    * containing a duplicated pair ({X,X,Y} vs {Z,Z,Y}) xor to the same
    * value at equal counts — but their sums differ (2X+Y vs 2Z+Y), so
    * a collision needs count AND xor AND sum to agree, with no
    * key-uniqueness precondition on the fingerprinted table.
    */
  def corpusFingerprint(s: SparkSession, dir: String, table: String,
      hashCols: Seq[String]): String =
    frameFingerprint(Tables.load(s, dir, table), hashCols)

  /** `corpusFingerprint` over an arbitrary frame — the incremental-
    * maintenance face (l131) fingerprints corpus SLICES (base vs
    * base+delta), which are frames, not stored tables.
    */
  def frameFingerprint(df: DataFrame, hashCols: Seq[String]): String = {
    val h = xxhash64(hashCols.map(col): _*)
    val r = df.agg(count(lit(1)).as("n"),
        bit_xor(h).as("x"),
        sum(h.cast("decimal(38,0)")).as("s"))
      .head()
    val x = if (r.isNullAt(1)) 0L else r.getLong(1)
    val sm = if (r.isNullAt(2)) java.math.BigInteger.ZERO
      else r.getDecimal(2).toBigInteger
        .mod(java.math.BigInteger.ONE.shiftLeft(64))
    s"n${r.getLong(0)}_x${java.lang.Long.toHexString(x)}" +
      s"_s${sm.toString(16)}"
  }

  private def tableName(family: String, fp: String, part: String) =
    s"graft_store_${family}_${fp}_$part"

  /** The catalog name a part registers under — exposed so plan probes
    * (l123, DurableStoreSpec) can assert the serve plan actually reads
    * the durable tables.
    */
  def registeredName(family: String, fp: String, part: String): String =
    tableName(family, fp, part)

  private def markerPath(base: Path): Path = new Path(base, Marker)

  private def markerPathGen(base: Path, gen: Long): Path =
    if (gen == 0L) markerPath(base) else new Path(base, s"$Marker.g$gen")

  /** The layout's marker files, highest generation first. Publishes
    * write generation 0; only `compactManifest` mints higher ones.
    */
  private def markerCandidates(f: FileSystem, base: Path)
      : Seq[(Long, Path)] =
    if (!f.exists(base)) Nil
    else f.listStatus(base).toSeq.map(_.getPath)
      .map(p => (markerGen(p.getName), p))
      .filter(_._1 >= 0)
      .sortBy(-_._1)

  /** True iff the family's durable layout for `fp` is complete on disk
    * (i.e. `loadOrBuild` would reload instead of building).
    */
  def isBuilt(s: SparkSession, family: String, fp: String): Boolean = {
    val base = basePath(s, family, fp)
    markerCandidates(fsOf(s, base), base).nonEmpty
  }

  /** Full marker content (short-read-safe: loops to EOF — a single
    * read() may return a prefix on any FileSystem).
    */
  private def readFully(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray,
        java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Marker lines of the layout's EFFECTIVE marker: the highest
    * generation whose content is complete. A torn candidate (created
    * but its content not yet visible — the HDFS create/write/close
    * window, or a crashed compaction swap) falls back to the next
    * generation down, so a mid-swap reader serves the previous chain
    * instead of failing. Only when NO candidate is readable (a fresh
    * publish whose content lags) does the read retry briefly and then
    * fail loudly — never silently resolve to the base dir.
    */
  private def tryMarkerLines(s: SparkSession, base: Path,
      retries: Int): Option[Seq[String]] = {
    val f = fsOf(s, base)
    def resolve(): Option[Seq[String]] =
      markerCandidates(f, base).iterator
        .flatMap { case (_, p) =>
          // a candidate may vanish between list and read (a concurrent
          // compaction deleting the superseded generation) or be
          // mid-write (ChecksumFileSystem throws EOF/Checksum on a
          // file whose crc shadow lags the content): either way it is
          // torn RIGHT NOW — skip it; resolution falls back or retries
          try Some(readFully(f, p).linesIterator.toSeq)
          catch { case _: java.io.IOException => None }
        }
        .find(markerComplete)
        .map { lines => requireKnownFormat(lines, base.toString); lines }
    var tries = 0
    var r = resolve()
    while (r.isEmpty && tries < retries &&
        markerCandidates(f, base).nonEmpty) {
      Thread.sleep(50)
      tries += 1
      r = resolve()
    }
    r
  }

  private def markerLines(s: SparkSession, base: Path): Seq[String] = {
    val lines = tryMarkerLines(s, base, retries = 20)
    require(lines.nonEmpty,
      s"durable marker at $base is absent, empty or torn — publish in " +
        "flight or crashed; retry or rebuild-check before reading this " +
        "layout")
    lines.get
  }

  /** The part-prefix dir the marker names (`.` = the base dir itself). */
  private def partPrefix(s: SparkSession, base: Path): String =
    markerLines(s, base).head match {
      case a if a.startsWith("attempt_") => a
      case "manifest" => sys.error(
        s"layout at $base is a segment manifest — resolve its parts " +
          "through manifestTables, not partLocation")
      case _ => "."
    }

  /** Publish stamp of a complete layout, for generation ordering:
    * (millis, per-JVM seq). Markers predating the stamp line sort as
    * the oldest generation.
    */
  def publishStampOf(s: SparkSession, family: String,
      fp: String): (Long, Long) =
    stampOf(markerLines(s, basePath(s, family, fp)))

  /** Resolved location of a published part's parquet dir. */
  def partLocation(s: SparkSession, family: String, fp: String,
      part: String): String = {
    val base = basePath(s, family, fp)
    val pfx = partPrefix(s, base)
    val dir = if (pfx == ".") base else new Path(base, pfx)
    new Path(dir, part).toString
  }

  /** Write every part's files under `dir` (bucketBy requires
    * saveAsTable, so each part goes through a throwaway staging table
    * whose metadata is dropped immediately — only the files matter).
    */
  private def writeParts(s: SparkSession, family: String, fp: String,
      parts: Seq[Part], built: Map[String, DataFrame],
      dir: Path): Unit =
    parts.foreach { p =>
      val st = s"${tableName(family, fp, p.name)}_stage"
      s.sql(s"DROP TABLE IF EXISTS $st")
      val w = built(p.name).write.mode("overwrite")
        .option("path", new Path(dir, p.name).toString)
      p.bucket.fold(w)(k => w.bucketBy(Buckets, k)).saveAsTable(st)
      s.sql(s"DROP TABLE IF EXISTS $st")
    }

  private def newSuffix(fp: String) =
    s"${fp}_${java.util.UUID.randomUUID().toString.take(8)}"

  /** RENAME protocol: stage dir (marker last, inside), one atomic
    * directory rename to publish.
    */
  private def publishByRename(s: SparkSession, family: String,
      fp: String, parts: Seq[Part])(build: => Map[String, DataFrame])
      : Unit = {
    val base = basePath(s, family, fp)
    val f = fsOf(s, base)
    f.mkdirs(base.getParent)
    // a marker-less base dir is an unpublished leftover (a crash under
    // an older layout, or manual tampering): move it ASIDE atomically
    // and delete the moved dir — never delete in place. If the moved
    // dir carries a marker after all (a concurrent JVM published
    // between our check and the move), move it straight back: a
    // published layout is never destroyed.
    if (f.exists(base) && !f.exists(markerPath(base))) {
      val aside = new Path(base.getParent, s".aside_${newSuffix(fp)}")
      if (f.rename(base, aside)) {
        if (f.exists(new Path(aside, Marker))) {
          // ours was the displaced winner; if yet another builder
          // published meanwhile, the displaced copy is a duplicate
          if (!f.rename(aside, base)) f.delete(aside, true)
        } else f.delete(aside, true)
      }
      // rename false: base vanished or a winner published under it —
      // the re-check below serves whatever is there now
    }
    if (!f.exists(markerPath(base))) {
      val stage = new Path(base.getParent, s".stage_${newSuffix(fp)}")
      val built = build
      try {
        writeParts(s, family, fp, parts, built, stage)
        val out = f.create(new Path(stage, Marker), true)
        try out.write(
          s".\n$fmtLine\n${stampLine()}"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        // pre-check RIGHT before the rename: the Hadoop FileSystem
        // contract moves src UNDER an existing destination dir (and
        // returns true), so renaming against an already-published base
        // would nest our staging dir INSIDE the winner's layout
        var won = !f.exists(markerPath(base)) && f.rename(stage, base)
        if (won) {
          // belt-and-braces for the pre-check's residual window: if a
          // winner published between the check and the rename, our
          // "successful" rename was the nesting move — reclaim it
          val nested = new Path(base, stage.getName)
          if (f.exists(nested)) { f.delete(nested, true); won = false }
        }
        if (!won) {
          // a concurrent builder published first — serve its bytes
          require(f.exists(markerPath(base)),
            s"durable publish rename failed with no winner: $base")
          if (f.exists(stage)) f.delete(stage, true)
        }
      } finally {
        if (f.exists(stage) && !f.exists(markerPath(base)))
          f.delete(stage, true)
      }
    }
  }

  /** MARKER protocol: unique attempt prefix inside the final base dir,
    * publish = one create-if-absent of the marker naming the attempt.
    */
  private def publishByMarker(s: SparkSession, family: String,
      fp: String, parts: Seq[Part])(build: => Map[String, DataFrame])
      : Unit = {
    val base = basePath(s, family, fp)
    val f = fsOf(s, base)
    val attempt = s"attempt_${newSuffix(fp)}"
    val built = build
    val dir = new Path(base, attempt)
    try {
      writeParts(s, family, fp, parts, built, dir)
      // one atomic create-if-absent — the ENTIRE race
      val won = createExclusive(f, markerPath(base),
        s"$attempt\n$fmtLine\n${stampLine()}")
      if (!won) f.delete(dir, true)
    } finally {
      if (f.exists(dir) && !f.exists(markerPath(base)))
        f.delete(dir, true)
    }
  }

  /** Serve the family's tables from the durable layout, building it
    * first only if the completion marker is absent. The build body
    * runs under the `durable_<family>` ledger key; a reload issues
    * only catalog DDL and a parquet-footer schema read — zero jobs
    * over the corpus, zero training aggregates (the l122/l123 gate).
    */
  def loadOrBuild(s: SparkSession, family: String, fp: String,
      parts: Seq[Part])(build: => Map[String, DataFrame])
      : Map[String, DataFrame] = synchronized {
    if (!isBuilt(s, family, fp)) StoreBuildLedger.timed(s"durable_$family") {
      if (commitMode(s) == "marker")
        publishByMarker(s, family, fp, parts)(build)
      else
        publishByRename(s, family, fp, parts)(build)
      require(isBuilt(s, family, fp),
        s"durable publish failed for $family/$fp")
    }
    parts.map { p =>
      val t = tableName(family, fp, p.name)
      if (!s.catalog.tableExists(t))
        register(s, t, partLocation(s, family, fp, p.name), p.bucket)
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

  // ------------------------------------------------------------------
  // Segment-manifest lineages: the O(delta)-WRITE publish shape.
  //
  // The plain `loadOrBuild` layout re-writes every part under each new
  // fingerprint — right for retrain lineages (the artifacts genuinely
  // change), but write-amplifying for INCREMENTAL ones: at 100 TB a
  // daily append would copy the corpus-sized index to add a day's
  // rows. Manifest lineages store parts as append-only DELTA
  // PARTITIONS instead:
  //
  //   <root>/<family>/seg_<uuid>/<part>/   immutable segment dirs,
  //       written once by `writeSegment` (its own completion marker is
  //       created last, so a crashed writer leaves only a marker-less
  //       segment — debris, never a half-readable store);
  //   <root>/<family>/<fp>/_GRAFT_STORE_COMPLETE   the fingerprint's
  //       MANIFEST: ONE create-if-absent (`createExclusive` — the
  //       marker-mode commit discipline, atomic on every supported
  //       store, never a directory rename) whose `seg_`
  //       lines name the ordered segments composing the layout.
  //
  // Readers resolve each part as the UNION of the listed segments'
  // part dirs (a segment may carry a subset of the family's parts —
  // frozen model artifacts live only in the base segment). An append
  // therefore WRITES only its delta segment plus one manifest file;
  // the standing segments are never copied or touched (l131's
  // write-amplification gate pins exactly that). Merge semantics are
  // the lineage's own: append-only artifacts (ANN lists/codes/norms)
  // union as-is; additive count tables (LM pairs, DSIR buckets, NB
  // features) merge by a vocab-bounded groupBy-sum ON READ — the
  // LSM-tree trade. A lineage that accumulates many segments compacts
  // IN PLACE with `compactManifest` (crash-atomic versioned-marker
  // swap, content and fingerprint unchanged — never a retrain;
  // `Maintenance.autoCompactManifest` fires it past a chain-length
  // threshold, the curve measured by graft.ChainBench), and the
  // periodic retrain that refreshes frozen models remains the retrain
  // family's single-layout build.
  //
  // Trade-off vs `loadOrBuild`: the multi-segment union read is a
  // plain multi-dir parquet scan, so bucket co-location applies only
  // once a part is carried by a SINGLE segment — base-generation
  // frozen artifacts, and every part after compaction — which
  // `manifestTables` re-registers CLUSTERED BY (l137's plan probe).
  // ------------------------------------------------------------------

  private def famDir(s: SparkSession, family: String): Path =
    new Path(root(s), family)

  /** Write ONE immutable segment of `family` holding `built`'s parts
    * (a subset of the family's part list) and return its name. The
    * segment's completion marker is created last: a crash mid-write
    * leaves a marker-less `seg_` dir that no manifest will ever name
    * (vacuum debris), and the unique name means two writers never
    * touch the same files — no rename anywhere, object-store-safe.
    */
  def writeSegment(s: SparkSession, family: String, parts: Seq[Part],
      built: Map[String, DataFrame]): String = {
    val fam = famDir(s, family)
    val f = fsOf(s, fam)
    f.mkdirs(fam)
    // identifier-safe (no dashes): the staging-table name embeds it
    val seg = "seg_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val dir = new Path(fam, seg)
    writeParts(s, family, seg, parts.filter(p => built.contains(p.name)),
      built, dir)
    require(createExclusive(f, new Path(dir, Marker),
      s".\n$fmtLine\n${stampLine()}"),
      s"fresh segment $seg already carried a marker — UUID collision?")
    seg
  }

  /** True iff `seg` finished writing (its completion marker exists). */
  def segmentComplete(s: SparkSession, family: String,
      seg: String): Boolean = {
    val dir = new Path(famDir(s, family), seg)
    fsOf(s, dir).exists(new Path(dir, Marker))
  }

  /** The ordered segment list a published manifest names. A complete
    * layout in the RENAME/MARKER format under a manifest family is a
    * retired-format leftover (the lineage predates its round-14
    * manifest migration): refuse loudly — auto-migrating would destroy
    * a layout an old-version reader may still be serving — and name
    * the documented one-time sweep.
    */
  def manifestSegments(s: SparkSession, family: String,
      fp: String): Seq[String] = {
    val lines = markerLines(s, basePath(s, family, fp))
    require(lines.head == "manifest",
      s"$family/$fp is not a manifest layout (marker head: " +
        s"'${lines.head}') — a retired-format leftover; sweep it once " +
        s"with DurableStore.vacuum(s, \"$family\", keep = Set(\"-\")) " +
        "(or delete the fingerprint dir) and rebuild")
    lines.filter(_.startsWith("seg_"))
  }

  /** (path, length, modificationTime) of every file under a segment —
    * the write-amplification gates' evidence that an append left the
    * standing segments byte-untouched.
    */
  def segmentFileStats(s: SparkSession, family: String,
      seg: String): Set[(String, Long, Long)] = {
    val dir = new Path(famDir(s, family), seg)
    val f = fsOf(s, dir)
    def walk(p: Path): Seq[(String, Long, Long)] =
      f.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath)
        else Seq((st.getPath.toString, st.getLen,
          st.getModificationTime))
      }
    walk(dir).toSet
  }

  /** Segments referenced by ANY complete manifest of the family, plus
    * segments PINNED by a complete batch ledger (`writeBatchSegmentOnce`
    * — an ingest run's written-but-not-yet-published micro-batch
    * segments must survive retention across a driver restart, however
    * long the outage; the ledger is the durable record that a replayed
    * batch already landed) — the loser-cleanup / vacuum reachability
    * set.
    */
  private def referencedSegments(s: SparkSession,
      family: String): Set[String] = {
    val fam = famDir(s, family)
    val f = fsOf(s, fam)
    if (!f.exists(fam)) return Set.empty
    val children = f.listStatus(fam).toSeq
    val fromManifests = children
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith(".")
        && !st.getPath.getName.startsWith("seg_"))
      .flatMap { st =>
        // a torn/unreadable marker contributes nothing: its layout is
        // unserveable debris (vacuum classifies it; an abort here would
        // take the whole sweep down with it — the r14 ADVICE fix)
        tryMarkerLines(s, st.getPath, retries = 3) match {
          case Some(lines) if lines.head == "manifest" =>
            lines.filter(_.startsWith("seg_"))
          case _ => Nil
        }
      }
    val fromLedgers = children
      .filter(st => !st.isDirectory &&
        st.getPath.getName.startsWith(BatchLedgerPrefix))
      .flatMap { st =>
        try {
          val lines = readFully(f, st.getPath).linesIterator.toSeq
          if (markerComplete(lines) && lines.head.startsWith("seg_"))
            Some(lines.head)
          else None
        } catch { case _: java.io.IOException => None }
      }
    (fromManifests ++ fromLedgers).toSet
  }

  /** Resolve a published manifest layout's parts: each is the UNION of
    * the listed segments' part dirs (segments lacking the part are
    * skipped — frozen artifacts live only in the base segment). A
    * footer-driven read, zero jobs over the data.
    *
    * BUCKET RECOVERY: a part carried by exactly ONE segment (a base
    * generation's frozen artifact, or any part after `compactManifest`
    * collapsed the chain) IS a bucketed single-dir layout — its files
    * were written with `bucketBy` and keep Spark's bucket-id naming —
    * so it re-registers `CLUSTERED BY` exactly like `register()` does
    * for retrain lineages, and serve-side joins/aggregations on the
    * bucket key plan exchange-free (l137's post-compaction plan probe).
    * Multi-segment unions stay plain multi-dir scans — the LSM
    * merge-on-read trade compaction exists to bound.
    */
  def manifestTables(s: SparkSession, family: String, fp: String,
      parts: Seq[Part]): Map[String, DataFrame] = {
    val fam = famDir(s, family)
    val f = fsOf(s, fam)
    val segs = manifestSegments(s, family, fp)
    parts.map { p =>
      val carrying = segs
        .filter(seg => f.exists(new Path(fam, new Path(seg, p.name))))
      require(carrying.nonEmpty,
        s"manifest $family/$fp lists no segment carrying part ${p.name}")
      val dirs = carrying
        .map(seg => new Path(fam, new Path(seg, p.name)).toString)
      val df =
        if (carrying.size == 1 && p.bucket.isDefined) {
          val t = tableName(family, fp, s"${carrying.head}_${p.name}")
          if (!s.catalog.tableExists(t))
            register(s, t, dirs.head, p.bucket)
          s.table(t)
        } else s.read.parquet(dirs: _*)
      p.name -> df
    }.toMap
  }

  /** Publish an explicit ordered segment list as `fp`'s manifest: ONE
    * create-if-absent of the manifest marker. Returns false when a
    * concurrent publisher won (the caller decides what to do with its
    * own now-unreferenced segments — `loadOrBuildManifest` reclaims
    * them; an ingest loop that publishes per window typically retries
    * under the next fingerprint). This is the ingest-loop face of the
    * manifest protocol: the caller wrote its segments itself (e.g. one
    * per micro-batch, t52) and the publish is not a build, so nothing
    * here touches the build ledger.
    */
  def publishManifest(s: SparkSession, family: String, fp: String,
      segs: Seq[String]): Boolean = {
    require(segs.nonEmpty && segs.forall(_.startsWith("seg_")),
      s"manifest publish for $family/$fp got no segment list")
    val base = basePath(s, family, fp)
    val f = fsOf(s, base)
    f.mkdirs(base)
    val won = createExclusive(f, markerPath(base),
      s"manifest\n$fmtLine\n${segs.mkString("\n")}\n${stampLine()}")
    if (won) {
      // post-win verification: a vacuum that ran between our
      // writeSegment calls and this publish may have swept a listed
      // segment as unreferenced (it WAS unreferenced until the marker
      // existed). Publishing a manifest naming deleted segments would
      // poison the layout permanently — isBuilt true, every read
      // failing, no self-heal — so re-check now and retract the marker
      // rather than leave broken published state. (A graced vacuum
      // never sweeps fresh segments; this guards the grace-less one.)
      val missing = segs.filterNot(g => segmentComplete(s, family, g))
      if (missing.nonEmpty) {
        f.delete(markerPath(base), false)
        sys.error(s"manifest publish for $family/$fp raced a vacuum: " +
          s"listed segments $missing are gone — marker retracted, " +
          "rebuild required")
      }
    }
    won
  }

  /** Serve a manifest lineage's fingerprint, building only if the
    * manifest is absent: the build body writes its delta segment(s)
    * via `writeSegment` and returns the FULL ordered segment list to
    * publish (typically the base manifest's segments plus one new
    * delta). Publish = one create-if-absent of the manifest marker; a
    * loser deletes its own segments that no published manifest
    * references and serves the winner's layout. Build seconds accrue
    * under `durable_<family>`; a reload reads the marker and parquet
    * footers only.
    */
  def loadOrBuildManifest(s: SparkSession, family: String, fp: String,
      parts: Seq[Part])(build: => Seq[String])
      : Map[String, DataFrame] = synchronized {
    if (!isBuilt(s, family, fp)) StoreBuildLedger.timed(s"durable_$family") {
      val segs = build
      if (!publishManifest(s, family, fp, segs)) {
        // loser: reclaim own segments nobody references (shared base
        // segments stay — other manifests name them)
        val f = fsOf(s, basePath(s, family, fp))
        val ref = referencedSegments(s, family)
        segs.filterNot(ref).foreach(seg =>
          f.delete(new Path(famDir(s, family), seg), true))
      }
      require(isBuilt(s, family, fp),
        s"durable manifest publish failed for $family/$fp")
    }
    manifestTables(s, family, fp, parts)
  }

  /** Maintenance-window COMPACTION of a manifest layout — the LSM
    * merge the segment lineages defer: read the fingerprint's current
    * segment union, apply the lineage's merge `transform` (identity
    * for append-only artifacts like ANN lists; the vocab-bounded
    * groupBy-sum/distinct for count lineages — pass the SAME merge
    * the lineage's `*Of` reader applies, so read semantics are
    * preserved by construction), write ONE merged segment, and swap
    * the manifest to name just that segment. Content is unchanged —
    * the fingerprint stays the fingerprint — only the file layout
    * contracts, so the now-unreferenced old segments become vacuum
    * stale data (segments other manifests still list — e.g. the base
    * generation's — remain referenced and survive the sweep).
    *
    * The swap is CRASH-ATOMIC (round 15; previously a delete+create
    * window could leave the fingerprint unbuilt and void the
    * never-a-retrain economics): the new chain publishes as the NEXT
    * marker GENERATION (`_GRAFT_STORE_COMPLETE.g<k+1>`, one
    * create-if-absent — the same atomic primitive as every publish
    * here), and only after that create succeeds are the superseded
    * generations' markers deleted as cleanup. Readers resolve the
    * highest COMPLETE marker, so a crash at any interleaving point
    * serves either the old chain (crash before the create, or a torn
    * new marker — skipped by resolution) or the new one (crash after)
    * — never unbuilt; orphaned artifacts (the merged segment, a torn
    * or superseded marker file) are vacuum debris. The swap is also
    * STAMP-NEUTRAL: the new marker carries the ORIGINAL `ts=` publish
    * stamp verbatim, so compacting an older generation cannot promote
    * it past genuinely newer ones under `vacuumKeepLatest` (the r14
    * ADVICE finding). A concurrent reader that resolved part paths
    * through the old marker keeps working until a vacuum sweeps the
    * superseded segments (grace-able — `vacuum(graceMillis)`).
    * Seconds accrue under `compact_<family>`: compaction is bounded
    * maintenance I/O, never a training job — the l137 gate pins that
    * the durable build key stays frozen across it.
    */
  def compactManifest(s: SparkSession, family: String, fp: String,
      parts: Seq[Part])(
      transform: Map[String, DataFrame] => Map[String, DataFrame])
      : Unit = synchronized {
    StoreBuildLedger.timed(s"compact_$family") {
      val base = basePath(s, family, fp)
      val f = fsOf(s, base)
      val lines = markerLines(s, base)
      require(lines.head == "manifest",
        s"compactManifest: $family/$fp is not a manifest layout")
      // highest EXISTING generation (readable or torn — a torn higher
      // marker still claims its number, so we mint past it)
      val curGen = markerCandidates(f, base).head._1
      val stamp = lines.find(_.startsWith("ts=")).getOrElse(stampLine())
      val merged = transform(manifestTables(s, family, fp, parts))
      // the merged frames read the OLD segments lazily; writeSegment
      // materializes them into the new segment while the old dirs are
      // still on disk, BEFORE the manifest swap
      val seg = writeSegment(s, family, parts, merged)
      faultHook("compact_segment_written")
      val next = markerPathGen(base, curGen + 1)
      val won = createExclusive(f, next,
        s"manifest\n$fmtLine\n$seg\n$stamp")
      if (!won) {
        // a concurrent compactor swapped first: its chain serves the
        // same content; our merged segment is unreferenced — reclaim
        if (!referencedSegments(s, family).contains(seg))
          f.delete(new Path(famDir(s, family), seg), true)
      } else {
        // post-win verification (the publishManifest discipline): a
        // grace-less concurrent vacuum may have swept the merged
        // segment — unreferenced until this marker existed — between
        // writeSegment and the create; a generation naming deleted
        // files would poison every read with no self-heal. Retract it:
        // the superseded markers still exist (cleanup below has not
        // run), so readers keep serving the OLD chain untouched — its
        // segments were reference-protected throughout.
        if (!segmentComplete(s, family, seg)) {
          f.delete(next, false)
          sys.error(s"compaction swap for $family/$fp raced a vacuum: " +
            s"merged segment $seg is gone — swap retracted, the prior " +
            "chain still serves; re-run compaction, or run vacuums " +
            "with a grace next to live maintenance")
        }
        // generation-resurrection guard (the r15 ADVICE race): a
        // compactor holding a stale curGen can succeed its create of a
        // generation the real winner already minted AND cleaned up
        // (A swaps g0->g1, compacts again g1->g2 deleting g1; B, still
        // targeting g1, creates it) — reads stay correct (highest
        // generation wins) but B's lower-generation marker would name
        // its own merged segment as resurrected debris. Re-list after
        // winning and RETRACT if a higher generation exists now,
        // mirroring the raced-vacuum retraction; the genuinely current
        // chain keeps serving and B's merged segment is reclaimed.
        if (markerCandidates(f, base).head._1 > curGen + 1) {
          f.delete(next, false)
          if (!referencedSegments(s, family).contains(seg))
            f.delete(new Path(famDir(s, family), seg), true)
        } else {
          faultHook("compact_marker_created")
          // cleanup, not correctness: readers already resolve g(cur+1)
          markerCandidates(f, base).filter(_._1 <= curGen)
            .foreach(c => f.delete(c._2, false))
          // drop this session's seg-keyed registrations against the
          // superseded chain (their files become vacuum stale data)
          dropFpRegistrations(s, family, fp, keepSeg = Some(seg))
        }
      }
    }
  }

  /** Drop this session's registered tables for `family`/`fp` except
    * those keyed to `keepSeg` (the catalog lowercases identifiers —
    * compare folded).
    */
  private def dropFpRegistrations(s: SparkSession, family: String,
      fp: String, keepSeg: Option[String]): Unit = {
    val pfx = s"graft_store_${family}_${fp}_".toLowerCase
    val keep = keepSeg.map(g => s"$pfx${g}_".toLowerCase)
    s.catalog.listTables().collect().map(_.name)
      .filter(n => n.toLowerCase.startsWith(pfx) &&
        !keep.exists(k => n.toLowerCase.startsWith(k)))
      .foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
  }

  /** What `vacuum` removed: unreferenced publish debris and (when
    * requested) complete-but-unkept fingerprints.
    */
  final case class VacuumReport(debris: Seq[String], stale: Seq[String])

  /** Tombstone file a sweep plants inside a complete segment dir the
    * moment it FIRST observes it unreferenced: graced deletion ages
    * from the tombstone's mtime — the supersession event — never from
    * the segment's own write time (a compaction's superseded chain
    * has historical mtimes but becomes unreferenced only at the swap;
    * the r15 ADVICE finding). A segment whose publish lands after a
    * sweep tombstoned it gets the tombstone removed — the aging clock
    * resets. Dot-prefixed: sits next to the segment's part dirs, never
    * inside them, and a parquet scan would ignore it even if it did.
    */
  val SegmentTombstone = ".graft_tombstone"

  /** The RETENTION face of the store lifecycle: a standing deployment
    * accumulates one layout per corpus fingerprint FOREVER (every
    * append/mutation mints a new fingerprint and orphans the old
    * layout), plus publish debris that no reader will ever resolve —
    * crashed `.stage_`/`.aside_` siblings in rename mode, and
    * marker-mode `attempt_` prefixes a marker does not name (a crashed
    * or losing builder whose cleanup never ran).
    *
    * Removes, for `family`: (a) all unreferenced debris; (b) when
    * `keep` is non-empty, every COMPLETE layout whose fingerprint is
    * not in `keep` — the caller names the fingerprints still servable
    * (typically the current corpus generation and N prior ones, the
    * Maintenance retention discipline). Marker-less fingerprint dirs
    * count as debris (never published, or mid-publish of a builder
    * that will re-check and rebuild).
    *
    * WINDOW-FREE RETENTION (round 15, re-gated round 16): with
    * `graceMillis > 0` the sweep is age-gated on the SUPERSESSION
    * event — the Delta tombstone-retention discipline — so it can run
    * next to live traffic. An unkept layout ages from the publish
    * stamp of the generation that pushed it out of the retention
    * window (`vacuumKeepLatest` passes the exact per-layout stamps;
    * explicit keep-sets use the earliest kept stamp newer than the
    * layout's own), NEVER from its own publish stamp: a generation
    * published hours ago but superseded seconds ago — the normal
    * cadence, a retention sweep right after each publish — survives
    * the whole grace, so a reader that resolved it moments before
    * supersession has had `graceMillis` to finish its scans. An
    * unreferenced complete segment likewise ages from a TOMBSTONE the
    * first sweep that observes it unreferenced plants inside it
    * (`SegmentTombstone`) — not from its own write mtime, which for a
    * compaction's superseded chain is historical — and a segment whose
    * publish lands after it was tombstoned gets the tombstone removed
    * (the aging clock resets). Half-written debris ages by plain
    * mtime, which also protects an in-flight builder's complete-but-
    * not-yet-published segments (the `writeSegment` ->
    * `publishManifest` window, the r14 ADVICE race). With the default
    * `graceMillis = 0` everything eligible sweeps immediately — the
    * maintenance-window contract: deleting a layout a concurrent
    * application is actively READING yields failed scans on its side
    * (external tables re-register against missing files), same as
    * dropping any shared table. Registered catalog entries in THIS
    * session for removed fingerprints/segments are dropped. A layout
    * whose every marker is torn (a crashed publish) is classified as
    * debris instead of aborting the sweep. A family with a multi-
    * writer HEAD (`initHead`/`appendManifest`) keeps the layout the
    * highest complete head names, whatever keep-set the caller passed;
    * batch-ledger files (`writeBatchSegmentOnce`) pin their in-flight
    * segments and are swept once torn, orphaned, or published.
    */
  def vacuum(s: SparkSession, family: String,
      keep: Set[String] = Set.empty,
      graceMillis: Long = 0L): VacuumReport =
    vacuumImpl(s, family, keep, graceMillis, Map.empty)

  /** `supersededAt`: exact supersession stamps (millis) per unkept
    * fingerprint, when the caller can compute them (vacuumKeepLatest's
    * rank rule); layouts absent from the map fall back to the
    * keep-set-derived stamp documented on `vacuum`.
    */
  private def vacuumImpl(s: SparkSession, family: String,
      keep: Set[String], graceMillis: Long,
      supersededAt: Map[String, Long]): VacuumReport = synchronized {
    val fam = famDir(s, family)
    val f = fsOf(s, fam)
    if (!f.exists(fam)) return VacuumReport(Nil, Nil)
    // <=, not <: with the default grace 0 the cutoff is "now", and a
    // just-planted file's mtime can equal it on a millisecond clock —
    // grace 0 must sweep everything eligible, exactly as before
    val cutoff = System.currentTimeMillis() - graceMillis
    val sweepNow = graceMillis == 0L
    def aged(p: Path): Boolean =
      try f.getFileStatus(p).getModificationTime <= cutoff
      catch { case _: java.io.FileNotFoundException => false }
    def readLines(p: Path): Option[Seq[String]] =
      try Some(readFully(f, p).linesIterator.toSeq)
      catch { case _: java.io.IOException => None }
    // highest readable COMPLETE marker of a layout dir, no retry — a
    // mid-write publish is protected by the grace, not by waiting; a
    // future-format marker errors loudly (this engine cannot know what
    // it references, so it must not sweep around it)
    def effective(base: Path): Option[(Long, Seq[String])] =
      markerCandidates(f, base).iterator.flatMap { case (g, p) =>
        readLines(p).filter(markerComplete).map { lines =>
          requireKnownFormat(lines, p.toString)
          (g, lines)
        }
      }.nextOption()
    var debris = List.empty[String]
    var stale = List.empty[String]
    val children = f.listStatus(fam).toSeq
    // one marker read per layout: classification AND the supersession
    // stamps both come from this cache
    val layoutState: Map[String, Option[(Long, Seq[String])]] = children
      .filter(st => st.isDirectory &&
        !st.getPath.getName.startsWith(".") &&
        !st.getPath.getName.startsWith("seg_"))
      .map(st => st.getPath.getName -> effective(st.getPath)).toMap
    val layoutStamp: Map[String, (Long, Long)] = layoutState.collect {
      case (n, Some((_, lines))) => n -> stampOf(lines)
    }
    // the family HEAD (multi-writer append chain) pins its layout: the
    // current generation of a head-tracked family must never sweep,
    // whatever keep-set the caller names
    val headStates = children
      .filter(st => !st.isDirectory &&
        st.getPath.getName.startsWith(HeadFilePrefix) &&
        headVersionOf(st.getPath.getName) >= 0)
      .flatMap { st =>
        readLines(st.getPath).filter(markerComplete).map { lines =>
          requireKnownFormat(lines, st.getPath.toString)
          (headVersionOf(st.getPath.getName), st.getPath, lines.head)
        }
      }
    val headTop: Option[(Long, Path, String)] =
      headStates.sortBy(-_._1).headOption
    val keepEff =
      if (keep.isEmpty) keep else keep ++ headTop.map(_._3)
    // pass 1: fingerprint dirs and loose files — segments are judged
    // AFTER the keep set is applied, against the SURVIVING manifests
    children.foreach { st =>
      val name = st.getPath.getName
      val isSeg = st.isDirectory && name.startsWith("seg_")
      val isFpDir = st.isDirectory && !name.startsWith(".") && !isSeg
      if (!isFpDir && !isSeg) {
        if (!st.isDirectory && name.startsWith(HeadFilePrefix)) {
          // head files: keep exactly the highest COMPLETE head; torn
          // or superseded ones are debris past the grace (sweeping a
          // torn head un-burns a crashed CAS's version number)
          if (!headTop.exists(_._2 == st.getPath) && aged(st.getPath)) {
            debris ::= name
            f.delete(st.getPath, false)
          }
        } else if (!st.isDirectory &&
            name.startsWith(BatchLedgerPrefix)) {
          // batch ledgers: torn, or naming a segment that is gone ->
          // debris past the grace; naming a segment some complete
          // MANIFEST lists -> the pin did its job (the run published),
          // debris past the grace; otherwise the ledger pins an
          // in-flight segment (referencedSegments) and must stay
          val named = readLines(st.getPath) match {
            case Some(lines) if markerComplete(lines) &&
                lines.head.startsWith("seg_") => Some(lines.head)
            case _ => None
          }
          val published = named.exists(seg =>
            layoutState.values.flatten.exists { case (_, lines) =>
              lines.head == "manifest" && lines.contains(seg) })
          val segGone =
            named.forall(seg => !f.exists(new Path(fam, seg)))
          if ((segGone || published) && aged(st.getPath)) {
            debris ::= name
            f.delete(st.getPath, false)
          }
        } else if (aged(st.getPath)) {
          // .stage_/.aside_ siblings (and any stray file) — debris once
          // no builder references them: true under the module lock
          // within this JVM, and past the grace across JVMs
          debris ::= name
          f.delete(st.getPath, true)
        }
      } else if (isFpDir) {
        layoutState(name) match {
          case None =>
            // no marker at all, or every marker torn (a crashed
            // publish): unserveable — debris, not an abort
            if (aged(st.getPath)) {
              debris ::= name
              f.delete(st.getPath, true)
            }
          case Some((gen, lines)) =>
            // superseded or torn marker FILES below/next to the
            // effective one (compaction leftovers) are debris
            markerCandidates(f, st.getPath)
              .filter { case (g, p) => g != gen && aged(p) }
              .foreach { case (_, p) =>
                debris ::= s"$name/${p.getName}"
                f.delete(p, false)
              }
            // children of a PUBLISHED layout the marker does not name
            // are debris: losing/crashed attempts (marker mode) and
            // staging dirs a loser's rename nested under the winner
            // (the Hadoop rename-into-existing-dir contract)
            if (lines.head != "manifest") {
              val pfx =
                if (lines.head.startsWith("attempt_")) lines.head else "."
              f.listStatus(st.getPath).foreach { sub =>
                val sn = sub.getPath.getName
                val orphanAttempt =
                  sub.isDirectory && sn.startsWith("attempt_") && sn != pfx
                val nestedStage = sub.isDirectory &&
                  (sn.startsWith(".stage_") || sn.startsWith(".aside_"))
                if ((orphanAttempt || nestedStage) && aged(sub.getPath)) {
                  debris ::= s"$name/$sn"
                  f.delete(sub.getPath, true)
                }
              }
            }
            if (keepEff.nonEmpty && !keepEff.contains(name)) {
              // supersession-gated (see the scaladoc): the stamp that
              // ages an unkept layout is the one of the generation
              // that displaced it, never its own
              val own = layoutStamp.getOrElse(name, (0L, 0L))
              val supMs = supersededAt.getOrElse(name, {
                val newerKept = keepEff.toSeq.flatMap(layoutStamp.get)
                  .filter(k => k._1 > own._1 ||
                    (k._1 == own._1 && k._2 > own._2))
                if (newerKept.nonEmpty) newerKept.min._1 else own._1
              })
              if (supMs <= cutoff) {
                stale ::= name
                f.delete(st.getPath, true)
                dropFpRegistrations(s, family, name, keepSeg = None)
              }
            }
        }
      }
    }
    // pass 2: segments. Reachability is THROUGH the surviving
    // manifests and batch ledgers (a kept child manifest pins the base
    // segments it lists even after the base fingerprint dir itself was
    // retired) — marker-less or never-referenced segments are debris;
    // unreferenced complete segments age from their tombstone (the
    // supersession observation), planted here on first sight
    val ref = referencedSegments(s, family)
    children.foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.startsWith("seg_") &&
          f.exists(st.getPath)) {
        val tomb = new Path(st.getPath, SegmentTombstone)
        if (ref.contains(name)) {
          // resurrection: a publish landed after a sweep had already
          // tombstoned this segment — clear the aging clock
          if (f.exists(tomb)) f.delete(tomb, false)
        } else {
          val marker = new Path(st.getPath, Marker)
          if (f.exists(marker)) {
            if (!f.exists(tomb)) {
              val o = f.create(tomb, true)
              try o.write(stampLine()
                .getBytes(java.nio.charset.StandardCharsets.UTF_8))
              finally o.close()
            }
            // sweepNow: grace 0 keeps the maintenance-window contract —
            // the just-planted tombstone's mtime postdates this pass's
            // cutoff, so the flag, not the mtime, carries immediacy
            if (sweepNow || aged(tomb)) {
              stale ::= name
              f.delete(st.getPath, true)
              dropSegRegistrations(s, family, name)
            }
          } else if (aged(st.getPath)) {
            debris ::= name
            f.delete(st.getPath, true)
          }
        }
      }
    }
    VacuumReport(debris.reverse, stale.reverse)
  }

  /** Drop this session's registered tables keyed to a swept segment
    * (any fingerprint — a segment may be listed by several manifests).
    */
  private def dropSegRegistrations(s: SparkSession, family: String,
      seg: String): Unit = {
    val famPfx = s"graft_store_${family}_".toLowerCase
    val segKey = s"_${seg}_".toLowerCase
    s.catalog.listTables().collect().map(_.name)
      .filter(n => n.toLowerCase.startsWith(famPfx) &&
        n.toLowerCase.contains(segKey))
      .foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
  }

  /** Generation-aware retention: keep the NEWEST `n` complete
    * layouts of `family` by publish stamp (marker `ts=` line; same-
    * millis ties break by per-JVM sequence then fingerprint name;
    * stamp-less markers from older layouts sort oldest) and vacuum
    * everything else — a caller names a COUNT instead of enumerating
    * fingerprints. Manifest lineages keep their reachable segments:
    * a kept child manifest pins the base segments it lists even when
    * the base generation itself is retired. With `graceMillis > 0`
    * each retired generation must also have been SUPERSEDED for longer
    * than the grace — the layout at rank i (newest first) fell out of
    * the newest-n window the moment the layout at rank i-n was
    * published, and THAT stamp gates its sweep (the window-free form,
    * see `vacuum`); the default 0 keeps the maintenance-window
    * contract.
    */
  def vacuumKeepLatest(s: SparkSession, family: String,
      n: Int, graceMillis: Long = 0L): VacuumReport = synchronized {
    require(n >= 1, s"vacuumKeepLatest: n must be >= 1, got $n")
    val fam = famDir(s, family)
    val f = fsOf(s, fam)
    if (!f.exists(fam)) return VacuumReport(Nil, Nil)
    val complete = f.listStatus(fam).toSeq
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith(".")
        && !st.getPath.getName.startsWith("seg_"))
      .map(_.getPath.getName)
      // a torn-marker layout has no stamp to order by — it is debris,
      // classified by the vacuum pass, never "kept"; a corrupted
      // ts= line degrades to the oldest stamp instead of a MatchError
      // aborting the sweep (the r15 VERDICT nit)
      .flatMap(fp => tryMarkerLines(s, new Path(fam, fp), retries = 0)
        .map(lines => (stampOf(lines), fp)))
    if (complete.isEmpty) return vacuumImpl(s, family, Set.empty,
      graceMillis, Map.empty)
    val sorted = complete
      .sortBy { case ((ms, seq), fp) => (-ms, -seq, fp) }
    val kept = sorted.take(n).map(_._2).toSet
    // exact per-layout supersession stamps for the grace gate (rank
    // rule above); rank < n entries are kept and need none
    val supersededAt = sorted.zipWithIndex.collect {
      case ((_, fp), i) if i >= n => fp -> sorted(i - n)._1._1
    }.toMap
    vacuumImpl(s, family, kept, graceMillis, supersededAt)
  }

  // ------------------------------------------------------------------
  // Restart-durable ingest: the per-batch segment LEDGER.
  //
  // foreachBatch is at-least-once along TWO axes: a same-run retry
  // re-invokes under the same batchId in the same JVM (an in-memory
  // map covers that), and a driver RESTART from checkpoint replays the
  // last uncommitted batch into a FRESH JVM with empty memory — the
  // axis only durable state can cover. The ledger is one tiny
  // create-if-absent file per (family, runId, batchId) naming the
  // segment that batch landed as: a replayed batch finds the ledger,
  // verifies the named segment is complete, and returns it without
  // writing — the replay is idempotent by construction, no
  // deterministic segment naming (and thus no in-place overwrite of a
  // complete segment) needed. Ledgered-but-unpublished segments are
  // PINNED against retention (referencedSegments) for as long as the
  // outage lasts; once the run publishes its manifest the references
  // transfer and the ledgers become sweepable debris.
  // ------------------------------------------------------------------

  /** File-name prefix of a batch ledger: `_GRAFT_BATCH_<runId>_b<id>`
    * in the family dir; content = segment name + fmt + stamp (stamp
    * last — the marker tear-detection discipline).
    */
  val BatchLedgerPrefix = "_GRAFT_BATCH_"

  private def batchLedgerPath(s: SparkSession, family: String,
      runId: String, batchId: Long): Path =
    new Path(famDir(s, family), s"$BatchLedgerPrefix${runId}_b$batchId")

  private def requireRunId(runId: String): Unit =
    require(runId.nonEmpty && runId.forall(c =>
        c.isLetterOrDigit || c == '_'),
      s"runId must be [A-Za-z0-9_]+ (it is embedded in file names): " +
        s"'$runId'")

  /** Exactly-once segment write per (family, runId, batchId) — the
    * restart face of the ingest->durable composition (t52/t53): the
    * FIRST invocation writes the segment via `writeSegment` and
    * records it in the batch ledger (one create-if-absent); every
    * later invocation — a same-run foreachBatch retry, or the replay
    * of the last uncommitted batch after a driver restart from
    * checkpoint — finds the ledger and returns the recorded segment
    * without evaluating `build`. Returns (segment, wroteThisCall).
    *
    * Degradation paths: a TORN ledger younger than 30 s is a
    * concurrent twin's create->write window (waited out); older, it is
    * a crashed writer's and is cleared for a redo. A complete ledger
    * naming a SWEPT segment (a grace-less vacuum raced the outage) is
    * cleared and the batch — replayed with the same rows by the
    * checkpoint contract — is re-written. A racing zombie twin of this
    * writer loses the ledger create, reclaims its own segment and
    * serves the winner's (same rows either way: same batch).
    */
  def writeBatchSegmentOnce(s: SparkSession, family: String,
      runId: String, batchId: Long, parts: Seq[Part])(
      build: => Map[String, DataFrame]): (String, Boolean) = {
    requireRunId(runId)
    val fam = famDir(s, family)
    val f = fsOf(s, fam)
    f.mkdirs(fam)
    val lp = batchLedgerPath(s, family, runId, batchId)
    def ledgered(): Option[String] =
      try {
        val lines = readFully(f, lp).linesIterator.toSeq
        if (markerComplete(lines) && lines.head.startsWith("seg_")) {
          requireKnownFormat(lines, lp.toString)
          Some(lines.head)
        } else None
      } catch { case _: java.io.IOException => None }
    var attempts = 0
    var out: Option[(String, Boolean)] = None
    while (out.isEmpty) {
      attempts += 1
      require(attempts <= 60,
        s"batch ledger $lp unresolvable after $attempts attempts")
      ledgered() match {
        case Some(seg) if segmentComplete(s, family, seg) =>
          out = Some((seg, false))
        case Some(_) =>
          // complete ledger naming a swept segment: clear and redo
          f.delete(lp, false)
        case None if f.exists(lp) =>
          // torn ledger: wait out a live twin, clear a crashed one
          val agedTorn =
            try f.getFileStatus(lp).getModificationTime <
              System.currentTimeMillis() - 30000L
            catch { case _: java.io.FileNotFoundException => false }
          if (agedTorn) f.delete(lp, false) else Thread.sleep(100)
        case None =>
          val seg = writeSegment(s, family, parts, build)
          val won = createExclusive(f, lp,
            s"$seg\n$fmtLine\n${stampLine()}")
          if (won) out = Some((seg, true))
          else if (!referencedSegments(s, family).contains(seg))
            f.delete(new Path(fam, seg), true)
      }
    }
    out.get
  }

  /** The run's recorded (batchId, segment) pairs in batch order — the
    * publish-time recovery of an ingest run across restarts: segments
    * recorded by a previous driver incarnation come back from the
    * ledger, not from process memory. Errors loudly if a recorded
    * segment is gone (a grace-less vacuum raced the outage — the run
    * must re-ingest, not publish a hole).
    */
  def batchSegments(s: SparkSession, family: String,
      runId: String): Seq[(Long, String)] = {
    requireRunId(runId)
    val fam = famDir(s, family)
    val f = fsOf(s, fam)
    if (!f.exists(fam)) return Nil
    val pfx = s"$BatchLedgerPrefix${runId}_b"
    f.listStatus(fam).toSeq
      .filter(st => !st.isDirectory && st.getPath.getName.startsWith(pfx))
      .flatMap { st =>
        val id = st.getPath.getName.stripPrefix(pfx).toLongOption
        val lines =
          try Some(readFully(f, st.getPath).linesIterator.toSeq)
          catch { case _: java.io.IOException => None }
        for {
          i <- id
          ls <- lines
          if markerComplete(ls) && ls.head.startsWith("seg_")
        } yield {
          requireKnownFormat(ls, st.getPath.toString)
          require(segmentComplete(s, family, ls.head),
            s"batch ledger ${st.getPath} names swept segment " +
              s"${ls.head} — a grace-less vacuum raced this run; " +
              "re-ingest the batch")
          (i, ls.head)
        }
      }.sortBy(_._1)
  }

  /** Remove a run's batch ledgers — call AFTER the run's manifest
    * publish (the manifest then carries the references; leftover
    * ledgers would pin the run's segments past the family's
    * retention). Abandoned runs' ledgers become vacuum debris once
    * their segments are published or gone; a run abandoned BEFORE
    * publishing holds its pins until this is called for it — the
    * price of surviving an outage of any length.
    */
  def dropBatchLedgers(s: SparkSession, family: String,
      runId: String): Int = {
    requireRunId(runId)
    val fam = famDir(s, family)
    val f = fsOf(s, fam)
    if (!f.exists(fam)) return 0
    val pfx = s"$BatchLedgerPrefix${runId}_b"
    val files = f.listStatus(fam).toSeq
      .filter(st => !st.isDirectory && st.getPath.getName.startsWith(pfx))
    files.foreach(st => f.delete(st.getPath, false))
    files.size
  }

  // ------------------------------------------------------------------
  // Multi-writer append: optimistic concurrency over a family HEAD.
  //
  // Two independent ingesters appending DIFFERENT deltas to one family
  // used to diverge into sibling fingerprints: each published
  // child = combine(head, ownDelta) and neither union contained the
  // other's rows. The head pointer linearizes them — the Delta Lake
  // _delta_log discipline re-expressed on the marker primitive:
  // `_GRAFT_HEAD.v<k>` files name the fingerprint that IS version k of
  // the family line, committing v(k+1) is one create-if-absent (the
  // CAS), and a loser re-reads the new head, re-publishes its delta on
  // top (child fingerprints are combinable without scanning the base —
  // the three fingerprint folds are associative-commutative), and
  // retries. Readers of the family line resolve `headState` and serve
  // that fingerprint; fingerprint-addressed readers are unaffected.
  // ------------------------------------------------------------------

  /** Head-pointer file-name prefix: `_GRAFT_HEAD.v<version>` in the
    * family dir; content = fingerprint + fmt + stamp (stamp last).
    */
  val HeadFilePrefix = "_GRAFT_HEAD.v"

  private def headVersionOf(name: String): Long =
    name.stripPrefix(HeadFilePrefix).toLongOption.getOrElse(-1L)

  private def headPath(s: SparkSession, family: String, v: Long): Path =
    new Path(famDir(s, family), s"$HeadFilePrefix$v")

  /** Highest COMPLETE head of the family: (version, fingerprint). A
    * torn candidate (a crashed or in-flight CAS) is skipped; its
    * version number stays burned until vacuum sweeps the torn file.
    */
  def headState(s: SparkSession, family: String)
      : Option[(Long, String)] = {
    val fam = famDir(s, family)
    val f = fsOf(s, fam)
    if (!f.exists(fam)) return None
    f.listStatus(fam).toSeq
      .filter(st => !st.isDirectory &&
        st.getPath.getName.startsWith(HeadFilePrefix) &&
        headVersionOf(st.getPath.getName) >= 0)
      .sortBy(st => -headVersionOf(st.getPath.getName))
      .iterator
      .flatMap { st =>
        try {
          val lines = readFully(f, st.getPath).linesIterator.toSeq
          if (markerComplete(lines)) {
            requireKnownFormat(lines, st.getPath.toString)
            Some((headVersionOf(st.getPath.getName), lines.head))
          } else None
        } catch { case _: java.io.IOException => None }
      }.nextOption()
  }

  /** One head-CAS attempt. An append records its commit's DELTA
    * SEGMENT as a `seg_` line (optional metadata within the current
    * marker format — every reader takes the fingerprint from the
    * head line and ignores lines it does not ask for): the head
    * files then form a self-contained commit log, so change-capture
    * windows resolve WITHOUT the superseded manifests and survive
    * an in-place compaction for as long as the delta segments
    * themselves do (the retention grace). v0 and pre-continuation
    * heads carry no seg line — `changedSegments` falls back to the
    * manifest containment diff there.
    */
  private def tryCreateHead(f: FileSystem, p: Path, fp: String,
      deltaSeg: Option[String] = None): Boolean =
    createExclusive(f, p,
      ((fp +: fmtLine +: deltaSeg.toSeq) :+ stampLine())
        .mkString("\n"))

  /** Install version 0 of the family head naming the already-published
    * `fp` (one create-if-absent; false when a head already exists).
    */
  def initHead(s: SparkSession, family: String, fp: String): Boolean = {
    require(isBuilt(s, family, fp),
      s"initHead: $family/$fp is not a published layout")
    val fam = famDir(s, family)
    val f = fsOf(s, fam)
    f.mkdirs(fam)
    headState(s, family).isEmpty &&
      tryCreateHead(f, headPath(s, family, 0L), fp)
  }

  private val FpPattern = "n(\\d+)_x([0-9a-f]+)_s([0-9a-f]+)".r

  /** Combine two `frameFingerprint` values into the fingerprint of
    * the disjoint-union corpus WITHOUT scanning either side: all
    * three folds are associative-commutative (count adds, xor xors,
    * sum adds mod 2^64), so fp(base ∪ delta) = combine(fp(base),
    * fp(delta)) — an appender commits a child fingerprint knowing
    * only the head's fingerprint and its own delta, O(delta) compute
    * to match the O(delta) write.
    */
  def combineFingerprints(a: String, b: String): String = (a, b) match {
    case (FpPattern(na, xa, sa), FpPattern(nb, xb, sb)) =>
      val mod = java.math.BigInteger.ONE.shiftLeft(64)
      val n = na.toLong + nb.toLong
      val x = java.lang.Long.parseUnsignedLong(xa, 16) ^
        java.lang.Long.parseUnsignedLong(xb, 16)
      val sm = new java.math.BigInteger(sa, 16)
        .add(new java.math.BigInteger(sb, 16)).mod(mod)
      s"n${n}_x${java.lang.Long.toHexString(x)}_s${sm.toString(16)}"
    case _ => sys.error(
      s"combineFingerprints: not frameFingerprint values: '$a', '$b'")
  }

  /** OPTIMISTIC MULTI-WRITER APPEND (Delta-style commit retry): commit
    * `deltaSeg` — already written and fingerprinted by the caller —
    * onto the family's head line. Each round: read the head (v, fp),
    * derive the child fingerprint by combination, publish the child
    * manifest (head's segments ++ the delta — O(delta) write, the
    * standing segments are never copied), then CAS the head to v+1
    * with ONE create-if-absent. A loser re-reads the new head and
    * re-publishes its delta on top of it, so with two concurrent
    * appenders BOTH deltas survive in the committed line (the
    * StoreRaceSpec multi-writer assertion); an abandoned off-head
    * sibling manifest from a lost round is retention work (a marker
    * file naming shared segments), deliberately never retracted here —
    * a concurrent identical appender may be about to commit that very
    * fingerprint. Publishing into a concurrently COMPACTED chain whose
    * old segments a grace-less vacuum swept retracts and retries
    * against the merged chain (the publishManifest discipline); the
    * delta itself being swept is unrecoverable here and errors loudly.
    * Returns the committed (headVersion, childFingerprint).
    */
  def appendManifest(s: SparkSession, family: String,
      deltaSeg: String, deltaFp: String,
      maxRetries: Int = 20): (Long, String) = {
    require(segmentComplete(s, family, deltaSeg),
      s"appendManifest: delta segment $deltaSeg of $family is not " +
        "complete on disk")
    val f = fsOf(s, famDir(s, family))
    var tries = 0
    var committed: Option[(Long, String)] = None
    while (committed.isEmpty) {
      tries += 1
      require(tries <= maxRetries,
        s"appendManifest for $family lost $maxRetries consecutive " +
          "head races — reduce writer contention, or vacuum the " +
          "family if a torn head file is burning the next version")
      val (v, headFp) = headState(s, family).getOrElse(sys.error(
        s"appendManifest: family $family has no head — publish a " +
          "base manifest and initHead first"))
      val childFp = combineFingerprints(headFp, deltaFp)
      if (childFp == headFp) {
        // an empty delta (n0_x0_s0): nothing to commit
        committed = Some((v, headFp))
      } else {
        val headSegs = manifestSegments(s, family, headFp)
        faultHook("append_head_resolved")
        val publishedOk =
          try {
            ensureChildManifest(s, family, childFp,
              headSegs :+ deltaSeg)
            true
          } catch {
            case e: RuntimeException if e.getMessage != null &&
                e.getMessage.contains("raced a vacuum") =>
              require(segmentComplete(s, family, deltaSeg),
                s"appendManifest: delta segment $deltaSeg was swept " +
                  "by a grace-less vacuum before the append " +
                  "committed — re-write the delta, and run vacuums " +
                  "with a grace next to live ingest")
              false
          }
        if (publishedOk) {
          faultHook("append_child_published")
          if (tryCreateHead(f, headPath(s, family, v + 1), childFp,
              deltaSeg = Some(deltaSeg)))
            committed = Some((v + 1, childFp))
          else {
            val now = headState(s, family)
            // an identical append (same parent, same delta content)
            // may have won the CAS: its chain is ours by content
            if (now.exists(_._2 == childFp))
              committed = Some((now.get._1, childFp))
          }
        }
      }
    }
    committed.get
  }

  /** The child manifest an append commits must exist and be
    * SERVEABLE before the head may name it: publish it if absent; if
    * an abandoned earlier attempt left a manifest for this
    * fingerprint naming swept segments, retract it and republish
    * (same fingerprint = same content, by the fingerprint contract).
    */
  private def ensureChildManifest(s: SparkSession, family: String,
      childFp: String, segs: Seq[String]): Unit = {
    val base = basePath(s, family, childFp)
    val f = fsOf(s, base)
    var done = false
    var attempts = 0
    while (!done) {
      attempts += 1
      require(attempts <= 5,
        s"child manifest $family/$childFp unresolvable in 5 attempts")
      if (isBuilt(s, family, childFp)) {
        val listed = manifestSegments(s, family, childFp)
        if (listed.forall(g => segmentComplete(s, family, g))) done = true
        else
          // broken abandoned sibling: retract its markers, republish
          markerCandidates(f, base).foreach(c => f.delete(c._2, false))
      } else
        publishManifest(s, family, childFp, segs)
        // won or lost, a manifest exists now — the loop re-verifies
    }
  }

  // ------------------------------------------------------------------
  // Head-LINE READ FACES: the head files ARE the family's commit log
  // (one `_GRAFT_HEAD.v<k>` per committed version, content = the
  // fingerprint that IS version k), so three lakehouse read shapes
  // fall out of the files that already exist — history listing, time
  // travel, and change capture — with NO new write-path state:
  //
  //   headLineage        DESCRIBE HISTORY: every surviving version
  //   manifestTablesAt   VERSION AS OF: serve the line as of v
  //   changesBetween     CDC: the rows (vFrom, vTo] appended, read
  //                      from ONLY the delta segments — O(delta),
  //                      never a snapshot diff
  //
  // Readable depth = the retention grace: vacuum keeps only the
  // highest head (and its layout) past the grace, so a swept version
  // errors LOUDLY here instead of serving a half-alive layout — the
  // Delta time-travel/CDF trade (their vacuumed log behaves the same
  // way) re-expressed on the marker primitive. The streaming face of
  // `changesBetween` is `graft.sources.StoreCdcProvider`
  // ("graft-store"), whose offsets are exactly these head versions.
  // ------------------------------------------------------------------

  /** COMPLETE surviving head files of the family, ascending:
    * (version, marker lines). Torn CAS leftovers and retention-swept
    * versions are simply absent (a torn candidate is unreadable by
    * contract, not an error).
    */
  private def headFileLines(s: SparkSession,
      family: String): Seq[(Long, Seq[String])] = {
    val fam = famDir(s, family)
    val f = fsOf(s, fam)
    if (!f.exists(fam)) return Nil
    f.listStatus(fam).toSeq
      .filter(st => !st.isDirectory &&
        st.getPath.getName.startsWith(HeadFilePrefix) &&
        headVersionOf(st.getPath.getName) >= 0)
      .sortBy(st => headVersionOf(st.getPath.getName))
      .flatMap { st =>
        try {
          val lines = readFully(f, st.getPath).linesIterator.toSeq
          if (markerComplete(lines)) {
            requireKnownFormat(lines, st.getPath.toString)
            Some((headVersionOf(st.getPath.getName), lines))
          } else None
        } catch { case _: java.io.IOException => None }
      }
  }

  /** Every COMPLETE surviving head version of the family, ascending:
    * (version, fingerprint) — the DESCRIBE HISTORY face.
    */
  def headLineage(s: SparkSession, family: String): Seq[(Long, String)] =
    headFileLines(s, family).map { case (v, lines) => (v, lines.head) }

  /** The delta segment head version `v` recorded at commit time —
    * the commit-log entry change capture prefers. None when the head
    * file is swept, v is the base version 0, or the head predates
    * the seg-line continuation (legacy commits fall back to the
    * manifest diff).
    */
  def headDeltaSegAt(s: SparkSession, family: String,
      v: Long): Option[String] =
    headFileLines(s, family).collectFirst { case (`v`, lines) =>
      lines.find(_.startsWith("seg_"))
    }.flatten

  /** The fingerprint head version `v` committed, when that head file
    * still survives retention.
    */
  def headFingerprintAt(s: SparkSession, family: String,
      v: Long): Option[String] =
    headLineage(s, family).collectFirst { case (`v`, fp) => fp }

  private def requireHeadFpAt(s: SparkSession, family: String,
      v: Long, what: String): String =
    headFingerprintAt(s, family, v).getOrElse(sys.error(
      s"$what: head version $v of $family is not readable — never " +
        "committed, a torn CAS, or swept by retention (vacuum keeps " +
        "only the current head past the grace); read the current " +
        "head via headState instead"))

  /** TIME TRAVEL (VERSION AS OF): serve the family's line exactly as
    * of head version `v`. Loud errors when the version — or the
    * layout it names — has been swept: a time-travel read must never
    * silently serve a different version.
    */
  def manifestTablesAt(s: SparkSession, family: String, v: Long,
      parts: Seq[Part]): Map[String, DataFrame] = {
    val fp = requireHeadFpAt(s, family, v, "time travel")
    require(isBuilt(s, family, fp),
      s"time travel: head version $v of $family names layout $fp, " +
        "which retention has swept — only versions within the " +
        "retention grace are readable")
    manifestTables(s, family, fp, parts)
  }

  /** The ordered segments version `vTo` carries BEYOND version
    * `vFrom` — the metadata core of change capture, shared by the
    * batch (`changesBetween`) and streaming (`StoreCdcProvider`)
    * faces. Resolution prefers the COMMIT LOG: each appended head
    * file names its commit's delta segment, so the window is the
    * versions' recorded segments in commit order — no manifest read
    * at all, which makes a window IMMUNE to an in-place compaction
    * (compaction rewrites manifests, never head files) for as long
    * as the delta segments themselves survive: tombstone-graced
    * after the swap, so a live tail has the whole retention grace to
    * drain. Once a window's segment is actually swept — or a legacy
    * head in the window predates the seg-line log — resolution falls
    * back to the manifest containment diff (appends only ever add
    * segments), and a chain compacted inside the window errors
    * loudly with the restart-from-snapshot instruction rather than
    * double-reading merged rows.
    */
  def changedSegments(s: SparkSession, family: String, vFrom: Long,
      vTo: Long): Seq[String] = {
    require(vFrom <= vTo,
      s"changedSegments: window ($vFrom, $vTo] of $family is reversed")
    val fpTo = requireHeadFpAt(s, family, vTo, "change capture")
    if (vFrom == vTo) return Nil
    // commit-log path: every version in the window both survives and
    // recorded its delta segment at CAS time (one dir listing for
    // the whole window, not one per version)
    val byVersion = headFileLines(s, family).toMap
    val logged = ((vFrom + 1) to vTo).map(v =>
      byVersion.get(v).flatMap(_.find(_.startsWith("seg_"))))
    if (logged.forall(_.isDefined)) {
      val segs = logged.flatten
      val missing =
        segs.filterNot(g => segmentComplete(s, family, g))
      require(missing.isEmpty,
        s"change capture: the window ($vFrom, $vTo] of $family " +
          s"names delta segments $missing that retention has swept " +
          "(a compacted chain's old segments survive only for the " +
          "grace) — restart from a snapshot read of the current head")
      return segs
    }
    val fpFrom = requireHeadFpAt(s, family, vFrom, "change capture")
    val sFrom = manifestSegments(s, family, fpFrom)
    val sTo = manifestSegments(s, family, fpTo)
    require(sFrom.toSet.subsetOf(sTo.toSet),
      s"change capture: the chain of $family was compacted inside " +
        s"the window ($vFrom, $vTo] (version $vFrom's segments are " +
        "no longer all part of the head chain), so the window's " +
        "delta is not isolatable as segment files — restart from a " +
        "snapshot read of the current head")
    sTo.filterNot(sFrom.toSet)
  }

  /** The existing part dirs of `part` across `segs` — a delta
    * segment need not carry every part (frozen model artifacts live
    * only in the base segment).
    */
  def segmentPartDirs(s: SparkSession, family: String,
      segs: Seq[String], part: String): Seq[String] = {
    val fam = famDir(s, family)
    val f = fsOf(s, fam)
    segs.map(seg => new Path(fam, new Path(seg, part)))
      .filter(f.exists).map(_.toString)
  }

  /** CHANGE CAPTURE, batch face: per part, the rows the line gained
    * in the window (vFrom, vTo] — read from ONLY the delta segments
    * (O(delta) I/O however large the standing corpus; an s19 gate
    * pins `inputFiles` to the delta dirs). A part no delta segment
    * carries changed nothing: an EMPTY frame in the part's own
    * schema, never an error.
    */
  def changesBetween(s: SparkSession, family: String, vFrom: Long,
      vTo: Long, parts: Seq[Part]): Map[String, DataFrame] = {
    val delta = changedSegments(s, family, vFrom, vTo)
    val fpTo = requireHeadFpAt(s, family, vTo, "change capture")
    val all = manifestSegments(s, family, fpTo)
    parts.map { p =>
      val dirs = segmentPartDirs(s, family, delta, p.name)
      val df =
        if (dirs.nonEmpty) s.read.parquet(dirs: _*)
        else {
          // schema from the serving chain's footers (metadata read)
          val carrying = segmentPartDirs(s, family, all, p.name)
          require(carrying.nonEmpty,
            s"change capture: no segment of $family/$fpTo carries " +
              s"part ${p.name}")
          val schema = s.read.parquet(carrying.head).schema
          s.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        }
      p.name -> df
    }.toMap
  }

  /** One-time FORMAT migration of a published layout: re-emit the
    * effective marker's content in the CURRENT format as the next
    * marker GENERATION (the compaction-swap discipline — one
    * create-if-absent, publish stamp carried verbatim; a stamp-less
    * pre-round-14 marker gets the sentinel `ts=0.0`, so it keeps
    * sorting as the oldest generation — then delete the superseded
    * markers as cleanup). Content, fingerprint, segment list and part
    * files are untouched, so the upgraded layout serves byte-
    * identically through the new reader. Returns false when the
    * layout already reads in the current format.
    */
  def upgradeLayoutFormat(s: SparkSession, family: String,
      fp: String): Boolean = synchronized {
    val base = basePath(s, family, fp)
    val f = fsOf(s, base)
    val lines = markerLines(s, base)
    if (formatOf(lines) == CurrentMarkerFormat) false
    else {
      val curGen = markerCandidates(f, base).head._1
      val stamp = lines.find(_.startsWith("ts=")).getOrElse("ts=0.0")
      val tail = lines.drop(1).filterNot(l =>
        l.startsWith("ts=") || l.startsWith("fmt="))
      val body = ((lines.head +: fmtLine +: tail) :+ stamp).mkString("\n")
      val next = markerPathGen(base, curGen + 1)
      val won = createExclusive(f, next, body)
      if (won)
        markerCandidates(f, base).filter(_._1 <= curGen)
          .foreach(c => f.delete(c._2, false))
      won
    }
  }
}
