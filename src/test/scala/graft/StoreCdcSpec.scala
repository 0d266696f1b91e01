package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.DurableStore

/** The head-line READ faces (round 16's lineage primitives turned
  * toward consumers): history listing, version-as-of time travel,
  * batch change capture, and the `graft-store` streaming source whose
  * offsets are head versions. The write-side protocol is pinned by
  * DurableStoreSpec/StoreRaceSpec; these tests pin what READERS may
  * rely on — exact version addressing, O(delta) windows, loud errors
  * on swept or compacted history (never a silently different answer),
  * and checkpoint-recovered streams resuming exactly where they left.
  */
class StoreCdcSpec extends SparkSpec {

  private val ds = DurableStore

  private def withFamily[A](test: (String, String) => A): A = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_cdc_").toString
    val saved = spark.conf.getOption("spark.graft.store.root")
    spark.conf.set("spark.graft.store.root", root)
    try test(root, "fam" + java.lang.Long.toHexString(
      new scala.util.Random().nextLong()).take(8))
    finally {
      saved.fold(spark.conf.unset("spark.graft.store.root"))(v =>
        spark.conf.set("spark.graft.store.root", v))
      graft.pipeline.SinkFiles.deleteRecursive(root)
    }
  }

  private val parts = Seq(ds.Part("t", None))

  private def slice(from: Long, until: Long): DataFrame = {
    import spark.implicits._
    (from until until).toDF("id")
  }

  /** base [0,8) -> head v0, d1 [8,16) -> v1, d2 [16,24) -> v2. */
  private def buildLine(fam: String): (String, String, String) = {
    val base = slice(0, 8)
    val fp0 = ds.frameFingerprint(base, Seq("id"))
    val seg0 = ds.writeSegment(spark, fam, parts, Map("t" -> base))
    assert(ds.publishManifest(spark, fam, fp0, Seq(seg0)))
    assert(ds.initHead(spark, fam, fp0))
    def append(from: Long, until: Long): String = {
      val d = slice(from, until)
      val seg = ds.writeSegment(spark, fam, parts, Map("t" -> d))
      ds.appendManifest(spark, fam, seg,
        ds.frameFingerprint(d, Seq("id")))._2
    }
    (fp0, append(8, 16), append(16, 24))
  }

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).toSeq.sorted

  test("headLineage lists every surviving version ascending with " +
      "combinable fingerprints, and manifestTablesAt serves each " +
      "version's exact row set; a retention-swept version then errors " +
      "loudly instead of serving something else") {
    withFamily { (_, fam) =>
      val (fp0, fp1, fp2) = buildLine(fam)
      val lineage = ds.headLineage(spark, fam)
      assert(lineage.map(_._1) === Seq(0L, 1L, 2L))
      assert(lineage.map(_._2) === Seq(fp0, fp1, fp2))
      // version addressing is exact
      assert(ids(ds.manifestTablesAt(spark, fam, 0L, parts)("t"))
        === (0L until 8L))
      assert(ids(ds.manifestTablesAt(spark, fam, 1L, parts)("t"))
        === (0L until 16L))
      assert(ids(ds.manifestTablesAt(spark, fam, 2L, parts)("t"))
        === (0L until 24L))
      // retention: keep-latest-1 + head pin -> v0/v1 become
      // unreadable LOUDLY, the head still serves
      ds.vacuumKeepLatest(spark, fam, 1)
      assert(ds.headLineage(spark, fam).map(_._1) === Seq(2L))
      val e = intercept[RuntimeException](
        ds.manifestTablesAt(spark, fam, 1L, parts))
      assert(e.getMessage.contains("swept by retention"))
      assert(ids(ds.manifestTablesAt(spark, fam, 2L, parts)("t"))
        === (0L until 24L))
    }
  }

  test("changesBetween isolates exactly the window's rows and reads " +
      "ONLY delta segment files; the empty window is an empty frame " +
      "in the part's schema; the window SURVIVES an in-place " +
      "compaction (the head files are a commit log naming each " +
      "commit's delta segment) and errors loudly only once a " +
      "window segment is actually gone") {
    withFamily { (root, fam) =>
      val (_, _, fp2) = buildLine(fam)
      val w02 = ds.changesBetween(spark, fam, 0L, 2L, parts)("t")
      assert(ids(w02) === (8L until 24L))
      // O(delta) evidence: every input file lives under a segment the
      // window appended, none under the base segment
      val deltaSegs = ds.changedSegments(spark, fam, 0L, 2L).toSet
      assert(deltaSegs.size === 2)
      assert(w02.inputFiles.nonEmpty && w02.inputFiles.forall(fpath =>
        deltaSegs.exists(seg => fpath.contains(s"/$fam/$seg/"))))
      assert(ids(ds.changesBetween(spark, fam, 1L, 2L, parts)("t"))
        === (16L until 24L))
      // empty window: no rows, right schema, no error
      val w22 = ds.changesBetween(spark, fam, 2L, 2L, parts)("t")
      assert(w22.count() === 0L)
      assert(w22.schema.fieldNames.toSeq === Seq("id"))
      // compaction rewrites the MANIFEST chain in place — but the
      // commit log (head files) still names each commit's delta
      // segment, and the superseded segments survive under the
      // grace, so the window keeps resolving exactly
      ds.compactManifest(spark, fam, fp2, parts)(identity)
      assert(ids(ds.changesBetween(spark, fam, 0L, 2L, parts)("t"))
        === (8L until 24L))
      assert(ids(ds.manifestTables(spark, fam, fp2, parts)("t"))
        === (0L until 24L))
      // once a window's segment is actually swept (the grace closed
      // on the compacted chain — simulated by removing it), the
      // window errors loudly instead of serving a partial answer
      val victim = ds.changedSegments(spark, fam, 0L, 2L).head
      graft.pipeline.SinkFiles.deleteRecursive(s"$root/$fam/$victim")
      val e = intercept[RuntimeException](
        ds.changedSegments(spark, fam, 0L, 2L))
      assert(e.getMessage.contains("retention has swept") &&
        e.getMessage.contains("snapshot read of the current head"))
    }
  }

  test("a legacy head line without commit-log seg lines falls back " +
      "to the manifest containment diff — and then refuses loudly " +
      "when the chain was compacted inside the window") {
    withFamily { (root, fam) =>
      val (_, _, fp2) = buildLine(fam)
      // strip the seg_ lines from every head file: the pre-log form
      // (and drop the checksum shadows the out-of-band rewrite broke)
      (0L to 2L).foreach { v =>
        val p = java.nio.file.Paths.get(root, fam, s"_GRAFT_HEAD.v$v")
        val kept = scala.jdk.CollectionConverters
          .ListHasAsScala(java.nio.file.Files.readAllLines(p)).asScala
          .filterNot(_.startsWith("seg_"))
        java.nio.file.Files.write(p, kept.mkString("\n").getBytes)
        java.nio.file.Files.deleteIfExists(
          java.nio.file.Paths.get(root, fam, s"._GRAFT_HEAD.v$v.crc"))
      }
      // fallback path still isolates the window from the manifests
      assert(ids(ds.changesBetween(spark, fam, 0L, 2L, parts)("t"))
        === (8L until 24L))
      // a compaction inside the window is then genuinely unreadable
      ds.compactManifest(spark, fam, fp2, parts)(identity)
      val e = intercept[RuntimeException](
        ds.changedSegments(spark, fam, 0L, 2L))
      assert(e.getMessage.contains("compacted inside the window"))
    }
  }

  test("graft-store stream, latest mode: the initial batch is empty, " +
      "each appended commit then arrives as exactly its delta rows — " +
      "O(delta) per trigger, proven by per-phase sink counts and the " +
      "final multiset") {
    withFamily { (_, fam) =>
      val base = slice(0, 8)
      val fp0 = ds.frameFingerprint(base, Seq("id"))
      val seg0 = ds.writeSegment(spark, fam, parts, Map("t" -> base))
      assert(ds.publishManifest(spark, fam, fp0, Seq(seg0)))
      assert(ds.initHead(spark, fam, fp0))
      val q = spark.readStream.format("graft-store")
        .option("family", fam).option("part", "t")
        .load()
        .writeStream.format("memory").queryName("cdc_latest")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        assert(spark.table("cdc_latest").count() === 0L)
        def append(from: Long, until: Long): Unit = {
          val d = slice(from, until)
          val seg = ds.writeSegment(spark, fam, parts, Map("t" -> d))
          ds.appendManifest(spark, fam, seg,
            ds.frameFingerprint(d, Seq("id")))
          ()
        }
        append(8, 16)
        q.processAllAvailable()
        assert(ids(spark.table("cdc_latest")) === (8L until 16L))
        // an in-place compaction between triggers must not disturb
        // the tail: the next batch is still exactly its commit's
        // delta (a merged-segment re-read would duplicate the base)
        val (_, fpHead) = ds.headState(spark, fam).get
        ds.compactManifest(spark, fam, fpHead, parts)(identity)
        append(16, 24)
        q.processAllAvailable()
        // a batch that re-read the base would show as duplicates here
        assert(ids(spark.table("cdc_latest")) === (8L until 24L))
      } finally {
        q.stop()
        spark.sql("DROP VIEW IF EXISTS cdc_latest")
      }
    }
  }

  test("graft-store stream, snapshot mode + checkpoint restart: the " +
      "first batch is the whole line as of stream start, the tail is " +
      "per-commit deltas; a restart from the same checkpoint resumes " +
      "at the recorded head version and emits ONLY the commits made " +
      "while the stream was down (offset recovery through the " +
      "serialized form)") {
    withFamily { (_, fam) =>
      buildLine(fam)
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_cdc_ckpt_").toString
      try {
        // a recovery-capable sink (the memory sink refuses to resume
        // from a checkpoint): each run collects its own batches
        def run(): Seq[Long] = {
          val got =
            new java.util.concurrent.ConcurrentLinkedQueue[Long]
          val q = spark.readStream.format("graft-store")
            .option("family", fam).option("part", "t")
            .option("startingVersion", "snapshot")
            .load()
            .writeStream
            .foreachBatch {
              (df: org.apache.spark.sql.Dataset[
                org.apache.spark.sql.Row], _: Long) =>
                df.collect().foreach(r => got.add(r.getLong(0)))
            }
            .option("checkpointLocation", ckpt)
            .start()
          try q.processAllAvailable() finally q.stop()
          scala.jdk.CollectionConverters
            .IteratorHasAsScala(got.iterator()).asScala.toSeq.sorted
        }
        // snapshot of v2 = the full line at stream start
        assert(run() === (0L until 24L))
        // two commits land while the stream is down
        def append(from: Long, until: Long): Unit = {
          val d = slice(from, until)
          val seg = ds.writeSegment(spark, fam, parts, Map("t" -> d))
          ds.appendManifest(spark, fam, seg,
            ds.frameFingerprint(d, Seq("id")))
          ()
        }
        append(24, 30)
        append(30, 36)
        // the restarted stream recovers offset v2 from the checkpoint
        // (a SerializedOffset on the recovery path) and emits exactly
        // the downtime window — never the snapshot again
        assert(run() === (24L until 36L))
        assert(ds.headLineage(spark, fam).map(_._1).max === 4L)
      } finally {
        graft.pipeline.SinkFiles.deleteRecursive(ckpt)
      }
    }
  }

  test("latest mode persists its anchor in the source-metadata dir: " +
      "a checkpointed restart emits exactly the downtime commits, and " +
      "the anchor file records the ORIGINAL stream-start version (the " +
      "value a replayed first batch must be computed against, not the " +
      "post-outage head)") {
    withFamily { (_, fam) =>
      buildLine(fam)
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_cdc_ckpt_").toString
      try {
        def run(): Seq[Long] = {
          val got =
            new java.util.concurrent.ConcurrentLinkedQueue[Long]
          val q = spark.readStream.format("graft-store")
            .option("family", fam).option("part", "t")
            .load()
            .writeStream
            .foreachBatch {
              (df: org.apache.spark.sql.Dataset[
                org.apache.spark.sql.Row], _: Long) =>
                df.collect().foreach(r => got.add(r.getLong(0)))
            }
            .option("checkpointLocation", ckpt)
            .start()
          try q.processAllAvailable() finally q.stop()
          scala.jdk.CollectionConverters
            .IteratorHasAsScala(got.iterator()).asScala.toSeq.sorted
        }
        assert(run() === Seq.empty) // nothing after the v2 anchor yet
        val anchorFile = new java.io.File(
          s"$ckpt/sources/0/graft_anchor")
        assert(anchorFile.isFile &&
          new String(java.nio.file.Files
            .readAllBytes(anchorFile.toPath)).trim === "2")
        def append(from: Long, until: Long): Unit = {
          val d = slice(from, until)
          val seg = ds.writeSegment(spark, fam, parts, Map("t" -> d))
          ds.appendManifest(spark, fam, seg,
            ds.frameFingerprint(d, Seq("id")))
          ()
        }
        append(24, 30)
        assert(run() === (24L until 30L))
        // the anchor stays the ORIGINAL stream-start version across
        // restarts — never silently re-derived from the moved head
        assert(new String(java.nio.file.Files
          .readAllBytes(anchorFile.toPath)).trim === "2")
      } finally {
        graft.pipeline.SinkFiles.deleteRecursive(ckpt)
      }
    }
  }

  test("graft-store stream, numeric startingVersion: replays from " +
      "that commit's window onward (not the base), and a version " +
      "outside the surviving lineage fails at stream DEFINITION") {
    withFamily { (_, fam) =>
      buildLine(fam)
      val q = spark.readStream.format("graft-store")
        .option("family", fam).option("part", "t")
        .option("startingVersion", "0")
        .load()
        .writeStream.format("memory").queryName("cdc_from0")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        assert(ids(spark.table("cdc_from0")) === (8L until 24L))
      } finally {
        q.stop()
        spark.sql("DROP VIEW IF EXISTS cdc_from0")
      }
      val e = intercept[Exception] {
        val bad = spark.readStream.format("graft-store")
          .option("family", fam).option("part", "t")
          .option("startingVersion", "7")
          .load()
          .writeStream.format("memory").queryName("cdc_bad")
          .outputMode("append").start()
        try { bad.processAllAvailable(); bad.stop() }
        finally spark.sql("DROP VIEW IF EXISTS cdc_bad")
      }
      assert(e.getMessage.contains("startingVersion") ||
        e.getCause != null)
    }
  }
}
