package graft

import org.apache.spark.sql.functions._

/** Dev-only phase probe for the durable ANN serve compositions
  * (t50/t52 — VERDICT r16 items 2 and 3): times each phase of the
  * ingest -> republish -> cold-boot -> serve cycle in isolation.
  * Mirrors t52's body (kept in sync by hand — it is a probe, not a
  * contract); phases whose jobs overlap via the §2.6 futures in the
  * real query are timed here SEQUENTIALLY, so the sum here minus the
  * bench line is the overlap's measured saving. Usage:
  *   sbt 'Test/runMain graft.ServeProbe <sfDir> [reps]'
  */
object ServeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[serveprobe] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val S = graft.operators.Similarity
    val ds = graft.operators.DurableStore
    val st = graft.operators.AnnIndexStore
    val parts = st.DurableParts

    for (r <- 1 to reps) {
      println(s"[serveprobe] ==== rep $r ====")
      val e = Tables.load(spark, sfDir, "embeddings")
      val base = e.where(col("vec_id") % 5 =!= 0)
      val baseFp = ds.frameFingerprint(base, Seq("vec_id", "embedding"))
      val newFp = ds.frameFingerprint(e, Seq("vec_id", "embedding"))
      val fam = s"ann_ingest_$baseFp"
      timed("vacuum")(ds.vacuum(spark, fam, keep = Set(baseFp)))
      val baseT = timed("base_load_or_build")(
        ds.loadOrBuildManifest(spark, fam, baseFp, parts) {
          val idx = S.buildAnnIndex(base, "vec_id", "embedding",
            st.DefaultNCentroids, st.DefaultTrainIters, st.DefaultM,
            st.DefaultNCodes, st.DefaultPqTrainIters)
          Seq(ds.writeSegment(spark, fam, parts, Map(
            "cent" -> idx.centroids, "lists" -> idx.lists,
            "codebook" -> idx.codebook, "codes" -> idx.codes,
            "norms" -> idx.norms)))
        })
      val cent = timed("base_checkpoints")(
        baseT("cent").localCheckpoint(eager = true))
      val cb = baseT("codebook").localCheckpoint(eager = true)
      val segsBase = ds.manifestSegments(spark, fam, baseFp)
      // the rebuild arm, timed sequentially (overlapped in real t52)
      val (lR, cR, nR, batchTop) = timed("rebuild_arm") {
        val (l0, c0, n0) = S.assignEncode(cent, cb, e,
          "vec_id", "embedding", m = st.DefaultM)
        val l = l0.localCheckpoint(eager = true)
        val c = c0.localCheckpoint(eager = true)
        val n = n0.localCheckpoint(eager = true)
        val qB = e.where(col("vec_id") % 25 === 0)
        val bt = S.pqTopKFromIndex(qB, e, "vec_id", "embedding",
            k = 10, m = st.DefaultM, codebook = cb, codes = c, norms = n,
            candidates = S.indexCandidates(qB, "vec_id", "embedding",
              cent, l, nProbe = 6), rerank = 0)
          .select(col("q_id"), col("c_id"), lit(1).as("__b"))
          .localCheckpoint(eager = true)
        (l, c, n, bt)
      }
      val out = java.nio.file.Files
        .createTempDirectory("graft_probe52_").toString
      val runId = "p" + java.lang.Integer.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(out))
      timed("ingest_spin") {
        val q = Tables.loadStream(spark, sfDir, "embeddings")
          .where(col("vec_id") % 5 === 0)
          .writeStream
          .foreachBatch((batch: org.apache.spark.sql.DataFrame, batchId: Long) => {
            ds.writeBatchSegmentOnce(spark, fam, runId, batchId, parts) {
              val (l, c, n) = S.assignEncode(cent, cb, batch,
                "vec_id", "embedding", m = st.DefaultM)
              Map("lists" -> l, "codes" -> c, "norms" -> n)
            }
            ()
          })
          .option("checkpointLocation", s"$out/_ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        q.stop()
      }
      val segsStreamed = ds.batchSegments(spark, fam, runId).map(_._2)
      timed("publish")(
        ds.publishManifest(spark, fam, newFp, segsBase ++ segsStreamed))
      val t = timed("manifest_tables")(
        ds.manifestTables(spark, fam, newFp, parts))
      val meta = timed("serve_meta_collect")(
        S.collectServeMeta(t("cent"), t("codebook")))
      timed("serve_spin") {
        val served = graft.streaming.StreamingOps.annTopKState(
          S.annServeScore(
            Tables.loadStream(spark, sfDir, "embeddings")
              .where(col("vec_id") % 25 === 0),
            "vec_id", "embedding", meta, t("lists"), t("codes"),
            t("norms"), nProbe = 6),
          k = 10)
        val prev = spark.conf.getOption("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        val q =
          try served.writeStream.format("memory")
            .queryName(s"serveprobe_mem_$r").outputMode("update")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          finally prev.fold(spark.conf.unset("spark.sql.shuffle.partitions"))(
            v => spark.conf.set("spark.sql.shuffle.partitions", v))
        q.awaitTermination()
        q.stop()
      }
      timed("gates") {
        val m1 = graft.queries.Gates.mismatches(t("lists"), lR, "__ml")
        val m2 = graft.queries.Gates.mismatches(t("codes"), cR, "__mc")
        val m3 = graft.queries.Gates.mismatches(t("norms"), nR, "__mn")
        m1.crossJoin(m2).crossJoin(m3).crossJoin(
          batchTop.agg(count(lit(1)).as("n")))
          .write.format("noop").mode("overwrite").save()
      }
      ds.dropBatchLedgers(spark, fam, runId)
      graft.pipeline.SinkFiles.deleteRecursive(out)
      timed("t52_full_as_registered")(
        SparkEntry.queries("t52_stream_ingest_republish")(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
      timed("t50_full_as_registered")(
        SparkEntry.queries("t50_stream_cold_boot_serve")(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
