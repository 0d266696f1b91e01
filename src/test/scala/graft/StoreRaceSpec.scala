package graft

import java.util.concurrent.TimeUnit

import graft.operators.DurableStore

/** The cross-JVM publish race, both commit modes: a REAL second JVM
  * (StoreRaceChild via ProcessBuilder — the same discipline as the
  * InfluxTable live-server test) builds the same family/fingerprint
  * against a shared store root, with a file barrier guaranteeing both
  * builders hold COMPLETE artifacts before either commits. Asserts,
  * per mode: exactly one winner published; BOTH JVMs end up serving
  * the winner's bytes (the loser discarded its own); and no debris
  * survives — a vacuum sweep finds nothing to reclaim and the layout
  * still serves. This is the cross-process face the in-process race
  * simulations (DurableStoreSpec's nested loadOrBuild) cannot model:
  * `loadOrBuild`'s `synchronized` protects only one JVM, so here the
  * filesystem protocol alone carries the race. Round 15 adds the
  * INGEST-REPUBLISH race (the t52 composition): both JVMs write their
  * own delta segment for the same child fingerprint of one manifest
  * family and race the create-if-absent publish — one winner, the
  * loser reclaims its unreferenced segment, both serve the winner's
  * union, zero debris.
  */
class StoreRaceSpec extends SparkSpec {

  /** build.sbt's JDK-17 module-opens set for a forked Spark JVM
    * (duplicated here because the child is launched raw, not via sbt).
    */
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("cross-JVM publish race, both commit modes: one winner, the " +
      "loser serves the winner's bytes, no debris") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_xjvm_root_").toString
    val barrier = java.nio.file.Files
      .createTempDirectory("graft_xjvm_bar_").toString
    val fp = "fp0"
    val outFile = new java.io.File(barrier, "child.out")
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx3g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path"),
      "graft.StoreRaceChild", root, barrier, fp))
    val proc = new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true)
      .redirectOutput(outFile)
      .start()
    val savedRoot = spark.conf.getOption("spark.graft.store.root")
    try {
      spark.conf.set("spark.graft.store.root", root)
      val servedTags = for (mode <- Seq("rename", "marker")) yield {
        spark.conf.set("spark.graft.store.commit", mode)
        val fam = s"xjvm_$mode"
        val served = DurableStore.loadOrBuild(spark, fam, fp,
          Seq(DurableStore.Part("t", None))) {
          RaceBarrier.sync(barrier, fam, "parent")
          Map("t" -> Seq((1, "parent")).toDF("k", "who"))
        }
        val rows = served("t").collect()
        assert(rows.length === 1, s"$fam served ${rows.length} rows")
        fam -> rows.head.getString(1)
      }
      // cross-JVM INGEST-REPUBLISH race (the t52 composition, the one
      // in-process simulation cannot model): publish the shared base
      // generation, signal the child, then both JVMs hold a complete
      // delta segment for the SAME child fingerprint before either
      // attempts the one create-if-absent manifest publish
      val famM = "xjvm_manifest"
      val partsM = Seq(DurableStore.Part("t", None))
      val baseSeg = DurableStore.writeSegment(spark, famM, partsM,
        Map("t" -> Seq((0, "base")).toDF("k", "who")))
      DurableStore.loadOrBuildManifest(spark, famM, "fpBase", partsM)(
        Seq(baseSeg))
      RaceBarrier.announce(barrier, "manifest_base_ready")
      val servedM = DurableStore.loadOrBuildManifest(spark, famM,
        "fpChild", partsM) {
        val seg = DurableStore.writeSegment(spark, famM, partsM,
          Map("t" -> Seq((1, "parent")).toDF("k", "who")))
        RaceBarrier.sync(barrier, famM, "parent")
        DurableStore.manifestSegments(spark, famM, "fpBase") :+ seg
      }
      val myManifestTags = servedM("t").collect()
        .map(_.getString(1)).sorted.mkString(",")
      // cross-JVM COMPACTION race: publish a two-segment chain, then
      // both processes compact it concurrently — the fault hook is the
      // barrier (both merged segments complete before either attempts
      // the create-if-absent generation swap)
      val famC = "xjvm_compact"
      val cSeg1 = DurableStore.writeSegment(spark, famC, partsM,
        Map("t" -> (0 until 6).map(i => (i, s"c$i")).toDF("k", "who")))
      val cSeg2 = DurableStore.writeSegment(spark, famC, partsM,
        Map("t" -> (6 until 10).map(i => (i, s"c$i")).toDF("k", "who")))
      DurableStore.loadOrBuildManifest(spark, famC, "fpC", partsM)(
        Seq(cSeg1, cSeg2))
      RaceBarrier.announce(barrier, "compact_ready")
      DurableStore.faultHook = step =>
        if (step == "compact_segment_written")
          RaceBarrier.sync(barrier, famC, "parent")
      try DurableStore.compactManifest(spark, famC, "fpC", partsM)(
        identity)
      finally DurableStore.faultHook = _ => ()
      // the loser can return while the winner's marker content is
      // still in its create->write window (resolution falls back to
      // the old chain — correct serving behavior); poll briefly for
      // the settled single-segment view before asserting on it
      var mySegsC = DurableStore.manifestSegments(spark, famC, "fpC")
      val segDeadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (mySegsC.size != 1 && System.nanoTime() < segDeadline) {
        Thread.sleep(50)
        mySegsC = DurableStore.manifestSegments(spark, famC, "fpC")
      }
      assert(proc.waitFor(180, TimeUnit.SECONDS),
        "child JVM did not finish in time")
      val childOut = new String(
        java.nio.file.Files.readAllBytes(outFile.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
      assert(proc.exitValue() === 0,
        s"child JVM failed:\n${childOut.takeRight(3000)}")
      val childServed = childOut.linesIterator
        .filter(_.startsWith("RACE_SERVED "))
        .map { l =>
          val Array(_, fam, tag) = l.trim.split(" ")
          fam -> tag
        }.toMap
      servedTags.foreach { case (fam, tag) =>
        // a real winner, and both JVMs converged on the same bytes
        assert(Set("parent", "child").contains(tag), s"$fam: $tag")
        assert(childServed.get(fam) === Some(tag),
          s"$fam: parent served '$tag', child served " +
            s"'${childServed.get(fam)}' — the loser kept its own bytes")
        // no debris: the loser reclaimed its staging/attempt, nothing
        // for vacuum to sweep, and the layout still serves
        val rep = DurableStore.vacuum(spark, fam)
        assert(rep.debris.isEmpty && rep.stale.isEmpty,
          s"$fam left publish debris: $rep")
        assert(DurableStore.isBuilt(spark, fam, fp))
        val again = DurableStore.loadOrBuild(spark, fam, fp,
          Seq(DurableStore.Part("t", None)))(
          sys.error("published race layout rebuilt"))
        assert(again("t").collect().head.getString(1) === tag)
      }
      // the ingest-republish race: exactly one winner's union is
      // served on BOTH sides (base + one delta), the loser reclaimed
      // its unreferenced segment, and the layout is debris-free
      assert(Set("base,child", "base,parent").contains(myManifestTags),
        s"manifest union: $myManifestTags")
      assert(childServed.get(famM) === Some(myManifestTags),
        s"parent served '$myManifestTags', child served " +
          s"'${childServed.get(famM)}' — the loser kept its own union")
      assert(DurableStore.manifestSegments(spark, famM, "fpChild")
        .size === 2, "child manifest must be base + exactly one delta")
      val repM = DurableStore.vacuum(spark, famM)
      assert(repM.debris.isEmpty && repM.stale.isEmpty,
        s"ingest-republish race left debris: $repM")
      assert(DurableStore.segmentComplete(spark, famM, baseSeg),
        "the shared base segment was reclaimed")
      assert(DurableStore.loadOrBuildManifest(spark, famM, "fpChild",
        partsM)(sys.error("published union rebuilt"))("t")
        .collect().length === 2)
      // the compaction race: exactly one winning merged segment,
      // identical on both sides, full multiset preserved; the loser's
      // merged segment was reclaimed, so a vacuum finds only the two
      // superseded chain segments
      assert(mySegsC.size === 1 &&
        !Seq(cSeg1, cSeg2).contains(mySegsC.head),
        s"$famC: post-race chain $mySegsC")
      val childC = childServed.get(famC)
      assert(childC === Some(s"${mySegsC.head}:10"),
        s"$famC: parent resolved '${mySegsC.head}:10', child " +
          s"'$childC' — the JVMs diverged on the winning swap")
      assert(DurableStore.loadOrBuildManifest(spark, famC, "fpC",
        partsM)(sys.error("compacted layout unbuilt"))("t")
        .count() === 10)
      val repC = DurableStore.vacuum(spark, famC)
      assert(repC.stale.toSet === Set(cSeg1, cSeg2) &&
        repC.debris.isEmpty,
        s"$famC: loser's merged segment not reclaimed cleanly: $repC")
      assert(DurableStore.loadOrBuildManifest(spark, famC, "fpC",
        partsM)(sys.error("compacted layout swept"))("t")
        .count() === 10)
    } finally {
      proc.destroyForcibly()
      spark.conf.unset("spark.graft.store.commit")
      savedRoot.fold(spark.conf.unset("spark.graft.store.root"))(v =>
        spark.conf.set("spark.graft.store.root", v))
      Seq("xjvm_rename", "xjvm_marker").foreach(fam =>
        DurableStore.dropRegistered(spark, fam, fp,
          Seq(DurableStore.Part("t", None))))
      graft.pipeline.SinkFiles.deleteRecursive(root)
      graft.pipeline.SinkFiles.deleteRecursive(barrier)
    }
  }
}
