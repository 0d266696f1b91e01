package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.pipeline.{Maintenance, ParquetSink}

/** Sink maintenance: small-file compaction and partition-drop retention. */
class MaintenanceSpec extends SparkSpec {

  test("compactParquet: fewer files, identical data") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_compact_").toString + "/series"
    val df = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
    df.repartition(16).write.parquet(dir)
    val filesBefore = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(filesBefore === 16)
    val (before, after) = Maintenance.compactParquet(spark, dir, targetBytes = Long.MaxValue)
    assert(before === 16 && after === 1, s"$before -> $after")
    val back = spark.read.parquet(dir)
    assert(back.count() === 1000)
    assert(back.agg(sum(col("v"))).first().getDouble(0) === (1 to 1000).map(_ * 2.0).sum)
  }

  test("dropPartitionsBelow: date-partition retention drops only expired days") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_retain_").toString
    val sink = new ParquetSink(base, partitionCols = Seq("p_date"))
    val rows = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, Timestamp.valueOf("2024-01-02 10:00:00")),
      (3L, Timestamp.valueOf("2024-01-03 10:00:00")))
    sink.append(rows.toDF("id", "time").withColumn("p_date", to_date(col("time"))),
      "events")
    val dropped = Maintenance.dropPartitionsBelow(
      s"$base/events", "p_date", cutoff = "2024-01-03")
    assert(dropped.sorted === Seq("2024-01-01", "2024-01-02"))
    val remaining = spark.read.parquet(s"$base/events")
    assert(remaining.select("id").collect().map(_.getLong(0)).toSeq === Seq(3L))
  }

  test("autoCompactManifest fires exactly past the chain-length " +
      "threshold, preserves the served multiset, and is a no-op at " +
      "or below it") {
    import spark.implicits._
    import graft.operators.DurableStore
    val root = Files.createTempDirectory("graft_autocompact_").toString
    val saved = spark.conf.getOption("spark.graft.store.root")
    spark.conf.set("spark.graft.store.root", root)
    val fam = "spec_autocompact"
    val parts = Seq(DurableStore.Part("t", None))
    try {
      def seg(lo: Int, hi: Int) = DurableStore.writeSegment(spark, fam,
        parts, Map("t" -> (lo until hi).map(i => (i, i.toLong))
          .toDF("k", "v")))
      val chain = Seq(seg(0, 8), seg(8, 12), seg(12, 14))
      DurableStore.loadOrBuildManifest(spark, fam, "fp0", parts)(chain)
      def rows() = DurableStore.loadOrBuildManifest(spark, fam, "fp0",
        parts)(sys.error("rebuilt"))("t")
        .collect().map(_.toString).toSeq.sorted
      val expect = rows()
      // AT the threshold (3 segments, max 3): must NOT fire
      assert(!Maintenance.autoCompactManifest(spark, fam, "fp0", parts,
        maxSegments = 3)(identity))
      assert(DurableStore.manifestSegments(spark, fam, "fp0") === chain,
        "a no-op policy pass changed the chain")
      // PAST the threshold (3 > 2): must fire and collapse to one
      assert(Maintenance.autoCompactManifest(spark, fam, "fp0", parts,
        maxSegments = 2)(identity))
      val after = DurableStore.manifestSegments(spark, fam, "fp0")
      assert(after.size === 1 && !chain.contains(after.head))
      assert(rows() === expect, "compaction changed the served multiset")
      // and the compacted chain (1 <= 2) is below threshold again
      assert(!Maintenance.autoCompactManifest(spark, fam, "fp0", parts,
        maxSegments = 2)(identity))
    } finally {
      saved.fold(spark.conf.unset("spark.graft.store.root"))(v =>
        spark.conf.set("spark.graft.store.root", v))
      graft.pipeline.SinkFiles.deleteRecursive(root)
    }
  }

  test("upsert: newer wins, version tie prefers the update, new keys insert") {
    import spark.implicits._
    val base = Seq(
      (1L, 10L, "old"), // will be updated by newer version
      (2L, 10L, "old"), // tie on version: update must win
      (3L, 10L, "old")  // untouched
    ).toDF("k", "v", "payload")
    val updates = Seq(
      (1L, 20L, "new"),
      (2L, 10L, "new"),
      (4L, 5L, "new")   // key not in base: plain insert
    ).toDF("k", "v", "payload")
    val got = graft.pipeline.Maintenance
      .upsert(base, updates, Seq("k"), "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 20L, "new"), (2L, 10L, "new"), (3L, 10L, "old"), (4L, 5L, "new")))
  }
}
