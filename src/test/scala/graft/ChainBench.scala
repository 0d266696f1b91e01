package graft

import org.apache.spark.sql.functions._

import graft.operators.{DurableStore, NgramLm, NgramModelStore}

/** Dev-only chain-length economics harness: measures the merge-on-read
  * SERVE cost of a manifest lineage as its segment chain grows — the
  * number the `Maintenance.autoCompactManifest` threshold should be
  * set from, recorded as BASELINE.md's chain-length slope row.
  *
  * For k in {1, 4, 16}: builds the LM incremental lineage as a
  * k-segment chain whose UNION is the full corpus (slices by
  * doc_id % k, so the merged model — and therefore the served
  * content — is identical across k; only the file layout differs),
  * then times the full serve path: manifest resolve + merge-on-read
  * (groupBy-sum over the segment union) + the l83 surprisal scan and
  * aggregate. Prints per-rep lines and one summary JSON (min across
  * reps — the steady-state discipline).
  *
  * Usage: sbt 'Test/runMain graft.ChainBench <sfDir> [reps]'
  */
object ChainBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files
      .createTempDirectory("graft_chainbench_").toString
    spark.conf.set("spark.graft.store.root", root)
    val docs = Tables.load(spark, sfDir, "documents")
      .localCheckpoint(eager = true) // time the serve, not the scan
    val chains = Seq(1, 4, 16)
    val best = scala.collection.mutable.Map.empty[Int, Double]
    try {
      for (k <- chains) {
        val fam = s"chainbench_$k"
        // build the k-segment chain: base slice + k-1 appends; the
        // union is the whole corpus, so every k serves the same model
        var fp = "g0"
        NgramModelStore.durableIncBase(spark,
          docs.where(col("doc_id") % k === 0), fp, fam)
        for (i <- 1 until k) {
          val nf = s"g$i"
          NgramModelStore.durableIncUpdateTo(spark, fp, nf,
            docs.where(col("doc_id") % k === i), fam)
          fp = nf
        }
        require(DurableStore.manifestSegments(spark, fam, fp).size == k,
          s"chain fixture broken for k=$k")
        for (r <- 1 to reps) {
          val t0 = System.nanoTime()
          val t = DurableStore.loadOrBuildManifest(spark, fam, fp,
            NgramModelStore.IncParts)(
            sys.error("chain serve ran a build"))
          val row = NgramLm.surprisalBits(docs, "doc_id", "text",
              NgramModelStore.incModelOf(t), 2)
            .agg(count(lit(1)).as("n"),
              sum(col("total_bits")).as("bits"))
            .head()
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"[chainbench] k=$k rep$r $sec%.3f s " +
            s"(n=${row.getLong(0)}, bits=${row.getLong(1)})")
          best(k) = math.min(best.getOrElse(k, Double.MaxValue), sec)
        }
      }
      println("{\"metric\":\"chain_serve\",\"sf\":\"" + sfDir +
        "\",\"unit\":\"sec\",\"chains\":{" +
        chains.map(k => s""""$k":${f"${best(k)}%.3f"}""")
          .mkString(",") + "}}")
    } finally {
      graft.pipeline.SinkFiles.deleteRecursive(root)
      spark.stop()
    }
  }
}
