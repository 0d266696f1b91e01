package graft

/** Dev-only diagnostic (BenchOne family): job count + wall time of one
  * `Dedup.components` run over the exact embedding threshold graph —
  * the shared cost core of l19/l32/l41/l62. Measured here (sf0.1, 920
  * edges / 1181 nodes): 16-20 propagation rounds at ~4 AQE jobs each,
  * ~7.5 s warm — the per-round floor is plan/codegen/scheduling, not
  * data. Usage: sbt 'Test/runMain graft.CcProbe <sfDir>'
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    val e = Tables.load(spark, sfDir, "embeddings")
    val pairs =
      operators.Similarity.exactCosinePairs(e, "vec_id", "embedding", 0.4)
    for (rep <- 1 to 3) {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val comp = operators.Dedup.components(pairs)
      val (n, nc) = comp
        .agg(count(lit(1)), countDistinct(col("cluster_id"))).first() match {
          case r => (r.getLong(0), r.getLong(1))
        }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[ccprobe] rep$rep nodes=$n clusters=$nc " +
        f"jobs=${jobs.get() - j0} wall=$dt%.2f s")
    }
    println(s"[ccprobe] n_pairs=${pairs.count()}")
    spark.stop()
  }
}
