package graft

/** Dev-only micro harness: time named queries with repetitions.
  * Usage: sbt 'Test/runMain graft.BenchOne <sfDir> <reps> <name> [name...]'
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val extras: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "_simhash_only" -> ((s, dir) =>
        graft.operators.Dedup.simhash(Tables.load(s, dir, "documents"), "doc_id", "text")),
      "_shingles_only" -> ((s, dir) =>
        graft.operators.Dedup.shingleSets(Tables.load(s, dir, "documents"), "doc_id", "text")
          .selectExpr("doc_id", "size(sh) as n")))
    if (sys.env.contains("BENCHONE_EXPLAIN"))
      names.foreach { n =>
        println(s"==== $n ====")
        (SparkEntry.queries ++ extras)(n)(spark, sfDir).explain("formatted")
      }
    for (name <- names; r <- 1 to reps) {
      val t0 = System.nanoTime()
      val df = (SparkEntry.queries ++ extras)(name)(spark, sfDir)
      df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(expr("bit_xor(h)")).collect()
      println(f"[benchone] $name rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
