package graft

import org.apache.spark.sql.functions._

/** Dev-only phase probe for the containment family (l50/l54/l55 —
  * VERDICT r16 item 4): times each phase of the capped containment
  * pipeline in isolation so "the candidate work is irreducible" is a
  * measured claim, not an assertion. Usage:
  *   sbt 'Test/runMain graft.ContainProbe <sfDir> [reps]'
  */
object ContainProbe {
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
      println(f"[containprobe] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val D = graft.operators.Dedup
    for (r <- 1 to reps) {
      println(s"[containprobe] ==== rep $r ====")
      val docs = Tables.load(spark, sfDir, "documents")
      // phase 1: the tokenize+shingle+explode scan both twins consume
      timed("postings_scan")(noop(D.containmentPostings(docs, "doc_id", "text")))
      val postings = timed("postings_checkpoint")(
        D.containmentPostings(docs, "doc_id", "text")
          .localCheckpoint(eager = true))
      // phase 2a: the df census (the cap's one aggregate)
      timed("df_agg")(noop(postings.groupBy(col("g"))
        .agg(count(lit(1)).as("df"))))
      // phase 2b: the capped candidate join + verify (from postings)
      timed("capped_pairs")(noop(
        D.containmentPairsCappedFromPostings(postings, 0.8, dfCap = 16)))
      // phase 2c: the exact twin's join (l54's other side)
      timed("exact_pairs")(noop(
        D.containmentPairsFromPostings(postings, 0.8)))
      // phase 3: the full gates as the bench runs them
      timed("l54_full")(noop(
        SparkEntry.queries("l54_containment_capped_gate")(spark, sfDir)))
      timed("l55_full")(noop(
        SparkEntry.queries("l55_curation_run")(spark, sfDir)))
    }
    spark.stop()
  }
}
