package graft

import org.apache.spark.sql.functions._

/** Dev-only phase decomposition of the l83 perplexity card. Usage:
  *   sbt 'Test/runMain graft.LmProbe <sfDir> <reps>'
  */
object LmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{NgramLm, NgramModelStore}

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[lmprobe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (rep <- 1 to reps) {
      println(s"==== rep $rep ====")
      val d = Tables.load(spark, sfDir, "documents")
      val model = t("model_store")(NgramModelStore.sharedBigram(spark, sfDir, 2))
      val pd = t("surprisal_noop") {
        val x = NgramLm.surprisalBits(d, "doc_id", "text", model, 2)
        x.write.format("noop").mode("overwrite").save()
        x
      }
      val ck = t("checkpoint")(pd.localCheckpoint(eager = true))
      t("tokens_only_noop") {
        d.select(explode(graft.functions.TextFunctions.tokens(col("text"))))
          .write.format("noop").mode("overwrite").save()
      }
      t("pairs_noop") {
        d.select(col("doc_id"),
          explode(NgramLm.ngramPairs(
            graft.functions.TextFunctions.tokens(col("text")), 2)).as("p"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
