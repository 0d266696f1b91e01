package graft

import org.apache.spark.sql.functions._

/** Dev-only phase decomposition of the l57 pqTopK composition — times
  * each eager phase separately so the optimization round attacks the
  * real cost, not a guess. Usage:
  *   sbt 'Test/runMain graft.PqProbe <sfDir> <reps>'
  */
object PqProbe {
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
    import graft.operators.Similarity

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pqprobe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (rep <- 1 to reps) {
      println(s"==== rep $rep ====")
      val e = Tables.load(spark, sfDir, "embeddings")
      val q = e.where(col("vec_id") % 25 === 0)
      val cand = t("cand_checkpoint") {
        Similarity.ivfCandidates(spark, q, e, "vec_id", "embedding",
          nCentroids = 8, nProbe = 6, trainIters = 0)
          .localCheckpoint(eager = true)
      }
      val ivf = Similarity.ivfTopK(spark, q, e, "vec_id", "embedding", 10,
        nCentroids = 8, nProbe = 6, candidatesOpt = Some(cand))
      t("ivf_collect")(ivf.collect())
      val pq = t("pq_plan") {
        Similarity.pqTopK(spark, q, e, "vec_id", "embedding", 10,
          m = 16, nCodes = 64, trainIters = 1, nCentroids = 8,
          nProbe = 6, rerank = 8, candidatesOpt = Some(cand))
      }
      t("pq_collect")(pq.collect())
    }
    spark.stop()
  }
}
