package graft

import org.apache.spark.sql.functions._

/** Dev-only plan artifact dumper for the optimization rounds: writes
  * `explain("formatted")` of named registered queries — plus the key
  * operator subframes whose plans the round's claims are about but
  * which a final gate frame hides behind localCheckpoints — to
  * `<outDir>/<name>_<tag>.txt`. Usage:
  *   sbt 'Test/runMain graft.PlanDump <sfDir> <outDir> <tag> <name>...'
  * Operator subframe names start with an underscore.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val names = args.drop(3).toSeq
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val extras: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "_lm_surprisal" -> ((s, dir) => {
        val d = Tables.load(s, dir, "documents")
        graft.operators.NgramLm.surprisalBits(d, "doc_id", "text",
          graft.operators.NgramModelStore.sharedBigram(s, dir, 2), 2)
      }),
      "_pq_topk" -> ((s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val q = e.where(col("vec_id") % 25 === 0)
        graft.operators.Similarity.pqTopK(s, q, e, "vec_id", "embedding",
          10, m = 16, nCodes = 64, trainIters = 1, nCentroids = 8,
          nProbe = 6, rerank = 8)
      }),
      "_knn_classify" -> ((s, dir) =>
        graft.operators.Similarity.knnClassify(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          "label", 10)),
      "_doremi_pairs" -> ((s, dir) =>
        graft.operators.Doremi.pairsFrame(
          Tables.load(s, dir, "documents"), "doc_id", "text", "source",
          col("doc_id") % 7 === 0)))

    names.foreach { n =>
      val df = (SparkEntry.queries ++ extras)(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${n}_$tag.txt"), plan)
      println(s"[plandump] wrote $n")
    }
    spark.stop()
  }
}
