package graft

import org.apache.spark.sql.functions._

import graft.operators.{Opq, Pca, Similarity}

/** Exploratory harness: print l112's two gate sides at a given sf —
  * the OPQ error trace and the pure-ADC top-10 agreement hit counts
  * under the PCA rotation vs the trained rotation (the "report both"
  * numbers BASELINE.md records). Not a test.
  */
object OpqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Engine.local(8)
    val e = Tables.load(spark, sfDir, "embeddings")
    val pca = Pca.fit(e, "embedding")
    val opq = Opq.fitRotation(e, "vec_id", "embedding",
      m = 16, nCodes = 64, iters = 4, r0 = pca.axes)
    println(s"[opqprobe] errTrace = ${opq.errTrace.toSeq}")
    val isQ = col("vec_id") % 25 === 0
    def hits(rot: Array[Array[Double]], tag: String): Unit = {
      val rc = e.select(col("vec_id"),
          Opq.rotateExpr(rot, col("embedding")).as("embedding"))
        .localCheckpoint(eager = true)
      val q = rc.where(isQ)
      val cand = Similarity.ivfCandidates(spark, q, rc, "vec_id",
          "embedding", nCentroids = 8, nProbe = 6, trainIters = 0)
        .localCheckpoint(eager = true)
      val ivf = Similarity.ivfTopK(spark, q, rc, "vec_id", "embedding",
          10, nCentroids = 8, nProbe = 6, candidatesOpt = Some(cand))
        .select(col("q_id"), col("c_id"), lit(1).as("__i"))
      val pq = Similarity.pqTopK(spark, q, rc, "vec_id", "embedding",
          10, m = 16, nCodes = 64, trainIters = 1, nCentroids = 8,
          nProbe = 6, rerank = 1, candidatesOpt = Some(cand))
        .select(col("q_id"), col("c_id"), lit(1).as("__p"))
      val r = ivf.join(pq, Seq("q_id", "c_id"), "full_outer")
        .agg(count(col("__i")).as("n_ivf"),
          count(when(col("__i").isNotNull && col("__p").isNotNull, 1))
            .as("h")).collect().head
      println(s"[opqprobe] $tag: hits = ${r.getLong(1)} / ${r.getLong(0)}")
    }
    hits(pca.axes, "pca")
    hits(opq.rotation, "opq")
    spark.stop()
  }
}
