package graft

/** Dev-only: print recall/precision of the approximate paths vs their
  * exact twins at a given sf, to pick CORRECTNESS gate floors.
  * Usage: sbt 'Test/runMain graft.RecallProbe <sfDir>'
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, Similarity}

    val emb = Tables.load(spark, sfDir, "embeddings")
    val q = emb.where(col("vec_id") % 25 === 0)
    val exact = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 10)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def rp(name: String, approx: Set[(Long, Long)], base: Set[(Long, Long)]): Unit = {
      val hits = (approx intersect base).size
      println(f"[probe] $name recall=${hits.toDouble / base.size}%.3f precision=${hits.toDouble / math.max(1, approx.size)}%.3f approx=${approx.size} base=${base.size}")
    }
    val lsh = Similarity.lshTopK(spark, q, emb, "vec_id", "embedding", 10, bits = 4, tables = 4)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rp("lshTopK(4x4)", lsh, exact)
    val ivf = Similarity.ivfTopK(spark, q, emb, "vec_id", "embedding", 10)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rp("ivfTopK(16/4)", ivf, exact)
    // PQ gate base: the SAME candidates ranked by full-precision cosine
    // (ivfTopK at identical probe params) — isolates ADC ranking fidelity
    // from candidate recall, which l23 gates separately.
    val ivfWide = Similarity.ivfTopK(spark, q, emb, "vec_id", "embedding",
        10, nCentroids = 8, nProbe = 6)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Seq((16, 64, 2, 0), (16, 64, 2, 4), (8, 32, 2, 4), (16, 64, 2, 8),
        (16, 64, 1, 8))
      .foreach { case (m, nc, it, rr) =>
        val pq = Similarity.pqTopK(spark, q, emb, "vec_id", "embedding", 10,
            m = m, nCodes = nc, trainIters = it, nCentroids = 8, nProbe = 6,
            rerank = rr)
          .select("q_id", "c_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        rp(s"pqTopK(m=$m,codes=$nc,it=$it,rr=$rr) vs exact", pq, exact)
        rp(s"pqTopK(m=$m,codes=$nc,it=$it,rr=$rr) vs ivf-same-cand", pq, ivfWide)
    }

    val ep = Similarity.exactCosinePairs(emb, "vec_id", "embedding", 0.4)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Seq((4, 16), (6, 10), (8, 8)).foreach { case (bits, tables) =>
      val got = Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 0.4,
          bits = bits, tables = tables)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      rp(s"lshNearDupPairs(${bits}x$tables)", got, ep)
    }
    // SemDeDup prune report: dropped-set recall (semantic CC vs exact CC;
    // picks l62's floor — dropped docs are a structural subset)
    locally {
      def dropped(pairs: org.apache.spark.sql.DataFrame): Set[Long] =
        Dedup.components(pairs)
          .where(col("cluster_id") =!= col("doc_id"))
          .select("doc_id").collect().map(_.getLong(0)).toSet
      val exDrop = dropped(
        Similarity.exactCosinePairs(emb, "vec_id", "embedding", 0.4))
      val semDrop = dropped(Similarity.semanticDedupPairs(emb, "vec_id",
        "embedding", 0.4, nClusters = 8, trainIters = 1, probes = 3))
      rp("semanticPrune dropped-set (k=8,it=1,p=3)", semDrop.map((0L, _)),
        exDrop.map((0L, _)))
    }
    // SemDeDup cluster-bounded pairs vs the same exact base (picks l61's
    // cluster count / training / probes / floor)
    Seq((8, 0, 1), (8, 1, 2), (16, 1, 2), (8, 1, 3), (16, 1, 3),
        (8, 1, 4)).foreach { case (k, it, p) =>
      val got = Similarity.semanticDedupPairs(emb, "vec_id", "embedding",
          0.4, nClusters = k, trainIters = it, probes = p)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      rp(s"semanticDedupPairs(k=$k,it=$it,p=$p)", got, ep)
    }

    val docs = Tables.load(spark, sfDir, "documents")
    val jac = Dedup.jaccardPairs(docs, "doc_id", "text", 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simhashPairs(docs, "doc_id", "text")
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rp("simhashPairs", sim, jac)

    // df distribution + df-capped containment recall (picks l54's cap/floor)
    val dfs = docs.select(explode(graft.functions.TextFunctions
        .shingles(col("text"), 3)).as("g"))
      .groupBy("g").count()
    dfs.agg(count(lit(1)).as("n_shingles"),
        expr("approx_percentile(count, array(0.5, 0.9, 0.99, 1.0))"))
      .collect().foreach(r => println(s"[probe] shingle df p50/p90/p99/max: $r"))
    val cont = Dedup.containmentPairs(docs, "doc_id", "text", 0.8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Seq(16, 32, 64, 128).foreach { cap =>
      val got = Dedup.containmentPairsCapped(docs, "doc_id", "text", 0.8,
          dfCap = cap)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      rp(s"containmentPairsCapped(df<=$cap)", got, cont)
    }
    spark.stop()
  }
}
