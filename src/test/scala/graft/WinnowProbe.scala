package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Diagnostic main for the winnowing pipeline (not a test): times the
  * fingerprint build and the pair join, and (WINNOW_EXPLAIN=1) prints
  * the optimized plan of the explode. Historical note: the original
  * HOF formulation of the fingerprints went quadratic per row here —
  * InferFiltersFromGenerate duplicated the two-level transform stack
  * into size/isnotnull filters under the Generate (87 s vs 0.8 s at
  * sf0.1) — which is why `WinnowFromText` is one fused codegen'd
  * expression.
  */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Engine.session("local[32]", 32)
    val docs = Tables.load(spark, dir, "documents")

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (n=$n)")
    }

    val fps = Dedup.winnowFingerprintSets(docs, "doc_id", "text", 4, 5)
    time("fingerprints")(fps.select(xxhash64(col("fps")).as("h"))
      .agg(max(col("h"))).collect().head.getLong(0))
    if (sys.env.contains("WINNOW_EXPLAIN")) {
      println("[probe] raw-explode optimized plan (see the inferred filter):")
      println(fps.select(col("doc_id"), explode(col("fps")).as("fp"))
        .queryExecution.optimizedPlan.treeString.take(4000))
    }
    time("pairs")(Dedup.winnowPairs(docs, "doc_id", "text", 4, 5, 2, 64)
      .count())
    spark.stop()
  }
}
