package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators beyond the built-in HLL (r09) and t-digest
  * (r35) paths: Count-Min for heavy-hitter counting. The reference has no
  * sketch surface; these are the §2.1 "absent category" scale extensions.
  */
object Sketches {

  /** Heavy hitters with Count-Min error bounds made driver-checkable:
    * the exact top-k items (fully tie-broken) each carry the CMS
    * estimate's guarantees as booleans — `ge_exact` (CMS never
    * undercounts; holds always) and `within_eps` (estimate ≤ exact +
    * ⌈eps·N⌉; holds with `confidence`, and deterministically for a fixed
    * seed/fixture). A regression in the sketch path flips a boolean and
    * fails the hash gate — same pattern as the l22-l24 recall gates.
    *
    * 100 TB shape: the sketch is one `count_min_sketch` aggregate —
    * constant-size (width×depth counters), map-side partial, merged by
    * counter addition, so the estimate is independent of partition
    * count and merge order (the unit test pins this). The exact side is
    * a map-side-combined count + TakeOrdered(k); the k-row join against
    * the 1-row sketch broadcasts. The estimate UDF deserializes the
    * sketch k times on one executor — off the hot path by construction
    * (k rows), and the sketch API is JVM-only so a codegen'd Expression
    * would buy nothing.
    */
  def cmsHeavyHitters(items: DataFrame, itemCol: String, k: Int,
      eps: Double = 0.001, confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    require(k > 0 && eps > 0 && confidence > 0 && confidence < 1,
      "need k > 0, eps > 0, 0 < confidence < 1")
    val exact = items
      .groupBy(col(itemCol).cast("string").as("item"))
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("item")).limit(k)
    val sk = items.agg(
      expr(s"count_min_sketch(CAST($itemCol AS STRING), " +
        s"CAST($eps AS DOUBLE), CAST($confidence AS DOUBLE), $seed)").as("sk"),
      count(lit(1)).as("total"))
    val estimate = udf((bytes: Array[Byte], item: String) =>
      org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(bytes))
        .estimateCount(item))
    exact.crossJoin(broadcast(sk))
      .select(col("item"), col("exact_cnt"),
        estimate(col("sk"), col("item")).as("cms_est"),
        ceil(lit(eps) * col("total")).cast("long").as("bound"))
      .select(col("item"), col("exact_cnt"),
        (col("cms_est") >= col("exact_cnt")).as("ge_exact"),
        (col("cms_est") <= col("exact_cnt") + col("bound")).as("within_eps"))
  }

  /** Blocklist removal with a bloom pre-filter — result IDENTICAL to the
    * plain anti-join (false positives die in the exact verify), but the
    * expensive shuffle only ever sees the bloom-maybe rows.
    *
    * Why the split-union shape: for an ANTI join a bloom cannot drop
    * rows outright (a bloom-negative row is KEPT, not discarded), so the
    * pre-filter's value is routing — definite-negatives (the vast
    * majority against any real blocklist) bypass the join entirely and
    * shuffle nothing; only maybes (true hits + fpp of the rest) pay the
    * anti-join. One extra pass over the (cheap, pruned, codegen'd) scan
    * buys a shuffle bounded by hits + fpp·N — the winning trade whenever
    * shuffle dominates scan, i.e. at exactly the scale a blocklist is
    * big. The blocklist-side `count()` is metadata-served for columnar
    * sources and sizes the filter; the built filter moves to the driver
    * as ONE fixed-size scalar (the scalar-subquery pattern), never rows.
    */
  def blocklistFilter(corpus: DataFrame, blocklist: DataFrame,
      corpusKey: String, blockKey: String, fpp: Double = 0.01): DataFrame = {
    val expected = blocklist.count()
    val bf = graft.functions.BloomFunctions.buildBloom(
      blocklist, blockKey, expected, fpp)
    val might = graft.functions.BloomFunctions.mightContain(bf, col(corpusKey))
    val clean = corpus.where(!might)
    val verified = corpus.where(might)
      .join(blocklist.select(col(blockKey).as("__bk")).distinct(),
        col(corpusKey) === col("__bk"), "left_anti")
    clean.unionByName(verified)
  }
}
