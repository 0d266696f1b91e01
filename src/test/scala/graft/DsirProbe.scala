package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

/** Dev-only: importance-bits distribution + acceptance regimes for the
  * DSIR resampler at a scale factor, to place the threshold so full,
  * partial and zero acceptance all occur at every sf.
  * Usage: sbt 'Test/runMain graft.DsirProbe <sfDir> [threshold]'
  */
object DsirProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val thr = args.lift(1).map(_.toLong).getOrElse(0L)
    val spark = Engine.local(8)
    val docs = Tables.load(spark, sfDir, "documents")
    val ledger = Dsir.dsirResample(docs, "doc_id", "text", "source",
      col("doc_id") % 7 === 0, offsetBits = thr)
    ledger.orderBy("source").show(50, truncate = false)
    // per-doc imp distribution via the importance table path
    val w = Dsir.importanceTable(docs, "doc_id", "text",
      col("doc_id") % 7 === 0)
    w.agg(min("imp"), max("imp"), count(lit(1))).show()
    val perDoc = docs
      .select(col("doc_id"),
        explode(graft.operators.NbClassifier.bigramFeats(
          graft.functions.TextFunctions.tokens(col("text")))).as("g"))
      .select(col("doc_id"),
        pmod(graft.functions.TextFunctions.rollingHash(col("g")),
          lit(4096L)).as("bkt"))
      .join(broadcast(w), Seq("bkt"))
      .groupBy("doc_id").agg(sum("imp").as("imp"))
    perDoc.select(
      percentile_approx(col("imp"), array((0 to 10).map(i => lit(i / 10.0)): _*),
        lit(10000)).as("deciles")).show(truncate = false)
    spark.stop()
  }
}
