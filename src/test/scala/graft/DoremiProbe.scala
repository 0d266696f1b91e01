package graft

import org.apache.spark.sql.functions._

/** Exploratory harness: dump the DoReMi ledger at a given sf to judge
  * regime liveliness (distinct excess values / non-uniform weights)
  * before pinning the oracle. Not a test.
  */
object DoremiProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Engine.local(8)
    val docs = Tables.load(spark, sfDir, "documents")
    val out = graft.operators.Doremi.domainWeights(
      docs, "doc_id", "text", "source", col("doc_id") % 7 === 0)
    out.orderBy(col("source")).show(50, truncate = false)
    spark.stop()
  }
}
