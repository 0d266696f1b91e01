package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

class DataCardSpec extends SparkSpec {

  test("data card values on a hand-built corpus") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a a b", "en", "s1"),
      (1L, "a a b", "en", "s2"), // exact dup of 0
      (2L, "c", "de", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val got = Curation.dataCard(docs, "doc_id", "text", "lang", "source")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got(("corpus", "n_docs")) === 3L)
    assert(got(("corpus", "n_tokens")) === 7L)
    assert(got(("corpus", "n_chars")) === 11L)
    assert(got(("dedup", "n_unique_digests")) === 2L)
    assert(got(("dedup", "n_dup_docs")) === 1L)
    assert(got(("dedup", "dup_token_mass")) === 3L)
    assert(got(("lang", "en")) === 2L && got(("lang", "de")) === 1L)
    assert(got(("source", "s1")) === 2L && got(("source", "s2")) === 1L)
    assert(got(("quality", "n_short_docs")) === 3L)
    assert(got(("quality", "repeated_token_mass")) === 2L)
    assert(got(("pack", "n_shards_4096")) === 1L)
    assert(got.size === 13)
  }

  test("data card plan: every section reads the one checkpointed scan, never the source") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val card = Curation.dataCard(docs, "doc_id", "text", "lang", "source")
    val plan = card.queryExecution.executedPlan.toString
    // the shared-scan contract: the parquet source is materialized ONCE
    // into the checkpointed per-doc frame; the assembled card must plan
    // zero parquet scans of its own — each section reads the checkpoint
    assert(!plan.contains("Scan parquet") && !plan.contains("FileScan"),
      s"a section replanned the corpus scan:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"expected sections to read the checkpointed frame:\n$plan")
  }
}
