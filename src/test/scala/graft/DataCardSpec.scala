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

  test("unimax: hand example — small sources capped, rest share one level") {
    import spark.implicits._
    // capacities: s1=1, s2=10, s3=10 tokens; epochCap=1, budget=12
    // (budgetBp 5715 of 21 total => floor 12). Waterline: s1 capped
    // (1*3 <= 12), s2 not (10*2 > 11) => k=1, share=(12-1) div 2=5.
    val docs = Seq(
      (0L, "t1", "s1"),
      (1L, (1 to 10).map(i => s"a$i").mkString(" "), "s2"),
      (2L, (1 to 10).map(i => s"b$i").mkString(" "), "s3"))
      .toDF("doc_id", "text", "source")
    val got = Curation.unimaxAllocate(docs, "text", "source",
        epochCap = 1, budgetBp = 5715)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3),
        r.getLong(4), r.getString(5))).toMap
    assert(got("s1") === ((1L, 1L, 10000L, "capped")))
    assert(got("s2") === ((10L, 5L, 5000L, "level")))
    assert(got("s3") === ((10L, 5L, 5000L, "level")))
  }

  test("unimax rates: serve map equals the published ledger's epoch fractions") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val serve = Curation.collectUnimaxRates(docs, "text", "source")
    val ledger = Curation.unimaxAllocate(docs, "text", "source",
        epochCap = 1, budgetBp = 9000)
      .collect()
      .map(r => r.getString(0) -> math.min(r.getLong(4), 10000L)).toMap
    assert(serve.rateBp === ledger)
    assert(serve.rateBp.values.exists(_ === 10000L),
      "a capped source must pass whole")
    assert(serve.rateBp.values.exists(_ < 10000L),
      "a level source must be sub-sampled")
  }

  test("unimax degenerate budgets: zero => nothing, full multi-epoch => all capped") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c", "s1"),
      (1L, "d e f g h", "s2"))
      .toDF("doc_id", "text", "source")
    val zero = Curation.unimaxAllocate(docs, "text", "source",
        epochCap = 1, budgetBp = 0)
      .collect().map(r => (r.getLong(3), r.getString(5)))
    zero.foreach { case (a, st) =>
      assert(a === 0L && st === "level", "zero budget allocates nothing")
    }
    // budget >= sum of caps: everyone takes the full epochCap
    val full = Curation.unimaxAllocate(docs, "text", "source",
        epochCap = 2, budgetBp = 30000)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    full.foreach { case (c, cap, a, ebp, st) =>
      assert(st === "capped" && a === cap && cap === 2 * c &&
        ebp === 20000L, "an over-provisioned budget caps everyone")
    }
  }

  test("unimax: min(cap, level) characterization holds on random capacities") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    (1 to 8).foreach { trial =>
      val nSrc = 2 + rnd.nextInt(9)
      val docs = (0 until nSrc).flatMap { s =>
        val nDocs = 1 + rnd.nextInt(4)
        (0 until nDocs).map { d =>
          val toks = 1 + rnd.nextInt(40)
          ((s * 10 + d).toLong,
            (1 to toks).map(i => s"w$i").mkString(" "), s"src$s")
        }
      }.toDF("doc_id", "text", "source")
      val cap = 1 + rnd.nextInt(3)
      val bp = 1000 + rnd.nextInt(12000)
      val rows = Curation.unimaxAllocate(docs, "text", "source",
          epochCap = cap, budgetBp = bp)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(5)))
      val totToks = rows.map(_._2).sum
      val budget = totToks * bp / 10000L
      val levels = rows.filter(_._5 == "level").map(_._4)
      assert(levels.distinct.size <= 1,
        s"trial $trial: all level sources share ONE waterline")
      val level = levels.headOption.getOrElse(Long.MaxValue)
      rows.foreach { case (s, _, c, a, st) =>
        assert(a === math.min(c, level) || (st == "capped" && a === c),
          s"trial $trial/$s: alloc must be min(cap, level)")
        assert(a <= c, s"trial $trial/$s: never above the epoch cap")
        if (st == "capped") assert(a === c && c <= level,
          s"trial $trial/$s: capped sources sit at/below the waterline")
        else assert(c > level || levels.isEmpty,
          s"trial $trial/$s: level sources exceed the waterline cap")
      }
      val alloc = rows.map(_._4).sum
      assert(alloc <= budget, s"trial $trial: never overspend")
      if (rows.exists(_._5 == "level"))
        assert(budget - alloc < rows.length.toLong,
          s"trial $trial: floor remainder only")
      else assert(rows.map(_._3).sum <= budget,
        s"trial $trial: all capped only when the caps fit the budget")
    }
  }
}
