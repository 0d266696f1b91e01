package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Invariants of the curation operators (chunking, hash split, scrub)
  * over systematically varied inputs — the driver gate checks fixture
  * equality; these check the contracts that must hold for ANY corpus.
  */
class TextOpsSpec extends SparkSpec {

  private def docsOfTokenCounts(ns: Seq[Int]) = {
    import spark.implicits._
    ns.zipWithIndex
      .map { case (n, i) => (i.toLong, (1 to n).map(j => s"t$j").mkString(" ")) }
      .toDF("doc_id", "text")
  }

  test("chunkWindows tiles [0, n) for every token count 1..100") {
    val window = 32
    val stride = 24
    val docs = docsOfTokenCounts(1 to 100)
    val rows = TextAnalysis.chunkWindows(docs, "doc_id", "text", window, stride)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    (1 to 100).foreach { n =>
      val id = (n - 1).toLong
      val chunks = rows(id).sortBy(_._3)
      // starts are exactly 0, stride, 2*stride, ... while start < n
      assert(chunks.map(_._3).toSeq === (0L until n.toLong by stride.toLong).toSeq)
      chunks.foreach { case (_, nTok, start, idx, len) =>
        assert(nTok === n.toLong)
        assert(idx === start / stride)
        assert(len === math.min(window.toLong, n - start))
        assert(len >= 1)
      }
      // coverage: chunk intervals union to [0, n) when stride <= window
      val covered = chunks.flatMap { case (_, _, s, _, l) => s until (s + l) }.toSet
      assert(covered === (0L until n.toLong).toSet)
    }
  }

  test("hashSplit: total, deterministic, and respects degenerate percentages") {
    val docs = docsOfTokenCounts(1 to 50)
    def run(train: Int, valPct: Int) = TextAnalysis.hashSplit(
        docs, "doc_id", "text", train, valPct, keepRate = lit(100))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    val a = run(80, 10)
    assert(a.length === 50)
    assert(a.forall { case (_, s, _) => Set("train", "val", "test")(s) })
    assert(a.forall(_._3), "keepRate=100 must keep everything")
    assert(run(80, 10).toSeq === a.toSeq, "assignment must be deterministic")
    assert(run(100, 0).forall(_._2 == "train"))
    assert(run(0, 0).forall(_._2 == "test"))
  }

  test("cleanText strips URLs and emails and collapses whitespace") {
    import spark.implicits._
    val got = Seq(
      ("see https://ex.com/a?b=1 now", "see now"),
      ("mail me@x.org  please", "mail please"),
      ("  a\t b \n c  ", "a b c")
    ).toDF("text", "expected")
      .select(TextAnalysis.cleanText(col("text")).as("got"), col("expected"))
      .collect()
    got.foreach(r => assert(r.getString(0) === r.getString(1)))
  }
}
