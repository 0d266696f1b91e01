package graft

import org.apache.spark.sql.functions._

import graft.operators.NbClassifier

/** Contracts of the Naive Bayes curation classifier (l90/t33) that
  * must hold for ANY corpus — the driver gate checks fixture equality;
  * these pin the arguments behind it.
  */
class NbClassifierSpec extends SparkSpec {

  private def docsDF(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("marginBits: hand-computed unigram log-odds margins") {
    // pos "a b a": a->2 b->1, N_pos=3; neg "c d": c->1 d->1, N_neg=2
    // V = 4 (a,b,c,d); N_pos+V=7 (bitlen 3), N_neg+V=6 (bitlen 3)
    // margin(a) = (3-bitlen(1)) - (3-bitlen(3)) = 2-1 = 1
    // margin(b) = (3-bitlen(1)) - (3-bitlen(2)) = 2-1 = 1
    // margin(c) = (3-bitlen(2)) - (3-bitlen(1)) = 1-2 = -1
    // margin(z unseen) = (3-1) - (3-1) = 0
    val model = NbClassifier.trainNb(
      docsDF(Seq("a b a")), docsDF(Seq("c d")), "text")
    val got = NbClassifier.marginBits(
        docsDF(Seq("a c z", "c c", "a b")), "doc_id", "text", model)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) -999L else r.getLong(2)))
      .toMap
    assert(got(0L) === (3L, 0L))  // 1 - 1 + 0
    assert(got(1L) === (2L, -2L))
    assert(got(2L) === (2L, 2L))
  }

  test("bigram features: a 1-token doc has no features and scores NULL") {
    val model = NbClassifier.trainNb(
      docsDF(Seq("a b a")), docsDF(Seq("c d")), "text",
      NbClassifier.bigramFeats)
    val r = NbClassifier.marginBits(docsDF(Seq("a")), "doc_id", "text",
      model, NbClassifier.bigramFeats).collect().head
    assert(r.getLong(1) === 0L && r.isNullAt(2) && r.isNullAt(3))
    val serve = NbClassifier.collectNbServeModel(model)
    val k = docsDF(Seq("a"))
      .select(graft.functions.TextFunctions.tokens(col("text")).as("t"))
      .select(NbClassifier.keepLocal(serve,
        NbClassifier.bigramFeats(col("t"))).as("k"))
      .collect().head
    assert(k.isNullAt(0))
  }

  test("property: serve fold keep decision equals the join path row-for-row") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val word = Gen.oneOf("a", "b", "c", "dd", "e")
    val doc = Gen.choose(0, 6).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val corpus = Gen.choose(3, 9).flatMap(Gen.listOfN(_, doc))
    val prop = Prop.forAll(corpus) { texts =>
      val docs = docsDF(texts)
      val model = NbClassifier.trainNb(
        docs.where(col("doc_id") % 2 === 0),
        docs.where(col("doc_id") % 2 === 1),
        "text", NbClassifier.bigramFeats)
      val join = NbClassifier
        .marginBits(docs, "doc_id", "text", model, NbClassifier.bigramFeats)
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(2)) null
          else java.lang.Long.valueOf(
            if (r.getLong(2) >= 0) 1L else 0L)))
        .toMap
      val serve = NbClassifier.collectNbServeModel(model)
      val fold = docs
        .select(col("doc_id"),
          graft.functions.TextFunctions.tokens(col("text")).as("t"))
        .select(col("doc_id"), NbClassifier.keepLocal(serve,
          NbClassifier.bigramFeats(col("t"))).as("k"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null
          else java.lang.Long.valueOf(r.getLong(1))))
        .toMap
      join == fold
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("l90 scoring plan: count table broadcasts, no sort-merge join") {
    val docs = docsDF((1 to 200).map(i => s"w${i % 9} w${(i * 3) % 9} w$i"))
    val model = NbClassifier.trainNb(
      docs.where(col("doc_id") % 7 === 0),
      docs.where(col("doc_id") % 7 === 1),
      "text", NbClassifier.bigramFeats)
    // the scale contract: the vocab-bounded count table BROADCASTS into
    // the corpus-sized scoring join — a shuffled join on the exploded
    // feature frame would move feature-count-sized data
    val plan = NbClassifier
      .marginBits(docs, "doc_id", "text", model, NbClassifier.bigramFeats)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"plan:\n$plan")
  }

  test("degenerate corpus with no features: all-zero model, margin 0, keep everything, fold agrees") {
    // every doc under 2 tokens -> bigram feats empty everywhere -> the
    // count table is EMPTY; totals must coalesce to the all-zero model
    // (margin 0 for any future doc = keep), not NULL
    val docs = docsDF(Seq("a", "b", "c", "d"))
    val model = NbClassifier.trainNb(
      docs.where(col("doc_id") % 2 === 0),
      docs.where(col("doc_id") % 2 === 1),
      "text", NbClassifier.bigramFeats)
    val scored = NbClassifier.marginBits(docsDF(Seq("x y z")), "doc_id",
      "text", model, NbClassifier.bigramFeats).collect().head
    assert(scored.getLong(1) === 2L && scored.getLong(2) === 0L)
    val serve = NbClassifier.collectNbServeModel(model)
    assert(serve.featMargin.isEmpty && serve.unseenMargin === 0)
    val k = docsDF(Seq("x y z"))
      .select(graft.functions.TextFunctions.tokens(col("text")).as("t"))
      .select(NbClassifier.keepLocal(serve,
        NbClassifier.bigramFeats(col("t"))).as("k"))
      .collect().head
    assert(k.getLong(0) === 1L)
  }

  test("collectNbServeModel refuses an over-bound feature table") {
    val docs = docsDF((1 to 40).map(i => s"u$i v$i"))
    val model = NbClassifier.trainNb(
      docs.where(col("doc_id") % 2 === 0),
      docs.where(col("doc_id") % 2 === 1), "text")
    val e = intercept[IllegalArgumentException] {
      NbClassifier.collectNbServeModel(model, maxEntries = 8)
    }
    assert(e.getMessage.contains("exceed"))
  }
}
