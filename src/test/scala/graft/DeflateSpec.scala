package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** The l114/l115/t46 deflate contract: the batched one-Deflater-per-
  * batch operator must equal a plain-Scala fresh-Deflater-per-row
  * reference byte-count-for-byte-count on ARBITRARY strings (pinning
  * that reset() between rows leaks no state across a batch), respect
  * the compressBound envelope, and discriminate repetitive from
  * incompressible text — the property the quality filter exists for.
  */
class DeflateSpec extends SparkSpec {

  private def docsDF(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  /** Fresh Deflater per call — the reference the batched reuse must
    * match exactly.
    */
  private def refDeflate(text: String, level: Int = 6): (Long, Long) = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val d = new java.util.zip.Deflater(level)
    try {
      d.setInput(bytes); d.finish()
      val buf = new Array[Byte](8192)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      (bytes.length.toLong, n)
    } finally d.end()
  }

  test("property: batched operator == fresh-per-row reference on " +
      "arbitrary strings (batch reuse leaks no state)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val word = Gen.oneOf("alpha", "beta", "x", "zz zz zz", "",
      "the quick brown fox", "é中文")
    val doc = Gen.choose(0, 30).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val corpus = Gen.choose(1, 12).flatMap(Gen.listOfN(_, doc))
    val prop = Prop.forAll(corpus) { texts =>
      // batchSize 3 forces multiple rows per Deflater instance AND
      // multiple batches per partition
      val got = TextAnalysis.deflateRatio(docsDF(texts), "doc_id",
          "text", batchSize = 3)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      texts.zipWithIndex.forall { case (t, i) =>
        got(i.toLong) == refDeflate(t)
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("compressBound envelope holds and empty text yields NULL ratio") {
    val texts = Seq("", "a", "ab " * 1000, ("x" * 100 + " ") * 50,
      (0 until 400).map(i => (i * 2654435761L).toString).mkString(" "))
    val rows = TextAnalysis.deflateRatio(docsDF(texts), "doc_id", "text")
      .withColumn("bound",
        TextAnalysis.deflateBound(col("len_in")))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(4),
        s"len_out ${r.getLong(2)} exceeds bound ${r.getLong(4)}")
    }
    val empty = rows.find(_.getLong(1) == 0L).get
    assert(empty.isNullAt(3), "empty text must have NULL ratio")
  }

  private def docsSrcDF(rows: Seq[(String, String)]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((t, s), i) => (i.toLong, t, s) }
      .toDF("doc_id", "text", "source")
  }

  /** Fresh Deflater per call WITH an optional preset dictionary. */
  private def refDictDeflate(text: String, dict: Option[Array[Byte]],
      level: Int = 6): Long = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val d = new java.util.zip.Deflater(level)
    try {
      dict.foreach(d.setDictionary)
      d.setInput(bytes); d.finish()
      val buf = new Array[Byte](8192)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      n
    } finally d.end()
  }

  test("property: dictionary operator == fresh-per-row reference; " +
      "reset() clears the dictionary between rows") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val word = Gen.oneOf("alpha", "beta", "zz zz", "template text",
      "", "é中文")
    val doc = Gen.choose(0, 20).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    // alternating dict / no-dict sources inside one batch: a no-dict
    // row FOLLOWING a dict row must equal the fresh no-dict reference,
    // which is exactly the reset-clears-dictionary claim
    val corpus = Gen.choose(2, 10).flatMap(n => Gen.listOfN(n,
      Gen.zip(doc, Gen.oneOf("withdict", "nodict"))))
    val dictGen = Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      .suchThat(_.nonEmpty)
    val prop = Prop.forAll(corpus, dictGen) { (rows, dict) =>
      val dicts = Map("withdict" -> dict)
      val got = TextAnalysis.deflateDictRatio(docsSrcDF(rows), "doc_id",
          "text", "source", dicts, batchSize = 3)
        .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4))))
        .toMap
      rows.zipWithIndex.forall { case ((t, s), i) =>
        val plain = refDictDeflate(t, None)
        val withD =
          if (s == "withdict") refDictDeflate(t, Some(dict)) else plain
        got(i.toLong) == ((plain, withD))
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("dictionary signal: a template doc gains sharply against its " +
      "source's trained dictionary, an unrelated doc does not") {
    val template = "please unsubscribe from this mailing list here"
    val docs = docsSrcDF(Seq(
      (s"$template now", "srcA"), (s"$template today", "srcA"),
      (s"intro text $template", "srcA"),
      ("completely unrelated words about volcanic geology", "srcB"),
      ("more unrelated prose on alpine botany and maps", "srcB")))
    val dicts = TextAnalysis.trainDeflateDicts(docs, "doc_id", "text",
      "source", k = 3, topPerSource = 8)
    assert(dicts.contains("srcA"), "template source trained no dict")
    assert(new String(dicts("srcA"),
        java.nio.charset.StandardCharsets.UTF_8).contains("unsubscribe"),
      "dictionary missed the hot passage")
    val got = TextAnalysis.deflateDictRatio(docs, "doc_id", "text",
        "source", dicts)
      .collect().map(r => r.getLong(0) -> r.getLong(6)).toMap
    assert((0L to 2L).forall(got(_) > 1000L),
      s"template docs gained <= 10% against their dictionary: $got")
    // srcB trained no df>=2 gram set rich enough to matter; its docs
    // must sit at (or near) zero gain
    assert((3L to 4L).forall(got(_) < 500L),
      s"unrelated docs gained suspiciously: $got")
  }

  test("discrimination: repetitive text compresses far below " +
      "number-noise text") {
    val rep = ("boilerplate template " * 200).trim
    val noise = (0 until 400)
      .map(i => ((i * 2654435761L) ^ (i << 17)).toString).mkString(" ")
    val got = TextAnalysis.deflateRatio(docsDF(Seq(rep, noise)),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(0L) < 1000L, s"repetitive ratio_bp ${got(0L)} not < 10%")
    assert(got(1L) > 3000L, s"noise ratio_bp ${got(1L)} not > 30%")
    assert(got(0L) * 3 < got(1L), "no discrimination margin")
  }
}
