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
