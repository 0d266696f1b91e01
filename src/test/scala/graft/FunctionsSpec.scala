package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorFunctions, VectorHash}

/** Unit tests for the custom Catalyst expressions (both interpreted eval
  * and the codegen path — local Spark runs whole-stage codegen, so a
  * `select` exercises `doGenCode`).
  */
class FunctionsSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def refRollingHash(s: String): Option[Long] =
    if (s.isEmpty) None
    else {
      var acc = 0L; var first = true; var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i); i += Character.charCount(cp)
        if (first) { acc = cp.toLong; first = false }
        else acc = (acc * 31L + cp) % 1000000007L
      }
      Some(acc)
    }

  test("RollingHash matches the reference fold; empty -> NULL; codepoints not chars") {
    import spark.implicits._
    val inputs = Seq("hello world", "", "a", "naïve café", "emoji 😀 test")
    val got = inputs.toDF("s")
      .select(TextFunctions.rollingHash(col("s")).as("h"))
      .collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq === inputs.map(refRollingHash))
  }

  test("RollingHash over a provably NON-NULL child: nullable stays true, codegen compiles, empty -> NULL") {
    import spark.implicits._
    // exploded split tokens are non-nullable — the case that used to wire
    // ev.isNull to the FalseLiteral and break generated code (`false =
    // true;` -> interpreter fallback + wrong nullability)
    val df = Seq("x yy zzz").toDF("s")
      .select(explode(split(col("s"), " ")).as("tok"))
      .select(TextFunctions.rollingHash(col("tok")).as("h"))
    assert(df.schema("h").nullable)
    val got = df.collect().map(_.getLong(0)).toSeq
    assert(got === Seq("x", "yy", "zzz").map(refRollingHash(_).get))
    // non-nullable EMPTY input must surface as SQL NULL, not garbage
    val empty = spark.range(1)
      .select(TextFunctions.rollingHash(lit("")).as("h")).collect()
    assert(empty.head.isNullAt(0))
  }

  test("CosineSimilarity matches a sequential double fold") {
    import spark.implicits._
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-1.0f, 0.5f, 2.0f)
    val Row(got: Double) = Seq((a, b)).toDF("a", "b")
      .select(VectorFunctions.cosineSim(col("a"), col("b"))).collect()(0)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
    }
    assert(got === dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  test("shingles: fewer than k tokens -> empty; distinct 3-shingles otherwise") {
    import spark.implicits._
    val got = Seq("a b", "a b c d", "x y z x y z x y z")
      .toDF("t").select(TextFunctions.shingles(col("t")).as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) === Seq.empty)
    assert(got(1) === Seq("a b c", "b c d"))
    assert(got(2) === Seq("x y z", "y z x", "z x y")) // distinct keeps first occurrences
  }

  test("property: byte-scan shingles == naive split/slide/distinct reference") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    def refShingles(text: String, k: Int): Seq[String] = {
      val toks = text.trim.split(" ", -1).toSeq
      if (toks.size < k) Seq.empty
      else toks.sliding(k).map(_.mkString(" ")).toSeq.distinct
    }
    val word = Gen.oneOf("a", "bb", "ccc", "δδ", "x", "")
    val genText = Gen.listOf(word).map(_.mkString(" "))
    val prop = Prop.forAll(Gen.listOfN(20, genText)) { texts =>
      val got = texts.toDF("t")
        .select(TextFunctions.shingles(col("t")).as("sh"))
        .collect().map(_.getSeq[String](0).toSeq)
      got.toSeq == texts.map(refShingles(_, 3))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("langId branches: CJK beats markers; marker priority; unknown fallback") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val cases = Seq(
      "the cat and the dog is here", // en
      "der hund und die katze",      // de
      "el perro y los gatos que",    // es
      "le chat et les chiens est",   // fr
      "你好 the and of is",  // CJK wins over en markers
      "zzz qqq www")                 // unknown
    val got = cases.toDF("t")
      .select(TextAnalysis.langId(col("t"))).collect().map(_.getString(0))
    assert(got.toSeq === Seq("en", "de", "es", "fr", "zh", "unknown"))
  }

  test("GraftExtensions: custom expressions callable from plain SQL") {
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT rolling_hash('hello world') AS h,
        |  cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |             array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
        |  shingles('a b c d', 3) AS sh,
        |  simhash64('a b c d', 3) IS NOT NULL AS s
        |""".stripMargin).collect()(0)
    assert(r.getLong(0) === refRollingHash("hello world").get)
    assert(r.getDouble(1) === 1.0)
    assert(r.getSeq[String](2) === Seq("a b c", "b c d"))
    assert(r.getBoolean(3))
  }

  test("HyperplaneSignature derives dim from the array (no 64-dim hardcode)") {
    import spark.implicits._
    val v = Array.fill(80)(0.0f)
    val v2 = v.clone(); v2(70) = 100.0f // only differs beyond dim 64
    val sigs = Seq(("a", v), ("b", v2)).toDF("id", "e")
      .select(VectorFunctions.hyperplaneSig(col("e"), 16).as("s"))
      .collect().map(_.getLong(0))
    assert(sigs(0) !== sigs(1), "components >= 64 must influence the signature")
    // and matches the shared reference arithmetic
    def refSig(arr: Array[Float], bits: Int): Long = {
      var sig = 0L
      for (j <- 0 until bits) {
        var proj = 0.0
        for (d <- arr.indices) proj += arr(d).toDouble * VectorHash.planeSign(j, d)
        if (proj > 0) sig |= (1L << j)
      }
      sig
    }
    assert(sigs(0) === refSig(v, 16) && sigs(1) === refSig(v2, 16))
  }

  test("ZOrder16 interleaves bits; codegen matches a reference fold") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def ref(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L)((z, k) =>
        z | (((x >> k) & 1L) << (2 * k)) | (((y >> k) & 1L) << (2 * k + 1)))
    // known value: x=0b101, y=0b011 -> z bits {0,4} from x, {1,3} from y = 27
    assert(ref(5L, 3L) === 27L)
    val pairs = Seq((0L, 0L), (5L, 3L), (65535L, 0L), (0L, 65535L),
      (65535L, 65535L), (12345L, 54321L))
    val got = pairs.toDF("x", "y")
      .select(graft.functions.LayoutFunctions.zorder16(col("x"), col("y")))
      .collect().map(_.getLong(0))
    assert(got.toSeq === pairs.map { case (x, y) => ref(x, y) })
    // locality: nearby points interleave to nearby keys (same high bits)
    assert((ref(100L, 200L) >> 8) === (ref(101L, 201L) >> 8))
  }
}
