package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** The REAL codec tier: genuine PNG bytes round-tripped through the
  * batched decode shape (fake-codec tiers are covered by the l12-l14 /
  * l18 / l43 oracle queries).
  */
class MultimodalSpec extends SparkSpec {

  test("withPngBlob -> decodeImageBatched recovers the id-derived dimensions from real PNG bytes") {
    import spark.implicits._
    // ids straddling the dimension formula's period (width = 8 + id % 16,
    // height = 8 + 3*id % 16): min/max width, min/max height, batch > 1
    val ids = Seq(0L, 1L, 5L, 15L, 16L, 21L, 100L, 1000L)
    val blobs = Multimodal.withPngBlob(ids.toDF("doc_id"), "doc_id")
    // the blob really is a PNG: magic bytes 89 50 4E 47
    val heads = blobs.select(col("doc_id"), substring(col("content"), 1, 4)
      .as("head")).collect()
    heads.foreach { r =>
      val h = r.getAs[Array[Byte]]("head")
      assert(h.toSeq === Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    }
    val got = Multimodal.decodeImageBatched(blobs, "doc_id", batchSize = 3)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2),
        r.getString(3)))).toMap
    ids.foreach { id =>
      assert(got(id) ===
        (((8 + id % 16).toInt, (8 + id * 3 % 16).toInt, "png")))
    }
  }

  test("withMixedImageBlob -> decodeImageBatched sniffs PNG and JPEG per row in one batch") {
    import spark.implicits._
    // even ids PNG, odd ids JPEG; batchSize > corpus so BOTH formats
    // land in the same batch and the per-format reader reuse is hit
    val ids = Seq(0L, 1L, 2L, 3L, 15L, 16L, 21L, 100L)
    val blobs = Multimodal.withMixedImageBlob(ids.toDF("doc_id"), "doc_id")
    val heads = blobs.select(col("doc_id"), substring(col("content"), 1, 4)
      .as("head")).collect()
    heads.foreach { r =>
      val h = r.getAs[Array[Byte]]("head")
      if (r.getLong(0) % 2 == 0)
        assert(h.toSeq === Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
      else
        assert((h(0) & 0xFF) === 0xFF && (h(1) & 0xFF) === 0xD8 &&
          (h(2) & 0xFF) === 0xFF)
    }
    val got = Multimodal.decodeImageBatched(blobs, "doc_id", batchSize = 100)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2),
        r.getString(3)))).toMap
    ids.foreach { id =>
      val fmt = if (id % 2 == 0) "png" else "jpeg"
      assert(got(id) ===
        (((8 + id % 16).toInt, (8 + id * 3 % 16).toInt, fmt)))
    }
  }

  test("decodeImageBatched fails loudly on undecodable bytes") {
    import spark.implicits._
    val junk = Seq((1L, "definitely not a png".getBytes("UTF-8")))
      .toDF("doc_id", "content")
    val e = intercept[Exception] {
      Multimodal.decodeImageBatched(junk, "doc_id").collect()
    }
    // the PNG reader throws on a bad signature rather than emitting a row
    assert(e != null)
  }

  test("quarantine decode isolates exactly the poisoned rows; strict decode dies on the same fixture") {
    import spark.implicits._
    val ids = (0L until 40L).toDF("doc_id")
    val poisoned = Multimodal.corruptBlobs(
      Multimodal.withMixedImageBlob(ids, "doc_id"), "doc_id", modulo = 7)
    // strict tier: ANY poisoned blob fails the task (curated-fixture
    // contract)
    intercept[Exception] {
      Multimodal.decodeImageBatched(poisoned, "doc_id").collect()
    }
    // quarantine tier: poisoned rows -> (corrupt, NULL dims); clean rows
    // decode exactly as the strict tier would, in the same batches
    val got = Multimodal.decodeImageQuarantine(poisoned, "doc_id",
        batchSize = 8)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1 else r.getInt(1),
          if (r.isNullAt(2)) -1 else r.getInt(2), r.getString(3)))
      .toMap
    assert(got.size === 40)
    (0L until 40L).foreach { id =>
      if (id % 7 == 0)
        assert(got(id) === ((-1, -1, "corrupt")))
      else
        assert(got(id) === (((8 + id % 16).toInt, (8 + id * 3 % 16).toInt,
          if (id % 2 == 0) "png" else "jpeg")))
    }
  }

  /** Plain-Scala dHash reference computed from the FIXTURE FORMULA —
    * no codec anywhere. Equality with `dHashBands` (which reads the
    * real PNG bytes) proves the decode returns every RGB value
    * exactly, the l91 oracle contract.
    */
  private def refDHash(id: Long, groupSize: Int = 4): Seq[Long] = {
    val group = id / groupSize
    val v = (id % groupSize).toInt
    val w = (16 + group % 8).toInt
    val h = (16 + (group * 3) % 8).toInt
    val seed = (group * 2654435761L) & 0xFFFFFFL
    val sums = Array.ofDim[Long](9, 8)
    val areas = Array.ofDim[Long](9, 8)
    for (y <- 0 until h; x <- 0 until w) {
      val t = (seed + x * 7349L + y * 131071L) * 2654435761L
      var p = (((t >> 8) ^ (t >> 24)) & 0xFFFFFFL).toInt
      if (x == v && y == 3 * v) p = p ^ 0xFFFFFF
      val (i, j) = ((9 * x + 8) / w, (8 * y + 7) / h)
      sums(i)(j) += ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
      areas(i)(j) += 1L
    }
    (0 until 8).map { j =>
      (0 until 8).foldLeft(0L) { (band, i) =>
        if (sums(i)(j) * areas(i + 1)(j) > sums(i + 1)(j) * areas(i)(j))
          band | (1L << i)
        else band
      }
    }
  }

  test("dHashBands of real decoded PNGs equals the formula reference pixel-for-pixel") {
    import spark.implicits._
    // ids straddling the group dimension period and all four variants
    val ids = (0L to 35L) ++ Seq(100L, 1001L, 4999L)
    val got = Multimodal.dHashBands(
        Multimodal.withNearDupPngBlob(ids.toDF("doc_id"), "doc_id"),
        "doc_id", batchSize = 7)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    ids.foreach(id => assert(got(id) === refDHash(id), s"id=$id"))
  }

  test("dHash variants: one inverted pixel moves Hamming by at most 2 per pixel; groups pair, strangers don't") {
    def ham(a: Seq[Long], b: Seq[Long]): Int =
      a.zip(b).map { case (x, y) =>
        java.lang.Long.bitCount(x ^ y) }.sum
    // within a group: each variant pair differs in exactly two pixels,
    // each affecting at most its block's two horizontal comparisons
    for (g <- 0L until 12L; va <- 0 until 4; vb <- va + 1 until 4) {
      val d = ham(refDHash(g * 4 + va), refDHash(g * 4 + vb))
      assert(d <= 4, s"group $g variants $va/$vb hamming $d")
    }
    // across groups: the multiply-fold mix keeps unrelated images far
    // apart (band-join candidates stay group-shaped, not corpus-shaped)
    val far = for (ga <- 0L until 8L; gb <- ga + 1 until 8L)
      yield ham(refDHash(ga * 4), refDHash(gb * 4))
    assert(far.count(_ <= 7) === 0, s"cross-group collisions: $far")
  }

  test("dHashBands rejects an image too small for the 9x8 grid") {
    import spark.implicits._
    val tiny = Seq(1L).toDF("doc_id").select(col("doc_id"),
      lit {
        val img = new java.awt.image.BufferedImage(
          4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        bos.toByteArray
      }.as("content"))
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.dHashBands(tiny, "doc_id").collect()
    }
    assert(e.getMessage.contains("too small") ||
      e.getCause.getMessage.contains("too small"))
  }

  test("withWavBlob -> decodeAudioBatched recovers rate, length and " +
      "peak from real RIFF/WAV bytes") {
    import spark.implicits._
    // ids straddling every formula period: rate (id % 4), length
    // (id % 60), amplitude ((id * 7) % 9000), half-period (id % 8)
    val ids = Seq(0L, 1L, 2L, 3L, 7L, 59L, 60L, 1287L, 9000L)
    val blobs = Multimodal.withWavBlob(ids.toDF("doc_id"), "doc_id")
    // the blob really is a RIFF/WAV file: magic bytes 'RIFF'
    blobs.select(substring(col("content"), 1, 4).as("head")).collect()
      .foreach { r =>
        assert(new String(r.getAs[Array[Byte]]("head"), "US-ASCII")
          === "RIFF")
      }
    val got = Multimodal.decodeAudioBatched(blobs, "doc_id",
        batchSize = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    ids.foreach { id =>
      assert(got(id) === (((8000 + (id % 4) * 4000).toInt,
        40 + id % 60, 1000 + (id * 7) % 9000, "wave")), s"id=$id")
    }
  }

  test("audio quarantine isolates exactly the poisoned rows; strict " +
      "decode dies on the same fixture") {
    import spark.implicits._
    val ids = (0L to 30L).toDF("doc_id")
    val poisoned = Multimodal.corruptBlobs(
      Multimodal.withWavBlob(ids, "doc_id"), "doc_id", modulo = 13)
    val got = Multimodal.decodeAudioQuarantine(poisoned, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    (0L to 30L).foreach { id =>
      assert(got(id) === (if (id % 13 == 0) "corrupt" else "wave"),
        s"id=$id")
    }
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeAudioBatched(poisoned, "doc_id").collect()
    }
  }

  test("audioFeaturesBatched recovers the square wave's exact " +
      "zero-crossing count; resampleWav at stride=1 is an identity " +
      "round-trip") {
    import spark.implicits._
    val ids = Seq(0L, 3L, 7L, 11L, 59L, 1287L)
    val blobs = Multimodal.withWavBlob(ids.toDF("doc_id"), "doc_id")
    val feats = Multimodal.audioFeaturesBatched(blobs, "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    ids.foreach { id =>
      val n = 40 + id % 60
      val half = 4 + id % 8
      assert(feats(id) === ((n, 1000 + (id * 7) % 9000, (n - 1) / half)),
        s"id=$id")
    }
    // stride=1: every sample kept, same rate — the decoded view of the
    // re-encoded blob must equal the decoded view of the original
    val orig = Multimodal.decodeAudioBatched(blobs, "doc_id")
      .collect().map(_.toString).sorted.toSeq
    val same = Multimodal.decodeAudioBatched(
        Multimodal.resampleWav(blobs, "doc_id", stride = 1), "doc_id")
      .collect().map(_.toString).sorted.toSeq
    assert(same === orig)
    // stride=2: half the samples at half the rate, peak preserved
    val deci = Multimodal.decodeAudioBatched(
        Multimodal.resampleWav(blobs, "doc_id", stride = 2), "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    ids.foreach { id =>
      val n = 40 + id % 60
      assert(deci(id) === (((8000 + (id % 4) * 4000).toInt / 2,
        (n + 1) / 2, 1000 + (id * 7) % 9000)), s"id=$id")
    }
  }

  test("withAviBlob -> decodeVideoBatched demuxes real MJPEG AVIs and " +
      "recovers the id-derived frame count and dims") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L, 3L, 15L, 16L, 21L, 100L)
    val blobs = Multimodal.withAviBlob(ids.toDF("doc_id"), "doc_id")
    blobs.select(substring(col("content"), 1, 4).as("head")).collect()
      .foreach { r =>
        assert(new String(r.getAs[Array[Byte]]("head"), "US-ASCII")
          === "RIFF")
      }
    val got = Multimodal.decodeVideoBatched(blobs, "doc_id",
        batchSize = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))))
      .toMap
    ids.foreach { id =>
      assert(got(id) === (((2 + id % 4).toInt, (8 + id % 16).toInt,
        (8 + id * 3 % 16).toInt, "mjpeg")), s"id=$id")
    }
  }

  test("video quarantine catches poisoned headers AND a container " +
      "whose dwTotalFrames lies about its payload") {
    import spark.implicits._
    val ids = (0L to 20L).toDF("doc_id")
    val poisoned = Multimodal.corruptBlobs(
      Multimodal.withAviBlob(ids, "doc_id"), "doc_id", modulo = 17)
    val got = Multimodal.decodeVideoQuarantine(poisoned, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    (0L to 20L).foreach { id =>
      assert(got(id) === (if (id % 17 == 0) "corrupt" else "mjpeg"),
        s"id=$id")
    }
    // metadata-lies case: overwrite the avih dwTotalFrames in-place
    // (offset 16 inside the avih body) — demux must refuse it
    val lying = Multimodal.withAviBlob(Seq(5L).toDF("doc_id"), "doc_id")
      .collect().head.getAs[Array[Byte]]("content").clone()
    val avihAt = {
      val s = new String(lying.map(b => (b & 0xFF).toChar))
      s.indexOf("avih")
    }
    assert(avihAt > 0, "avih chunk not found")
    lying(avihAt + 8 + 16) = 99.toByte // claim 99 frames
    val lyingDf = Seq(5L).toDF("doc_id").select(col("doc_id"),
      lit(lying).as("content"))
    val q = Multimodal.decodeVideoQuarantine(lyingDf, "doc_id")
      .collect().head
    assert(q.getString(4) === "corrupt",
      "a lying container must quarantine")
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeVideoBatched(lyingDf, "doc_id").collect()
    }
  }

  test("sampleVideoFramesBatched decodes every stride-th frame with " +
      "real dims; stride=1 yields all frames") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 3L, 7L) // n_frames 2, 3, 5, 5
    val blobs = Multimodal.withAviBlob(ids.toDF("doc_id"), "doc_id")
    val got = Multimodal.sampleVideoFramesBatched(blobs, "doc_id",
        stride = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .toSet
    val want = ids.flatMap { id =>
      (0 until (2 + id % 4).toInt by 2).map(i =>
        (id, i, (8 + id % 16).toInt, (8 + id * 3 % 16).toInt))
    }.toSet
    assert(got === want)
    val all = Multimodal.sampleVideoFramesBatched(blobs, "doc_id",
        stride = 1).collect()
    assert(all.length === ids.map(id => (2 + id % 4).toInt).sum)
  }

  test("property: ARBITRARY byte corruption never escapes quarantine " +
      "on any tier — a flipped blob decodes to 'corrupt' or (for " +
      "payload flips) to the clean structural metadata, never a " +
      "silently wrong dimension") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}

    def indexOf(b: Array[Byte], pat: Array[Byte]): Int =
      b.indices.find(i => i + pat.length <= b.length &&
        pat.indices.forall(j => b(i + j) == pat(i + j - i))).getOrElse(-1)
    def ascii(s: String) = s.getBytes("US-ASCII")

    // first byte offset that is pure PAYLOAD (structural headers all
    // strictly before it): flips there must leave the reported
    // structure byte-identical to the clean decode, or quarantine
    def payloadStart(kind: String, b: Array[Byte]): Int = kind match {
      case "image" =>
        if ((b(0) & 0xFF) == 0x89) 41 // PNG: sig 8 + IHDR chunk 25 + IDAT hdr 8
        else { // JPEG: everything after the SOS marker's 0xFFDA
          val i = b.indices.dropRight(1)
            .find(i => (b(i) & 0xFF) == 0xFF && (b(i + 1) & 0xFF) == 0xDA)
          i.get + 2
        }
      case "wav" => indexOf(b, ascii("data")) + 8
      case "avi" => indexOf(b, ascii("movi")) + 4
    }

    // structural metadata only: WAV peak_amp is payload-derived BY
    // DESIGN (a payload flip legitimately moves it), so it is not part
    // of the never-silently-wrong contract
    def decode(kind: String,
        blobs: Seq[(Long, Array[Byte])]): Map[Long, Seq[Any]] = {
      val df = blobs.toDF("doc_id", "content")
      val out = kind match {
        case "image" => Multimodal.decodeImageQuarantine(df, "doc_id")
          .select(col("doc_id"), col("width"), col("height"),
            col("format"))
        case "wav" => Multimodal.decodeAudioQuarantine(df, "doc_id")
          .select(col("doc_id"), col("sample_rate"), col("n_samples"),
            col("format"))
        case "avi" => Multimodal.decodeVideoQuarantine(df, "doc_id")
          .select(col("doc_id"), col("n_frames"), col("width"),
            col("height"), col("format"))
      }
      out.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    }

    val legal = Map(
      "image" -> Set("png", "jpeg", "corrupt"),
      "wav" -> Set("wave", "corrupt"),
      "avi" -> Set("mjpeg", "corrupt"))

    val cleanBlobs: Map[String, Map[Long, Array[Byte]]] =
      Map("image" -> Multimodal.withMixedImageBlob(
          (0L until 8L).toDF("doc_id"), "doc_id"),
        "wav" -> Multimodal.withWavBlob(
          (0L until 8L).toDF("doc_id"), "doc_id"),
        "avi" -> Multimodal.withAviBlob(
          (0L until 8L).toDF("doc_id"), "doc_id"))
        .map { case (k, df) => k -> df.collect()
          .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap }
    val cleanMeta = cleanBlobs.map { case (k, m) =>
      k -> decode(k, m.toSeq) }

    val flipGen = for {
      id <- Gen.choose(0L, 7L)
      frac <- Gen.choose(0.0, 1.0)
      x <- Gen.choose(1, 255) // xor != 0: the byte really changes
    } yield (id, frac, x)
    val caseGen = for {
      kind <- Gen.oneOf("image", "wav", "avi")
      flips <- Gen.listOfN(24, flipGen)
    } yield (kind, flips)

    val prop = Prop.forAll(caseGen) { case (kind, flips) =>
      // one decode job per iteration: all flipped variants in a batch,
      // doc_id = variant index riding on top of the source id
      val variants = flips.zipWithIndex.map { case ((id, frac, x), v) =>
        val base = cleanBlobs(kind)(id)
        val off = math.min((frac * base.length).toInt, base.length - 1)
        val b = base.clone()
        b(off) = (b(off) ^ x).toByte
        (v.toLong, id, off, b)
      }
      val got = decode(kind, variants.map(t => (t._1, t._4)))
      variants.forall { case (v, id, off, b) =>
        val m = got(v)
        val fmt = m.last.asInstanceOf[String]
        val inPayload = off >= payloadStart(kind, cleanBlobs(kind)(id))
        legal(kind).contains(fmt) &&
          (fmt == "corrupt" || !inPayload || m == cleanMeta(kind)(id))
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)

    // positive controls — both branches of the disjunction demonstrably
    // fire (a wrong payloadStart would make the strong clause vacuous):
    // magic-byte flips must QUARANTINE on every tier...
    Seq("image", "wav", "avi").foreach { kind =>
      val b = cleanBlobs(kind)(2L).clone()
      b(0) = (b(0) ^ 0x55).toByte
      val m = decode(kind, Seq((0L, b)))(0L)
      assert(m.last === "corrupt", s"$kind magic flip not quarantined: $m")
    }
    // ...and a PCM/IDAT payload flip must decode CLEAN-EQUAL (the WAV
    // payload carries no structure; the PNG tier reads header-only)
    Seq("wav", "image").foreach { kind =>
      val base = cleanBlobs(kind)(2L) // id 2: PNG on the image tier
      val off = payloadStart(kind, base) + 2
      assert(off < base.length, s"$kind payload offset out of range")
      val b = base.clone()
      b(off) = (b(off) ^ 0x55).toByte
      val m = decode(kind, Seq((0L, b)))(0L)
      assert(m === cleanMeta(kind)(2L),
        s"$kind payload flip moved structural metadata: $m")
    }
  }
}
