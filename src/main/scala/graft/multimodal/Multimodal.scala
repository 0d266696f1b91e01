package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus batched decode / feature-extract /
  * frame-sample operators.
  *
  * Two codec tiers. For image bytes the decode is REAL: `withPngBlob` /
  * `withMixedImageBlob` encode genuine PNGs and JPEGs (deterministic,
  * id-derived dimensions) and `decodeImageBatched` reads them back
  * header-only through javax.imageio — public JDK API, zero external
  * deps — inside the same batched shape, picking the reader per row by
  * magic-byte sniff. For audio the decode is REAL too: `withWavBlob`
  * writes genuine RIFF/WAV PCM through javax.sound.sampled and
  * `decodeAudioBatched` parses the header and scans the PCM payload
  * back (in-JDK codec, zero external deps). Video is REAL as of the
  * MJPEG tier: the container ships no video codec, but MJPEG needs
  * none beyond JPEG — `withAviBlob` writes spec-shaped RIFF/AVI files
  * around genuine JPEG frames and `decodeVideoBatched` /
  * `sampleVideoFramesBatched` demux them back with a generic RIFF
  * walker and decode every (sampled) frame through javax.imageio.
  * Only the legacy `fakeDecode` column tier (l12-l14/l18/l43 —
  * deliberately kept as the SQL-mirrorable plumbing baseline) remains
  * synthetic; what is real and tested everywhere is everything Spark
  * cares about: the schema, the binary column handling, the batched
  * `mapPartitions` shape (the Scala analogue of `mapInPandas`: decode
  * wants amortized per-batch setup, not per-row), and the partitioning
  * story (decode is narrow — no shuffle; frame sampling is a generator,
  * also narrow).
  */
object Multimodal {

  /** Metadata struct every decoded media row carries. */
  val metaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Attach a binary `content` column. Fixtures have no real media, so
    * document text bytes stand in for the blob.
    */
  def withBlob(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("content", col(textCol).cast("binary"))

  /** FAKE deterministic "header decode" — a stand-in for an image/audio
    * codec, derived purely from the byte length so the column-expression
    * path and the batched path agree bit-for-bit and are oracle-checkable.
    */
  def fakeDecode(bytes: Array[Byte]): (Long, Int, Int, Int, String) = {
    val n = bytes.length.toLong
    val fmt = (n % 3) match {
      case 0 => "img"
      case 1 => "audio"
      case _ => "video"
    }
    (n, (16 + n % 64).toInt, (16 + (n * 7) % 64).toInt, (1 + n % 8).toInt, fmt)
  }

  /** Column-expression decode (codegen'd; used by the oracle-checked
    * query — arithmetic identical to `fakeDecode`).
    */
  def decodeMetaCols(df: DataFrame): DataFrame = {
    val n = octet_length(col("content")).cast("long")
    df.withColumn("meta", struct(
      n.as("n_bytes"),
      (lit(16) + n % 64).cast("int").as("width"),
      (lit(16) + (n * 7) % 64).cast("int").as("height"),
      (lit(1) + n % 8).cast("int").as("n_frames"),
      when(n % 3 === 0, "img").when(n % 3 === 1, "audio").otherwise("video")
        .as("format")))
  }

  /** Batched decode via mapPartitions — the real plumbing a native codec
    * would use: rows flow in partition-sized iterators, are decoded in
    * `batchSize` groups (amortizing codec init / model load), and come
    * back as (id, meta) rows. Narrow transformation: no shuffle.
    */
  def decodeMetaBatched(df: DataFrame, idCol: String,
      batchSize: Int = 256): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("meta", metaSchema)))
    val idIdx = df.schema.fieldIndex(idCol)
    val contentIdx = df.schema.fieldIndex("content")
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch codec setup would happen here
        batch.iterator.map { r =>
          val (n, w, h, f, fmt) =
            fakeDecode(r.getAs[Array[Byte]](contentIdx))
          Row(r.getLong(idIdx), Row(n, w, h, f, fmt))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Deterministic REAL-image fixture: encode an actual PNG per row
    * (java.awt.BufferedImage -> javax.imageio, both public JDK API — no
    * external codec needed) with dimensions derived from the id:
    * width = 8 + id % 16, height = 8 + (id * 3) % 16, pixels seeded from
    * the id. The dimension formulas are the oracle contract —
    * `decodeImageBatched` must recover them from the real byte stream.
    * Narrow mapPartitions, no shuffle; the blob column is genuine PNG
    * bytes, not a stand-in.
    */
  def withPngBlob(df: DataFrame, idCol: String): DataFrame =
    encodeImageBlobs(df, idCol, _ => "png")

  /** Mixed-format variant of `withPngBlob` — the shape of a real web
    * corpus, which is mostly JPEG with a PNG minority: even ids encode
    * as PNG, odd ids as JPEG (both via javax.imageio; JPEG is lossy in
    * PIXELS but exact in DIMENSIONS, which is what the decode oracle
    * checks). Same id-derived dimension formulas as `withPngBlob`.
    */
  def withMixedImageBlob(df: DataFrame, idCol: String): DataFrame =
    encodeImageBlobs(df, idCol, id => if (id % 2 == 0) "png" else "jpg")

  private def encodeImageBlobs(df: DataFrame, idCol: String,
      fmtOf: Long => String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("content", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val w = (8 + id % 16).toInt
        val h = (8 + (id * 3) % 16).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val seed = (id * 2654435761L).toInt
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, (seed ^ (x * 31 + y * 131)) & 0xFFFFFF)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, fmtOf(id), bos)
        Row(id, bos.toByteArray)
      }
    }(Encoders.row(outSchema))
  }

  /** Poisoned-row FIXTURE: deterministically corrupt the blob of every
    * id % modulo == 0 row by zeroing its first 8 bytes (killing both
    * the PNG and JPEG signatures) — the test surface for the
    * quarantine decode tier. Rare poison, not bulk: at modulo=11 one
    * row in eleven, the realistic web-corpus shape.
    */
  def corruptBlobs(df: DataFrame, idCol: String, modulo: Int): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val contentIdx = df.schema.fieldIndex("content")
    df.mapPartitions { rows =>
      rows.map { r =>
        if (r.getLong(idIdx) % modulo == 0) {
          val b = r.getAs[Array[Byte]](contentIdx).clone()
          java.util.Arrays.fill(b, 0, math.min(8, b.length), 0.toByte)
          Row.fromSeq(r.toSeq.updated(contentIdx, b))
        } else r
      }
    }(Encoders.row(df.schema))
  }

  /** REAL batched image decode — the same mapPartitions shape as
    * `decodeMetaBatched`, but the codec is javax.imageio reading actual
    * PNG/JPEG bytes: the reader is chosen per row by CONTENT SNIFF
    * (magic bytes, with ImageIO's SPI probe as the fallback for other
    * signatures) and instantiated once PER FORMAT PER BATCH (the
    * amortized-setup contract a native codec or model needs); the
    * `format` column is what the matched reader reports, and
    * width/height come from the decoded header, not from arithmetic. A
    * row whose bytes no installed reader understands FAILS the task
    * (corrupt media should never silently pass a curation pipeline).
    * Narrow, no shuffle.
    */
  def decodeImageBatched(df: DataFrame, idCol: String,
      batchSize: Int = 256): DataFrame =
    decodeImageCore(df, idCol, batchSize, quarantine = false)

  /** `decodeImageBatched` under the PRODUCTION ingest contract (the
    * l74 count-and-quarantine discipline): a row whose bytes no reader
    * understands — or that throws mid-decode — emits
    * (format='corrupt', NULL dims) instead of failing the task. Rare
    * poison must never kill a 100 TB ingest; it must be counted,
    * quarantined, and routed to ops. The strict variant stays the
    * default for curated fixtures where ANY undecodable blob is a
    * pipeline bug.
    */
  def decodeImageQuarantine(df: DataFrame, idCol: String,
      batchSize: Int = 256): DataFrame =
    decodeImageCore(df, idCol, batchSize, quarantine = true)

  private def decodeImageCore(df: DataFrame, idCol: String,
      batchSize: Int, quarantine: Boolean): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("width", IntegerType, nullable = quarantine),
      StructField("height", IntegerType, nullable = quarantine),
      StructField("format", StringType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val contentIdx = df.schema.fieldIndex("content")
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch codec setup: one reader PER FORMAT, chosen by
        // CONTENT SNIFF (magic bytes — the stream decides, not caller
        // config) and reused across the batch where formats repeat.
        // Bytes with neither signature fall back to ImageIO's own SPI
        // probe; no reader at all -> loud failure (corrupt media must
        // never silently pass a curation pipeline).
        val readers =
          scala.collection.mutable.Map.empty[String, javax.imageio.ImageReader]
        def sniffed(bytes: Array[Byte]): Option[String] =
          if (bytes.length >= 8 && (bytes(0) & 0xFF) == 0x89 &&
            bytes(1) == 'P'.toByte && bytes(2) == 'N'.toByte &&
            bytes(3) == 'G'.toByte) Some("png")
          else if (bytes.length >= 3 && (bytes(0) & 0xFF) == 0xFF &&
            (bytes(1) & 0xFF) == 0xD8 && (bytes(2) & 0xFF) == 0xFF)
            Some("jpeg")
          else None
        val out = batch.map { r =>
          val bytes = r.getAs[Array[Byte]](contentIdx)
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          // the CACHE key the reader sits under (sniff token or
          // SPI-derived name) — remembered at insertion, because
          // re-deriving it from reader.getFormatName in the catch could
          // name a different string than the sniff token for plugins
          // whose first format name differs, leaving the poisoned
          // reader cached
          var cacheKey: Option[String] = None
          try {
            val reader = sniffed(bytes) match {
              case Some(fmt) =>
                cacheKey = Some(fmt)
                readers.getOrElseUpdate(fmt,
                  javax.imageio.ImageIO.getImageReadersByFormatName(fmt)
                    .next())
              case None =>
                val it = javax.imageio.ImageIO.getImageReaders(iis)
                if (!it.hasNext) throw new IllegalArgumentException(
                  s"no installed ImageReader understands the ${bytes.length}" +
                    "-byte stream (unknown signature)")
                val rd = it.next()
                val k = rd.getFormatName.toLowerCase
                cacheKey = Some(k)
                readers.getOrElseUpdate(k, rd)
            }
            reader.setInput(iis)
            // header-only reads: no pixel materialization for metadata
            Row(r.getLong(idIdx), reader.getWidth(0), reader.getHeight(0),
              reader.getFormatName.toLowerCase)
          } catch {
            case scala.util.control.NonFatal(e) if quarantine =>
              // a reader that threw mid-decode may hold poisoned state:
              // drop it from the per-batch cache (by the key it was
              // inserted under) so the next row gets a fresh instance
              cacheKey.foreach(k => readers.remove(k).foreach(_.dispose()))
              Row(r.getLong(idIdx), null, null, "corrupt")
          } finally iis.close()
        }
        readers.values.foreach(_.dispose())
        out.iterator
      }
    }(Encoders.row(outSchema))
  }

  /** Deterministic REAL-audio fixture — the WAV analogue of
    * `withPngBlob` (the audio tier leaves the documented-synthetic
    * `fakeDecode` rung: WAV/PCM is decodable with the in-JDK
    * javax.sound.sampled codec, zero external deps): encode a genuine
    * RIFF/WAV file per row through AudioSystem.write — 16-bit signed
    * little-endian mono PCM, id-derived parameters that ARE the oracle
    * contract:
    *   sample_rate = 8000 + (id % 4) * 4000
    *   n_samples   = 40 + id % 60
    *   peak_amp    = 1000 + (id * 7) % 9000
    * The samples are a square wave of amplitude peak_amp with
    * half-period 4 + id % 8 (sample 0 is +peak, so the peak is always
    * reached and exactly representable in 16 bits) — `decodeAudio*`
    * must recover rate and count from the real header and the peak
    * from the real PCM payload, so the oracle's arithmetic only
    * matches if the codec round-trip is byte-exact. Narrow
    * mapPartitions, no shuffle; the blob is a genuine WAV file, not a
    * stand-in.
    */
  def withWavBlob(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("content", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val rate = (8000 + (id % 4) * 4000).toInt
        val n = (40 + id % 60).toInt
        val amp = (1000 + (id * 7) % 9000).toInt
        val half = (4 + id % 8).toInt
        val data = new Array[Byte](n * 2)
        var k = 0
        while (k < n) {
          val s = if ((k / half) % 2 == 0) amp else -amp
          data(2 * k) = (s & 0xFF).toByte
          data(2 * k + 1) = ((s >> 8) & 0xFF).toByte
          k += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          rate.toFloat, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(data), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Row(id, bos.toByteArray)
      }
    }(Encoders.row(outSchema))
  }

  /** REAL batched audio decode — the l66/l71 contract extended to the
    * WAV codec: javax.sound.sampled.AudioSystem parses the actual RIFF
    * header (sample rate, frame count) and the 16-bit PCM payload is
    * scanned for the peak amplitude — metadata AND content come from
    * the genuine byte stream, never from arithmetic. Same batched
    * mapPartitions shape as the image tier (per-batch setup
    * amortization; a streaming consumer uses it unchanged — stateless
    * narrow transform). A non-WAV/undecodable blob FAILS the task.
    */
  def decodeAudioBatched(df: DataFrame, idCol: String,
      batchSize: Int = 256): DataFrame =
    decodeAudioCore(df, idCol, batchSize, quarantine = false)

  /** `decodeAudioBatched` under the PRODUCTION ingest contract (l85's
    * count-and-quarantine discipline): a blob the codec rejects — or
    * that throws mid-decode — emits (format='corrupt', NULL meta)
    * instead of killing the task.
    */
  def decodeAudioQuarantine(df: DataFrame, idCol: String,
      batchSize: Int = 256): DataFrame =
    decodeAudioCore(df, idCol, batchSize, quarantine = true)

  private def decodeAudioCore(df: DataFrame, idCol: String,
      batchSize: Int, quarantine: Boolean): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("sample_rate", IntegerType, nullable = quarantine),
      StructField("n_samples", LongType, nullable = quarantine),
      StructField("peak_amp", LongType, nullable = quarantine),
      StructField("format", StringType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val contentIdx = df.schema.fieldIndex("content")
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch codec setup would cache decoder instances here;
        // AudioSystem's WAV reader is stateless static API, so the
        // batch loop is the amortization surface alone
        batch.iterator.map { r =>
          val bytes = r.getAs[Array[Byte]](contentIdx)
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            try {
              val f = ais.getFormat
              require(f.getSampleSizeInBits == 16 && f.getChannels == 1
                  && !f.isBigEndian,
                s"unsupported PCM layout: ${f}")
              val n = ais.getFrameLength
              val buf = ais.readAllBytes()
              // the video tier's dwTotalFrames discipline: a container
              // whose header lies about the payload (truncated data
              // chunk, inflated frame count) must fail/quarantine, not
              // pass with header-derived n and a short peak scan
              require(buf.length == n * f.getFrameSize,
                s"header claims $n frames (${n * f.getFrameSize} bytes)" +
                  s", payload has ${buf.length}")
              var peak = 0L
              var k = 0
              while (k + 1 < buf.length) {
                val s = ((buf(k + 1).toInt << 8) | (buf(k) & 0xFF)).toLong
                val a = math.abs(s)
                if (a > peak) peak = a
                k += 2
              }
              Row(r.getLong(idIdx), f.getSampleRate.toInt, n, peak, "wave")
            } finally ais.close()
          } catch {
            case scala.util.control.NonFatal(e) if quarantine =>
              Row(r.getLong(idIdx), null, null, null, "corrupt")
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL audio feature extraction — the feature-extract rung of the
    * audio tier (the brief's decode / feature-extract / resize chain,
    * on genuinely decoded bytes): per blob the frame count, the peak
    * amplitude AND the zero-crossing count (the standard integer audio
    * descriptor — speech/music/noise discrimination uses ZCR before
    * any spectral feature), all scanned from the decoded 16-bit PCM
    * payload. Integer-exact, so the oracle can replay the synthesis
    * formulas: for `withWavBlob`'s square wave the crossings are
    * exactly floor((n-1)/half) — the hash only matches if every
    * decoded sample's SIGN is byte-correct, a strictly stronger
    * payload check than the peak alone. Same batched mapPartitions
    * shape; a non-WAV blob fails the task (quarantine is the decode
    * tier's job, upstream).
    */
  def audioFeaturesBatched(df: DataFrame, idCol: String,
      batchSize: Int = 256): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_samples", LongType, nullable = false),
      StructField("peak_amp", LongType, nullable = false),
      StructField("zero_crossings", LongType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val contentIdx = df.schema.fieldIndex("content")
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val bytes = r.getAs[Array[Byte]](contentIdx)
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val f = ais.getFormat
            require(f.getSampleSizeInBits == 16 && f.getChannels == 1
                && !f.isBigEndian,
              s"unsupported PCM layout: ${f}")
            val n = ais.getFrameLength
            val buf = ais.readAllBytes()
            require(buf.length == n * f.getFrameSize,
              s"header claims $n frames (${n * f.getFrameSize} bytes)" +
                s", payload has ${buf.length}")
            var peak = 0L
            var zc = 0L
            var prevNeg = false
            var first = true
            var k = 0
            while (k + 1 < buf.length) {
              val s = (buf(k + 1).toInt << 8) | (buf(k) & 0xFF)
              val a = math.abs(s.toLong)
              if (a > peak) peak = a
              val neg = s < 0
              if (!first && neg != prevNeg) zc += 1L
              prevNeg = neg
              first = false
              k += 2
            }
            Row(r.getLong(idIdx), n, peak, zc)
          } finally ais.close()
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL audio resample (decimation) — the resize rung of the audio
    * tier, and unlike the image tier's metadata-only `resizeMeta` this
    * one transforms the actual BLOB: decode the WAV, keep every
    * `stride`-th sample, re-encode a genuine WAV at rate/stride
    * through the same in-JDK codec (duration preserved, bandwidth
    * traded — the standard cheap downsample a 100 TB audio pipeline
    * runs before feature extraction; a production resampler would
    * low-pass first, which changes no Spark-side plumbing). Output is
    * a (doc_id, content) frame of REAL re-encoded bytes, so a
    * downstream decode pass verifies the whole
    * decode→transform→encode round-trip. Batched shape, narrow.
    */
  def resampleWav(df: DataFrame, idCol: String, stride: Int = 2,
      batchSize: Int = 256): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("content", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val contentIdx = df.schema.fieldIndex("content")
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val bytes = r.getAs[Array[Byte]](contentIdx)
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val f = ais.getFormat
            require(f.getSampleSizeInBits == 16 && f.getChannels == 1
                && !f.isBigEndian,
              s"unsupported PCM layout: ${f}")
            val buf = ais.readAllBytes()
            val n = buf.length / 2
            val nOut = (n + stride - 1) / stride
            val data = new Array[Byte](nOut * 2)
            var j = 0
            while (j < nOut) {
              data(2 * j) = buf(2 * j * stride)
              data(2 * j + 1) = buf(2 * j * stride + 1)
              j += 1
            }
            val outRate = f.getSampleRate / stride
            val of = new javax.sound.sampled.AudioFormat(
              outRate, 16, 1, true, false)
            val oais = new javax.sound.sampled.AudioInputStream(
              new java.io.ByteArrayInputStream(data), of, nOut.toLong)
            val bos = new java.io.ByteArrayOutputStream()
            javax.sound.sampled.AudioSystem.write(oais,
              javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
            Row(r.getLong(idIdx), bos.toByteArray)
          } finally ais.close()
        }
      }
    }(Encoders.row(outSchema))
  }

  // --------------------------------------------------------------------
  // REAL video tier: MJPEG-in-AVI. The container has no video CODEC,
  // but MJPEG needs none beyond the JPEG codec javax.imageio already
  // provides — so the video rung is a hand-rolled (public-spec) RIFF/
  // AVI container around genuine JPEG frames: `withAviBlob` writes a
  // spec-shaped minimal AVI (RIFF 'AVI ' { LIST hdrl { avih, LIST strl
  // { strh 'vids'/'MJPG', strf BITMAPINFOHEADER } }, LIST movi { 00dc
  // chunks } }), and `decodeVideoBatched` DEMUXES it back with a
  // generic RIFF chunk walker (no assumption about the writer's byte
  // offsets) and decodes every frame through the REAL JPEG codec —
  // upgrading video from the documented-synthetic fakeDecode tier to
  // real demux + real frame decode, still zero external deps.
  // --------------------------------------------------------------------

  private def fourCC(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad = if (body.length % 2 == 1) Array(0.toByte)
    else Array.emptyByteArray
    fourCC(id) ++ le32(body.length) ++ body ++ pad
  }

  private def list(kind: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", fourCC(kind) ++ body)

  /** One genuine JPEG frame, dims + pixel seed derived from (id, idx). */
  private def jpegFrame(id: Long, idx: Int, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val seed = ((id * 31L + idx) * 2654435761L).toInt
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (seed ^ (x * 31 + y * 131)) & 0xFFFFFF)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Deterministic REAL-video fixture: a minimal spec-shaped MJPEG AVI
    * per row — n_frames = 2 + id % 4 genuine JPEG frames at the l66
    * dimension formulas (w = 8 + id % 16, h = 8 + (id * 3) % 16; all
    * frames of a video share dims, per-frame pixels vary), 10 fps
    * header metadata, dwTotalFrames filled truthfully (the demuxer
    * cross-checks it against the actual chunk count). Narrow
    * mapPartitions; the blob is a genuine RIFF/AVI byte stream.
    */
  def withAviBlob(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("content", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val n = (2 + id % 4).toInt
        val w = (8 + id % 16).toInt
        val h = (8 + (id * 3) % 16).toInt
        Row(id, buildAvi((0 until n).map(i => jpegFrame(id, i, w, h)),
          w, h))
      }
    }(Encoders.row(outSchema))
  }

  /** Assemble a spec-shaped minimal MJPEG AVI around the given JPEG
    * frame payloads (truthful avih/strh/strf metadata) — shared by the
    * fixture writer and the frame-transforming operators (resize).
    */
  private def buildAvi(frames: Seq[Array[Byte]], w: Int,
      h: Int): Array[Byte] = {
    val n = frames.size
    val maxBytes = frames.map(_.length).max
    // avih: 14 DWORDs (56 bytes)
    val avih = chunk("avih",
      le32(100000) ++ le32(maxBytes * 10) ++ le32(0) ++ le32(0) ++
        le32(n) ++ le32(0) ++ le32(1) ++ le32(maxBytes) ++
        le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(0))
    // strh: 'vids'/'MJPG', scale 1 rate 10, dwLength n (56 bytes)
    val strh = chunk("strh",
      fourCC("vids") ++ fourCC("MJPG") ++ le32(0) ++ le32(0) ++
        le32(0) ++ le32(1) ++ le32(10) ++ le32(0) ++ le32(n) ++
        le32(maxBytes) ++ le32(0) ++ le32(0) ++
        // rcFrame: four 16-bit shorts (left, top, right, bottom)
        le32(0) ++ le32((h << 16) | w))
    // strf: BITMAPINFOHEADER (40 bytes), biCompression = 'MJPG'
    val strf = chunk("strf",
      le32(40) ++ le32(w) ++ le32(h) ++
        Array(1.toByte, 0.toByte, 24.toByte, 0.toByte) ++
        fourCC("MJPG") ++ le32(w * h * 3) ++ le32(0) ++ le32(0) ++
        le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi",
      frames.map(f => chunk("00dc", f)).reduce(_ ++ _))
    val body = fourCC("AVI ") ++ hdrl ++ movi
    fourCC("RIFF") ++ le32(body.length) ++ body
  }

  private def rdLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private def cc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Generic RIFF walk: demux an MJPEG AVI into (dwTotalFrames, frame
    * payload list). Walks chunks by declared sizes — no assumption
    * about the writer's layout beyond the public RIFF/AVI structure.
    */
  private def demuxAvi(bytes: Array[Byte])
      : (Int, Seq[Array[Byte]]) = {
    require(bytes.length >= 12 && cc(bytes, 0) == "RIFF" &&
      cc(bytes, 8) == "AVI ",
      s"not a RIFF/AVI stream (${bytes.length} bytes)")
    var totalFrames = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def walk(from: Int, to: Int): Unit = {
      var off = from
      while (off + 8 <= to) {
        val id = cc(bytes, off)
        val sz = rdLe32(bytes, off + 4)
        require(sz >= 0 && off + 8 + sz <= to,
          s"corrupt chunk '$id' size $sz at $off")
        if (id == "LIST") {
          val kind = cc(bytes, off + 8)
          if (kind == "hdrl" || kind == "strl" || kind == "movi")
            walk(off + 12, off + 8 + sz)
        } else if (id == "avih") {
          totalFrames = rdLe32(bytes, off + 8 + 16)
        } else if (id.endsWith("dc") || id.endsWith("db")) {
          frames += java.util.Arrays.copyOfRange(bytes, off + 8,
            off + 8 + sz)
        }
        off += 8 + sz + (sz % 2) // chunks are word-aligned
      }
    }
    walk(12, bytes.length)
    (totalFrames, frames.toSeq)
  }

  /** REAL batched video decode — generic RIFF/AVI demux + every frame
    * through the real JPEG codec: per video (n_frames, width, height,
    * format='mjpeg'), with the container's dwTotalFrames CROSS-CHECKED
    * against the demuxed chunk count and all frames checked for
    * uniform dimensions (a container whose metadata lies about its
    * payload must fail a curation pipeline, not pass silently). Same
    * batched shape as the image tier; `quarantine` mode emits
    * (format='corrupt', NULL meta) for undecodable rows instead.
    */
  def decodeVideoBatched(df: DataFrame, idCol: String,
      batchSize: Int = 256): DataFrame =
    decodeVideoCore(df, idCol, batchSize, quarantine = false)

  def decodeVideoQuarantine(df: DataFrame, idCol: String,
      batchSize: Int = 256): DataFrame =
    decodeVideoCore(df, idCol, batchSize, quarantine = true)

  private def decodeVideoCore(df: DataFrame, idCol: String,
      batchSize: Int, quarantine: Boolean): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_frames", IntegerType, nullable = quarantine),
      StructField("width", IntegerType, nullable = quarantine),
      StructField("height", IntegerType, nullable = quarantine),
      StructField("format", StringType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val contentIdx = df.schema.fieldIndex("content")
    df.mapPartitions { rows =>
      // grouped() here (and in the other video paths) is batch-shape
      // parity with the image/audio tiers only: the RIFF walker and
      // ImageIO.read are static calls with no per-format reader cache
      // to amortize, so the batch boundary carries no setup cost
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val bytes = r.getAs[Array[Byte]](contentIdx)
          try {
            val (meta, frames) = demuxAvi(bytes)
            require(frames.nonEmpty, "AVI with no frame chunks")
            require(meta == frames.size,
              s"container claims $meta frames, demuxed ${frames.size}")
            // uniformity as a running fold: per-frame metadata never
            // materializes per video, only the (w, h) of frame 0
            var w0 = -1
            var h0 = -1
            frames.foreach { f =>
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(f))
              require(img != null, "undecodable JPEG frame")
              if (w0 < 0) { w0 = img.getWidth; h0 = img.getHeight }
              else require(img.getWidth == w0 && img.getHeight == h0,
                s"non-uniform frame dims: ($w0, $h0) vs " +
                  s"(${img.getWidth}, ${img.getHeight})")
            }
            Row(r.getLong(idIdx), frames.size, w0, h0, "mjpeg")
          } catch {
            case scala.util.control.NonFatal(e) if quarantine =>
              Row(r.getLong(idIdx), null, null, null, "corrupt")
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL frame sampling — the sampleFrames generator upgraded to the
    * real tier: demux, keep every `stride`-th frame, decode each KEPT
    * frame through the real JPEG codec, one output row per sampled
    * frame with its actual decoded dimensions. Narrow; skipped frames
    * are never decoded (the whole point of sampling at 100 TB).
    */
  def sampleVideoFramesBatched(df: DataFrame, idCol: String,
      stride: Int = 2, batchSize: Int = 256): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val contentIdx = df.schema.fieldIndex("content")
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.flatMap { r =>
          val (_, frames) = demuxAvi(r.getAs[Array[Byte]](contentIdx))
          frames.indices.collect {
            case i if i % stride == 0 =>
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(frames(i)))
              require(img != null, s"undecodable JPEG frame $i")
              Row(r.getLong(idIdx), i, img.getWidth, img.getHeight)
          }
        }.iterator
      }
    }(Encoders.row(outSchema))
  }

  /** REAL video resize — the resize rung of the video tier,
    * transforming the actual blob (the l118 audio-resample discipline:
    * decode → transform → re-encode, verifiable by a second decode):
    * demux the AVI, decode every JPEG frame, scale it to
    * (w*num/den, h*num/den) through a real AWT raster draw, re-encode
    * each frame as a genuine JPEG, and rebuild a spec-shaped AVI with
    * truthful metadata. Batched shape, narrow; output dims floor like
    * integer arithmetic, minimum 1.
    */
  def resizeVideo(df: DataFrame, idCol: String, num: Int, den: Int,
      batchSize: Int = 256): DataFrame = {
    require(num >= 1 && den >= 1, s"need num, den >= 1, got ($num, $den)")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("content", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val contentIdx = df.schema.fieldIndex("content")
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val (_, frames) = demuxAvi(r.getAs[Array[Byte]](contentIdx))
          require(frames.nonEmpty, "AVI with no frame chunks")
          // gate input uniformity here too (not just in the decode
          // tier): remuxing a non-uniform input would emit a container
          // whose header lies about every other frame, surfacing only
          // at the NEXT decode pass
          var (iw, ih) = (-1, -1)
          var (ow, oh) = (0, 0)
          val resized = frames.map { f =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(f))
            require(img != null, "undecodable JPEG frame")
            if (iw < 0) { iw = img.getWidth; ih = img.getHeight }
            else require(img.getWidth == iw && img.getHeight == ih,
              s"non-uniform input frame dims: ($iw, $ih) vs " +
                s"(${img.getWidth}, ${img.getHeight})")
            val nw = math.max(1, img.getWidth * num / den)
            val nh = math.max(1, img.getHeight * num / den)
            ow = nw; oh = nh
            val out = new java.awt.image.BufferedImage(
              nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try g.drawImage(img, 0, 0, nw, nh, null)
            finally g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "jpg", bos)
            bos.toByteArray
          }
          Row(r.getLong(idIdx), buildAvi(resized, ow, oh))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Frame sampling: one output row per sampled frame index (every
    * `stride`-th frame) — a generator (posexplode), narrow, no shuffle.
    */
  def sampleFrames(decoded: DataFrame, stride: Int = 2): DataFrame =
    decoded.select(col("doc_id"), col("meta.n_frames").as("n_frames"),
        posexplode(sequence(lit(0), col("meta.n_frames") - 1)))
      .where(col("pos") % stride === 0)
      .select(col("doc_id"), col("col").as("frame_idx"))

  /** "Resize": a metadata transform scaling width/height by num/den
    * (integer arithmetic, floor) — the real codec call would transform
    * the blob too; the Spark-side shape (narrow column op over the meta
    * struct) is identical.
    */
  def resizeMeta(decoded: DataFrame, num: Int, den: Int): DataFrame =
    decoded.withColumn("meta", struct(
      col("meta.n_bytes").as("n_bytes"),
      (col("meta.width") * num / den).cast("int").as("width"),
      (col("meta.height") * num / den).cast("int").as("height"),
      col("meta.n_frames").as("n_frames"),
      col("meta.format").as("format")))

  /** Batched feature extraction: blob -> small float vector via
    * mapPartitions (the model-inference plumbing shape: per-batch setup,
    * rows in fixed-size groups, vector column out). The FAKE featurizer
    * derives 4 floats from the decoded metadata and L2-normalizes —
    * deterministic and oracle-mirrorable; a real image/audio model drops
    * into the same loop.
    */
  def extractFeaturesBatched(df: DataFrame, idCol: String,
      batchSize: Int = 256): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("feature", ArrayType(FloatType, containsNull = false))))
    val idIdx = df.schema.fieldIndex(idCol)
    val contentIdx = df.schema.fieldIndex("content")
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch model/codec setup would happen here
        batch.iterator.map { r =>
          val (n, w, h, f, _) = fakeDecode(r.getAs[Array[Byte]](contentIdx))
          val raw = Array(n.toDouble, w.toDouble, h.toDouble, f.toDouble)
          var norm2 = 0.0
          raw.foreach(x => norm2 += x * x)
          val inv = 1.0 / math.sqrt(norm2)
          Row(r.getLong(idIdx), raw.map(x => (x * inv).toFloat).toSeq)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Near-dup PNG FIXTURE: four variants per group (`group = id /
    * groupSize`) share one group-seeded pixel pattern and the GROUP's
    * dimensions (w = 16 + group%8, h = 16 + (group*3)%8); each variant
    * v = id%groupSize inverts the single pixel (v, 3v). Byte-exact
    * dedup sees four distinct blobs; a perceptual hash must see one
    * image. The pixel mix is a MULTIPLY-then-fold (not a plain
    * seed-XOR of a positional gradient, whose block-brightness
    * structure is shared across every seed and made unrelated groups
    * collide perceptually): distinct groups hash to independent
    * 64-bit dHashes, so cross-group Hamming matches are ~2^-34 per
    * pair. PNG only — the perceptual oracle replays PIXELS, and only
    * the lossless codec carries them exactly.
    */
  def withNearDupPngBlob(df: DataFrame, idCol: String,
      groupSize: Int = 4): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("content", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val group = id / groupSize
        val v = (id % groupSize).toInt
        val w = (16 + group % 8).toInt
        val h = (16 + (group * 3) % 8).toInt
        val seed = (group * 2654435761L) & 0xFFFFFFL
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            // nonneg 64-bit throughout (< 2^57), so >> and % replay
            // verbatim as DuckDB BIGINT arithmetic
            val t = (seed + x * 7349L + y * 131071L) * 2654435761L
            var p = (((t >> 8) ^ (t >> 24)) & 0xFFFFFFL).toInt
            if (x == v && y == 3 * v) p = p ^ 0xFFFFFF
            img.setRGB(x, y, p)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row(id, bos.toByteArray)
      }
    }(Encoders.row(outSchema))
  }

  /** Difference-hash (dHash) of REAL decoded pixels, as 8 row-byte
    * BANDS — the perceptual-dedup analogue of the MinHash band trick:
    * gray-sum the image, block-average it onto a 9-column x 8-row
    * grid, and bit (i,j) says "block (i,j) is brighter than its right
    * neighbor"; band j packs row j's 8 bits. Every step is INTEGER
    * arithmetic with explicit floor boundaries (block (i,j) covers
    * x in [i*w/9, (i+1)*w/9), y in [j*h/8, (j+1)*h/8); brightness
    * compares cross-multiplied sums, never divides), so the oracle can
    * replay the hash from the fixture's pixel formula — equality holds
    * only if the PNG decode returns the exact RGB values. Requires
    * w >= 9, h >= 8 (every block non-empty); violations fail loudly.
    *
    * Why bands and not one 64-bit hash: pairs within Hamming distance
    * 7 differ in at most 7 of the 8 bands, so a band equi-join finds
    * every such pair by pigeonhole — no all-pairs comparison at any
    * scale. Per-row mapPartitions, no shuffle here.
    */
  def dHashBands(df: DataFrame, idCol: String,
      batchSize: Int = 256): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("bands", ArrayType(LongType, containsNull = false))))
    val idIdx = df.schema.fieldIndex(idCol)
    val contentIdx = df.schema.fieldIndex("content")
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(
              r.getAs[Array[Byte]](contentIdx)))
          require(img != null, "dHashBands: undecodable image bytes")
          val (w, h) = (img.getWidth, img.getHeight)
          require(w >= 9 && h >= 8,
            s"dHashBands: image ${w}x$h too small for a 9x8 grid")
          // block gray sums and areas on the 9x8 grid
          val sums = Array.ofDim[Long](9, 8)
          val areas = Array.ofDim[Long](9, 8)
          var y = 0
          while (y < h) {
            // y is in block j iff j*h/8 <= y < (j+1)*h/8; the closed
            // form (8y+7)/h inverts those floor boundaries exactly
            // (property-verified for every h) — the oracle replays it
            val jj = (8 * y + 7) / h
            var x = 0
            while (x < w) {
              val ii = (9 * x + 8) / w
              val p = img.getRGB(x, y) & 0xFFFFFF
              sums(ii)(jj) +=
                ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
              areas(ii)(jj) += 1L
              x += 1
            }
            y += 1
          }
          val bands = new Array[Any](8)
          var j = 0
          while (j < 8) {
            var band = 0L
            var i = 0
            while (i < 8) {
              if (sums(i)(j) * areas(i + 1)(j) >
                  sums(i + 1)(j) * areas(i)(j))
                band |= 1L << i
              i += 1
            }
            bands(j) = band
            j += 1
          }
          Row(r.getLong(idIdx), bands.toSeq)
        }
      }
    }(Encoders.row(outSchema))
  }
}
