package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus batched decode / feature-extract /
  * frame-sample operators.
  *
  * The actual codecs are NOT in this container, so the byte-level decode
  * is a clearly-marked deterministic FAKE (`fakeDecode`) — what is real
  * and tested is everything Spark cares about: the schema, the binary
  * column handling, the batched `mapPartitions` shape (the Scala analogue
  * of `mapInPandas`: decode wants amortized per-batch setup, not per-row),
  * and the partitioning story (decode is narrow — no shuffle; frame
  * sampling is a generator, also narrow).
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
}
