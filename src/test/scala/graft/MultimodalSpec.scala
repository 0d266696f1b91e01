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
}
