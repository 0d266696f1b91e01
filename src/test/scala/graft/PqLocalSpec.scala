package graft

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.functions.{PqCodebookLocal, PqFunctions}
import graft.operators.Similarity

/** Pins the round-16 PQ rework (driver-side treeAggregate training +
  * codegen'd encode/ADC expressions) to the retired SQL formulation's
  * semantics: the encode argmin must be BIT-identical given the same
  * codebook (same per-element d2 arithmetic, same smallest-code
  * tie-break — the l82/t51/t52 update≡rebuild gates and every layout
  * persisted by the old path depend on that), the codebook round-trip
  * through its (blk, code, cent) frame must be exact, and the trainer
  * must keep empty cells and match a plain-Scala Lloyd reference.
  */
class PqLocalSpec extends SparkSpec with TableDrivenPropertyChecks {

  import spark.implicits._

  private def mkVec(seed: Long, d: Int): Array[Float] = {
    var h = seed
    Array.tabulate(d) { i =>
      h = h * 6364136223846793005L + 1442695040888963407L + i
      ((h >>> 40).toInt % 1000) / 250.0f
    }
  }

  test("expression encode == retired SQL join+aggregate encode, bit for bit") {
    val d = 8; val m = 4; val nCodes = 3
    val vecs = (0L until 40L).map(i => (i, mkVec(i * 7 + 1, d).toSeq))
    val df = vecs.toDF("c_id", "c_emb")
    val cb = Similarity.pqTrainCodebookLocal(df, m, nCodes, trainIters = 1)

    // retired formulation, reconstructed verbatim over the SAME codebook
    val cbDf = Similarity.codebookDf(spark, cb)
    val sub = d / m
    val blocks = df.select(col("c_id"),
        explode(sequence(lit(0), lit(m - 1))).as("blk"),
        slice(col("c_emb"), col("blk") * sub + 1, lit(sub)).as("sub"))
    val l2 = aggregate(zip_with(col("sub"), col("cent"),
        (x, y) => (x.cast("double") - y.cast("double"))
          * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
    val oldCodes = blocks.join(broadcast(cbDf), Seq("blk"))
      .select(col("c_id"), col("blk"), col("code"), l2.as("__d2"))
      .groupBy(col("c_id"), col("blk"))
      .agg(min(struct(col("__d2"), col("code"))).as("m"))
      .select(col("c_id"), col("blk"), col("m.code").as("code"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap

    val newCodes = df.select(col("c_id"),
        posexplode(PqFunctions.encodeCodes(cb, col("c_emb"))))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap

    assert(newCodes == oldCodes)
  }

  test("codebook survives the (blk, code, cent) frame round-trip exactly") {
    val df = (0L until 30L).map(i => (i, mkVec(i + 3, 12).toSeq))
      .toDF("c_id", "c_emb")
    val cb = Similarity.pqTrainCodebookLocal(df, m = 3, nCodes = 4,
      trainIters = 2)
    val back = Similarity.collectCodebookLocal(
      Similarity.codebookDf(spark, cb))
    assert(back.m == cb.m && back.subDim == cb.subDim)
    assert(back.codeIds.toSeq == cb.codeIds.toSeq)
    assert(back.cents.toSeq == cb.cents.toSeq)
  }

  test("one trainer round == plain-Scala Lloyd reference (means + empty cells)") {
    val d = 6; val m = 2; val nCodes = 4
    val raw = (0L until 25L).map(i => i -> mkVec(i * 13 + 5, d))
    val df = raw.map { case (i, v) => (i, v.toSeq) }.toDF("c_id", "c_emb")
    val seeded = Similarity.pqTrainCodebookLocal(df, m, nCodes, 0)
    val trained = Similarity.pqTrainCodebookLocal(df, m, nCodes, 1)
    val sub = d / m
    // reference: assign every vector per block with the seeded codebook,
    // mean per cell, empty cells keep the seed
    val sums = Array.fill(m * nCodes * sub)(0.0)
    val counts = Array.fill(m * nCodes)(0L)
    raw.foreach { case (_, v) =>
      for (blk <- 0 until m) {
        val dense = seeded.nearestDense(v, blk)
        for (k <- 0 until sub)
          sums((blk * nCodes + dense) * sub + k) += v(blk * sub + k).toDouble
        counts(blk * nCodes + dense) += 1L
      }
    }
    for (cell <- 0 until m * nCodes; k <- 0 until sub) {
      val expect =
        if (counts(cell) == 0L) seeded.cents(cell * sub + k)
        else (sums(cell * sub + k) / counts(cell)).toFloat
      assert(trained.cents(cell * sub + k) == expect,
        s"cell $cell pos $k")
    }
  }

  test("adcDot == sum of per-block dot products against the coded centroids") {
    val d = 8; val m = 4
    val df = (0L until 20L).map(i => (i, mkVec(i + 11, d).toSeq))
      .toDF("c_id", "c_emb")
    val cb = Similarity.pqTrainCodebookLocal(df, m, nCodes = 3, 1)
    val q = mkVec(99L, d)
    val rows = df.select(col("c_id"),
        PqFunctions.encodeCodes(cb, col("c_emb")).as("codes"))
      .select(col("c_id"), col("codes"),
        PqFunctions.adcDot(cb, typedLit(q.toSeq), col("codes")).as("dot"))
      .collect()
    val sub = d / m
    rows.foreach { r =>
      val codes = r.getSeq[Long](1)
      var expect = 0.0
      for (blk <- 0 until m) {
        val dense = java.util.Arrays.binarySearch(cb.codeIds, codes(blk))
        for (k <- 0 until sub)
          expect += q(blk * sub + k).toDouble *
            cb.cents((blk * cb.nCodes + dense) * sub + k).toDouble
      }
      assert(r.getDouble(2) == expect, s"c_id ${r.getLong(0)}")
    }
  }

  test("dimension mismatch fails loudly in encode, train and ADC") {
    val df = Seq((1L, Seq.fill(7)(0.5f))).toDF("c_id", "c_emb")
    val e1 = intercept[Exception] {
      Similarity.pqTrainCodebookLocal(df, m = 4, nCodes = 2, 0)
    }
    assert(e1.getMessage.contains("multiple of m"))
    val cb = PqCodebookLocal(4, 2, Array(1L, 2L),
      Array.fill(4 * 2 * 2)(0.1f))
    val e2 = intercept[Exception] {
      df.select(PqFunctions.encodeCodes(cb, col("c_emb"))).collect()
    }
    assert(e2.getMessage.contains("dimension"))
  }
}
