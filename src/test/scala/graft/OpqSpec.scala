package graft

import org.apache.spark.sql.functions._

import graft.operators.{Opq, Pca}

/** Contracts of the trained-rotation OPQ refinement (l112) that must
  * hold for ANY data: the per-iteration in-sample objective never
  * increases (the coordinate-descent guarantee the warm-started
  * codebook preserves), the fitted rotation stays exactly orthogonal,
  * and the rotation expression applied corpus-side preserves norms.
  */
class OpqSpec extends SparkSpec {

  private def embDF(vecs: Seq[Array[Float]]) = {
    import spark.implicits._
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")
  }

  /** Deterministic pseudo-random vectors (seeded LCG — Date/Random are
    * banned in workflow scripts, and a fixed stream keeps the test
    * reproducible anyway).
    */
  private def vecs(n: Int, d: Int, seed: Long): Seq[Array[Float]] = {
    var s = seed
    def next(): Float = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33).toInt % 1000) / 250.0f
    }
    Seq.fill(n)(Array.fill(d)(next()))
  }

  private def identity(d: Int): Array[Array[Double]] =
    Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)

  private def assertOrthonormal(r: Array[Array[Double]]): Unit = {
    val d = r.length
    for (i <- 0 until d; j <- i until d) {
      var dot = 0.0
      var k = 0
      while (k < d) { dot += r(i)(k) * r(j)(k); k += 1 }
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"R R^T [$i][$j] = $dot")
    }
  }

  test("errTrace is monotonically non-increasing from identity and " +
      "from a PCA seed, on three independent draws") {
    for (seed <- Seq(1L, 42L, 12345L)) {
      val df = embDF(vecs(120, 8, seed))
      val pca = Pca.fit(df, "embedding")
      for (r0 <- Seq(identity(8), pca.axes)) {
        val m = Opq.fitRotation(df, "vec_id", "embedding",
          m = 4, nCodes = 8, iters = 5, r0 = r0)
        m.errTrace.sliding(2).foreach { case Array(a, b) =>
          assert(b <= a * (1.0 + 1e-9) + 1e-12,
            s"seed=$seed err increased: ${m.errTrace.toSeq}")
        }
        assertOrthonormal(m.rotation)
      }
    }
  }

  test("refinement strictly improves a rotation-scrambled PQ-friendly " +
      "mixture (the signal OPQ exists for)") {
    // data = axis-aligned cluster centers (perfectly PQ-codable under
    // identity) passed through a fixed non-trivial rotation: the
    // identity-seeded initial codebook quantizes badly, and the
    // trained rotation must recover most of the structure
    val d = 8
    val theta = 0.7
    val rotIn = identity(d)
    rotIn(0)(0) = math.cos(theta); rotIn(0)(3) = -math.sin(theta)
    rotIn(3)(0) = math.sin(theta); rotIn(3)(3) = math.cos(theta)
    rotIn(1)(1) = math.cos(theta); rotIn(1)(6) = -math.sin(theta)
    rotIn(6)(1) = math.sin(theta); rotIn(6)(6) = math.cos(theta)
    val base = vecs(80, d, 7L).map(_.map(x => math.round(x * 2) / 2.0f))
    val data = base.map { v =>
      Array.tabulate(d) { i =>
        var acc = 0.0
        var j = 0
        while (j < d) { acc += rotIn(i)(j) * v(j); j += 1 }
        acc.toFloat
      }
    }
    val df = embDF(data)
    val m = Opq.fitRotation(df, "vec_id", "embedding",
      m = 4, nCodes = 16, iters = 6, r0 = identity(d))
    assert(m.errTrace.last < m.errTrace.head,
      s"no improvement: ${m.errTrace.toSeq}")
    assertOrthonormal(m.rotation)
  }

  test("rotateExpr preserves norms exactly enough for cosine machinery") {
    val df = embDF(vecs(40, 8, 9L))
    val m = Opq.fitRotation(df, "vec_id", "embedding",
      m = 4, nCodes = 8, iters = 2, r0 = identity(8))
    val drift = df.select(
        aggregate(Opq.rotateExpr(m.rotation, col("embedding")),
          lit(0.0), (a, x) => a + x.cast("double") * x).as("n2r"),
        aggregate(col("embedding"), lit(0.0),
          (a, x) => a + x.cast("double") * x).as("n2o"))
      .select(max(abs(col("n2r") - col("n2o")) /
        (lit(1.0) + col("n2o"))).as("d"))
      .collect().head.getDouble(0)
    assert(drift < 1e-5, s"norm drift $drift")
  }

  test("fit refuses an empty frame and a non-divisible m") {
    val e1 = intercept[IllegalArgumentException] {
      Opq.fitRotation(embDF(Seq.empty), "vec_id", "embedding",
        m = 4, nCodes = 8, iters = 1, r0 = identity(8))
    }
    assert(e1.getMessage.contains("empty frame"))
    val e2 = intercept[IllegalArgumentException] {
      Opq.fitRotation(embDF(vecs(10, 8, 3L)), "vec_id", "embedding",
        m = 3, nCodes = 8, iters = 1, r0 = identity(8))
    }
    assert(e2.getMessage.contains("multiple"))
  }
}
