package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

/** PCA fit/project invariants the driver gate (l101) checks only as
  * booleans: exact eigenstructure on a known matrix, and equality of the
  * distributed fit + column-expression projection with a plain-Scala
  * reference on a small fixture.
  */
class PcaSpec extends SparkSpec {

  test("jacobiEigen: known 3x3 spectrum, orthonormal vectors") {
    // [[4,1,0],[1,4,0],[0,0,2]] has eigenvalues 5, 3, 2
    val a = Array(
      Array(4.0, 1.0, 0.0),
      Array(1.0, 4.0, 0.0),
      Array(0.0, 0.0, 2.0))
    val (values, vectors) = Pca.jacobiEigen(a)
    assert(values.sorted.zip(Seq(2.0, 3.0, 5.0))
      .forall { case (g, w) => math.abs(g - w) < 1e-12 })
    // columns orthonormal
    for (i <- 0 until 3; j <- i until 3) {
      val d = (0 until 3).map(k => vectors(k)(i) * vectors(k)(j)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-12, s"col dot ($i,$j) = $d")
    }
    // A v = lambda v for each pair
    for (c <- 0 until 3) {
      val av = a.map(row => (0 until 3).map(k => row(k) * vectors(k)(c)).sum)
      assert((0 until 3).forall(k =>
        math.abs(av(k) - values(c) * vectors(k)(c)) < 1e-10))
    }
  }

  test("fit + projectExpr: matches a plain-Scala reference; whitening yields exactly unit variance") {
    import spark.implicits._
    // anisotropic 3-d cloud, deterministic
    val pts = (0 until 60).map { i =>
      val t = i * 0.7
      (i.toLong, Array(
        (3.0 * math.cos(t) + 0.3 * math.sin(3 * t)).toFloat,
        (0.5 * math.sin(t)).toFloat,
        (0.1 * math.cos(2 * t) + 1.0).toFloat))
    }
    val df = pts.toDF("id", "embedding")
    val model = Pca.fit(df, "embedding")
    assert(model.dim === 3)

    // reference covariance and mean (population-normalized)
    val n = pts.size
    val mean = (0 until 3).map(j => pts.map(_._2(j).toDouble).sum / n)
    val cov = Array.tabulate(3, 3)((i, j) =>
      pts.map(p => (p._2(i) - mean(i)) * (p._2(j) - mean(j))).sum / n)
    assert((0 until 3).forall(j => math.abs(model.mean(j) - mean(j)) < 1e-9))
    // model axes diagonalize the reference covariance: v' C v == lambda
    model.axes.zip(model.eigenvalues).foreach { case (ax, lv) =>
      val cv = (0 until 3).map(i =>
        (0 until 3).map(j => cov(i)(j) * ax(j)).sum)
      val vcv = (0 until 3).map(i => ax(i) * cv(i)).sum
      assert(math.abs(vcv - lv) < 1e-9, s"v'Cv=$vcv vs lambda=$lv")
    }
    // spectrum descending
    assert(model.eigenvalues.zip(model.eigenvalues.drop(1))
      .forall { case (a, b) => a >= b - 1e-12 })

    // projection matches per-point reference arithmetic
    val got = df.select(col("id"),
        Pca.projectExpr(model, col("embedding"), 3, whiten = false).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    pts.foreach { case (id, x) =>
      val want = model.axes.map(ax =>
        (0 until 3).map(j => (x(j).toDouble - model.mean(j)) * ax(j)).sum)
      got(id).zip(want).foreach { case (g, w) =>
        assert(math.abs(g - w) < 1e-9)
      }
    }

    // whitened components of the FITTED rows: unit variance, zero mean
    val wrows = df.select(
        Pca.projectExpr(model, col("embedding"), 3, whiten = true).as("w"))
      .collect().map(_.getSeq[Double](0))
    (0 until 3).foreach { j =>
      val m = wrows.map(_(j)).sum / n
      val v = wrows.map(w => (w(j) - m) * (w(j) - m)).sum / n
      assert(math.abs(m) < 1e-9, s"whitened mean dim $j = $m")
      assert(math.abs(v - 1.0) < 1e-9, s"whitened var dim $j = $v")
    }
  }
}
