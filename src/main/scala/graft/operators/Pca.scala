package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA + whitening over an embedding column — the standard retrieval
  * post-processing step (public recipe: Jegou & Chum 2012, "Negative
  * evidences and co-occurrences in image retrieval: the benefit of PCA
  * and whitening", ECCV; the same transform LLM pipelines apply before
  * quantizing or truncating embedding stores).
  *
  * Decomposition of the work by scale:
  *   - The corpus-sized part is ONE pass: a per-partition (sum, outer
  *     product, count) accumulator merged by treeAggregate — d + d^2
  *     doubles of state per partition, no shuffle of row data at all
  *     (the canonical way to fit a d x d model to 100 TB when d is
  *     small; mapPartitions-style imperative code is warranted here
  *     because an exploded (i, j) DataFrame formulation would emit
  *     n*d^2 rows).
  *   - The eigendecomposition is DRIVER-side plain-Scala cyclic Jacobi
  *     on the d x d covariance — microseconds at d=64, independent of
  *     corpus size (the k-means/PQ codebook discipline: train tiny,
  *     apply wide).
  *   - The projection back over the corpus is per-row fold arithmetic
  *     against broadcast literal matrices — stateless, codegen'd,
  *     streaming-safe.
  *
  * Float caveat: covariance accumulation is a shuffled-double sum and
  * Jacobi rotations are iterative — NOT bit-deterministic across
  * engines, so PCA queries are property-gated (orthonormality, descending
  * spectrum, unit whitened variance, exact-rotation reconstruction),
  * never hash-compared — the l61/l57 contract.
  */
object Pca {

  /** The fitted model: column means, eigenvectors as ROWS sorted by
    * descending eigenvalue (V(i) = i-th principal axis), eigenvalues.
    */
  final case class PcaModel(mean: Array[Double], axes: Array[Array[Double]],
      eigenvalues: Array[Double]) {
    def dim: Int = mean.length
  }

  /** Fit the model in one distributed pass + a driver-side Jacobi
    * eigendecomposition. Population normalization (divide by n, not
    * n-1) so whitening the SAME rows the model was fit on yields
    * exactly unit variance — the property the gate checks.
    */
  def fit(df: DataFrame, embCol: String): PcaModel = {
    val rows = df.select(col(embCol)).where(col(embCol).isNotNull)
      .rdd.map(_.getSeq[Float](0).toArray)
    // dimensionality probe via take(1): an empty / all-null frame gets
    // the intended error message instead of first()'s opaque
    // NoSuchElementException
    val head = rows.take(1)
    require(head.nonEmpty, "PCA fit over an empty frame")
    val d = head(0).length
    // guard absurd dimensionality the way the serve collects guard
    // their entry counts: the treeAggregate carries d^2 doubles per
    // partition — fine at embedding scale, catastrophic if a caller
    // points this at a wide matrix by mistake
    require(d <= 4096, s"PCA fit dimensionality $d exceeds 4096 — the " +
      "per-partition d^2 covariance state would not fit; reduce the " +
      "column or use a randomized sketch")
    // acc = (n, sum[d], outer[d*d] upper triangle packed full)
    val zero = (0L, new Array[Double](d), new Array[Double](d * d))
    val (n, s, o) = rows.treeAggregate(zero)(
      seqOp = { case ((cnt, sum, out), x) =>
        require(x.length == d, s"ragged embedding: ${x.length} != $d")
        var i = 0
        while (i < d) {
          val xi = x(i).toDouble
          sum(i) += xi
          var j = i
          while (j < d) { out(i * d + j) += xi * x(j); j += 1 }
          i += 1
        }
        (cnt + 1L, sum, out)
      },
      combOp = { case ((n1, s1, o1), (n2, s2, o2)) =>
        var i = 0
        while (i < d) { s1(i) += s2(i); i += 1 }
        i = 0
        while (i < d * d) { o1(i) += o2(i); i += 1 }
        (n1 + n2, s1, o1)
      })
    require(n > 0, "PCA fit over an empty frame")
    val mean = s.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = o(i * d + j) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigen(cov)
    // sort axes by eigenvalue descending; tie-break on index for
    // determinism of the ORDER (the axes themselves are already fixed)
    val order = values.indices.sortBy(k => (-values(k), k))
    PcaModel(mean,
      order.map(k => vectors.map(_(k))).toArray,
      order.map(values).toArray)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix — the
    * textbook rotation sweep (Golub & Van Loan §8.5), plain Scala,
    * driver-side only. Returns (eigenvalues, eigenvector COLUMNS).
    */
  private[graft] def jacobiEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // smaller root of t^2 + 2*theta*t - 1 = 0 (NR's stable form)
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sn = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - sn * akq
              a(k)(q) = sn * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - sn * aqk
              a(q)(k) = sn * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - sn * vkq
              v(k)(q) = sn * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  /** Project the embedding column onto the model's top-k axes —
    * per-row fold arithmetic against broadcast literal matrices
    * (centered embedding MATERIALIZED first so each output component
    * reads it, never re-derives it — the t28 interpreted-HOF lesson).
    * `whiten` divides each component by sqrt(eigenvalue) (guarded to 0
    * for degenerate axes), making the projected covariance the
    * identity. Streaming-safe: no window, no aggregation.
    */
  def projectExpr(model: PcaModel, emb: Column, k: Int,
      whiten: Boolean): Column = {
    require(k >= 1 && k <= model.dim, s"k=$k out of range 1..${model.dim}")
    val axes = model.axes.take(k).zipWithIndex.map { case (ax, i) =>
      val scale =
        if (!whiten) 1.0
        else if (model.eigenvalues(i) > 1e-12)
          1.0 / math.sqrt(model.eigenvalues(i))
        else 0.0
      ax.map(_ * scale).toSeq
    }.toSeq
    val centered = zip_with(emb, typedLit(model.mean.toSeq),
      (x, m) => x.cast("double") - m)
    transform(typedLit(axes), row =>
      aggregate(zip_with(centered, row, (x, w) => x * w),
        lit(0.0), (acc, t) => acc + t))
  }
}
