package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Optimized Product Quantization with a TRAINED rotation — the
  * alternating (non-parametric) refinement of Ge et al. 2013 §4 that
  * l106's PCA rotation (the paper's non-iterative R0 baseline) seeds:
  * repeat { PQ-encode under the current rotation R; re-fit R from the
  * (vector, reconstruction) pairing by orthogonal Procrustes }. Every
  * step is a coordinate-descent minimization of the ONE objective
  * sum_i ||R x_i - xhat_i||^2, so the in-sample quantization error is
  * monotonically non-increasing by construction (OpqSpec property-pins
  * it): the codebook update is warm-started from the previous
  * iteration's codebook (a re-seeded codebook could land in a worse
  * local optimum and break the guarantee), the encode step is the
  * per-row minimum, and the Procrustes step is the closed-form optimum
  * over orthogonal matrices.
  *
  * Sync-point shape (the l80 BPE-argmax discipline): each iteration is
  * TWO distributed passes with one driver sync each —
  *   pass A (Lloyd):    treeAggregate of per-(block, code) sub-vector
  *                      sums/counts (m*nCodes*subDim doubles of state
  *                      per partition) -> driver mean update;
  *   pass B (Procrustes): treeAggregate of the d x d cross-covariance
  *                      A = sum_i x_i xhat_i^T plus the scalar error
  *                      (d^2 + 1 doubles of state) -> driver SVD (via
  *                      the Pca Jacobi solver on A^T A) -> R = V U^T.
  * Nothing corpus-sized ever moves: the driver state is O(model) per
  * iteration, the same d<=4096 bound Pca.fit enforces, and at 100 TB
  * the rotation trains on a bounded sample anyway (the k-means/PQ
  * codebook discipline: train tiny, apply wide).
  *
  * Float caveat: treeAggregate double sums and Jacobi sweeps are not
  * bit-deterministic across engines, so OPQ queries are property- and
  * agreement-gated (monotone error trace, orthonormal rotation, top-k
  * agreement vs the R0 baseline at the same budget), never
  * hash-compared — the l101/l106 contract.
  */
object Opq {

  /** The fitted artifact: the trained orthogonal rotation (rows =
    * output dims), the per-iteration in-sample quantization error
    * (errTrace(t) is measured under the iteration-t codebook AND
    * rotation, BEFORE that iteration's Procrustes update), and the
    * final codebook (blk -> code -> sub-centroid) in rotated space.
    */
  final case class OpqModel(rotation: Array[Array[Double]],
      errTrace: Array[Double],
      codebook: Array[Array[Array[Double]]])

  /** Fit the alternating-refinement rotation. `r0` seeds the rotation
    * (identity, or l101's PCA axes for the OPQ_NP-with-PCA-init of the
    * paper); codebook seeds are the sub-vectors of the `nCodes`
    * smallest-xxhash64 ids (the Similarity PQ discipline), rotated by
    * r0. Each of the `iters` iterations runs one warm-started Lloyd
    * round and one encode/Procrustes round (two passes — see the
    * sync-point note above).
    */
  def fitRotation(df: DataFrame, idCol: String, embCol: String,
      m: Int, nCodes: Int, iters: Int,
      r0: Array[Array[Double]]): OpqModel = {
    require(m >= 1 && nCodes >= 1 && iters >= 1,
      s"need m, nCodes, iters >= 1, got ($m, $nCodes, $iters)")
    // persist: the fit runs take(1) + 2*iters treeAggregate passes —
    // an uncached RDD would re-scan and re-project the parquet source
    // once per pass (the Dedup.components eager-materialization lesson)
    val rows = df.select(col(embCol)).where(col(embCol).isNotNull)
      .rdd.map(_.getSeq[Float](0).toArray.map(_.toDouble))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val head = rows.take(1)
    require(head.nonEmpty, "OPQ fit over an empty frame")
    val d = head(0).length
    require(d % m == 0 && d >= m,
      s"embedding dimension $d must be a positive multiple of m=$m")
    require(d <= 4096, s"OPQ fit dimensionality $d exceeds 4096 (the " +
      "Pca.fit bound: d^2 driver/partition state)")
    val sub = d / m
    require(r0.length == d && r0.forall(_.length == d),
      s"r0 must be $d x $d")

    // seed codebook: the nCodes smallest-hash ids' sub-vectors under
    // r0 (collected raw once — nCodes rows — and re-usable because the
    // warm start means we never re-seed)
    val seedRows = df.select(col(idCol), col(embCol))
      .where(col(embCol).isNotNull)
      .select(col(idCol), col(embCol), xxhash64(col(idCol)).as("__h"))
      .orderBy(col("__h"), col(idCol)).limit(nCodes)
      .select(col(embCol)).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    require(seedRows.nonEmpty, "OPQ fit: no seed rows")

    var rot = r0.map(_.clone())
    def rotate(x: Array[Double], r: Array[Array[Double]]): Array[Double] = {
      val out = new Array[Double](d)
      var i = 0
      while (i < d) {
        var acc = 0.0
        val ri = r(i)
        var j = 0
        while (j < d) { acc += ri(j) * x(j); j += 1 }
        out(i) = acc
        i += 1
      }
      out
    }
    // codebook(blk)(code)(k); seeds cycled if fewer rows than codes
    var codebook = Array.tabulate(m, nCodes) { (blk, code) =>
      val s = rotate(seedRows(code % seedRows.length), rot)
      java.util.Arrays.copyOfRange(s, blk * sub, (blk + 1) * sub)
    }
    def nearestCode(rx: Array[Double], blk: Int,
        cb: Array[Array[Array[Double]]]): Int = {
      var best = 0
      var bestD = Double.MaxValue
      var code = 0
      while (code < nCodes) {
        val cent = cb(blk)(code)
        var d2 = 0.0
        var k = 0
        while (k < sub) {
          val t = rx(blk * sub + k) - cent(k)
          d2 += t * t
          k += 1
        }
        if (d2 < bestD) { bestD = d2; best = code }
        code += 1
      }
      best
    }

    val errs = new Array[Double](iters)
    var it = 0
    while (it < iters) {
      val (r, cb) = (rot, codebook)
      // pass A — warm-started Lloyd round: per-(blk, code) sub-vector
      // sums and counts; empty cells keep their old centroid
      val zeroA = (new Array[Double](m * nCodes * sub),
        new Array[Long](m * nCodes))
      val (sums, counts) = rows.treeAggregate(zeroA)(
        seqOp = { case ((s, c), x) =>
          require(x.length == d, s"ragged embedding: ${x.length} != $d")
          val rx = rotate(x, r)
          var blk = 0
          while (blk < m) {
            val code = nearestCode(rx, blk, cb)
            val off = (blk * nCodes + code) * sub
            var k = 0
            while (k < sub) { s(off + k) += rx(blk * sub + k); k += 1 }
            c(blk * nCodes + code) += 1L
            blk += 1
          }
          (s, c)
        },
        combOp = { case ((s1, c1), (s2, c2)) =>
          var i = 0
          while (i < s1.length) { s1(i) += s2(i); i += 1 }
          i = 0
          while (i < c1.length) { c1(i) += c2(i); i += 1 }
          (s1, c1)
        })
      codebook = Array.tabulate(m, nCodes) { (blk, code) =>
        val n = counts(blk * nCodes + code)
        if (n == 0L) cb(blk)(code)
        else {
          val off = (blk * nCodes + code) * sub
          Array.tabulate(sub)(k => sums(off + k) / n)
        }
      }
      val cb2 = codebook
      // pass B — encode under the updated codebook, accumulate the
      // in-sample error and A = sum_i x_i xhat_i^T for Procrustes
      val zeroB = (new Array[Double](d * d), new Array[Double](1))
      val (a, errArr) = rows.treeAggregate(zeroB)(
        seqOp = { case ((acc, e), x) =>
          // same invariant as pass A: rotate() would otherwise throw an
          // opaque AIOOBE on a short row, and pass B must not depend on
          // pass A having scanned the same cached RDD first
          require(x.length == d, s"ragged embedding: ${x.length} != $d")
          val rx = rotate(x, r)
          val xhat = new Array[Double](d)
          var blk = 0
          while (blk < m) {
            val cent = cb2(blk)(nearestCode(rx, blk, cb2))
            var k = 0
            while (k < sub) { xhat(blk * sub + k) = cent(k); k += 1 }
            blk += 1
          }
          var i = 0
          while (i < d) {
            val t = rx(i) - xhat(i)
            e(0) += t * t
            val xi = x(i)
            var j = 0
            while (j < d) { acc(i * d + j) += xi * xhat(j); j += 1 }
            i += 1
          }
          (acc, e)
        },
        combOp = { case ((a1, e1), (a2, e2)) =>
          var i = 0
          while (i < a1.length) { a1(i) += a2(i); i += 1 }
          e1(0) += e2(0)
          (a1, e1)
        })
      errs(it) = errArr(0)
      rot = procrustes(a, d)
      it += 1
    }
    OpqModel(rot, errs, codebook)
    } finally rows.unpersist(blocking = false)
  }

  /** Closed-form orthogonal Procrustes: given A = sum_i x_i xhat_i^T
    * (row-major d x d), the R maximizing tr(R A) = sum_i xhat_i^T R x_i
    * over orthogonal matrices is R = V U^T from the SVD A = U S V^T —
    * computed via the Pca Jacobi solver on the symmetric A^T A (V and
    * S^2), with U = A V / S and rank-deficient directions completed by
    * Gram-Schmidt so R stays exactly orthogonal on degenerate data.
    */
  private[graft] def procrustes(a: Array[Double], d: Int)
      : Array[Array[Double]] = {
    val ata = Array.tabulate(d, d) { (i, j) =>
      var acc = 0.0
      var k = 0
      while (k < d) { acc += a(k * d + i) * a(k * d + j); k += 1 }
      acc
    }
    val (eig, vcols) = Pca.jacobiEigen(ata) // vcols(i)(k) = V[i][k]
    val order = eig.indices.sortBy(k => (-eig(k), k))
    val maxEig = math.max(eig(order.head), 0.0)
    val eps = 1e-12 * math.max(maxEig, 1.0)
    // V columns in descending-singular-value order
    val v = order.map(k => Array.tabulate(d)(i => vcols(i)(k))).toArray
    val u = new Array[Array[Double]](d)
    var r = 0
    while (r < d) {
      if (eig(order(r)) > eps) {
        val s = math.sqrt(eig(order(r)))
        u(r) = Array.tabulate(d) { i =>
          var acc = 0.0
          var j = 0
          while (j < d) { acc += a(i * d + j) * v(r)(j); j += 1 }
          acc / s
        }
      } else u(r) = null
      r += 1
    }
    completeOrthonormal(u)
    // R = V U^T: R[i][j] = sum_k v(k)(i) * u(k)(j)
    Array.tabulate(d, d) { (i, j) =>
      var acc = 0.0
      var k = 0
      while (k < d) { acc += v(k)(i) * u(k)(j); k += 1 }
      acc
    }
  }

  /** Fill the null rows of `u` with unit vectors orthogonal to every
    * existing row (modified Gram-Schmidt over the standard basis) —
    * the rank-deficient completion of the Procrustes U.
    */
  private def completeOrthonormal(u: Array[Array[Double]]): Unit = {
    val d = u.length
    var next = 0
    var r = 0
    while (r < d) {
      if (u(r) == null) {
        var done = false
        while (!done) {
          require(next < d, "orthonormal completion exhausted the basis")
          val cand = Array.tabulate(d)(i => if (i == next) 1.0 else 0.0)
          next += 1
          var k = 0
          while (k < d) {
            if (u(k) != null) {
              var dot = 0.0
              var i = 0
              while (i < d) { dot += cand(i) * u(k)(i); i += 1 }
              var j = 0
              while (j < d) { cand(j) -= dot * u(k)(j); j += 1 }
            }
            k += 1
          }
          var n2 = 0.0
          cand.foreach(x => n2 += x * x)
          if (n2 > 1e-8) {
            val inv = 1.0 / math.sqrt(n2)
            u(r) = cand.map(_ * inv)
            done = true
          }
        }
      }
      r += 1
    }
  }

  /** Apply a rotation matrix to an embedding column — per-row fold
    * arithmetic against a broadcast literal matrix (the Pca.projectExpr
    * shape, without centering: a PURE rotation preserves norms and dot
    * products exactly, so downstream cosine machinery is unchanged).
    * Output elements cast to float for embedding-column compatibility.
    * Streaming-safe: no window, no aggregation.
    */
  def rotateExpr(rotation: Array[Array[Double]], emb: Column): Column = {
    // zip_with pads the shorter side with nulls, so a dimension
    // mismatch would silently yield null-filled vectors — fail loudly
    // instead (the decode tiers' container-lies discipline). A NULL
    // embedding maps to a NULL ARRAY — a deliberate semantics change
    // from the unguarded expression, which produced an array of NULL
    // floats (zip_with over a null side): no fixture or registered
    // consumer feeds NULL embeddings, and NULL-in/NULL-out is the
    // convention every other embedding expression here follows. Only a
    // PRESENT vector of the wrong width is a hard error, and the
    // message coalesces the width so raise_error never throws a null
    // message.
    val rotated = transform(typedLit(rotation.map(_.toSeq).toSeq), row =>
      aggregate(zip_with(emb, row, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, t) => acc + t).cast("float"))
    when(emb.isNull, lit(null).cast("array<float>"))
      .when(size(emb) === lit(rotation.length), rotated)
      .otherwise(raise_error(concat(
        lit(s"rotateExpr: embedding dim != rotation dim ${rotation.length}: "),
        coalesce(size(emb).cast("string"), lit("NULL")))))
  }
}
