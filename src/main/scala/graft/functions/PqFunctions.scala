package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Driver-side PQ codebook — the model-sized artifact (m blocks x
  * nCodes sub-centroids x subDim floats, e.g. 16x64x4 = 4 KB of
  * floats) that PQ encoding and ADC scoring are per-row functions OF.
  * Holding it as one flat array and shipping it inside the expression
  * tree (the BloomMightContain discipline) turns what used to be a
  * broadcast-join + shuffled-aggregate plan per consumer into a single
  * codegen'd projection: encode = argmin scan per block, ADC = m
  * dot-products — no Exchange anywhere (optimization guide §2.4/§4).
  *
  * Bit-compatibility contract (load-bearing for the l82/l131/t51/t52
  * update≡rebuild equality gates and for layouts persisted by the old
  * join+aggregate formulation): per-element arithmetic is EXACTLY the
  * retired SQL path's — d2 sums `(x.toDouble - cent.toDouble)^2` in
  * ascending element order (the zip_with/aggregate left fold), the
  * argmin tie-breaks to the smallest raw code id on exactly-equal d2
  * (the `min(struct(d2, code))` order; `codeIds` is sorted ascending
  * and the scan keeps the first strict minimum), and the ADC dot sums
  * ascending within each block, blocks ascending. So the same
  * (codebook, vector) pair encodes to the same codes as before, bit
  * for bit — only codebook TRAINING (a different shuffled-double
  * summation draw per run, gated never hash-compared) moves.
  *
  * `codeIds` carries the RAW code ids (the seed rows' own ids — the
  * persisted `codes` tables store these, so the dense 0..nCodes-1
  * layout stays an in-memory detail); every block shares the one seed
  * id set, which is what the seeded init produces.
  */
final case class PqCodebookLocal(m: Int, subDim: Int,
    codeIds: Array[Long], cents: Array[Float]) {

  def nCodes: Int = codeIds.length
  def dim: Int = m * subDim

  require(m >= 1 && subDim >= 1 && codeIds.nonEmpty,
    s"PqCodebookLocal: need m, subDim, nCodes >= 1, got ($m, $subDim, ${codeIds.length})")
  require(cents.length == m * nCodes * subDim,
    s"PqCodebookLocal: ragged centroid array: ${cents.length} != $m * $nCodes * $subDim")
  require((1 until nCodes).forall(j => codeIds(j - 1) < codeIds(j)),
    "PqCodebookLocal: codeIds must be strictly ascending (the encode tie-break order)")

  private def checkDim(n: Int): Unit =
    if (n != dim) throw new IllegalArgumentException(
      s"PQ encode/ADC: embedding dimension must be m*subDim = $dim, got $n")

  /** Dense index of the argmin sub-centroid for block `blk` of a raw
    * float vector — the treeAggregate trainer's per-row step.
    */
  def nearestDense(x: Array[Float], blk: Int): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var j = 0
    while (j < nCodes) {
      val off = (blk * nCodes + j) * subDim
      var d2 = 0.0
      var k = 0
      while (k < subDim) {
        val t = x(blk * subDim + k).toDouble - cents(off + k).toDouble
        d2 += t * t
        k += 1
      }
      if (d2 < bestD) { bestD = d2; best = j }
      j += 1
    }
    best
  }

  /** Raw code ids (blk ascending) of an embedding — PQ encoding as a
    * per-row function.
    */
  def encode(emb: ArrayData): Array[Long] = {
    checkDim(emb.numElements())
    val out = new Array[Long](m)
    var blk = 0
    while (blk < m) {
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < nCodes) {
        val off = (blk * nCodes + j) * subDim
        var d2 = 0.0
        var k = 0
        while (k < subDim) {
          val t = emb.getFloat(blk * subDim + k).toDouble -
            cents(off + k).toDouble
          d2 += t * t
          k += 1
        }
        if (d2 < bestD) { bestD = d2; best = j }
        j += 1
      }
      out(blk) = codeIds(best)
      blk += 1
    }
    out
  }

  /** ADC approximate dot: sum over blocks of dot(query sub-vector,
    * coded sub-centroid) — ascending within each block, blocks
    * ascending (deterministic, unlike the retired shuffled partial-dot
    * sum).
    */
  def adcDot(qEmb: ArrayData, codes: ArrayData): Double = {
    checkDim(qEmb.numElements())
    if (codes.numElements() != m) throw new IllegalArgumentException(
      s"PQ ADC: codes array must have m = $m entries, got ${codes.numElements()}")
    var dot = 0.0
    var blk = 0
    while (blk < m) {
      val dense = java.util.Arrays.binarySearch(codeIds, codes.getLong(blk))
      if (dense < 0) throw new IllegalArgumentException(
        s"PQ ADC: unknown code id ${codes.getLong(blk)} in block $blk")
      val off = (blk * nCodes + dense) * subDim
      var k = 0
      while (k < subDim) {
        dot += qEmb.getFloat(blk * subDim + k).toDouble *
          cents(off + k).toDouble
        k += 1
      }
      blk += 1
    }
    dot
  }
}

/** Codegen'd per-row PQ encode: array<float> embedding -> array<long>
  * of raw code ids (blk ascending) against the codebook shipped in the
  * expression tree.
  */
case class PqEncodeCodes(child: Expression, cb: PqCodebookLocal)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  def encodeData(a: ArrayData): ArrayData = new GenericArrayData(cb.encode(a))

  override def nullSafeEval(input: Any): Any =
    encodeData(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("pqEncode", this,
        classOf[PqEncodeCodes].getName)
      s"${ev.value} = $ref.encodeData($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd per-row ADC dot product of a full-precision query against
  * a PQ-coded candidate (raw code ids).
  */
case class PqAdcDot(left: Expression, right: Expression, cb: PqCodebookLocal)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  def adcDotData(q: ArrayData, codes: ArrayData): Double = cb.adcDot(q, codes)

  override def nullSafeEval(a: Any, b: Any): Any =
    adcDotData(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdcDot].getName)
      s"${ev.value} = $ref.adcDotData($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqFunctions {

  /** Column API: PQ-encode an array<float> embedding column. */
  def encodeCodes(cb: PqCodebookLocal, emb: Column): Column =
    GraftBridge.column(PqEncodeCodes(GraftBridge.expression(emb), cb))

  /** Column API: ADC approximate dot of (query embedding, codes). */
  def adcDot(cb: PqCodebookLocal, qEmb: Column, codes: Column): Column =
    GraftBridge.column(PqAdcDot(
      GraftBridge.expression(qEmb), GraftBridge.expression(codes), cb))
}
