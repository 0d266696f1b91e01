package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Cosine similarity between two `array<float>` embedding columns as a
  * native Catalyst expression with whole-stage codegen — one fused loop,
  * no boxing, no UDF serialization; this sits in the O(|Q|*|C|) hot path
  * of similarity search so it must stay inside WholeStageCodegen.
  *
  * Determinism contract (QuerySpec): a single sequential left-fold per
  * accumulator in double precision — dot, |a|^2, |b|^2 — then
  * `dot / (sqrt(na) * sqrt(nb))`. Identical to the DuckDB-oracle
  * formulation `list_reduce(list_transform(...))`, so results are
  * bit-equal, and threshold filters agree.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi;
         |  $na += $xi * $xi;
         |  $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Shared vector-hash arithmetic, callable from both interpreted eval and
  * generated Java (Scala emits static forwarders for top-level objects).
  */
object VectorHash {

  /** Deterministic pseudo-random +-1 hyperplane component: sign of a 64-bit
    * avalanche hash of (plane, dim). Reproducible across runs/engines — the
    * hyperplanes are pure arithmetic, not RNG state.
    */
  def planeSign(plane: Int, dim: Int): Double = {
    var h = plane.toLong * 0x9E3779B97F4A7C15L + dim.toLong * 0xC2B2AE3D27D4EB4FL
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
    if ((h & 1L) == 0L) 1.0 else -1.0
  }

  /** b-bit random-hyperplane signature of a float vector: bit j is set iff
    * the (sequential, per-row — deterministic) dot product with hyperplane j
    * is > 0. Dim comes from the array itself — nothing hardcoded.
    */
  def signature(arr: ArrayData, bits: Int): Long = {
    val n = arr.numElements()
    var sig = 0L
    var j = 0
    while (j < bits) {
      var proj = 0.0
      var d = 0
      while (d < n) {
        proj += arr.getFloat(d).toDouble * planeSign(j, d)
        d += 1
      }
      if (proj > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** Random-hyperplane LSH signature as a per-row expression: replaces the
  * posexplode + plane-table-join + two-shuffle formulation (a rows x dim x
  * bits row explosion) with zero-shuffle narrow evaluation — the plan shape
  * that survives a 100 TB corpus.
  */
case class HyperplaneSignature(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 64,
    s"hyperplane signature must fit one long: bits=$bits not in [1,64]")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    VectorHash.signature(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorHash.signature($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  /** Column API: cosine similarity of two array<float> columns. */
  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column API: b-bit hyperplane LSH signature of an array<float> column. */
  def hyperplaneSig(v: Column, bits: Int): Column =
    GraftBridge.column(HyperplaneSignature(GraftBridge.expression(v), bits))

  /** Symmetric per-row int8 scalar quantization of an array<float>
    * column: q_i = floor(x_i / max|x| * 127 + 0.5), emitted as long
    * (Spark's floor of a double is BIGINT). All codegen'd built-ins
    * (transform/aggregate/greatest), per-row and shuffle-free;
    * `floor(t + 0.5)` instead of `round(t)` because floor is
    * bit-identical across engines while round's half-way rule is
    * engine-specific (HALF_UP vs half-even) — the oracle must reproduce
    * the exact values. Zero vectors quantize to zeros (scale guard).
    */
  def int8Quantize(emb: Column): Column = {
    import org.apache.spark.sql.functions._
    val m = aggregate(
      transform(emb, x => abs(x.cast("double"))),
      lit(0.0), (a, x) => greatest(a, x))
    val scale = when(m === 0.0, lit(1.0)).otherwise(m)
    transform(emb, x => floor(x.cast("double") / scale * 127 + 0.5))
  }
}
