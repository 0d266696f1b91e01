package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint as a codegen'd Catalyst
  * expression: a 64-bit-safe left fold over Unicode code points,
  * `acc := (acc * 31 + cp) mod 1e9+7`, seeded with the first code point.
  *
  * Fold semantics are chosen to be expressible verbatim in the DuckDB
  * oracle (`list_reduce` seeds with the first element and has no initial
  * accumulator), so fingerprints hash-match cross-engine. Empty input
  * fingerprints to NULL (list_reduce of an empty list is an error; NULL is
  * the sane total version).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  /** Nullable even over a non-null child: the EMPTY string hashes to
    * null (no codepoints to fold). Without this override the default
    * (child.nullable) lets codegen wire `ev.isNull` to the FalseLiteral
    * when the input is provably non-null (an exploded token, a lit) —
    * the generated `false = true;` fails to compile and the projection
    * silently falls back to interpreter mode.
    */
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.isEmpty) null
    else {
      var acc = 0L
      var first = true
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        i += Character.charCount(cp)
        if (first) { acc = cp.toLong; first = false }
        else acc = (acc * 31L + cp) % 1000000007L
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val first = ctx.freshName("first")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $s = $c.toString();
         |if ($s.isEmpty()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  boolean $first = true;
         |  int $i = 0;
         |  while ($i < $s.length()) {
         |    int $cp = $s.codePointAt($i);
         |    $i += Character.charCount($cp);
         |    if ($first) { $acc = (long) $cp; $first = false; }
         |    else { $acc = ($acc * 31L + $cp) % 1000000007L; }
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {

  /** Column API: rolling-hash fingerprint of a string column. */
  def rollingHash(c: Column): Column =
    GraftBridge.column(RollingHash(GraftBridge.expression(c)))

  /** Whitespace tokens of trimmed text. The fixtures are single-spaced;
    * a production corpus would pre-normalize whitespace upstream.
    */
  def tokens(text: Column): Column = split(trim(text), " ")

  /** Distinct word k-shingles of a text column (default 3-word shingles):
    * the standard near-dup unit — far more discriminative than unigrams
    * when the vocabulary is small. One codegen'd byte pass
    * (`ShinglesFromText`); empty array when the document has fewer than k
    * tokens. (The earlier split/transform/slice/concat_ws/array_distinct
    * formulation was correct but Catalyst's constraint inference
    * duplicated the whole tree into join-side filters, multiplying its
    * cost; the single expression is both cheaper and duplication-proof.)
    */
  def shingles(text: Column, k: Int = 3): Column =
    SketchFunctions.shinglesFromText(text, k)
}
