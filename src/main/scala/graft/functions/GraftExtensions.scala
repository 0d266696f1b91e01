package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the engine's custom Catalyst expressions: registering
  * this class via `spark.sql.extensions=graft.functions.GraftExtensions`
  * (or `new SparkSession.Builder().withExtensions(new GraftExtensions)`)
  * makes them callable from plain SQL —
  *
  * {{{
  *   SELECT rolling_hash(text), simhash64(text, 3),
  *          cosine_sim(a.embedding, b.embedding)
  * }}}
  *
  * This is rung (b)+(c) of the extension ladder (SURVEY.md §7.3): the
  * expressions stay native codegen'd Catalyst operators; the extension
  * only adds name resolution.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (identifier, info, builder) triples, also usable to register into an
    * existing session's `functionRegistry`.
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] = Seq(
    (FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(text) - codepoint rolling-hash fingerprint"),
      (args: Seq[Expression]) => RollingHash(args.head)),
    (FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float arrays"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))),
    (FunctionIdentifier("hyperplane_sig"),
      info("hyperplane_sig", "hyperplane_sig(vec, bits) - LSH bit signature"),
      (args: Seq[Expression]) =>
        HyperplaneSignature(args(0), intArg(args(1), "bits"))),
    (FunctionIdentifier("shingles"),
      info("shingles", "shingles(text, k) - distinct word k-shingles"),
      (args: Seq[Expression]) => ShinglesFromText(args(0), intArg(args(1), "k"))),
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(text, k) - 64-bit SimHash of word k-shingles"),
      (args: Seq[Expression]) => SimHash64FromText(args(0), intArg(args(1), "k"))),
    (FunctionIdentifier("minhash_bands"),
      info("minhash_bands",
        "minhash_bands(text, k, perms, bands) - MinHash LSH band hashes"),
      (args: Seq[Expression]) => MinHashBandHashesFromText(args(0),
        intArg(args(1), "k"), intArg(args(2), "perms"), intArg(args(3), "bands"))))

  /** Register all functions into an already-running session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
