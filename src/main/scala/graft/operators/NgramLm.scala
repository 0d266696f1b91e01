package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Count-based n-gram language-model scoring — the CCNet/Gopher-style
  * "LM perplexity" quality filter of an LLM curation pipeline: train a
  * smoothed bigram model on a held-out clean slice, score every
  * document's per-token surprisal, band the corpus by bits-per-token
  * and surface the extremes (high = noise/garble candidates, low =
  * boilerplate/templating candidates).
  *
  * Determinism (the no-libm contract of QuerySpec.scala): add-one
  * smoothing keeps every token probability an exact BIGINT rational
  * num/den = (pairCount+1)/(ctxCount+V), and the per-token surprisal is
  * the INTEGER-QUANTIZED log2, bitlen(den) - bitlen(num) — computed as
  * `length(bin(x))` on both engines (neither pads), so scores are pure
  * integer arithmetic and hash-match cross-engine. floor(log2 den) -
  * floor(log2 num) is within 1 bit of the real -log2 p per token;
  * bands of its per-token mean ARE log2-perplexity bands (perplexity =
  * 2^bits-per-token), which is what the filter thresholds on — the
  * exact transcendental value never matters, its band does.
  *
  * 100 TB shape: training is ONE pair-count aggregate over the (small)
  * clean slice plus a context-count aggregate DERIVED from the pair
  * table (never a second corpus pass); both count tables are
  * vocab-bounded and broadcast to the scoring join, so scoring the full
  * corpus is explode → two broadcast joins → one map-side-combined
  * per-doc sum — no corpus-sized shuffle beyond the per-doc aggregate.
  * (If a real corpus's bigram table outgrew broadcast, the same plan
  * degrades gracefully to a shuffle join on `prev,cur`; the streaming
  * face in StreamingOps instead collects the tables once at serve
  * start, the t25 codebook-at-boot discipline.)
  */
object NgramLm {

  /** Adjacent (prev, cur) token-pair structs of a token array. The
    * `size >= 2` guard matters: Spark's `sequence(1, 0)` counts DOWN.
    */
  def tokenPairs(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => struct(element_at(toks, i).as("prev"),
          element_at(toks, i + 1).as("cur"))))
      .otherwise(array().cast("array<struct<prev:string,cur:string>>"))

  /** The trained artifact: bigram counts (prev, cur, pair_c), context
    * counts (prev, ctx_c — the row sums of the pair table), and the
    * one-row vocab size (v). All three are vocab-bounded.
    */
  final case class BigramModel(pairCounts: DataFrame, ctxCounts: DataFrame,
      vocab: DataFrame)

  /** Train the add-one bigram model on `train` (the held-out clean
    * slice): one adjacent-pair count aggregate, context counts derived
    * from it, distinct-token vocab size.
    */
  def trainBigram(train: DataFrame, textCol: String): BigramModel = {
    val pc = train
      .select(explode(tokenPairs(TextFunctions.tokens(col(textCol))))
        .as("p"))
      .select(col("p.prev").as("prev"), col("p.cur").as("cur"))
      .groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).as("pair_c"))
    val ctx = pc.groupBy(col("prev")).agg(sum(col("pair_c")).as("ctx_c"))
    val v = train
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .agg(count_distinct(col("tok")).as("v"))
    BigramModel(pc, ctx, v)
  }

  /** Per-pair quantized surprisal bits given resolved counts:
    * bitlen(ctx_c + V) - bitlen(pair_c + 1), always >= 0 because
    * pair_c <= ctx_c and 1 <= V. An unseen context scores the uniform
    * 1/V.
    */
  private def bitsExpr(pairC: Column, ctxC: Column, v: Column): Column =
    (length(bin(coalesce(ctxC, lit(0L)) + v))
      - length(bin(coalesce(pairC, lit(0L)) + lit(1L)))).cast("long")

  /** Score every document against the model: (doc_id, n_scored,
    * total_bits, bpt) where n_scored is the number of conditioned
    * tokens (pairs), total_bits their summed quantized surprisal, bpt
    * the bits-per-token mean (NULL for docs with < 2 tokens, which
    * condition nothing).
    */
  def surprisalBits(docs: DataFrame, idCol: String, textCol: String,
      model: BigramModel): DataFrame = {
    val ap = docs
      .select(col(idCol).as("doc_id"),
        explode(tokenPairs(TextFunctions.tokens(col(textCol)))).as("p"))
      .select(col("doc_id"), col("p.prev").as("prev"),
        col("p.cur").as("cur"))
    val scored = ap
      .join(broadcast(model.pairCounts), Seq("prev", "cur"), "left")
      .join(broadcast(model.ctxCounts), Seq("prev"), "left")
      .crossJoin(broadcast(model.vocab))
      .select(col("doc_id"),
        bitsExpr(col("pair_c"), col("ctx_c"), col("v")).as("bits"))
    val perDoc = scored.groupBy(col("doc_id"))
      .agg(count(col("bits")).as("n_scored"),
        sum(col("bits")).as("total_bits"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_scored"), lit(0L)).as("n_scored"),
        col("total_bits"),
        when(coalesce(col("n_scored"), lit(0L)) > 0,
          col("total_bits").cast("double") / col("n_scored")).as("bpt"))
  }

  /** The collected serve-time artifact (the t25 codebook-at-boot
    * discipline): pair and context counts as in-process maps plus the
    * vocab scalar, collected ONCE at serve start so per-document
    * scoring becomes a pure per-row fold — the shape a streaming
    * score-at-ingest needs (no joins to re-plan per micro-batch, no
    * window). Guarded against silently collecting an unbounded table.
    */
  final case class ServeModel(pairCounts: Map[String, Long],
      ctxCounts: Map[String, Long], v: Long)

  def collectServeModel(model: BigramModel,
      maxEntries: Int = 65536): ServeModel = {
    val pc = model.pairCounts.collect()
      .map(r => s"${r.getString(0)} ${r.getString(1)}" -> r.getLong(2))
      .toMap
    require(pc.size <= maxEntries,
      s"collectServeModel: ${pc.size} bigrams exceed the $maxEntries" +
        " in-process bound — serve this model via the broadcast-join" +
        " batch path instead")
    val ctx = model.ctxCounts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val v = model.vocab.collect().head.getLong(0)
    ServeModel(pc, ctx, v)
  }

  /** Per-ROW surprisal over a token array against the collected model:
    * map-literal lookups + the same integer bit-length arithmetic, no
    * join, no aggregation — streaming-safe anywhere a column is. Yields
    * a struct (n_scored, total_bits, bpt); total_bits/bpt are NULL for
    * < 2 tokens, exactly `surprisalBits`' contract (the two paths are
    * equal row-for-row; NgramLmSpec pins it).
    */
  def surprisalBitsLocal(serve: ServeModel, toks: Column): Column = {
    val pcLit = typedLit(serve.pairCounts)
    val ctxLit = typedLit(serve.ctxCounts)
    val pairBits = transform(tokenPairs(toks), p =>
      bitsExpr(
        element_at(pcLit, concat_ws(" ", p.getField("prev"),
          p.getField("cur"))),
        element_at(ctxLit, p.getField("prev")),
        lit(serve.v)))
    val n = size(pairBits).cast("long")
    val total = when(n > 0,
      aggregate(pairBits, lit(0L), (acc, b) => acc + b))
    struct(n.as("n_scored"), total.as("total_bits"),
      (total.cast("double") / n).as("bpt"))
  }
}
