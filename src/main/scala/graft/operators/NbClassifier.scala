package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Classifier-based quality filtering — the OTHER standard curation
  * filter next to the LM-perplexity family (NgramLm): train a text
  * classifier to separate a labeled reference slice from a labeled
  * reject slice, score every document's log-odds margin, keep what
  * scores reference-like. (GPT-3 filtered CommonCrawl with a
  * WebText-vs-crawl classifier; LLaMA with a Wikipedia-reference
  * classifier; FineWeb-style pipelines bootstrap the labels from a
  * CHEAPER pass — l90 trains on the winnowing dedup pass's
  * boilerplate labels, then the frozen model flags boilerplate-LIKE
  * documents at ingest with no corpus join at all, t32's complement.)
  * Multinomial Naive Bayes with add-one smoothing is the closed-form
  * member of that family: training is count aggregation — no
  * iteration, no driver sync points, no convex solver — which is what
  * makes the filter exactly reproducible AND cheap at corpus scale.
  *
  * Determinism (the l47/l83 no-libm contract): with add-one smoothing
  * every class-conditional feature probability is the exact BIGINT
  * rational (c_class+1)/(N_class+V), and the per-feature log-odds
  * margin is the INTEGER-QUANTIZED difference of the two class
  * surprisals,
  *   margin = [bitlen(N_neg+V) - bitlen(c_neg+1)]
  *          - [bitlen(N_pos+V) - bitlen(c_pos+1)]
  * via `length(bin(x))` on both engines — pure integer arithmetic,
  * hash-exact cross-engine. Positive margin = the feature is likelier
  * under the reference class. The doc margin is the sum (NB's
  * conditional independence), and `margin >= 0` is the Bayes decision
  * at equal priors — the keep/reject filter.
  *
  * Features are an array<string> column the caller shapes (unigram
  * tokens, the word bigrams `bigramFeats` builds — the shared-phrasing
  * signature a boilerplate detector needs, char n-grams, ...); the
  * count/score machinery is feature-agnostic.
  *
  * 100 TB shape: training is ONE feature-count aggregate over the
  * union of the two (small) labeled slices; the totals row (N_pos,
  * N_neg, V) is DERIVED from that count table — never a second pass.
  * Scoring the full corpus is explode → one broadcast join (the
  * vocab-bounded count table) → one-row totals attach →
  * map-side-combined per-doc sum: no corpus-sized shuffle beyond the
  * per-doc aggregate, same plan family as NgramLm.surprisalBits.
  */
object NbClassifier {

  /** Word-bigram feature strings of a token ARRAY column — the
    * shared-phrasing signature (a duplicated passage contributes its
    * exact bigrams; random text draws them independently). Callers
    * must hand in a MATERIALIZED token column: `toks` is referenced
    * both by ngramPairs' size guard and inside its lambda, so a named
    * column survives CollapseProject and is evaluated once per row
    * (the t28 lesson).
    */
  def bigramFeats(toks: Column): Column =
    transform(NgramLm.ngramPairs(toks, 2),
      p => concat_ws(" ", p.getField("prev"), p.getField("cur")))

  /** The trained artifact: per-feature class counts (feat, pos_c,
    * neg_c) and the one-row totals (n_pos, n_neg, v) derived from it.
    * Both vocab-bounded.
    */
  final case class NbModel(featCounts: DataFrame, totals: DataFrame)

  /** Train on two labeled slices (reference-quality `pos`, reject
    * `neg`): one union + one count aggregate; v = the count table's
    * row count (distinct features across BOTH slices — the shared
    * smoothing vocabulary). `feats` maps the materialized token column
    * to the feature array (identity for unigrams).
    */
  def trainNb(pos: DataFrame, neg: DataFrame, textCol: String,
      feats: Column => Column = identity): NbModel = {
    def side(df: DataFrame, isPos: Boolean) = df
      .select(TextFunctions.tokens(col(textCol)).as("t"),
        lit(if (isPos) 1L else 0L).as("is_pos"))
      .select(explode(feats(col("t"))).as("feat"), col("is_pos"))
    val tc = side(pos, isPos = true)
      .unionByName(side(neg, isPos = false))
      .groupBy(col("feat"))
      .agg(sum(col("is_pos")).as("pos_c"),
        sum(lit(1L) - col("is_pos")).as("neg_c"))
    // coalesce: a degenerate corpus with NO features (every doc under
    // 2 tokens with bigram feats) must yield the all-zero model — every
    // margin 0, keep everything — not NULL totals
    val totals = tc.agg(coalesce(sum(col("pos_c")), lit(0L)).as("n_pos"),
      coalesce(sum(col("neg_c")), lit(0L)).as("n_neg"),
      count(lit(1)).as("v"))
    NbModel(tc, totals)
  }

  private def classBits(c: Column, n: Column, v: Column): Column =
    length(bin(n + v)) - length(bin(coalesce(c, lit(0L)) + lit(1L)))

  /** Score every document: (doc_id, n_scored, total_bits, bpt) where
    * total_bits is the SIGNED summed log-odds margin (positive =
    * reference-like; NB keep decision = total_bits >= 0), bpt its
    * per-feature mean, both NULL for feature-less documents. Column
    * names deliberately match NgramLm's per-doc frame so the
    * band/extremes card assembly is shared.
    */
  def marginBits(docs: DataFrame, idCol: String, textCol: String,
      model: NbModel, feats: Column => Column = identity): DataFrame = {
    val af = docs
      .select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("t"))
      .select(col("doc_id"), explode(feats(col("t"))).as("feat"))
    val scored = af
      .join(broadcast(model.featCounts), Seq("feat"), "left")
      .crossJoin(broadcast(model.totals))
      .select(col("doc_id"),
        (classBits(col("neg_c"), col("n_neg"), col("v"))
          - classBits(col("pos_c"), col("n_pos"), col("v")))
          .cast("long").as("bits"))
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

  /** The collected serve artifact (the t25 codebook-at-boot
    * discipline): per-feature margins PRECOMPUTED — unlike the backoff
    * serve model, NB margins depend on nothing but the feature, so the
    * whole model collapses to one vocab-bounded map plus the constant
    * unseen-feature margin bitlen(N_neg+V) - bitlen(N_pos+V). Guarded
    * against silently collecting an unbounded table.
    */
  final case class NbServeModel(featMargin: Map[String, Int],
      unseenMargin: Int)

  def collectNbServeModel(model: NbModel,
      maxEntries: Int = 65536): NbServeModel = {
    def bitlen(x: Long) =
      math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(x))
    val t = model.totals.collect().head
    val (nPos, nNeg, v) = (t.getLong(0), t.getLong(1), t.getLong(2))
    val rows = model.featCounts.collect()
    require(rows.length <= maxEntries,
      s"collectNbServeModel: ${rows.length} features exceed the" +
        s" $maxEntries in-process bound — serve via the broadcast-join" +
        " batch path instead")
    NbServeModel(
      rows.map { r =>
        r.getString(0) ->
          ((bitlen(nNeg + v) - bitlen(r.getLong(2) + 1L))
            - (bitlen(nPos + v) - bitlen(r.getLong(1) + 1L)))
      }.toMap,
      (bitlen(nNeg + v) - 1) - (bitlen(nPos + v) - 1))
  }

  /** Per-ROW keep decision against the collected model (1 = keep,
    * 0 = reject, NULL for feature-less documents) — one map-literal
    * lookup per feature, one single-pass sum fold, no join:
    * streaming-safe anywhere a column is, row-for-row equal to
    * `marginBits.total_bits >= 0` (pinned in NgramLmSpec). `featsCol`
    * must be a MATERIALIZED feature-array column (the t28 lesson — an
    * inlined split chain would be re-evaluated inside the lambdas).
    */
  def keepLocal(serve: NbServeModel, featsCol: Column): Column = {
    val mLit = typedLit(serve.featMargin)
    val margins = transform(featsCol, f =>
      coalesce(element_at(mLit, f), lit(serve.unseenMargin)).cast("long"))
    aggregate(margins,
      struct(lit(0L).as("s"), lit(0L).as("c")),
      (acc, b) => struct((acc.getField("s") + b).as("s"),
        (acc.getField("c") + lit(1L)).as("c")),
      acc => when(acc.getField("c") > 0,
        (acc.getField("s") >= 0L).cast("long")))
  }
}
