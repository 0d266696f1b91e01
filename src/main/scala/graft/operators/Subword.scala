package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Unigram-LM subword segmentation (public recipe: Kudo 2018,
  * "Subword Regularization: Improving Neural Network Translation Models
  * with Multiple Subword Candidates", arXiv:1804.10959 — the
  * SentencePiece unigram tokenizer): a piece VOCABULARY with unigram
  * scores, and per-word VITERBI decoding to the minimum-cost
  * segmentation. This implements the seed-vocabulary stage (frequent
  * substrings + all single characters, the paper's initialization) and
  * the exact Viterbi INFERENCE step — what a serving tokenizer runs on
  * every document; iterative EM vocabulary pruning is the training
  * refinement the BPE family (l79/l80) already covers for merges.
  *
  * Exactness: piece scores are the l83 bitlen-quantized surprisal
  * (bits = bitlen(total) - bitlen(count), pure BIGINT), the DP
  * minimizes (cost, n_pieces) lexicographically with every candidate
  * split enumerable, so segment counts and costs are hash-exact
  * against an oracle that replays the same vocabulary and DP.
  *
  * 100 TB shape: the only corpus-sized aggregates are the distinct-WORD
  * count table (the l79 wordcount discipline — everything downstream is
  * per distinct word, weighted by count) and the piece census derived
  * from it; the selected vocabulary is top-K + alphabet, collected once
  * and baked into the per-word DP as a literal map; the DP itself is
  * O(len * maxPieceLen) per distinct word.
  */
object Subword {

  /** Piece-length ceiling of the seed vocabulary. */
  val MaxPieceLen = 6

  /** The weighted substring census over the distinct-word table:
    * (piece, cnt) where cnt counts occurrences across the corpus
    * (word count x positions inside the word), for pieces of length
    * 1..MaxPieceLen.
    */
  def pieceCensus(wordCounts: DataFrame): DataFrame = {
    val subs = flatten(transform(
      sequence(lit(1), length(col("w"))),
      i => transform(
        sequence(lit(1), least(lit(MaxPieceLen),
          length(col("w")) - i + lit(1))),
        l => col("w").substr(i, l))))
    wordCounts
      .select(col("wc"), explode(subs).as("piece"))
      .groupBy(col("piece"))
      .agg(sum(col("wc")).as("cnt"))
  }

  /** The seed vocabulary: ALL single characters (so every word stays
    * segmentable) plus the top-K multi-character pieces by
    * (cnt desc, piece asc) — deterministic at the boundary. Returns
    * (piece, cnt).
    */
  def seedVocab(census: DataFrame, topK: Int): DataFrame = {
    val chars = census.where(length(col("piece")) === 1)
    val multi = census.where(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece"))
      .limit(topK)
    chars.unionByName(multi)
  }

  /** Collected serve artifact: piece -> quantized cost bits
    * (bitlen(total) - bitlen(cnt), total = mass of the SELECTED
    * vocabulary — the renormalize-over-vocab step of unigram pruning).
    * Bounded by construction: topK + alphabet entries.
    */
  def collectCosts(vocab: DataFrame): Map[String, Long] = {
    val rows = vocab.collect().map(r => r.getString(0) -> r.getLong(1))
    val total = rows.iterator.map(_._2).sum
    def bitlen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    rows.iterator
      .map { case (p, c) => p -> (bitlen(total) - bitlen(c)) }
      .toMap
  }

  /** Exact Viterbi segmentation of one word column against the frozen
    * cost map: dp(i) = min over piece lengths l of dp(i-l) +
    * cost(word[i-l+1 .. i]), minimum taken lexicographically over
    * (cost, n_pieces) structs. Returns a struct column with fields
    * `c` (total bits) and `np` (piece count). Pieces absent from the
    * vocabulary cost an unreachable sentinel; single characters are
    * always present, so every in-alphabet word decodes. Per-row fold
    * arithmetic over a literal map — stateless and streaming-safe.
    */
  def viterbiExpr(costs: Map[String, Long], word: Column): Column = {
    require(costs.nonEmpty, "empty piece vocabulary")
    val mapLit = typedLit(costs)
    val big = lit(1000000000L)
    val dp = aggregate(
      sequence(lit(1), length(word)),
      array(struct(lit(0L).as("c"), lit(0L).as("np"))),
      (acc, i) => concat(acc, array(
        array_min(transform(
          sequence(lit(1), least(lit(MaxPieceLen), i)),
          l => struct(
            (element_at(acc, (i - l + lit(1)).cast("int")).getField("c")
              + coalesce(element_at(mapLit,
                  word.substr(i - l + lit(1), l)), big)).as("c"),
            (element_at(acc, (i - l + lit(1)).cast("int")).getField("np")
              + lit(1L)).as("np")))))),
      acc => element_at(acc, -1))
    when(length(word) > 0, dp)
      .otherwise(struct(lit(0L).as("c"), lit(0L).as("np")))
  }
}
