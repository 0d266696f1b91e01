package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Byte-pair-encoding tokenizer induction — the vocabulary-training
  * workload of an LLM data pipeline (the reference pipelines feed a
  * trained tokenizer; HERE is where that tokenizer comes from).
  *
  * The 100 TB shape is the one every production BPE trainer uses: the
  * corpus collapses to a WORD-FREQUENCY table first (one wordcount
  * shuffle — the only corpus-proportional step), and all merge
  * iterations run over that table, whose size is the distinct-word
  * count, not the corpus. Each iteration is (a) one map-side-combined
  * pair-count aggregate weighted by word frequency, (b) a driver-side
  * argmax of ONE row (the algorithm's inherent sync point, exactly
  * k-means' centroid collect), (c) a per-row left-to-right merge apply
  * (a sequential `aggregate` fold — codegen'd column expression, no
  * UDF). The word table is localCheckpoint'ed each iteration so the
  * plan never grows with the merge count (the CC discipline).
  *
  * Determinism: ties on pair count break to the lexicographically
  * smallest (left, right) pair, so the merge sequence is a pure
  * function of the corpus.
  */
object Bpe {

  /** (word, freq) table of the corpus — the only corpus-sized pass. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))

  /** Split a word into single-character symbols. */
  private def charSymbols(word: Column): Column =
    // split on the empty pattern yields one element per character
    filter(split(word, ""), s => length(s) > 0)

  /** Adjacent-symbol pairs of a symbol array, as "a b" strings (space
    * cannot occur inside a symbol — tokens are whitespace-split).
    */
  private def adjacentPairs(syms: Column): Column =
    when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1),
        i => concat_ws(" ", element_at(syms, i), element_at(syms, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** Iteration-0 pair census: adjacent CHARACTER pairs across the
    * corpus vocabulary weighted by word frequency, top-k by count with
    * lexicographic tie-break — the statistic the first BPE merge
    * maximizes, and the oracle-checkable face of the trainer (the
    * iterative loop itself is not SQL-expressible; `bpeTrain`'s rank-1
    * merge must equal this census's top row, asserted in-test).
    */
  def pairCensus(docs: DataFrame, textCol: String, topK: Int = 50): DataFrame =
    wordFreq(docs, textCol)
      .select(col("freq"), explode(adjacentPairs(charSymbols(col("word"))))
        .as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("freq")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("pair"))
      .limit(topK)

  /** Apply ONE merge (a, b) -> a||b left-to-right over a symbol array:
    * a sequential fold with accumulator (out, pending-symbol) — after a
    * merge the merged token cannot immediately re-merge with the symbol
    * it just consumed (standard BPE single-pass semantics).
    */
  private def applyMerge(syms: Column, a: String, b: String): Column = {
    val zero = struct(
      array().cast("array<string>").as("out"),
      array().cast("array<string>").as("pend"))
    aggregate(
      syms,
      zero,
      (acc, s) => {
        val pend = acc.getField("pend")
        val out = acc.getField("out")
        val merged = size(pend) === 1 &&
          element_at(pend, 1) === lit(a) && s === lit(b)
        struct(
          when(merged, concat(out, array(lit(a + b))))
            .otherwise(concat(out, pend)).as("out"),
          when(merged, array().cast("array<string>"))
            .otherwise(array(s)).as("pend"))
      },
      acc => concat(acc.getField("out"), acc.getField("pend")))
  }

  /** Encode the corpus with a FROZEN merge list and report the
    * per-group fertility census (n_words, n_chars, n_tokens,
    * tokens-per-word) — the serve-time shape: at ingest the tokenizer
    * is a frozen artifact from a previous `bpeTrain` run, and fertility
    * per language/source is the statistic a multilingual budget is
    * planned around.
    *
    * Encoding applies each merge as ONE left-to-right pass in rank
    * order over a sentinel-joined symbol string ("c1<SEP>c2<SEP>...";
    * the merge (a,b) rewrites boundary-anchored "a<SEP>b<SEP>" to
    * "ab<SEP>" — anchored, because an unanchored substring match can
    * fire on the SUFFIX of a longer token ending in `a` and merge
    * across a token boundary). One pass per rank is EXACT BPE: a merge
    * never makes an earlier-rank pair newly adjacent (merging combines
    * neighbors, it cannot delete a symbol between two others), and
    * anchored left-to-right non-overlapping replacement is the
    * leftmost-first merge order — pinned by the NgramLmSpec property
    * against an iterative reference encoder over trained merge lists
    * of arbitrary depth.
    * Token count = sentinel count. Per-row string ops only — no
    * shuffle before the ≤|groups| census; the sentinel must not occur
    * in corpus text (U+0001 never does in whitespace-tokenized prose,
    * and a row that DOES carry it fails the task loudly via a guard
    * rather than silently corrupting token counts).
    *
    * PRECONDITION (validated): `merges` must be a valid BPE merge list
    * in rank order — each merge's left and right symbol is either a
    * single character or the merged output of an EARLIER rank (what
    * `bpeTrain` produces by construction). The one-pass-per-rank
    * exactness argument above holds only for such lists; an arbitrary
    * symbol pair would silently deviate from iterative BPE semantics,
    * so it is rejected here instead.
    */
  /** The encode sentinel. */
  private val sep = "\u0001"

  /** Reject a merge list that is not a valid rank-ordered BPE merge
    * sequence (see `encodeCensus`'s precondition).
    */
  private[graft] def validateMerges(merges: Seq[(String, String)]): Unit = {
    val produced = scala.collection.mutable.Set.empty[String]
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      def ok(s: String) =
        (s.nonEmpty && s.codePointCount(0, s.length) == 1) ||
          produced.contains(s)
      require(ok(a) && ok(b),
        s"encodeCensus: merge ${i + 1} ($a, $b) is not a valid BPE merge —" +
          " each side must be a single character or an earlier rank's" +
          " merged output")
      produced += (a + b)
    }
  }

  /** Sentinel-joined encoded form of one word under the frozen merge
    * list ("tok1<SEP>tok2<SEP>...<SEP>") — the per-row core of
    * `encodeCensus`, exposed so the one-pass-per-rank exactness claim
    * is property-testable against a reference iterative BPE encoder at
    * full sequence granularity (TextOpsSpec/NgramLmSpec), not just via
    * token counts. Guards: a word carrying the sentinel fails loudly.
    */
  private[graft] def encodeSyms(word: Column,
      merges: Seq[(String, String)]): Column = {
    validateMerges(merges)
    val safeWord = when(word.contains(lit(sep)),
      raise_error(concat(
        lit("encodeCensus: corpus word contains the U+0001 sentinel: "),
        word))).otherwise(word)
    val sym0 = concat(concat_ws(sep, charSymbols(safeWord)), lit(sep))
    merges.foldLeft(sym0) { case (s, (a, b)) =>
      // the match start is ANCHORED to a token boundary (string start
      // or a preceding sentinel, zero-width lookbehind): the naive
      // substring replace of "a<SEP>b<SEP>" can match the SUFFIX of a
      // longer token ending in `a` (e.g. tokens [bb, c] match "b<SEP>
      // c<SEP>" at offset 1) and merge across the boundary — a defect
      // the NgramLmSpec property over arbitrary trained merge lists
      // caught; anchored, one left-to-right non-overlapping pass per
      // rank is exactly leftmost-first BPE application of that rank
      regexp_replace(s,
        "(?<=^|" + sep + ")" + java.util.regex.Pattern.quote(a) + sep +
          java.util.regex.Pattern.quote(b) + sep,
        java.util.regex.Matcher.quoteReplacement(a + b + sep))
    }
  }

  def encodeCensus(docs: DataFrame, textCol: String, groupCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val enc = encodeSyms(col("word"), merges)
    docs.select(col(groupCol).as("grp"),
        explode(TextFunctions.tokens(col(textCol))).as("word"))
      .where(length(col("word")) > 0)
      .select(col("grp"),
        length(col("word")).cast("long").as("nc"),
        (length(enc) - length(replace(enc, lit(sep), lit(""))))
          .cast("long").as("nt"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("nc")).as("n_chars"),
        sum(col("nt")).as("n_tokens"))
      .select(col("grp"), col("n_words"), col("n_chars"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("n_words")).as("fertility"))
      .orderBy(col("grp"))
  }

  /** Train `nMerges` BPE merges over the corpus: returns the merge
    * table (rank, left, right, merged, pair_count) — rank 1 is the
    * first merge learned. Stops early if no pair occurs twice.
    */
  def bpeTrain(spark: SparkSession, docs: DataFrame, textCol: String,
      nMerges: Int = 20): DataFrame = {
    import spark.implicits._
    require(nMerges >= 1, "need nMerges>=1")
    var words = wordFreq(docs, textCol)
      .select(charSymbols(col("word")).as("syms"), col("freq"))
      .localCheckpoint(eager = true)
    val learned = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val top = words
        .select(col("freq"), explode(adjacentPairs(col("syms"))).as("pair"))
        .groupBy(col("pair"))
        .agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("pair"))
        .limit(1)
        .collect()
      top.headOption.map(r => (r.getString(0), r.getLong(1))) match {
        case Some((pair, c)) if c >= 2 =>
          val Array(a, b) = pair.split(" ", 2)
          learned += ((rank, a, b, a + b, c))
          val next = words
            .select(applyMerge(col("syms"), a, b).as("syms"), col("freq"))
            .localCheckpoint(eager = true)
          words.unpersist()
          words = next
          rank += 1
        case _ => done = true
      }
    }
    words.unpersist()
    learned.toSeq
      .toDF("rank", "left", "right", "merged", "pair_count")
      .orderBy(col("rank"))
  }
}
