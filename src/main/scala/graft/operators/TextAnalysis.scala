package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Text analysis for training-data curation: language ID (marker-word
  * n-gram heuristic), quality scoring (length/punctuation/stopword
  * ratios), token counting (whitespace + BPE-ish regex), and rolling-hash
  * fingerprinting.
  *
  * Everything is per-row scalar column arithmetic — fully codegen'd, no
  * shuffle, trivially scalable; and every formula is mirror-expressible in
  * ANSI SQL for the DuckDB oracle (no libm transcendentals).
  */
object TextAnalysis {

  private def hits(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Marker-word counts per language. Kept deliberately simple and
    * SQL-mirrorable; a production language ID would use char n-gram
    * profiles, but the *shape* (per-row scalar scoring) is identical.
    */
  def langMarkerCounts(text: Column): Seq[(String, Column)] = Seq(
    "en" -> hits(text, "\\b(the|and|of|is)\\b"),
    "de" -> hits(text, "\\b(der|die|das|und)\\b"),
    "es" -> hits(text, "\\b(el|los|las|que)\\b"),
    "fr" -> hits(text, "\\b(le|les|et|est)\\b"))

  /** Predicted language: CJK codepoint presence wins, else the marker
    * language with the highest count (priority order en>de>es>fr on ties),
    * else 'unknown'.
    */
  def langId(text: Column): Column = {
    val counts = langMarkerCounts(text).toMap
    val (en, de, es, fr) = (counts("en"), counts("de"), counts("es"), counts("fr"))
    when(text.rlike("[\\x{4e00}-\\x{9fff}]"), "zh")
      .when(en > 0 && en >= de && en >= es && en >= fr, "en")
      .when(de > 0 && de >= es && de >= fr, "de")
      .when(es > 0 && es >= fr, "es")
      .when(fr > 0, "fr")
      .otherwise("unknown")
  }

  /** Quality features + a composite score in [0, ~1.5] (pure +,*,/ — no
    * transcendentals, oracle-exact).
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val nTokens = size(TextFunctions.tokens(t))
    val nChars = length(t)
    val noSpace = length(regexp_replace(t, " ", ""))
    val punct = nChars - length(regexp_replace(t, "[.,;:!?]", ""))
    val stop = hits(t, "\\b(the|a|of|and|is)\\b")
    df.withColumn("n_tokens", nTokens)
      .withColumn("n_chars_m", nChars)
      .withColumn("avg_token_len", noSpace.cast("double") / nTokens)
      .withColumn("punct_ratio", punct.cast("double") / nChars)
      .withColumn("stopword_ratio", stop.cast("double") / nTokens)
      .withColumn("quality_score",
        (lit(1.0) - col("punct_ratio")) *
          (lit(0.5) + col("stopword_ratio")) *
          when(nTokens >= 5, lit(1.0)).otherwise(lit(0.25)))
  }

  /** Whitespace vs BPE-ish regex token counts (letter runs, digit runs,
    * single punctuation — the usual pre-tokenizer split shape).
    */
  def tokenStats(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("ws_tokens", size(TextFunctions.tokens(t)))
      .withColumn("bpe_tokens",
        size(regexp_extract_all(lower(t), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))))
      .withColumn("n_chars_m", length(t))
      .withColumn("n_bytes", octet_length(t))
  }

  /** Rolling-hash document fingerprint (codegen'd Catalyst expression). */
  def fingerprint(text: Column): Column = TextFunctions.rollingHash(text)

  /** Per-document salient terms: top-k tokens by a TF-IDF-style score
    * tf * N / df. The idf is the RATIONAL N/df rather than ln(N/df) so the
    * score stays inside the oracle determinism contract (no libm); a
    * production deployment can swap `ln` in — the plan shape (and the
    * [doc, token]-grouped ranking) is identical.
    *
    * 100 TB shape: tokens explode narrowly; tf is one (doc, token) hash
    * aggregate; df re-aggregates tf's (already-deduplicated) output by
    * token — no second pass over raw tokens; N is a metadata-served count;
    * the tf-df equi-join shuffles on token (a skewed-key candidate —
    * `Skew.saltedJoin` is the lever if one stopword dominates); the final
    * per-doc top-k is a bounded window.
    */
  /** Boilerplate scrub for curation: strip URLs and emails, collapse
    * whitespace runs, trim. Per-row regexp_replace chain — codegen'd,
    * shuffle-free, and each pattern is ANSI-regex so the oracle replays
    * it verbatim. Production pipelines append their own patterns; the
    * chain shape (and cost: one pass per pattern) is the real content.
    */
  def cleanText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(text, "https?://\\S+", ""),
        "\\S+@\\S+", ""),
      "\\s+", " "))

  /** Deterministic content-hash train/val/test split plus mixture
    * sampling — the reproducibility workhorses of a training-data
    * pipeline: the assignment depends only on the DOCUMENT CONTENT
    * (rolling-hash fingerprint), so re-runs, re-shards, and re-ingests
    * land every document in the same split, and near-dup copies of a
    * leaked eval document land in the same split as the original.
    * `keepRate` (percent, 0-100) is evaluated per row — pass a CASE over
    * the source column for mixture weighting. Split uses fp%100, the
    * keep decision (fp/100)%100 — decorrelated hash windows. Per-row
    * arithmetic only: shuffle-free, codegen'd, oracle-exact.
    */
  def hashSplit(docs: DataFrame, idCol: String, textCol: String,
      trainPct: Int, valPct: Int, keepRate: Column): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      "split percentages must fit in [0, 100]")
    docs.select(col(idCol).as("doc_id"),
        TextFunctions.rollingHash(col(textCol)).as("__fp"),
        keepRate.as("__rate"))
      .select(col("doc_id"),
        when(col("__fp") % 100 < trainPct, "train")
          .when(col("__fp") % 100 < trainPct + valPct, "val")
          .otherwise("test").as("split"),
        (expr("__fp div 100") % 100 < col("__rate")).as("kept"))
  }

  /** Fixed token-window chunking with overlap (context-window packing
    * prep): chunk i covers tokens [i*stride, i*stride+window); starts
    * enumerate while start < n_tokens. One narrow generate per row — no
    * shuffle; emits (doc_id, n_tok, start_tok, chunk_idx, chunk_tokens).
    */
  def chunkWindows(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 32, stride: Int = 24): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window")
    docs.select(col(idCol).as("doc_id"),
        size(TextFunctions.tokens(col(textCol))).cast("long").as("n_tok"))
      .where(col("n_tok") > 0)
      .select(col("doc_id"), col("n_tok"),
        explode(sequence(lit(0L), col("n_tok") - 1, lit(stride.toLong)))
          .as("start_tok"))
      .select(col("doc_id"), col("n_tok"), col("start_tok"),
        expr(s"start_tok div $stride").as("chunk_idx"),
        least(lit(window.toLong), col("n_tok") - col("start_tok"))
          .as("chunk_tokens"))
  }

  def tfIdfTopK(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
    val tf = tok.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val scored = tf.join(dfreq, "tok").crossJoin(n)
      .select(col("doc_id"), col("tok"), col("tf"), col("df"),
        (col("tf").cast("double") * col("__n") / col("df")).as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("tok"))
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
  }
}
