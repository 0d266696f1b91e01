package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DSIR-style data selection with importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): score
  * every raw document by how much likelier its text is under a TARGET
  * distribution than under the RAW pool — both modeled as hashed n-gram
  * (word-bigram) bag models, the fixed-size trick that makes the method
  * corpus-scale — then sample documents with probability proportional to
  * the exponentiated importance weight. Sits between l78's linear
  * probability-difference domain scorer (same hashed buckets, no
  * resampling) and l67's temperature resampler (sampling executor, no
  * per-document score): DSIR is the per-document importance model AND the
  * sampling step in one operator.
  *
  * Determinism (the l47/l83/l90 no-libm contract), two quantizations:
  *   - The importance weight log p_T(doc) - log p_R(doc) is the sum over
  *     the doc's hashed-bigram occurrences of the INTEGER-QUANTIZED
  *     log-ratio  [bitlen(N_R+B) - bitlen(c_R+1)] - [bitlen(N_T+B) -
  *     bitlen(c_T+1)]  (add-one smoothing over the B-bucket vocabulary;
  *     `length(bin(x))` on both engines) — pure BIGINT, hash-exact.
  *   - The resampling acceptance exp(weight) is EXACT at base 2: accept
  *     with probability min(1, 2^(bits - threshold)), realized as a
  *     content-hash basis-point window (the l67 idiom: (fp div 100) %
  *     10000) compared against rate = 10000 >> (threshold - bits) — an
  *     integer shift, so the exponential tilt costs no transcendental
  *     call and re-runs keep exactly the same documents. Docs at or
  *     above the threshold are kept surely; every bit below halves the
  *     keep probability; 14+ bits below (10000 >> 14 = 0) are never
  *     kept. Featureless or NULL-text docs score 0 bits / are never
  *     kept, on both engines.
  *
  * 100 TB shape: the hashed-bucket frame is localCheckpoint'ed and feeds
  * the count aggregate AND the scoring join (the l78 one-scan
  * discipline); the importance table is <= `buckets` rows (the point of
  * hashing — model size is B, not vocabulary) and broadcasts; per-doc
  * scoring is one map-side-combined sum; acceptance is per-row
  * arithmetic; the ledger is O(sources). In production the importance
  * table is trained once against the target slice, persisted, and either
  * broadcast-joined per batch or collected at serve start (t35's
  * stream face via `collectImportance`/`acceptLocal` — the t25
  * codebook-at-boot discipline).
  */
object Dsir {

  /** Hashed word-bigram bucket frame: (doc_id, is_t, bkt), one row per
    * bigram OCCURRENCE (DSIR's bag-of-ngrams uses multiplicities).
    * Checkpointed by callers that consume it twice.
    */
  private[graft] def bucketFrame(docs: DataFrame, idCol: String,
      textCol: String, targetPred: Column, buckets: Int): DataFrame =
    docs
      .where(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol).as("doc_id"),
        when(targetPred, 1L).otherwise(0L).as("is_t"),
        TextFunctions.tokens(col(textCol)).as("t"))
      .select(col("doc_id"), col("is_t"),
        explode(NbClassifier.bigramFeats(col("t"))).as("g"))
      .select(col("doc_id"), col("is_t"),
        pmod(TextFunctions.rollingHash(col("g")), lit(buckets.toLong))
          .as("bkt"))

  private def bitlen(x: Column): Column = length(bin(x)).cast("long")

  /** Per-bucket importance table (bkt, imp) from a bucket frame —
    * imp = quantized log2 [p_target(bkt) / p_raw(bkt)], add-one smoothed
    * over the B-bucket vocabulary. The totals row is DERIVED from the
    * count table (never a second corpus pass) and attached as a one-row
    * broadcast (the l78 scalar-attach shape).
    */
  private def importanceOf(bucketed: DataFrame, buckets: Int): DataFrame =
    importanceFromCounts(bucketCountsOf(bucketed), buckets)

  /** The per-bucket class-count table (bkt, ct, cr) — DSIR's trained
    * state in its MERGEABLE form: counts over disjoint document sets
    * are additive, so an appended batch's counts groupBy-sum onto a
    * persisted base table and the importance values recompute exactly
    * (the l133 incremental face; the l132 LM discipline).
    */
  private[graft] def bucketCountsOf(bucketed: DataFrame): DataFrame =
    bucketed.groupBy(col("bkt"))
      .agg(sum(col("is_t")).as("ct"), count(lit(1)).as("cr"))

  /** The importance projection from an already-aggregated count table
    * — totals DERIVED from the counts (never a second corpus pass),
    * attached as a one-row broadcast.
    */
  def importanceFromCounts(tc: DataFrame, buckets: Int): DataFrame = {
    val tot = tc.agg(coalesce(sum(col("ct")), lit(0L)).as("nt"),
      coalesce(sum(col("cr")), lit(0L)).as("nr"))
    val b = lit(buckets.toLong)
    tc.crossJoin(broadcast(tot))
      .select(col("bkt"),
        ((bitlen(col("nr") + b) - bitlen(col("cr") + 1L))
          - (bitlen(col("nt") + b) - bitlen(col("ct") + 1L))).as("imp"))
  }

  /** The frozen artifact alone — (bkt, imp), <= `buckets` rows — for a
    * standing pipeline that trains once and serves many batches.
    */
  def importanceTable(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int = 4096): DataFrame = {
    require(buckets > 0, "need buckets>0")
    importanceOf(
      bucketFrame(docs, idCol, textCol, targetPred, buckets), buckets)
  }

  /** `importanceTable` over a pretrained (store-shared) bucket frame —
    * the one training aggregate, runnable once and PERSISTED (l110's
    * build half).
    */
  def importanceTableFrom(bucketed: DataFrame, buckets: Int): DataFrame = {
    require(buckets > 0, "need buckets>0")
    importanceOf(bucketed, buckets)
  }

  /** Per-doc importance frame (doc_id, source, imp, win): coalesced
    * summed importance bits plus the content-hash basis-point window.
    * One checkpointed bucket scan feeds the count aggregate and the
    * scoring join.
    */
  private[graft] def perDocImp(docs: DataFrame, idCol: String,
      textCol: String, groupCol: String, targetPred: Column,
      buckets: Int): DataFrame =
    perDocImpFrom(docs, idCol, textCol, groupCol,
      bucketFrame(docs, idCol, textCol, targetPred, buckets)
        .localCheckpoint(eager = false), buckets)

  /** `perDocImp` over a pretrained (typically store-shared, already
    * checkpointed) bucket frame.
    */
  private[graft] def perDocImpFrom(docs: DataFrame, idCol: String,
      textCol: String, groupCol: String, bucketed: DataFrame,
      buckets: Int): DataFrame =
    perDocImpFromTable(docs, idCol, textCol, groupCol, bucketed,
      importanceOf(bucketed, buckets))

  /** The serve half alone: per-doc importance against a FROZEN (bkt,
    * imp) table (typically read back from a persisted artifact — the
    * plan contains no training aggregate at all; the bucket frame is
    * scoring input, re-derived or store-shared per batch).
    */
  private[graft] def perDocImpFromTable(docs: DataFrame, idCol: String,
      textCol: String, groupCol: String, bucketed: DataFrame,
      w: DataFrame): DataFrame = {
    val perDoc = bucketed.join(broadcast(w), Seq("bkt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("imp")).as("imp_sum"))
    docs
      .select(col(idCol).as("doc_id"), col(groupCol).as("source"),
        TextFunctions.rollingHash(col(textCol)).as("__fp"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("imp_sum"), lit(0L)).as("imp"),
        (expr("__fp div 100") % 10000L).as("win"))
  }

  /** The acceptance rate (basis points) for a doc `imp` bits against
    * threshold `thr`: min(1, 2^(imp - thr)) — integer shifts only.
    */
  private def rateBp(imp: Column, thr: Column): Column =
    when(imp >= thr, lit(10000L))
      .when(imp <= thr - 14L, lit(0L))
      .otherwise(call_function("shiftright", lit(10000L),
        (thr - imp).cast("int")))

  /** Train-and-select in one pass: per-source ledger (source, n_docs,
    * n_selected, sel_bits) of the importance-resampled corpus —
    * `sel_bits` the summed importance of the selected docs, the
    * mixture-shift evidence (selection pulls each source toward its
    * target-like documents).
    *
    * The full-acceptance threshold is the CORPUS MEAN importance plus
    * `offsetBits` — self-normalizing across corpus sizes (absolute
    * importance drifts with scale: a small target slice makes
    * target-unseen buckets, and so every score, more negative under
    * add-one smoothing; the mean moves with it). Docs at or above the
    * threshold are kept surely; every bit below halves the keep
    * probability. The mean is floor(sum/n) computed as
    * (sum - pmod(sum, n)) div n — `div` truncates toward zero on Spark
    * but `//` floors on DuckDB, so the oracle-shared form subtracts the
    * non-negative pmod first, making the division exact on both.
    */
  /** Per-doc acceptance frame (doc_id, source, imp, acc): the scored
    * frame with the mean-anchored threshold applied — the selection
    * decision BEFORE the ledger aggregate, for consumers that compose
    * per-document decisions (l98's selector-agreement census).
    */
  private[graft] def perDocAccept(docs: DataFrame, idCol: String,
      textCol: String, groupCol: String, targetPred: Column,
      buckets: Int = 4096, offsetBits: Long = 0L): DataFrame = {
    require(buckets > 0, "need buckets>0")
    perDocAcceptFrom(docs, idCol, textCol, groupCol,
      bucketFrame(docs, idCol, textCol, targetPred, buckets)
        .localCheckpoint(eager = false), buckets, offsetBits)
  }

  /** `perDocAccept` over a pretrained (store-shared) bucket frame. */
  private[graft] def perDocAcceptFrom(docs: DataFrame, idCol: String,
      textCol: String, groupCol: String, bucketed: DataFrame,
      buckets: Int = 4096, offsetBits: Long = 0L): DataFrame =
    perDocAcceptFromTable(docs, idCol, textCol, groupCol, bucketed,
      importanceOf(bucketed, buckets), offsetBits)

  /** `perDocAccept` against a FROZEN importance table (the persisted-
    * artifact serve face — no training aggregate in the plan).
    */
  private[graft] def perDocAcceptFromTable(docs: DataFrame, idCol: String,
      textCol: String, groupCol: String, bucketed: DataFrame,
      w: DataFrame, offsetBits: Long = 0L): DataFrame = {
    // the per-doc frame feeds the threshold aggregate AND the acceptance
    // pass — checkpoint it (narrow: source, imp, win) or the whole
    // scoring subtree, importance build included, runs twice
    val scored = perDocImpFromTable(docs, idCol, textCol, groupCol,
      bucketed, w).localCheckpoint(eager = false)
    val thr = scored
      .agg(sum(col("imp")).as("s"), count(lit(1)).as("n"))
      .select((expr("(s - pmod(s, n)) div n") + offsetBits).as("thr"))
    scored.crossJoin(broadcast(thr))
      .withColumn("acc", col("win") < rateBp(col("imp"), col("thr")))
  }

  def dsirResample(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, targetPred: Column, buckets: Int = 4096,
      offsetBits: Long = 0L): DataFrame =
    ledgerOf(perDocAccept(docs, idCol, textCol, groupCol, targetPred,
      buckets, offsetBits))

  /** `dsirResample` over a pretrained (store-shared) bucket frame. */
  def dsirResampleFrom(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, bucketed: DataFrame, buckets: Int = 4096,
      offsetBits: Long = 0L): DataFrame =
    ledgerOf(perDocAcceptFrom(docs, idCol, textCol, groupCol, bucketed,
      buckets, offsetBits))

  /** `dsirResample` against a FROZEN (bkt, imp) table — the l110
    * persisted-artifact serve: the plan trains nothing, the importance
    * weights come off disk.
    */
  def dsirResampleFromTable(docs: DataFrame, idCol: String,
      textCol: String, groupCol: String, bucketed: DataFrame,
      w: DataFrame, offsetBits: Long = 0L): DataFrame =
    ledgerOf(perDocAcceptFromTable(docs, idCol, textCol, groupCol,
      bucketed, w, offsetBits))

  private def ledgerOf(accepted: DataFrame): DataFrame =
    accepted
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("acc"), 1)).as("n_selected"),
        coalesce(sum(when(col("acc"), col("imp"))), lit(0L)).as("sel_bits"))

  /** The collected serve artifact (the t25 codebook-at-boot discipline):
    * the <= `buckets`-row importance table as one in-process map plus the
    * constant unseen-bucket importance bitlen(N_R+B) - bitlen(N_T+B)
    * (both class counts zero under add-one smoothing — reachable only
    * for a bucket no training bigram hashed to).
    */
  final case class DsirServeModel(bucketImp: Map[Long, Int],
      unseenImp: Int, buckets: Int, threshold: Long)

  /** Trains the model AND resolves the mean-anchored threshold (one
    * extra corpus-scoring pass at train time — the serve path itself
    * never touches the corpus again).
    */
  def collectDsirServeModel(docs: DataFrame, idCol: String,
      textCol: String, targetPred: Column, buckets: Int = 4096,
      offsetBits: Long = 0L): DsirServeModel =
    collectDsirServeModelFrom(docs, idCol, textCol,
      bucketFrame(docs, idCol, textCol, targetPred, buckets)
        .localCheckpoint(eager = false), buckets, offsetBits)

  /** `collectDsirServeModel` over a pretrained (store-shared) bucket
    * frame — train/threshold passes read the standing frame only.
    */
  def collectDsirServeModelFrom(docs: DataFrame, idCol: String,
      textCol: String, bucketed: DataFrame, buckets: Int = 4096,
      offsetBits: Long = 0L): DsirServeModel = {
    val tot = bucketed.agg(
      coalesce(sum(col("is_t")), lit(0L)).as("nt"),
      count(lit(1)).as("nr")).collect().head
    val (nt, nr) = (tot.getLong(0), tot.getLong(1))
    def bl(x: Long) =
      math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(x))
    val rows = importanceOf(bucketed, buckets).collect()
    val thr = perDocImpFrom(docs, idCol, textCol, idCol, bucketed, buckets)
      .agg(sum(col("imp")).as("s"), count(lit(1)).as("n"))
      .select(expr("(s - pmod(s, n)) div n").as("thr"))
      .collect().head.getLong(0) + offsetBits
    DsirServeModel(
      rows.map(r => r.getLong(0) -> r.getLong(1).toInt).toMap,
      bl(nr + buckets) - bl(nt + buckets), buckets, thr)
  }

  /** Per-ROW accept decision against the collected model (1 = selected,
    * 0 = not; 0 for featureless/NULL-text rows) — map-literal lookups
    * plus one single-pass fold, no join: streaming-safe anywhere a
    * column is, row-for-row equal to the batch acceptance. `toksCol`
    * must be a MATERIALIZED token-array column (the t28 lesson).
    */
  def acceptLocal(serve: DsirServeModel, toksCol: Column,
      fpCol: Column): Column = {
    val mLit = typedLit(serve.bucketImp)
    val imps = transform(NbClassifier.bigramFeats(toksCol), g =>
      coalesce(
        element_at(mLit,
          pmod(TextFunctions.rollingHash(g), lit(serve.buckets.toLong))),
        lit(serve.unseenImp)).cast("long"))
    val impSum = coalesce(
      aggregate(imps, lit(0L), (acc, x) => acc + x), lit(0L))
    val rate = when(impSum >= serve.threshold, lit(10000L))
      .when(impSum <= serve.threshold - 14L, lit(0L))
      .otherwise(call_function("shiftright", lit(10000L),
        (lit(serve.threshold) - impSum).cast("int")))
    // fp < 1e9+7 so fp/100.0 is floor-exact in double (correctly-rounded
    // division of sub-2^53 integers can't cross an integer boundary) —
    // the Column-only equivalent of the batch path's `__fp div 100`
    val win = pmod(floor(fpCol.cast("double") / 100.0).cast("long"),
      lit(10000L))
    when(fpCol.isNull, lit(0L)).otherwise((win < rate).cast("long"))
  }
}
