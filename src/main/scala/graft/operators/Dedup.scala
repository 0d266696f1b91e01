package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.shingles

/** Document deduplication for LLM-training-data pipelines, in increasing
  * sophistication: exact (hash group-by), exact set-similarity (shingle
  * self-join), MinHash+LSH (the 100 TB path), and SimHash (bit-sketch).
  *
  * Scale stances:
  *   - exact dedup is a single hash aggregate on the text (or a text
  *     digest) — one shuffle, map-side combined.
  *   - `jaccardPairs` is exact but its shingle self-join can explode on
  *     hot shingles; it is the *oracle/verification* path. At scale, cap
  *     shingle document-frequency (drop shingles appearing in > df_max
  *     docs — they carry no dedup signal) or go through `minhashLshPairs`.
  *   - `minhashLshPairs` is the scale path: signatures are one aggregate
  *     over exploded shingles; banding turns all-pairs into an equi-join
  *     on (band, bandHash); only LSH *candidates* pay the exact-verify
  *     cost. With 32 bands x 6 rows the S-curve passes j>=0.8 pairs with
  *     P(miss) < 1e-5 and admits j<=0.3 noise at ~2%.
  */
object Dedup {

  /** Exact dedup: one keeper (min id) per identical text + group size. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))

  /** (id, shingle-set) pairs; documents shorter than k tokens get an
    * empty set and never pair.
    */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame =
    docs.select(col(idCol).as("doc_id"), shingles(col(textCol), k).as("sh"))

  /** Exact shingle-Jaccard near-dup pairs (a_id < b_id, jac >= threshold).
    * inter/union arithmetic in exact integers; the division is one IEEE op.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 3): DataFrame = {
    val sets = shingleSets(docs, idCol, textCol, k)
    val sizes = sets.select(col("doc_id"), size(col("sh")).as("n"))
    val exA = sets.select(col("doc_id").as("a_id"), explode(col("sh")).as("g"))
    val exB = exA.select(col("a_id").as("b_id"), col("g").as("g2"))
    val inter = exA.join(exB, col("g") === col("g2") && col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), "b_id")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** MinHash signatures: perm p of doc d = min over d's shingles of
    * xxhash64(shingle, p). One codegen'd aggregate over the exploded
    * shingles — numPerms min-columns, map-side combined.
    */
  def minhashSignatures(sets: DataFrame, numPerms: Int): DataFrame = {
    val ex = sets.select(col("doc_id"), explode(col("sh")).as("g"))
    val mins = (0 until numPerms).map(p =>
      min(xxhash64(col("g"), lit(p))).as(s"h$p"))
    ex.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** LSH candidate pairs -> exact-Jaccard verification >= threshold.
    * Output is identical to `jaccardPairs` up to the (tiny, tunable)
    * LSH miss probability.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, numPerms: Int = 192, bands: Int = 32,
      k: Int = 3): DataFrame = {
    require(numPerms % bands == 0, "bands must divide numPerms")
    val rows = numPerms / bands
    val sets = shingleSets(docs, idCol, textCol, k)
    val sig = minhashSignatures(sets, numPerms)

    // One hash per band over its `rows` signature slots; the band index
    // is folded into the hash via a distinct seed column.
    val bandStructs = (0 until bands).map { b =>
      val slot = (b * rows until (b + 1) * rows).map(p => col(s"h$p"))
      struct(lit(b).as("band"), xxhash64(slot :+ lit(10000 + b): _*).as("bh"))
    }
    val bandTab = sig
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))

    val candB = bandTab.select(col("doc_id").as("b_id"),
      col("band").as("band2"), col("bh").as("bh2"))
    val candidates = bandTab
      .join(candB, col("band") === col("band2") && col("bh") === col("bh2") &&
        col("doc_id") < col("b_id"))
      .select(col("doc_id").as("a_id"), col("b_id"))
      .distinct()

    // Exact verification of candidates only (array_intersect on the
    // distinct shingle sets).
    val verified = candidates
      .join(sets.select(col("doc_id").as("a_id"), col("sh").as("sh_a")), "a_id")
      .join(sets.select(col("doc_id").as("b_id"), col("sh").as("sh_b")), "b_id")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .where(col("jaccard") >= threshold)
    verified.select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** 64-bit SimHash over distinct word k-shingles: per bit, sum +-1
    * votes of the shingle hashes; bit = 1 iff the vote is positive.
    * Shingles, not unigrams: on a small vocabulary every document's
    * distinct-token set converges to the whole vocabulary and token-level
    * SimHash collides everywhere; k-shingles keep the feature space wide.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(shingles(col(textCol), k)).as("tok"))
      .withColumn("hv", xxhash64(col("tok")))
    val votes = (0 until 64).map(b =>
      sum(when(shiftright(col("hv"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"v$b"))
    val agg = tok.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    agg.select(col("doc_id"),
      (0 until 64).map(b =>
        when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming, banded
    * into four 16-bit chunks (a pair within distance 3 shares at least
    * one exact chunk — pigeonhole), so all-pairs becomes an equi-join.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sh = simhash(docs, idCol, textCol)
    val chunks = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("c"),
          shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))
            .as("v"))): _*)).as("ch"))
      .select(col("doc_id"), col("simhash"),
        col("ch.c").as("c"), col("ch.v").as("v"))
    val right = chunks.select(col("doc_id").as("b_id"),
      col("simhash").as("simhash_b"), col("c").as("c2"), col("v").as("v2"))
    chunks
      .join(right, col("c") === col("c2") && col("v") === col("v2") &&
        col("doc_id") < col("b_id"))
      .select(col("doc_id").as("a_id"), col("b_id"),
        bit_count(col("simhash").bitwiseXOR(col("simhash_b"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
