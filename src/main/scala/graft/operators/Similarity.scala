package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosineSim

/** Similarity search over an embedding column (`array<float>`).
  *
  *   - `bruteForceTopK`: exact top-k via broadcast query set x corpus scan
  *     with the codegen'd cosine expression. O(|Q|*|C|) but embarrassingly
  *     parallel and shuffle-free up to the final k-row window: the right
  *     baseline, and the correct choice whenever |Q| is small.
  *   - `lshTopK`: random-hyperplane LSH (SimHash for vectors) — the scale
  *     path: each vector gets a b-bit signature; only same-bucket pairs
  *     are scored. Recall is tunable via bits; deterministic because the
  *     hyperplanes derive from a seeded hash, not RNG state.
  *
  * The next rung (IVF: k-means coarse quantizer + inverted lists) drops in
  * behind the same (queries, corpus, k) signature; LSH was chosen first
  * because it needs no training pass.
  */
object Similarity {

  private def renameQ(queries: DataFrame, idCol: String, embCol: String) =
    queries.select(col(idCol).as("q_id"), col(embCol).as("q_emb"))

  /** Exact cosine top-k of each query against the corpus (query rows are
    * broadcast; ties broken by corpus id).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, embCol: String, k: Int): DataFrame = {
    val q = renameQ(queries, idCol, embCol)
    val c = corpus.select(col(idCol).as("c_id"), col(embCol).as("c_emb"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        cosineSim(col("q_emb"), col("c_emb")).as("cos"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("q_id"), col("c_id"), col("cos"), col("rk"))
  }

  /** b-bit random-hyperplane signature per vector, as one narrow codegen'd
    * expression per row (`HyperplaneSignature`): zero shuffle, dim taken
    * from the array itself, deterministic per-row sequential FP fold.
    * (Replaces an earlier posexplode + plane-table join + two-shuffle
    * formulation — a rows x dim x bits intermediate explosion.)
    */
  def hyperplaneSignatures(spark: SparkSession, df: DataFrame,
      idCol: String, embCol: String, bits: Int = 16): DataFrame =
    df.select(col(idCol).as("v_id"),
      graft.functions.VectorFunctions.hyperplaneSig(col(embCol), bits).as("sig"))

  /** Approximate top-k: score only same-signature-bucket pairs. Queries
    * whose bucket has < k neighbours return fewer rows — the recall/cost
    * dial is `bits` (fewer bits = bigger buckets = higher recall).
    */
  def lshTopK(spark: SparkSession, queries: DataFrame, corpus: DataFrame,
      idCol: String, embCol: String, k: Int, bits: Int = 8): DataFrame = {
    val qSig = hyperplaneSignatures(spark, queries, idCol, embCol, bits)
      .select(col("v_id").as("q_id"), col("sig").as("q_sig"))
    val cSig = hyperplaneSignatures(spark, corpus, idCol, embCol, bits)
      .select(col("v_id").as("c_id"), col("sig").as("c_sig"))
    val q = renameQ(queries, idCol, embCol).join(qSig, Seq("q_id"))
    val c = corpus.select(col(idCol).as("c_id"), col(embCol).as("c_emb"))
      .join(cSig, "c_id")
    val scored = c.join(broadcast(q),
        col("q_sig") === col("c_sig") && col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        cosineSim(col("q_emb"), col("c_emb")).as("cos"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("q_id"), col("c_id"), col("cos"), col("rk"))
  }
}
