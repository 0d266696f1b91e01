package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Application-scoped cache of the embedding-dedup family's shared
  * builds — the AnnIndexStore/NbModelStore/MixtureModelStore
  * standing-artifact discipline applied to the SemDeDup stack: the
  * exact cosine pair set at the canonical 0.4 threshold (l05's output,
  * and the gate baseline of l30/l61/l62/l99) and the semantic pair set
  * + its connected-component labels (l61/l62/l99) are each computed
  * ONCE per application instead of five queries rebuilding identical
  * frames. In a production pipeline these ARE standing tables — the
  * dedup ledger written by the corpus build and read by every
  * downstream curation job.
  *
  * Canonical registry parameterization (hardcoded so consumers cannot
  * silently desync): the `embeddings` table's vec_id/embedding columns,
  * cosine threshold 0.4, 8 clusters x 1 Lloyd round x 3 probes.
  *
  * The exact pair computation is per-row deterministic (sequential-fold
  * cosine, no shuffled aggregation), so l05's hash-checked output is
  * unchanged by the reuse; the semantic side is recall-gated by
  * contract (centroid training means are shuffled doubles).
  */
object SemDedupStore {

  /** Canonical cosine threshold of the dedup family. */
  val Threshold = 0.4

  private final case class Key(appId: String, dir: String)

  private val exactCache =
    scala.collection.mutable.Map.empty[Key, DataFrame]
  private val semPairsCache =
    scala.collection.mutable.Map.empty[Key, DataFrame]
  private val semLblCache =
    scala.collection.mutable.Map.empty[Key, DataFrame]

  private def keyFor(s: SparkSession, dir: String): Key = {
    val key = Key(s.sparkContext.applicationId,
      new java.io.File(dir).getCanonicalPath)
    exactCache.filterInPlace((k, _) => k.appId == key.appId)
    semPairsCache.filterInPlace((k, _) => k.appId == key.appId)
    semLblCache.filterInPlace((k, _) => k.appId == key.appId)
    key
  }

  /** The exact all-pairs cosine set at the canonical threshold. */
  def sharedExactPairs(s: SparkSession, dir: String): DataFrame =
    synchronized {
      exactCache.getOrElseUpdate(keyFor(s, dir), StoreBuildLedger.timed("semdedup_exact") {
        val e = Tables.load(s, dir, "embeddings")
        Similarity.exactCosinePairs(e, "vec_id", "embedding", Threshold)
          .localCheckpoint(eager = true)
      })
    }

  /** The cluster-bounded semantic pair set (SemDeDup candidates,
    * exact-verified).
    */
  def sharedSemPairs(s: SparkSession, dir: String): DataFrame =
    synchronized {
      semPairsCache.getOrElseUpdate(keyFor(s, dir), StoreBuildLedger.timed("semdedup_pairs") {
        val e = Tables.load(s, dir, "embeddings")
        Similarity.semanticDedupPairs(e, "vec_id", "embedding", Threshold,
            nClusters = 8, trainIters = 1, probes = 3)
          .localCheckpoint(eager = true)
      })
    }

  /** Connected-component labels over the shared semantic pairs —
    * (doc_id, cluster_id), the keeper/dropped ledger.
    */
  def sharedSemLabels(s: SparkSession, dir: String): DataFrame =
    synchronized {
      // resolve the pair store outside the timed body (its build
      // seconds belong to semdedup_pairs' ledger key)
      val pairs = sharedSemPairs(s, dir)
      semLblCache.getOrElseUpdate(keyFor(s, dir),
        StoreBuildLedger.timed("semdedup_labels") {
          Dedup.components(pairs).localCheckpoint(eager = true)
        })
    }
}
