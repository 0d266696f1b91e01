package graft.operators

import org.apache.spark.sql.SparkSession

import graft.Tables

/** Application-scoped cache of the per-source deflate preset
  * dictionaries (the standing-artifact discipline for the dictionary
  * tier): the hot-passage census is a training job shared by the
  * batch census (l126), its oracle-checked gate twin (l127) and the
  * streaming face (t48) — train once per (application, corpus),
  * ledger under `deflate_dicts`. The artifact is a driver-side map
  * (sources x <= 32 KiB), the boot-artifact shape.
  *
  * Canonical registry parameterization: documents' doc_id/text/source,
  * k=6 grams, 64 grams per source, 32 KiB clamp.
  */
object DeflateDictStore {

  private final case class Key(appId: String, dir: String)

  private val cache =
    scala.collection.mutable.Map.empty[Key, Map[String, Array[Byte]]]

  def sharedDicts(s: SparkSession, dir: String): Map[String, Array[Byte]] =
    synchronized {
      val key = Key(s.sparkContext.applicationId,
        new java.io.File(dir).getCanonicalPath)
      cache.filterInPlace((k, _) => k.appId == key.appId)
      cache.getOrElseUpdate(key, StoreBuildLedger.timed("deflate_dicts") {
        TextAnalysis.trainDeflateDicts(
          Tables.load(s, dir, "documents"), "doc_id", "text", "source")
      })
    }
}
