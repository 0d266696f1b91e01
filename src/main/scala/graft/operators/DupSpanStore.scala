package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Application-scoped cache of the exact maximal-dup-span frame (the
  * MixtureModelStore discipline applied to the substring-dedup tier):
  * the ladder+descent machine (Dedup.maximalDupSpans) is a training-
  * grade job whose output both the per-position report (l124) and the
  * per-doc census (l125) consume — run it once per (application,
  * corpus), checkpoint the spans (duplicated-start-bounded), ledger
  * the build under `dup_spans`.
  *
  * Canonical registry parameterization: the documents table's
  * doc_id/text, minLen 6, minDocs 2 (l77's thresholds, uncapped).
  */
object DupSpanStore {

  private final case class Key(appId: String, dir: String)

  private val cache = scala.collection.mutable.Map.empty[Key, DataFrame]

  /** Durable layout: the spans frame bucketed on doc_id (the census
    * groupBy key, so the daily aggregation is exchange-free).
    */
  val DurableFamily = "dup_spans"
  val DurableParts: Seq[DurableStore.Part] =
    Seq(DurableStore.Part("spans", Some("doc_id")))

  def corpusFp(s: SparkSession, dir: String): String =
    DurableStore.corpusFingerprint(s, dir, "documents",
      Seq("doc_id", "text"))

  /** The in-memory cache's MISS path goes through the durable layout:
    * the ladder+descent machine runs only if NO application ever saw
    * this corpus — every later application (and every later round of
    * the harness) reloads the persisted spans and pays the checkpoint
    * alone. Ledger: a genuine build accrues under `durable_dup_spans`;
    * the `dup_spans` key records whatever the miss path actually cost
    * this application (reload + checkpoint on warm machines).
    */
  def sharedSpans(s: SparkSession, dir: String): DataFrame =
    synchronized {
      val key = Key(s.sparkContext.applicationId,
        new java.io.File(dir).getCanonicalPath)
      cache.filterInPlace((k, _) => k.appId == key.appId)
      cache.getOrElseUpdate(key, StoreBuildLedger.timed("dup_spans") {
        val fp = corpusFp(s, dir)
        DurableStore.loadOrBuild(s, DurableFamily, fp, DurableParts) {
          Map("spans" -> Dedup.maximalDupSpans(
            Tables.load(s, dir, "documents"),
            "doc_id", "text", minLen = 6, minDocs = 2))
        }("spans").localCheckpoint(eager = true)
      })
    }

  def evictAll(): Unit = synchronized { cache.clear() }
}
