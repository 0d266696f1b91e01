package graft.operators

import org.apache.spark.sql.SparkSession

import graft.Tables

/** Application-scoped cache of built IVF-PQ index artifacts, keyed by
  * (corpus dir, build parameters) — the standing-artifact discipline
  * the ANN family argues for, applied to the harness itself: the index
  * is SUPPOSED to be built once and served many times, so the build
  * (t22), the persisted-table serve (l72) and the incremental update
  * (l82) all consume ONE shared build instead of each retraining
  * identical artifacts per query.
  *
  * Scope: the cache lives for the Spark application (applicationId in
  * the key) and holds localCheckpoint'ed frames — centroids and
  * codebook are O(model), lists/codes/norms are O(corpus vectors), the
  * same footprint any one of the consumers already checkpointed. A
  * production pipeline keeps the artifacts as bucketed TABLES across
  * applications (l72 persists and serves exactly that way); a
  * cross-application file cache is deliberately NOT attempted here —
  * a half-written artifact path would poison every later run, whereas
  * catalog tables have transactional overwrite semantics.
  */
object AnnIndexStore {

  private final case class Key(appId: String, dir: String, nCentroids: Int,
      trainIters: Int, m: Int, nCodes: Int, pqTrainIters: Int)

  /** The harness's ONE shared build parameterization — 8 coarse
    * centroids (seeded, no Lloyd iterations — deterministic), m=16
    * sub-blocks at 64 codes with one PQ training round, the l72
    * fidelity-grade codebook. Single source of truth: `sharedIndex`'s
    * defaults and `sharedServe`'s cache key both read THESE constants,
    * so they cannot silently desync.
    */
  val DefaultNCentroids = 8
  val DefaultTrainIters = 0
  val DefaultM = 16
  val DefaultNCodes = 64
  val DefaultPqTrainIters = 1

  private val cache =
    scala.collection.mutable.Map.empty[Key, Similarity.AnnIndex]

  private def keyFor(s: SparkSession, dir: String, nCentroids: Int,
      trainIters: Int, m: Int, nCodes: Int, pqTrainIters: Int): Key = {
    val key = Key(s.sparkContext.applicationId,
      new java.io.File(dir).getCanonicalPath,
      nCentroids, trainIters, m, nCodes, pqTrainIters)
    // entries from stopped applications (earlier SparkSessions in the
    // same JVM — test suites, notebooks) can never be hit again but
    // would pin checkpointed frames for the JVM's life: evict them
    cache.filterInPlace((k, _) => k.appId == key.appId)
    serveCache.filterInPlace((k, _) => k.appId == key.appId)
    key
  }

  /** The canonical-parameterization miss path goes through the
    * DURABLE layout (the DupSpanStore discipline): index training
    * runs only if NO application ever saw this corpus — a warm
    * machine reloads the five persisted tables and the `ann_index`
    * ledger key times the checkpoints alone (a genuine build accrues
    * under `durable_ann_index`). Non-default parameterizations (no
    * durable layout — no standing consumer) build in-memory.
    */
  def sharedIndex(s: SparkSession, dir: String,
      nCentroids: Int = DefaultNCentroids,
      trainIters: Int = DefaultTrainIters, m: Int = DefaultM,
      nCodes: Int = DefaultNCodes,
      pqTrainIters: Int = DefaultPqTrainIters): Similarity.AnnIndex =
    synchronized {
    val key = keyFor(s, dir, nCentroids, trainIters, m, nCodes,
      pqTrainIters)
    val canonical = key == keyFor(s, dir, DefaultNCentroids,
      DefaultTrainIters, DefaultM, DefaultNCodes, DefaultPqTrainIters)
    cache.getOrElseUpdate(key, {
      val idx =
        if (canonical) durableIndex(s, dir, corpusFp(s, dir))
        else Similarity.buildAnnIndex(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          nCentroids, trainIters, m, nCodes, pqTrainIters)
      StoreBuildLedger.timed("ann_index") {
        Similarity.AnnIndex(
          idx.centroids.localCheckpoint(eager = true),
          idx.lists.localCheckpoint(eager = true),
          idx.codebook.localCheckpoint(eager = true),
          idx.codes.localCheckpoint(eager = true),
          idx.norms.localCheckpoint(eager = true))
      }
    })
  }

  /** Durable layout of the index family: lists/codes/norms bucketed on
    * their serve join keys (the l72 writer's spec), centroids/codebook
    * unbucketed boot tables.
    */
  val DurableFamily = "ann_index"
  val DurableParts: Seq[DurableStore.Part] = Seq(
    DurableStore.Part("cent", None),
    DurableStore.Part("lists", Some("cent_id")),
    DurableStore.Part("codebook", None),
    DurableStore.Part("codes", Some("c_id")),
    DurableStore.Part("norms", Some("c_id")))

  def corpusFp(s: SparkSession, dir: String): String =
    DurableStore.corpusFingerprint(s, dir, "embeddings",
      Seq("vec_id", "embedding"))

  /** Load-or-build the DURABLE index: later applications (and the
    * post-evict reload inside one) serve the five tables with zero
    * training jobs — the standing ANN pipeline's actual daily shape.
    * The raw training job lives HERE (the shared cache's miss path
    * calls down into this layout, never the other way, so build
    * seconds land un-nested under `durable_ann_index`).
    */
  def durableIndex(s: SparkSession, dir: String,
      fp: String): Similarity.AnnIndex = {
    val t = DurableStore.loadOrBuild(s, DurableFamily, fp, DurableParts) {
      val idx = Similarity.buildAnnIndex(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
        DefaultNCentroids, DefaultTrainIters, DefaultM, DefaultNCodes,
        DefaultPqTrainIters)
      asParts(idx)
    }
    asIndex(t)
  }

  /** The INCREMENTAL durable lineage — a separate family from
    * `ann_index` because the two hold DIFFERENT artifacts for the same
    * corpus fingerprint: `ann_index/<fp>` is the retrain lineage
    * (centroids/codebook trained on exactly that corpus, l72/l123's
    * contract), `ann_index_inc/<fp>` is the frozen-model lineage (the
    * base build's centroids/codebook carried forward, lists/codes/
    * norms extended per append — the daily-ingest economics where only
    * the DELTA is encoded; centroid drift is a periodic retrain, which
    * is exactly a jump back to the other lineage).
    *
    * Since round 14 this is a MANIFEST family (the O(delta)-WRITE
    * shape): the base build is one segment holding all five parts;
    * each append writes ONE delta segment (lists/codes/norms of the
    * delta only — the frozen cent/codebook live in the base segment
    * and are never copied) and publishes the new fingerprint as a
    * manifest naming base segments + the delta. A day's publish
    * therefore writes O(delta) bytes, not a corpus-sized parquet copy
    * (l131 pins this with the segment-file-stats gate). Readers union
    * the listed segments; compaction — when the segment list grows
    * long or co-located serve joins are wanted — is the periodic jump
    * to the retrain lineage's single bucketed layout.
    */
  val IncFamily = "ann_index_inc"

  private def asParts(idx: Similarity.AnnIndex)
      : Map[String, org.apache.spark.sql.DataFrame] =
    Map("cent" -> idx.centroids, "lists" -> idx.lists,
      "codebook" -> idx.codebook, "codes" -> idx.codes,
      "norms" -> idx.norms)

  private def asIndex(t: Map[String, org.apache.spark.sql.DataFrame])
      : Similarity.AnnIndex =
    Similarity.AnnIndex(t("cent"), t("lists"), t("codebook"),
      t("codes"), t("norms"))

  /** Load-or-build the incremental lineage's BASE layout: a one-time
    * training build over the base corpus (fingerprint = the base
    * FRAME's content hash, so any base change invalidates), published
    * as a single-segment manifest.
    */
  def durableIncBase(s: SparkSession,
      base: org.apache.spark.sql.DataFrame, baseFp: String,
      idCol: String, embCol: String): Similarity.AnnIndex =
    asIndex(DurableStore.loadOrBuildManifest(s, IncFamily, baseFp,
      DurableParts) {
      val idx = Similarity.buildAnnIndex(base, idCol, embCol,
        DefaultNCentroids, DefaultTrainIters, DefaultM, DefaultNCodes,
        DefaultPqTrainIters)
      Seq(DurableStore.writeSegment(s, IncFamily, DurableParts,
        asParts(idx)))
    })

  /** Extend a published incremental layout to an appended corpus and
    * republish under the new fingerprint — the l82 maintenance
    * discipline lifted to the durable tier, at O(delta) WRITE cost:
    * the delta is assigned + PQ-encoded against the base manifest's
    * FROZEN centroids/codebook (per-row functions, zero Lloyd
    * machinery — l82's update face) and written as ONE new segment
    * holding only the delta's lists/codes/norms; the publish is one
    * create-if-absent manifest marker naming base segments + the
    * delta. The standing segments are never copied or touched by the
    * append (l131's file-stats gate pins that), and the frozen model
    * is never duplicated — it resolves from the base segment through
    * every descendant manifest. If the new fingerprint is already
    * built this is a pure reload (a re-run day costs zero jobs —
    * gated in l131).
    */
  def durableUpdateTo(s: SparkSession, baseFp: String,
      newFp: String, delta: org.apache.spark.sql.DataFrame,
      idCol: String, embCol: String): Similarity.AnnIndex =
    asIndex(DurableStore.loadOrBuildManifest(s, IncFamily, newFp,
      DurableParts) {
      val baseT = DurableStore.manifestTables(s, IncFamily, baseFp,
        DurableParts)
      val (l, c, n) = Similarity.assignEncode(baseT("cent"),
        baseT("codebook"), delta, idCol, embCol, m = DefaultM)
      val seg = DurableStore.writeSegment(s, IncFamily, DurableParts,
        Map("lists" -> l, "codes" -> c, "norms" -> n))
      DurableStore.manifestSegments(s, IncFamily, baseFp) :+ seg
    })

  /** Drop every in-memory artifact (the fresh-application simulation
    * of the durable-reload gates, spec-side / cold-boot t50 where the
    * query pays its own boot).
    */
  def evictAll(): Unit = synchronized {
    cache.clear(); serveCache.clear()
  }

  /** Drop ONLY the index cache — the artifact whose durable reload
    * l123 gates. The serve-meta cache survives: its collected
    * codebook/centroids came from checkpointed frames that stay valid,
    * and clearing it would make t22 after the gate silently re-pay the
    * driver collect (ledger noise), while proving nothing — the
    * durable layout holds the five index tables, not the serve meta.
    */
  def evictIndex(): Unit = synchronized { cache.clear() }

  /** Re-seed the shared cache with a (reloaded) index so sibling
    * queries after an evict-reload gate serve the durable tables
    * instead of silently re-paying the build (the serve-meta cache
    * re-derives lazily from these frames).
    */
  def seedIndex(s: SparkSession, dir: String,
      idx: Similarity.AnnIndex): Unit = synchronized {
    // checkpoint the reloaded tables so siblings get the same
    // in-memory frames a fresh build would have pinned (serving raw
    // table reads measurably slows every later consumer)
    cache.update(keyFor(s, dir, DefaultNCentroids, DefaultTrainIters,
      DefaultM, DefaultNCodes, DefaultPqTrainIters),
      StoreBuildLedger.timed("ann_index_seed") {
        Similarity.AnnIndex(
          idx.centroids.localCheckpoint(eager = true),
          idx.lists.localCheckpoint(eager = true),
          idx.codebook.localCheckpoint(eager = true),
          idx.codes.localCheckpoint(eager = true),
          idx.norms.localCheckpoint(eager = true))
      })
  }

  /** The serve-tier view of the shared index (t22's boot artifacts):
    * the driver-collected meta (codebook + centroids) and the index's
    * own ARRAY-form codes table (already checkpointed by
    * `sharedIndex`) — since r17 the persisted codes ARE the serve
    * layout, so boot is just the two tiny collects, with zero
    * reconstruction jobs.
    */
  private val serveCache = scala.collection.mutable.Map.empty[
    Key, (Similarity.AnnServeMeta, org.apache.spark.sql.DataFrame)]

  def sharedServe(s: SparkSession, dir: String)
      : (Similarity.AnnServeMeta, org.apache.spark.sql.DataFrame) =
    synchronized {
      val key = keyFor(s, dir, DefaultNCentroids, DefaultTrainIters,
        DefaultM, DefaultNCodes, DefaultPqTrainIters)
      // resolve the index OUTSIDE the timed body: on a serve-cache
      // miss the index may itself be a miss, and its build seconds
      // belong to the ann_index ledger key, not ann_serve's
      val idx = sharedIndex(s, dir)
      serveCache.getOrElseUpdate(key, StoreBuildLedger.timed("ann_serve") {
        (Similarity.collectServeMeta(idx.centroids, idx.codebook),
          idx.codes)
      })
    }
}
