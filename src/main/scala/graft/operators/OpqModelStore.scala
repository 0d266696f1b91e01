package graft.operators

import org.apache.spark.sql.SparkSession

import graft.Tables

/** Application-scoped cache of the trained OPQ rotation (and the PCA
  * model that seeds it) — the AnnIndexStore discipline applied to the
  * rotation family: the alternating refinement is a training job run
  * ONCE per corpus (l112 gates its quality, l116 serves a rotated
  * index built with it), not re-fit per consumer. The fit is a handful
  * of driver-side matrices (d x d), so the cache holds plain objects;
  * build seconds land in the StoreBuildLedger under `opq_rotation`.
  *
  * Canonical parameterization (single source of truth so l112's gate
  * and l116's index cannot silently desync): the l72 fidelity-grade
  * codebook shape m=16 x 64 codes, 4 refinement iterations, PCA-seeded.
  */
object OpqModelStore {

  val M = 16
  val NCodes = 64
  val Iters = 4

  private final case class Key(appId: String, dir: String)

  private val cache =
    scala.collection.mutable.Map.empty[Key, (Pca.PcaModel, Opq.OpqModel)]

  private def keyFor(s: SparkSession, dir: String): Key = {
    val key = Key(s.sparkContext.applicationId,
      new java.io.File(dir).getCanonicalPath)
    cache.filterInPlace((k, _) => k.appId == key.appId)
    key
  }

  /** The standing (PCA seed, trained OPQ rotation) pair over `dir`'s
    * embeddings.
    */
  def shared(s: SparkSession, dir: String): (Pca.PcaModel, Opq.OpqModel) =
    synchronized {
      cache.getOrElseUpdate(keyFor(s, dir),
        StoreBuildLedger.timed("opq_rotation") {
          val e = Tables.load(s, dir, "embeddings")
          val pca = Pca.fit(e, "embedding")
          (pca, Opq.fitRotation(e, "vec_id", "embedding",
            M, NCodes, Iters, pca.axes))
        })
    }

  /** Durable layout of the trained rotation: one d-row (i, row) table
    * — the driver-side d x d matrix as its persistable face.
    */
  val DurableFamily = "opq_rotation"
  val DurableParts: Seq[DurableStore.Part] =
    Seq(DurableStore.Part("rot", None))

  def corpusFp(s: SparkSession, dir: String): String =
    DurableStore.corpusFingerprint(s, dir, "embeddings",
      Seq("vec_id", "embedding"))

  /** Load-or-build the DURABLE rotation matrix: the alternating fit
    * runs in the first application ever to see this corpus; later
    * applications reload d rows (d <= 4096 by the fit's own guard).
    */
  def durableRotation(s: SparkSession, dir: String,
      fp: String): Array[Array[Double]] = {
    val t = DurableStore.loadOrBuild(s, DurableFamily, fp, DurableParts) {
      import s.implicits._
      val rot = shared(s, dir)._2.rotation
      Map("rot" -> rot.zipWithIndex
        .map { case (r, i) => (i, r.toSeq) }.toSeq.toDF("i", "row"))
    }
    t("rot").orderBy("i").collect()
      .map(_.getSeq[Double](1).toArray)
  }

  /** Drop every in-memory artifact (the fresh-application simulation
    * of the durable-reload gates).
    */
  def evictAll(): Unit = synchronized { cache.clear() }
}
