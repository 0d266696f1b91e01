package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared gate machinery for the update≡rebuild equivalence queries
  * (l82/l131/l134/t51/t52 and the DurableStoreSpec twins) — one
  * definition instead of per-query inline copies, so the compare
  * semantics cannot drift between gates.
  */
private[graft] object Gates {

  /** Per-segment file stats of a manifest layout — the BEFORE
    * snapshot of the write-amplification gate.
    */
  def manifestStats(s: org.apache.spark.sql.SparkSession, family: String,
      fp: String): Map[String, Set[(String, Long, Long)]] = {
    val ds = graft.operators.DurableStore
    ds.manifestSegments(s, family, fp)
      .map(g => g -> ds.segmentFileStats(s, family, g)).toMap
  }

  /** The O(delta)-WRITE assertion for an incremental manifest append
    * (`statsBefore` = `manifestStats` of the BASE fingerprint taken
    * before the update ran): the new manifest must be exactly the base
    * segments plus ONE delta segment, and every standing segment's
    * files must be byte-for-byte untouched (path, length AND mtime) —
    * i.e. the append wrote only its own delta partition, the l122
    * zero-build discipline applied to write amplification. Holds on
    * re-run days too: a pure reload writes nothing and the PUBLISHED
    * manifest still shows base + 1.
    */
  def writeODeltaOk(s: org.apache.spark.sql.SparkSession, family: String,
      baseFp: String, newFp: String,
      statsBefore: Map[String, Set[(String, Long, Long)]]): Boolean = {
    val ds = graft.operators.DurableStore
    val segsBase = ds.manifestSegments(s, family, baseFp)
    val segsNew = ds.manifestSegments(s, family, newFp)
    segsNew.take(segsBase.size) == segsBase &&
      segsNew.size == segsBase.size + 1 &&
      segsBase.forall(g =>
        ds.segmentFileStats(s, family, g) == statsBefore(g))
  }

  /** Exact MULTISET compare of two frames on ALL columns: each side is
    * grouped on every column with a count and full-outer-joined on the
    * columns AND the count, so duplicate-row multiplicity differences
    * fail too (a pure set-equality join would pass them silently).
    * Floats compare bitwise — per-row IEEE arithmetic is deterministic
    * on both paths. Returns a one-row frame whose `name` column is the
    * mismatch count (0 = multiset-equal).
    */
  def mismatches(u: DataFrame, r: DataFrame, name: String): DataFrame = {
    val ks = u.columns.toSeq
    def counted(df: DataFrame) =
      df.groupBy(ks.map(col): _*).agg(count(lit(1)).as("__n"))
    counted(u).withColumn("__u", lit(1))
      .join(counted(r).withColumn("__r", lit(1)),
        ks :+ "__n", "full_outer")
      .agg(count(when(col("__u").isNull || col("__r").isNull, 1))
        .as(name))
  }
}
