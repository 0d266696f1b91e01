package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew tools. AQE's skew-join splitting (on in `graft.Engine`) handles
  * most runtime skew; these are the explicit levers for the cases AQE
  * can't fix — a *single* group-by key so hot that one reducer owns it.
  */
object Skew {

  /** Two-stage salted aggregation: rows are spread over `saltBuckets`
    * sub-keys (random-uniform via a hash of a unique column, so the
    * split is deterministic), partially aggregated per (key, salt), then
    * re-aggregated per key. Stage 1 shuffles at most
    * `distinct-keys * saltBuckets` rows into balanced partitions; the
    * hot key's work is spread over `saltBuckets` reducers.
    *
    * The caller supplies the per-stage aggregates: `partial` runs per
    * (key, salt), `merge` recombines partials per key — the standard
    * algebraic-aggregate decomposition (sum/sum, count/sum, min/min...).
    */
  def saltedAgg(
      df: DataFrame,
      key: Column,
      saltFrom: Column,
      saltBuckets: Int,
      partial: Seq[Column],
      merge: Seq[Column]): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    df.withColumn("__salt", pmod(xxhash64(saltFrom), lit(saltBuckets)))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col("__key"))
      .agg(merge.head, merge.tail: _*)
      .withColumnRenamed("__key", "key")
  }

  /** Salted equi-join for a hot join key: left rows spread over
    * `saltBuckets` deterministic sub-keys, the right side replicated once
    * per bucket, joined on (key, salt) — the hot key's probe work lands
    * on `saltBuckets` reducers instead of one. Replication costs
    * `|right| * saltBuckets` shuffled rows, so the lever fits
    * big-skewed-left x modest-right joins (the classic fact x dim case
    * AQE's split can't fix when a SINGLE key dominates). Result is
    * bit-identical to the plain join (oracle-checked by s04).
    */
  def saltedJoin(left: DataFrame, leftKey: String, saltFrom: Column,
      right: DataFrame, rightKey: String, saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val sl = left.withColumn("__salt", pmod(xxhash64(saltFrom), lit(saltBuckets)))
    val sr = right.withColumn("__salt",
      explode(array((0 until saltBuckets).map(b => lit(b.toLong)): _*)))
    sl.join(sr,
        sl("__salt") === sr("__salt") && sl(leftKey) === sr(rightKey))
      .drop("__salt")
  }
}
