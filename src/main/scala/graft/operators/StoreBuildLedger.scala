package graft.operators

/** Static ledger of one-time standing-store build costs — the bench
  * decomposition the shared stores otherwise hide: an application-
  * scoped build (AnnIndexStore, NgramModelStore, NbModelStore,
  * MixtureModelStore, SemDedupStore) lands on whichever consumer runs
  * FIRST and reads like a per-query cost in the bench ledger (judge-
  * measured r10: l72 rep1 25 s vs 4 s warm, all of it the shared ANN
  * build + codegen). Every store times its cache-miss build body here;
  * Bench emits the snapshot as a separate `store_build_sec` map in the
  * full JSON so driver lines decompose into build + query.
  *
  * Seconds ACCUMULATE per ledger key (a store variant rebuilt for a
  * second corpus dir in one application adds to its key — the total is
  * "seconds this application spent building stores", the number the
  * bench total can be corrected by).
  */
object StoreBuildLedger {

  private val ledger = scala.collection.mutable.Map.empty[String, Double]

  /** Time `body` and accumulate its wall seconds under `name`. */
  def timed[T](name: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally {
      val secs = (System.nanoTime() - t0) / 1e9
      synchronized {
        ledger.update(name, ledger.getOrElse(name, 0.0) + secs)
      }
    }
  }

  def snapshot: Map[String, Double] = synchronized(ledger.toMap)
}
