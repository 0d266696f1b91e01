package graft

/** Guards on the driver contract itself — the round-1 failure mode was
  * shipping a harness that could not run.
  */
class HarnessSpec extends SparkSpec {

  test("query registry: unique names, oracle keys subset of queries") {
    val specs = SparkEntry.allSpecs
    val names = specs.map(_.name)
    assert(names.distinct.size === names.size, "duplicate query names")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // naming convention: module prefix + 2-3 digit index (the l-family
    // crossed 99 in round 10)
    assert(names.forall(_.matches("[prtls]\\d{2,3}_[a-z0-9_]+")), names.filterNot(_.matches("[prtls]\\d{2,3}_[a-z0-9_]+")).mkString(","))
  }

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
