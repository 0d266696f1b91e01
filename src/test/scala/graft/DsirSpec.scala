package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Dsir

/** Contracts of the DSIR importance resampler (l94/t35) that must hold
  * for ANY corpus — the driver gate checks fixture equality; these pin
  * the arguments behind it.
  */
class DsirSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def refHash(s: String): Long = {
    var acc = 0L
    var first = true
    s.codePoints().toArray.foreach { cp =>
      if (first) { acc = cp.toLong; first = false }
      else acc = (acc * 31L + cp) % 1000000007L
    }
    acc
  }

  private def bitlen(x: Long): Int =
    math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(x))

  test("importanceTable matches a plain-Scala reference count model") {
    import spark.implicits._
    val texts = Seq(
      0L -> "a b a b c",
      1L -> "a b c d e f",
      2L -> "c d c d",
      3L -> "f g h")
    val docs = texts.toDF("doc_id", "text")
    val buckets = 16
    // reference: hashed bigram occurrence counts per class
    val occ = texts.flatMap { case (id, t) =>
      val w = t.split(" ")
      w.zip(w.tail).map { case (x, y) =>
        (refHash(s"$x $y") % buckets, if (id == 0L) 1 else 0)
      }
    }
    val ct = occ.groupBy(_._1).view.mapValues(_.map(_._2).sum.toLong).toMap
    val cr = occ.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val (nt, nr) = (ct.values.sum, cr.values.sum)
    val expected = cr.keys.map { b =>
      b -> ((bitlen(nr + buckets) - bitlen(cr(b) + 1))
        - (bitlen(nt + buckets) - bitlen(ct(b) + 1))).toLong
    }.toMap
    val got = Dsir.importanceTable(docs, "doc_id", "text",
        col("doc_id") === 0, buckets = buckets)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("fixture ledger: deterministic, bounded, all three regimes live") {
    val docs = Tables.load(spark, sf, "documents")
    def run() = Dsir.dsirResample(docs, "doc_id", "text", "source",
        col("doc_id") % 7 === 0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    val a = run()
    assert(a === run(), "re-run must select exactly the same documents")
    assert(a.nonEmpty)
    a.foreach { case (_, nDocs, nSel, _) =>
      assert(nSel >= 0 && nSel <= nDocs)
    }
    // regimes: recompute per-doc importance + the mean threshold the way
    // the operator defines them and require docs at full (>= thr),
    // partial ((thr-14, thr)) and never (<= thr-14) acceptance
    val w = Dsir.importanceTable(docs, "doc_id", "text",
      col("doc_id") % 7 === 0)
    val perDoc = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
      .select(col("doc_id"),
        explode(graft.operators.NbClassifier.bigramFeats(col("t"))).as("g"))
      .select(col("doc_id"),
        pmod(TextFunctions.rollingHash(col("g")), lit(4096L)).as("bkt"))
      .join(broadcast(w), Seq("bkt"))
      .groupBy("doc_id").agg(sum("imp").as("imp"))
    val imps = docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(coalesce(col("imp"), lit(0L)))
      .collect().map(_.getLong(0))
    val thr = {
      val s = imps.sum; val n = imps.length
      (s - java.lang.Math.floorMod(s, n.toLong)) / n
    }
    assert(imps.exists(_ >= thr), "full-acceptance regime must be live")
    assert(imps.exists(i => i < thr && i > thr - 14L),
      "partial-acceptance regime must be live")
    assert(imps.exists(_ <= thr - 14L), "never-accepted regime must be live")
  }

  test("acceptLocal: per-source accept counts equal the batch ledger") {
    val docs = Tables.load(spark, sf, "documents")
    val serve = Dsir.collectDsirServeModel(docs, "doc_id", "text",
      col("doc_id") % 7 === 0)
    val local = docs
      .select(col("source"), TextFunctions.tokens(col("text")).as("t"),
        TextFunctions.rollingHash(col("text")).as("fp"))
      .select(col("source"),
        Dsir.acceptLocal(serve, col("t"), col("fp")).as("acc"))
      .groupBy("source").agg(sum("acc").as("n_sel"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = Dsir.dsirResample(docs, "doc_id", "text", "source",
        col("doc_id") % 7 === 0)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(local === batch)
  }

  test("plan: importance table broadcasts; only the two scalar attaches are BNLJ") {
    import spark.implicits._
    val docs = (1L to 300L).map(i =>
      (i, s"alpha beta gamma w$i x${i % 7}", s"s${i % 5}"))
      .toDF("doc_id", "text", "source")
    // the scoring pipeline (pre-checkpoint): the <=buckets importance
    // table must BROADCAST into the scoring join, with exactly one BNLJ
    // (the one-row totals attach) and no shuffled join on bkt
    val scoring = Dsir.perDocImp(docs, "doc_id", "text", "source",
        col("doc_id") % 3 === 0, buckets = 256)
      .queryExecution.executedPlan.toString
    assert(scoring.contains("BroadcastHashJoin"), s"plan:\n$scoring")
    assert("BroadcastNestedLoopJoin".r.findAllIn(scoring).size === 1,
      s"plan:\n$scoring")
    // the assembled query: the checkpointed per-doc frame is read ONCE
    // (no duplicated scoring subtree) and only the one-row threshold
    // attach remains a BNLJ
    val plan = Dsir.dsirResample(docs, "doc_id", "text", "source",
        col("doc_id") % 3 === 0, buckets = 256)
      .queryExecution.executedPlan.toString
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size === 1,
      s"plan:\n$plan")
    assert(!plan.contains("bin("),
      s"scoring subtree must not be duplicated into the final plan:\n$plan")
  }
}
