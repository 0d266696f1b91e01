package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._

import graft.operators.{Doremi, Dsir, NbClassifier, NgramLm}

/** The l107-l110 persisted-model-store serve contract: a serve plan
  * built from PERSISTED catalog tables must contain ZERO training
  * aggregates — no aggregate anywhere in the optimized plan produces a
  * model column (pair_c/ctx_c/v, pos_c/neg_c/n_pos, pair_f/ctx_f/v_f,
  * imp). Each probe carries its positive control: the train-inline
  * twin of the same plan DOES contain those aggregates, so the probe
  * demonstrably distinguishes the two. Serve output equality with the
  * trained twin is the driver's hash gate; here it is asserted row-wise
  * on the fixtures as the cheap local face of that gate.
  *
  * Probes target the pre-checkpoint scoring subtrees (scoredBits,
  * perDocImpFromTable): localCheckpoint truncates lineage, so probing
  * a post-checkpoint frame would vacuously pass.
  */
class ModelStoreSpec extends SparkSpec {

  private def docsDF(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, s"src${i % 2}") }
      .toDF("doc_id", "text", "source")
  }

  /** Names produced by any Aggregate in the optimized plan. */
  private def aggOutputs(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case a: Aggregate => a.aggregateExpressions.map(_.name)
    }.flatten.toSet

  /** Persist `frames` as catalog tables under a temp dir, run `body`
    * over the read-back tables, drop everything after.
    */
  private def withTables[A](frames: Seq[(String, DataFrame)])
      (body: Map[String, DataFrame] => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft_mstest_")
    val pfx = "graft_mstest_" + dir.getFileName.toString.takeRight(8)
    try {
      frames.foreach { case (part, df) =>
        df.write.mode("overwrite")
          .option("path", s"$dir/$part").saveAsTable(s"${pfx}_$part")
      }
      body(frames.map { case (p, _) => p -> spark.table(s"${pfx}_$p") }
        .toMap)
    } finally {
      frames.foreach { case (p, _) =>
        spark.sql(s"DROP TABLE IF EXISTS ${pfx}_$p") }
      graft.pipeline.SinkFiles.deleteRecursive(dir.toString)
    }
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  private val texts = Seq(
    "a b a b c d", "b c d e", "a a b b", "c d c d e f",
    "e f g h", "a b c", "g h a b", "b b b c")

  test("LM serve plan from persisted tables has zero training " +
      "aggregates; trained twin does; outputs equal") {
    val docs = docsDF(texts)
    val m = NgramLm.trainBigram(docs.where(col("doc_id") % 3 === 0),
      "text")
    val twin = NgramLm.surprisalBits(docs, "doc_id", "text", m)
    val twinAggs = aggOutputs(twin)
    assert(twinAggs.contains("pair_c") && twinAggs.contains("v"),
      s"positive control lost its training aggregates: $twinAggs")
    withTables(Seq("pairs" -> m.pairCounts, "ctx" -> m.ctxCounts,
        "vocab" -> m.vocab)) { t =>
      val serve = NgramLm.surprisalBits(docs, "doc_id", "text",
        NgramLm.BigramModel(t("pairs"), t("ctx"), t("vocab")))
      val aggs = aggOutputs(serve)
      assert(!aggs.exists(Set("pair_c", "ctx_c", "v")),
        s"serve plan contains a training aggregate: $aggs")
      assert(sortedRows(serve) === sortedRows(twin))
    }
  }

  test("NB serve plan from persisted tables has zero training " +
      "aggregates; trained twin does; outputs equal") {
    val docs = docsDF(texts)
    val m = NbClassifier.trainNb(
      docs.where(col("doc_id") % 2 === 0),
      docs.where(col("doc_id") % 2 =!= 0),
      "text", NbClassifier.bigramFeats)
    val twin = NbClassifier.marginBits(docs, "doc_id", "text", m,
      NbClassifier.bigramFeats)
    val twinAggs = aggOutputs(twin)
    assert(twinAggs.contains("pos_c") && twinAggs.contains("n_pos"),
      s"positive control lost its training aggregates: $twinAggs")
    withTables(Seq("feat" -> m.featCounts, "totals" -> m.totals)) { t =>
      val serve = NbClassifier.marginBits(docs, "doc_id", "text",
        NbClassifier.NbModel(t("feat"), t("totals")),
        NbClassifier.bigramFeats)
      val aggs = aggOutputs(serve)
      assert(!aggs.exists(Set("pos_c", "neg_c", "n_pos", "n_neg")),
        s"serve plan contains a training aggregate: $aggs")
      assert(sortedRows(serve) === sortedRows(twin))
    }
  }

  test("DoReMi serve scoring from persisted count tables has zero " +
      "training aggregates; trained twin does; ledgers equal") {
    val docs = docsDF(texts)
    val ref = col("doc_id") % 3 === 0
    val jl = Doremi.trainJoint(docs, "doc_id", "text", "source", ref)
    val twinAggs = aggOutputs(Doremi.scoredBits(jl, "source"))
    assert(twinAggs.contains("pair_f") && twinAggs.contains("v_f"),
      s"positive control lost its training aggregates: $twinAggs")
    withTables(Seq("pc" -> jl.pc, "ctx" -> jl.ctx,
        "vocab" -> jl.vocab)) { t =>
      val served = Doremi.JointLm(
        Doremi.pairsFrame(docs, "doc_id", "text", "source", ref),
        t("pc"), t("ctx"), t("vocab"))
      val aggs = aggOutputs(Doremi.scoredBits(served, "source"))
      assert(!aggs.exists(Set("pair_f", "pair_r", "ctx_f", "ctx_r",
        "v_f", "v_r")),
        s"serve plan contains a training aggregate: $aggs")
      assert(sortedRows(
          Doremi.domainWeightsFrom(served, docs, "source"))
        === sortedRows(Doremi.domainWeightsFrom(jl, docs, "source")))
    }
  }

  test("serve-tier BOOT COLLECTS read back identically from persisted " +
      "tables (the t28/t31/t33 boot artifacts could load off disk)") {
    val docs = docsDF(texts)
    val lm = NgramLm.trainBigram(docs.where(col("doc_id") % 3 === 0),
      "text")
    val nb = NbClassifier.trainNb(
      docs.where(col("doc_id") % 2 === 0),
      docs.where(col("doc_id") % 2 =!= 0),
      "text", NbClassifier.bigramFeats)
    withTables(Seq("pairs" -> lm.pairCounts, "ctx" -> lm.ctxCounts,
        "vocab" -> lm.vocab, "feat" -> nb.featCounts,
        "totals" -> nb.totals)) { t =>
      val lmTables =
        NgramLm.BigramModel(t("pairs"), t("ctx"), t("vocab"))
      assert(NgramLm.collectServeModel(lmTables)
        === NgramLm.collectServeModel(lm))
      val nbTables = NbClassifier.NbModel(t("feat"), t("totals"))
      assert(NbClassifier.collectNbServeModel(nbTables)
        === NbClassifier.collectNbServeModel(nb))
    }
  }

  test("DSIR serve scoring from a persisted importance table has zero " +
      "training aggregates; trained twin does; ledgers equal") {
    val docs = docsDF(texts)
    val bucketed = Dsir.bucketFrame(docs, "doc_id", "text",
      col("doc_id") % 3 === 0, 64).localCheckpoint(eager = true)
    // the importance VALUE is a projection; the training aggregates
    // output the class counts ct/cr and the totals nt/nr
    val twinAggs = aggOutputs(
      Dsir.perDocImpFrom(docs, "doc_id", "text", "source", bucketed, 64))
    assert(twinAggs.contains("ct") && twinAggs.contains("nt"),
      s"positive control lost its training aggregates: $twinAggs")
    withTables(Seq("imp" -> Dsir.importanceTableFrom(bucketed, 64))) {
      t =>
        val serve = Dsir.perDocImpFromTable(docs, "doc_id", "text",
          "source", bucketed, t("imp"))
        val aggs = aggOutputs(serve)
        assert(!aggs.exists(Set("ct", "cr", "nt", "nr")),
          s"serve plan contains an importance-training aggregate: " +
            s"$aggs")
        assert(sortedRows(Dsir.dsirResampleFromTable(docs, "doc_id",
            "text", "source", bucketed, t("imp")))
          === sortedRows(Dsir.dsirResampleFrom(docs, "doc_id", "text",
            "source", bucketed, 64)))
    }
  }
}
