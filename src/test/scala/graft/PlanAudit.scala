package graft

/** Dev-only registry-wide plan audit: build (don't run) every registered
  * query at a scale factor and flag plan smells — cartesian products and
  * broadcast-nested-loop joins outside the known intentional all-pairs
  * formulations, plus missing whole-stage codegen at the scan level.
  * Usage: sbt 'Test/runMain graft.PlanAudit <sfDir>'
  */
object PlanAudit {

  /** Queries whose plans legitimately contain a non-equi self-join:
    * exact all-pairs oracle paths and their gates (the scale twins are
    * the bucketed variants), plus the small-side-replicated salted join.
    */
  private val nonEquiIntentional = Set(
    "l02_jaccard_pairs", "l05_embed_neardup", "l19_dedup_clusters",
    "l21_embed_neardup_lsh", "l22_lsh_recall", "l23_ivf_recall",
    "l24_simhash_gate", "l30_embed_lsh_scaled_bits", "l31_split_leakage", "l32_keep_best",
    "l06_cosine_topk", "l07_lsh_topk", "l16_ivf_topk", "l46_knn_classify",
    "l51_knn_ivf_agree", "l52_quantize_gate",
    "t04_asof_join", "t05_range_join", "t09_stream_stream_join",
    "r25_percentile", "r33_lateral_join",
    // single-row scalar attach (corpus count N / the serialized CMS
    // broadcast into a k-row side): a 1-row BroadcastNestedLoopJoin IS
    // the right plan for a scalar
    "l25_tfidf_topk", "l37_cms_heavy_hitters", "l47_bm25", "l48_rrf_fusion",
    // the curation-run ledger assembles four one-row scalar aggregates
    // (and its containment stage is the exact twin, like l02/l50)
    "l55_curation_run",
    // one-row batch-total x one-row survivor-totals scalar attach
    "l56_incremental_dedup",
    // runs ivfTopK + pqTopK (both over the ivf candidate machinery)
    "l57_pq_gate",
    // recall gates: the exact side is the deliberate all-pairs twin
    // (l05 pattern); the semantic side itself is equi-joined on cent_id
    "l61_semantic_dedup", "l62_semantic_prune",
    // one-row sum-of-sqrt normalizer attached to the per-group census
    // (the l47/l48 scalar-attach shape)
    "l67_temperature_resample",
    // one-row (N_target, N_background) totals attached to the <=buckets
    // weight table (the l25/l47 scalar-attach shape)
    "l78_domain_score",
    // the batch-side agreement gate probes the 8-row centroid table per
    // query (the l16/l51 IVF probe shape: tiny-side broadcast replicate)
    "t22_stream_ann_serve",
    // t22's agreement shape over the durable reload (same tiny-side
    // centroid probe + one-row gate attaches)
    "t50_stream_cold_boot_serve",
    // l82's one-row count/mismatch scalar attaches over the drained
    // ingest state (plus the same centroid-probe encode shape)
    "t51_stream_index_ingest",
    // one-row count/mismatch/agreement scalar attaches + the same
    // centroid-probe shape, twice (updated and rebuilt serve)
    "l82_ann_index_update",
    // one-row budget scalar attached to the O(sources) plan frame
    // (the l67/l78 scalar-attach shape)
    "l92_budget_waterfill",
    // two one-row scalar attaches: the (N_target, N_raw) totals on the
    // <=buckets importance table and the mean-importance threshold on
    // the per-doc frame (the l78/l92 shape)
    "l94_dsir_select",
    // three one-row scalar attaches: vocab sizes on the scoring join,
    // the corpus-mean excess anchor and the weight total on the
    // O(sources) ledger (the l94 shape)
    "l95_doremi_weights",
    // two one-row scalar attaches: budget+count, then the waterline
    // level, both on the O(sources) plan frame (the l92 shape)
    "l96_unimax_alloc",
    // two one-row scalar attaches: vocab sizes on the scoring join and
    // the corpus-mean excess anchor on the per-doc ledger (l95's shape)
    "l97_rho_select",
    // composes l94's and l97's scoring subtrees: their four one-row
    // scalar attaches (dsir totals+threshold, rho vocab+anchor)
    "l98_selector_agreement",
    // the exact all-pairs gate twin (l61/l62's base side) plus the
    // 8-row centroid broadcast replicate of the prototype stage and
    // one-row recall/quota/order gate attaches
    "l99_d4_prune",
    // one-row corpus-total attach on the (source, word) count table
    // (the l67/l78 scalar-attach shape)
    "l100_source_kl",
    // one-row gate frames (whitened variance, rotation norm) attached
    // to the one-row count aggregate — pure scalar attaches
    "l101_pca_whiten",
    // the broadcast EVAL side replicated against the corpus scan with
    // no equi key — the l06 brute-force shape; eval benches are always
    // broadcast-sized
    "l103_semantic_decontam",
    // one-row smoothed-reference-total attach on the drained
    // (source, bucket) state (the l100 shape)
    "t39_stream_kl_drift",
    // the semantic flag replicates the broadcast eval vectors against
    // the embedding scan with no equi key (l103's shape)
    "l105_decontam_agreement",
    // two brute-force exact sides (the l06 broadcast-query shape, once
    // per space) plus l57's candidate probe — all deliberate gate twins
    "l106_opq_rotate_pq",
    // the two rotation arms' ONE-ROW agreement-hit frames crossJoined
    // into the gate row (pure scalar attach; the per-arm machinery is
    // l106's candidate/ivf/pq shape)
    "l112_opq_refine",
    // composes l61's + l62's cards over the durable reload: the exact
    // all-pairs gate twin (their base side) plus the two ONE-ROW cards
    // crossJoined into the gate row (the l112 scalar-attach shape)
    "l130_semdedup_durable_serve",
    // l82's one-row count/mismatch scalar attaches over the durable
    // incremental lineage (same centroid-probe + gate-attach shapes)
    "l131_ann_durable_update",
    // l94's serve shape over the merged importance table: the same
    // two one-row scalar attaches (totals + mean-importance
    // threshold); l110 only escapes the audit by checkpointing its
    // result frame before returning (it must drop its temp tables)
    "l133_dsir_durable_update",
    // l82/l131's one-row count/mismatch scalar attaches over the
    // semantic incremental lineage
    "l134_semdedup_durable_update",
    // l95's serve shape over the merged-on-read joint counts: the same
    // three one-row scalar attaches (vocab sizes, excess anchor,
    // weight total); l132/l135 escape the audit only because their
    // card helpers checkpoint the per-doc frame before the sections
    "l136_doremi_durable_update")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Engine.local(8)
    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      // Side-effecting queries (sink writes, streaming runs) still only
      // PLAN here via queryExecution on the returned frame; the ones that
      // must execute to build their result do run — acceptable for a dev
      // audit at sf0.001.
      val plan =
        try fn(spark, sfDir).queryExecution.executedPlan.toString
        catch { case e: Throwable => s"<failed: ${e.getMessage}>" }
      val cartesian = plan.contains("CartesianProduct")
      val bnlj = plan.contains("BroadcastNestedLoopJoin")
      // a query that cannot even BUILD is a flag, not a silent skip —
      // otherwise a broken registry entry reads as a green audit
      val broken = plan.startsWith("<failed:")
      val smell = broken || ((cartesian || bnlj) && !nonEquiIntentional(name))
      if (smell) {
        flagged += 1
        if (broken) println(s"[audit] FLAG $name: build failed: ${plan.take(200)}")
        else println(s"[audit] FLAG $name: cartesian=$cartesian bnlj=$bnlj")
      }
    }
    println(s"[audit] done, flagged=$flagged")
    spark.stop()
  }
}
