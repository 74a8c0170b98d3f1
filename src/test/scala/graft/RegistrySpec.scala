package graft

/** Driver-contract registry invariants: the query inventory is the
  * interface the round driver consumes — catch registration mistakes
  * (duplicate names, missing oracles) before it does.
  */
class RegistrySpec extends SparkSpec {

  test("no duplicate query names") {
    assert(Queries.duplicateNames.isEmpty,
      s"duplicates: ${Queries.duplicateNames.mkString(", ")}")
  }

  test("registry size derives from its parts and every query has oracle SQL") {
    import graft.queries.{CoreQueries, ExtQueries}
    assert(Queries.all.size == CoreQueries.all.size + ExtQueries.all.size)
    val missingOracle = Queries.all.filter(_.oracle.isEmpty).map(_.name)
    assert(missingOracle.isEmpty,
      s"queries without oracle SQL: ${missingOracle.mkString(", ")}")
  }

  test("registry matches the canonical declared inventory exactly") {
    // SURVEY §2.12 core inventory + scale twins + [EXT] LLM-pipeline ops.
    // Set equality in BOTH directions: adding a query without declaring it
    // here fails, as does declaring one that was never registered.
    val declared = RegistrySpec.declaredInventory.toSet
    val names = Queries.all.map(_.name).toSet
    val missing = declared.diff(names)
    val undeclared = names.diff(declared)
    assert(missing.isEmpty, s"missing from registry: ${missing.mkString(", ")}")
    assert(undeclared.isEmpty,
      s"registered but not in declared inventory (add to RegistrySpec.declaredInventory): ${undeclared.mkString(", ")}")
  }

  test("every query builds a plan against sf0.001 (no analysis errors) " +
      "AND its plan shape matches the committed signature snapshot") {
    val d = "/root/testdata/sf0.001"
    val live = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val df = fn(spark, d)
      assert(df.schema.fields.nonEmpty, s"$name produced an empty schema")
      name -> graft.tools.PlanSignature.signature(df)
    }
    // Plan-shape regression guard (the r17 coalesce(1) decode-pinning
    // class): exchange/join/window/aggregate/coalesce counts + the
    // whole-stage-codegen span per query, diffed against the committed
    // snapshot. A failing diff is either a regression (fix the plan) or
    // a DELIBERATE change — regenerate with
    //   sbt "runMain graft.tools.PlanSignature"
    // and review the PLAN_SIGNATURES.json diff in the commit.
    val snapPath = java.nio.file.Paths.get("PLAN_SIGNATURES.json")
    assert(java.nio.file.Files.exists(snapPath),
      "PLAN_SIGNATURES.json missing — generate it with " +
        "sbt \"runMain graft.tools.PlanSignature\"")
    val snap = graft.tools.PlanSignature.parse(
      java.nio.file.Files.readString(snapPath))
    val drift = live.flatMap { case (name, sig) =>
      snap.get(name) match {
        case Some(s) if s == sig => None
        case Some(s) => Some(s"$name:\n  snapshot: $s\n  live:     $sig")
        case None => Some(s"$name: NOT IN SNAPSHOT (live: $sig)")
      }
    }
    val gone = snap.keySet.diff(live.map(_._1).toSet)
    assert(drift.isEmpty && gone.isEmpty,
      s"plan-shape drift in ${drift.size} queries" +
        (if (gone.nonEmpty) s"; ${gone.size} stale snapshot entries " +
          s"(${gone.mkString(", ")})" else "") +
        ":\n" + drift.mkString("\n") +
        "\nIf deliberate: regenerate via sbt \"runMain " +
        "graft.tools.PlanSignature\" and review the diff.")
  }
}

object RegistrySpec {
  /** The one canonical declared query inventory. Every registered query must
    * appear here and vice versa (asserted above as set equality).
    */
  val declaredInventory: Seq[String] = Seq(
    // SURVEY §2.12 core
    "q_scan", "q_scan_prune", "q_project", "q_filter_eq", "q_filter_like",
    "q_filter_rlike", "q_join_inner", "q_join_broadcast", "q_join_star",
    "q_join_left", "q_semi_join", "q_anti_join", "q_find_first",
    "q_range_join", "q_distinct", "q_dedup_subset", "q_first_wins",
    "q_group_count", "q_group_collect", "q_group_route", "q_rollup",
    "q_cube", "q_window_running", "q_window_frame", "q_window_rank",
    "q_sort", "q_sort_multi", "q_topk", "q_union", "q_except",
    "q_intersect", "q_str_replace", "q_str_route", "q_str_split",
    "q_bin_hex", "q_date_trunc", "q_math_expr", "q_percentile_disc",
    "q_array_dot", "q_json_extract", "q_explode_tokens",
    "q_window_tumbling", "q_window_sliding", "q_window_session",
    // scale twins (rounds 2 + 5)
    "q_range_banded", "q_join_salted", "q_agg_salted",
    // [EXT] LLM-pipeline operators
    "q_dedup_exact", "q_minhash", "q_minhash_lsh", "q_simhash",
    "q_simhash_pairs", "q_simhash_pairs64",
    "q_ngram_jaccard", "q_dedup_clusters", "q_embed_cosine", "q_embed_lsh",
    "q_ann_topk", "q_ann_ivf", "q_ann_ivf_probe", "q_lang_id", "q_quality_score",
    "q_token_count", "q_fingerprint", "q_tfidf", "q_normalize_nfc",
    // [EXT] corpus assembly (rounds 4 + 5)
    "q_dedup_corpus", "q_sample_stratified", "q_pack_sequences",
    "q_quantize_int8", "q_ann_quantized", "q_ann_asymmetric", "q_chunk_windows",
    "q_chunk_pack", "q_decontaminate13",
    "q_pipeline_corpus", "q_decontaminate", "q_redact", "q_repetition",
    // round 7: temporal / CDC / reshape + corpus quota / index
    "q_asof_join", "q_merge_upsert", "q_pivot", "q_unpivot", "q_histogram",
    "q_domain_cap", "q_inverted_index",
    // round 8: navigation windows, RANGE frames, grouping sets
    "q_window_lag", "q_window_range", "q_window_range_ts", "q_window_dist",
    "q_grouping_sets", "q_grouping_id", "q_asof_forward", "q_asof_nearest",
    "q_minhash_sources",
    // round 8: warehouse/time-series/stats + set-op + fuzzy family
    "q_scd2", "q_table_diff", "q_resample_ffill", "q_resample_interp",
    "q_regr_fit", "q_percentile_cont", "q_except_all", "q_intersect_all",
    "q_histogram_eq", "q_streaks", "q_funnel", "q_cohort_retention",
    "q_moving_zscore",
    "q_fuzzy_pairs", "q_jaro_winkler", "q_sample_weighted",
    "q_entity_resolution", "q_train_split", "q_length_buckets",
    "q_doc_rarity", "q_session_paths",
    "q_passage_dedup", "q_bloom_decontaminate", "q_rrf_fusion", "q_bm25",
    "q_semantic_dedup", "q_triplet_mine", "q_profile", "q_winsorize", "q_lsh_recall", "q_ann_recall", "q_dedup_sweep", "q_source_lengths", "q_token_ids", "q_cluster_sizes",
    // round 9: skew-guarded LSH
    "q_minhash_lsh_bounded",
    // round 9: corpus mixing / quality cut / corpus stats / dup-graph QA
    // + analytics (skyline, bounded EWMA)
    "q_corpus_mix", "q_quality_cut", "q_freq_bigrams", "q_triangle_count",
    "q_skyline", "q_ewma", "q_containment", "q_pagerank", "q_collocations",
    "q_clustering_coef", "q_mode", "q_topk_ties", "q_sample_priority",
    "q_ngram_jaccard_capped", "q_dedup_incremental", "q_ann_filtered",
    // round 10: passage-granularity dup profile, percentile calibration,
    // per-source term profile, per-group exact-k sampling
    "q_dup_passages", "q_score_percentile", "q_top_terms",
    "q_sample_priority_grouped", "q_robust_cut", "q_label_centroids",
    "q_gaps", "q_weighted_median", "q_temperature_mix", "q_shard_assign",
    "q_quality_rules", "q_source_drift", "q_kmeans", "q_kmeans_inertia",
    "q_cluster_canonical", "q_hard_negatives",
    // round 12: overlapping-span exact-substring dedup + URL domains
    "q_span_dedup", "q_url_domain", "q_wordpiece", "q_unigram_lm",
    "q_ngram_novelty", "q_quality_logit", "q_vocab_growth", "q_bpe_train",
    "q_semantic_decontaminate", "q_ann_pq", "q_pq_recall", "q_ann_ivfpq",
    "q_ivfpq_recall", "q_bpe_apply",
    "q_leakage_safe_split", "q_novelty_incremental",
    // round-12 session 2: rank-weighted retrieval eval, corpus-shape
    // diagnostics, CCNet bucketing, JL reduction
    "q_ndcg", "q_zipf_fit", "q_perplexity_bucket", "q_jl_project",
    "q_tokenizer_fertility", "q_embed_covariance", "q_mmr_diversify",
    "q_moore_lewis", "q_feature_hash", "q_interleave", "q_bigram_lm", "q_source_overlap", "q_silhouette", "q_cdc_chunks", "q_dsir_weights", "q_blocklist", "q_data_card", "q_minhash_bbit", "q_lr_train", "q_calibration", "q_embed_standardize", "q_simhash_recall", "q_token_budget_cut", "q_span_corrupt", "q_fim", "q_score_norm", "q_negative_samples", "q_blocklist_phrases", "q_dedup_by_source", "q_mrr",
    "q_dedup_refresh", "q_ann_refresh", "q_novelty_refresh",
    "q_media_dedup", "q_ann_retrain", "q_novelty_compact",
    // round 18
    "q_audio_dedup", "q_video_dedup", "q_media_dedup_refresh",
    "q_video_dedup_multi", "q_gif_dedup", "q_crossmodal_dedup",
    "q_bitext_margin", "q_knn_classify", "q_emb_outliers",
    "q_token_entropy", "q_bitext_margin_ivf",
    "q_html_extract", "q_sentence_segment")
}
