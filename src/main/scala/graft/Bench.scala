package graft

/** Benchmark main: times the headline query set from BASELINE.md — the ten
  * dashboard cards D1–D10, the merge pipeline (J1), the cleaning aggregate
  * (A1), and the two composed reference pipelines (clean, warehouse) — on
  * SPARK_GRAFT_SF_DIR, printing one JSON line.
  *
  * Each query is fully materialized via a `noop`-format write: every output
  * column is computed and serialized on the executors, so expression-heavy
  * projections are really timed. A bare `.count()` would let Catalyst prune
  * all columns and bench the scan alone (round-1 VERDICT "What's wrong").
  * An untimed warm-up amortizes JVM/codegen/classloading (a small-SF pass
  * over the whole headline set), parquet footer + page-cache reads for
  * EVERY input table (one noop scan per sfDir table), and the per-JVM
  * staged codebooks, so per-query numbers measure the plan, not
  * first-touch JIT noise (with a d9-only warm-up, the first query to
  * touch lineitem absorbed ~4 s of one-time cost that its plan didn't
  * own).
  *
  * Three verdict-driven gates ride along in the JSON line:
  *  - a query whose ANY timed run failed reports `null` (a broken query
  *    must not masquerade as a fast success — round-2 ADVICE);
  *  - `regressions`: headline queries slower than 2× their recorded
  *    BASELINE.md median (the round-over-round regression gate);
  *  - `scaling`: per-query elapsed ratio vs one run at a smaller scale
  *    factor (default sf0.01, ~10× less data) — a numeric tripwire for
  *    superlinear plans: ratios far above the data ratio mean a plan
  *    stopped scaling linearly.
  *
  * Delivery posture (round 8): the run is on a wall-clock budget
  * (SPARK_GRAFT_BENCH_BUDGET, default 45 min) and emits its verdict line
  * + BENCH.json after EVERY phase (timed / gated / final), so a driver
  * timeout kill costs detail, never the verdict; a `host` preamble
  * (shm free, load, free mem, heap, tmpdir) makes cross-environment
  * drift self-diagnosing; and the /dev/shm scratch redirect is
  * capacity-gated (≥8 GiB usable, SPARK_GRAFT_TMPFS=0 opt-out) so a
  * container with a default 64 MiB shm never spills into a starving
  * tmpfs.
  */
object Bench {
  val headline: Seq[String] = Seq(
    "d1_avg_popularity", "d2_n_artists", "d3_top_albums",
    "d4_winning_artists", "d5_wins_danceability", "d6_year_genre_pivot",
    "d7_extremes", "d8_low_energy_popular", "d9_top_artists",
    "d10_genre_wins", "j1_merge_indicator", "a1_mode_first",
    "pipeline_clean", "pipeline_warehouse_counts",
    // The curation surface (from round 3): full text-curation chain,
    // decontamination overlap join, LSH-pruned ANN.
    "t_curation_funnel", "t_decontam", "sim_topk_lsh",
    // Training-mix assembly: global-order sequence packing (distributed
    // prefix sum) and per-source token-budget trimming.
    "t_pack_sequences", "t_token_budget",
    // The whole curation→mix→pack chain as one plan.
    "t_training_pipeline",
    // BI/warehouse surface (first ship in round 3's exit bench): one-pass
    // multi-level rollup, SCD2 snapshot apply, stream-stream attribution
    // batch face.
    "olap_rollup", "scd2_versions", "ev_attribution",
    // Retrieval/sketch surface (round 3): chunk generator, BM25 scoring,
    // count-min heavy hitters, bloom-pruned incremental dedup.
    "t_chunk_overlap", "t_bm25", "t_cms_heavy", "t_dedup_bloom",
    // Lakehouse + graph surface (round 3, late): MERGE INTO upsert,
    // Z-order clustered rewrite, iterative integer PageRank.
    "lake_merge", "s17_zorder_box", "g_pagerank",
    // Round-3 continuation first-ships: OLAP skyline + market basket,
    // prefix-filtered all-pairs similarity join, drift gate, Merkle-
    // pruned diff, sketch join-size, PQ ANN (train+query — the ADC
    // training cost is the story; IVF-PQ adds only a redundant second
    // training of the same quantizers, so it stays correctness-only),
    // triangle census.
    "olap_skyline", "fi_pairs", "t_setsim_prefix", "dq_drift_nchars",
    "a19_diff_pruned", "t_cms_join_size", "sim_topk_pq", "g_triangles",
    // Late-session first-ships: two-pass exact median + decile ladder,
    // concurrency sweep, exact incremental near-dup, k-core peeling.
    "olap_group_median", "olap_group_deciles", "ev_concurrency",
    "t_setsim_incremental", "g_kcore",
    // Statistics + retrieval first-ships: MAD outliers, weighted
    // median, exact-moment corr/OLS, time-weighted average, inverted
    // index build, golden-record survivorship.
    "dq_outliers_mad", "t_weighted_median", "olap_corr_ols", "ev_twa",
    "t_inverted_index", "j4_golden_record",
    // Recommender + concentration + funnel-latency first-ships.
    "fi_cosine_topk", "fi_recs_user", "olap_concentration",
    "ev_funnel_latency",
    // Graph + experimentation first-ships.
    "g_pagerank_weighted", "g_communities", "ev_ab_test",
    "ev_bursts", "dq_fk_chain", "ev_cohort_ltv", "ev_streaks",
    // Round-4 first-ships: winnowing local fingerprints, multi-source
    // BFS, Luhn PII gate, hard-negative mining, 7-day moving average,
    // RRF hybrid retrieval, duplicated-span profile, winsorized mean.
    // (t_containment stays correctness-only: blocked all-pairs grows
    // quadratically in block size by design — the same reasoning that
    // keeps the redundant-retrain IVF-PQ variant out of the headline.)
    "t_winnow_fp", "g_bfs_hops", "dq_pii_luhn",
    "sim_hard_negatives", "w_moving_avg",
    "t_rrf_fusion", "t_dup_spans", "olap_winsorized",
    // Late round-4 first-ships (no pins yet — gated from the round
    // they first appear in a driver bench): winnow candidate pairs,
    // keyword extraction, Gopher quality, Benford audit, tolerance
    // as-of, MMR re-rank, running distinct, completeness profile.
    // t_containment_scaled also stays correctness-only ON THIS CORPUS:
    // the synthetic docs are templated, so winnow fingerprints are
    // shared almost all-pairs and the candidate set degenerates to the
    // quadratic one (14.4 s, scaling 8.6 — pure candidate fan-out). On
    // a diverse real corpus the candidate volume is the rare-overlap
    // set and the same plan is linear; the plan shape, not this
    // corpus's timing, is the scale argument (SCALE.md).
    "t_winnow_pairs", "t_keywords", "t_quality_gopher", "dq_benford",
    "ev_asof_tolerance", "sim_mmr_rerank", "olap_running_distinct",
    "dq_completeness", "t_tokens_regex",
    // Round-6 first-ships: per-doc n-gram novelty (first-occurrence
    // attribution) and DSIR-style importance selection.
    // t_containment_diverse stays correctness-only: it is a fixture
    // whose JOB is measuring candidate volume (SCALE.md r6), not a
    // workload.
    "t_novelty", "t_dsir_select",
    // Round-6 second-batch first-ships: exact connected components,
    // KMV pairwise set-op sketch, familiarity scoring, per-source cap,
    // positional phrase search, hour-of-day seasonal baseline.
    "g_concomp", "t_kmv_overlap", "t_familiarity", "t_source_cap",
    "t_phrase_search", "ev_seasonal_hour",
    // Round-6 third-batch first-ships: per-(type, hod) quantile bands
    // and Matryoshka-style truncated-dim recall.
    "ev_value_bands", "sim_recall_trunc",
    // Round-6 fourth-batch first-ships: integer-exact linear quality
    // classifier, per-source percent_rank score normalization,
    // C4-style line-level dedup with reassembly, personalized
    // PageRank, labeled-retrieval MRR eval, FD audit.
    "t_quality_logistic", "t_quality_rank", "t_line_dedup",
    "g_ppr", "sim_mrr_label", "dq_fd_audit",
    // Round-6 fifth-batch first-ships: RFM segmentation, DAU/WAU
    // stickiness, ABC Pareto classes (distributed prefix sum),
    // pinned-literal nDCG@10, vocabulary OOV coverage.
    "ev_rfm", "ev_dau_wau", "olap_abc", "sim_ndcg_label",
    "t_vocab_coverage",
    // Round-6 sixth-batch first-ships: snapshot time travel, C4
    // blocklist gate, soft quality sampling, k-anon generalization
    // ladder, CUSUM level-shift detection.
    "s23_snapshot_asof", "t_blocklist_filter", "t_soft_sample",
    "dq_anon_ladder", "ev_cusum_shift",
    // Round-6 seventh-batch first-ships: rank-change movers and
    // linear multi-touch attribution.
    "w_rank_change", "ev_attrib_linear",
    // Round-6 eighth-batch first-ships: session journeys and Simpson
    // lexical diversity. (t_setsim_sweep stays correctness-only ON
    // THIS CORPUS, the t_containment precedent: at its loose 0.7
    // threshold the templated docs' verified-pair volume explodes —
    // 31 s at sf0.1, pure output fan-out on a plan identical to
    // t_setsim_prefix. On a diverse corpus the 0.7 pair set is the
    // rare-overlap tail and the same plan prices the sweep cheaply.)
    "ev_session_paths", "t_simpson_diversity",
    // Round-6 ninth-batch first-ship: the native whole-operator as-of
    // join (custom strategy + merge exec), benched beside the composed
    // carry-forward form it must at least match.
    "ev_asof_native",
    // Round-6 tenth-batch first-ships: snapshot version diff,
    // association rules, per-user bounce rate.
    "s24_snapshot_diff", "fi_rules", "ev_bounce_rate",
    // Round-6 eleventh-batch first-ships: common-neighbor Jaccard link
    // prediction, degree assortativity, largest-remainder proportional
    // stratified sampling, Markov next-event prediction accuracy.
    "g_link_predict", "g_assortativity", "t_proportional_sample",
    "ev_markov_next",
    // Round-6 twelfth-batch first-ships: dyadic-weight trailing EWMA,
    // lift-ranked collocation extraction, most-frequent-value profile.
    "ev_ewma", "t_collocations", "dq_mfv_profile",
    // Round-6 thirteenth-batch first-ships: cosine radius search,
    // audience-overlap matrix, per-language lexical richness.
    "sim_range_search", "ev_audience_overlap", "t_lexical_richness",
    // Round-6 fourteenth-batch first-ships: language-ID PRF metrics,
    // weekly growth accounting, Tukey-fence IQR anomaly flags.
    "t_langid_prf", "ev_growth_accounting", "ev_anomaly_iqr",
    // Round-6 fifteenth-batch first-ships: a-priori frequent triples,
    // dyadic time-decay attribution, lead-lag cross-correlation.
    "fi_triples", "ev_attrib_decay", "ev_lag_correlation",
    // Round-6 sixteenth-batch first-ships: zero-float p-chart rate
    // control, dyadic degree distribution, per-source dup-rate report.
    "ev_error_pchart", "g_degree_dist", "dq_dup_rate_source",
    // Round-6 seventeenth-batch first-ships: LSH bucket-balance skew
    // report, basket-size pair bill, customer-band migration matrix.
    "sim_bucket_balance", "fi_basket_stats", "w_customer_migration",
    // Round-6 eighteenth-batch first-ships: CCNet head/middle/tail
    // split, near-dup cluster-size profile, DoW×HoD heatmap.
    "t_ccnet_buckets", "t_neardup_profile", "ev_heatmap",
    // Round-6 nineteenth-batch first-ships: context-window fit report
    // and Apdex satisfaction score.
    "t_context_fit", "ev_apdex",
    // Round-6 twentieth-batch first-ships: per-user Simpson behavioral
    // diversity and the quality-gate ablation matrix.
    "ev_user_diversity", "t_gate_ablation",
    // Round-6 twenty-first-batch first-ships: first-touch attribution,
    // cart-abandonment rate, per-dimension embedding variance.
    "ev_attrib_first", "ev_cart_abandonment", "sim_dim_variance",
    // Round-6 twenty-second-batch first-ship: the cross-source
    // contamination matrix. (sim_knn_purity stays correctness-only,
    // the sim_knn_join precedent: the 8-cell coarse quantizer puts
    // ~n/8 vectors per cell, so the full self-kNN approaches
    // all-pairs on THIS corpus — 56.8 s at sf0.1, scaling 4.5. The
    // plan is the bucketed-top-k shape; the cell count is the knob,
    // and the headline already prices that shape via sim_topk_lsh.)
    "t_cross_source_overlap",
    // Round-6 twenty-third-batch first-ships: month seasonality index
    // and YoY delta-contribution waterfall.
    "w_seasonality_index", "olap_delta_contribution",
    // Round-6 twenty-fourth-batch first-ship: label-centroid
    // separation matrix.
    "sim_label_separation",
    // Round-6 twenty-fifth-batch first-ships: ID-continuity audit and
    // the dedup savings report.
    "dq_id_continuity", "t_dedup_savings",
    // Round-6 twenty-sixth-batch first-ships: CCNet-split fairness
    // matrix and the embedding norm audit.
    "t_ccnet_by_lang", "sim_norm_audit",
    // Round-6 twenty-seventh-batch first-ships: session-depth
    // distribution and the per-source epoch plan.
    "ev_session_depth", "mix_epoch_plan",
    // Round-6 twenty-eighth-batch first-ships: boilerplate-line report
    // and per-type inter-arrival percentiles.
    "t_boilerplate_lines", "ev_interarrival_median",
    // Round-6 twenty-ninth-batch first-ships: new-vs-returning revenue
    // split and the hub wedge-share report.
    "ev_new_vs_returning", "g_hub_report",
    // Round-6 thirtieth-batch first-ships: the order/lineitem
    // reconciliation audit (lineitem-wide groupBy + full-outer join)
    // and the pair-free anisotropy audit (two passes over embeddings).
    "dq_order_reconcile", "sim_anisotropy",
    // Round-6 thirty-first-batch first-ships: the forecast backtest
    // (dense-spine windows) and the full-row duplicate audit (four
    // whole-table distinct aggregates).
    "ev_forecast_backtest", "dq_duplicate_rows",
    // Round-6 thirty-second-batch first-ships: the seasonal-residual
    // anomaly detector (two ladder passes over hour cells) and the
    // cross-table temporal-order audit (lineitem-wide equi-join).
    "ev_anomaly_seasonal", "dq_temporal_order",
    // Round-6 thirty-third-batch first-ships: modularity (pair graph +
    // 4 label-prop rounds + three label-keyed aggregates) and the
    // vocabulary concentration curve (token-stream aggregate).
    "g_modularity", "t_ngram_coverage_curve",
    // Round-6 thirty-fourth-batch first-ships: per-path conversion
    // (session_window assembly) and the hourly load-error correlation.
    "ev_path_conversion", "ev_load_error_corr",
    // Round-6 thirty-fifth-batch first-ships: the strict-order window
    // funnel (three conditional-min fact passes) and χ² drift.
    "ev_window_funnel", "dq_drift_chisq",
    // Round-6 thirty-sixth-batch first-ships: k-means diversity
    // sampling (trained centroids + per-cell quota) and MTTR (one
    // forward-frame user window + the quantile ladder).
    "sim_diverse_sample", "ev_mttr",
    // Round-6 thirty-seventh-batch first-ships: the adoption curve
    // (per-type first-use + running total) and the three-table domain
    // conformance audit.
    "ev_adoption_curve", "dq_domain_conformance",
    // Round-6 thirty-eighth-batch first-ships: the gate-agreement
    // matrix (three gates in one projection) and IVF cell balance.
    "t_gate_agreement", "sim_cell_balance",
    // Round-6 thirty-ninth-batch first-ships: hub two-hop reach
    // (seeded frontier joins) and the temperature sweep.
    "g_two_hop_reach", "t_mix_temperature_sweep",
    // Round-6 fortieth-batch first-ships: per-day content fingerprints
    // and the mod-N vs rendezvous resharding-cost comparison.
    "dq_fingerprint_daily", "t_shard_stability",
    // Round-6 forty-first-batch first-ships: the session-gap and
    // attribution-window knob sweeps, and the Zipf frequency spectrum.
    "ev_session_gap_sweep", "ev_attrib_window_sweep", "t_freq_spectrum",
    // Round-6 forty-second-batch first-ships: the LSH band sweep,
    // per-type dwell-time quantiles, and closure by degree class.
    "t_lsh_band_sweep", "ev_dwell_time", "g_closure_by_degree",
    // Round-6 forty-third-batch first-ships: error-budget burn and
    // the quality-score calibration table.
    "ev_error_budget", "t_quality_calibration",
    // Round-6 forty-fourth-batch first-ships: the Jaccard-threshold
    // sweep and association-rule temporal stability.
    "t_jaccard_threshold_sweep", "fi_rule_stability",
    // Round-7 first-ships (no pins until this round's full-set run):
    // XML and binaryFile source round-trips, the Spark-4 VARIANT
    // extraction path, and the binary-quantization two-tier ANN
    // (sign-code Hamming funnel + exact rerank) with its recall
    // calibration.
    "s25_xml_roundtrip", "s26_binaryfile_scan", "ev_variant_props",
    "sim_topk_bq", "sim_recall_bq",
    // The IVF×BQ composition (cell prune → code funnel → exact rerank)
    // and its compounded-recall calibration.
    "sim_topk_ivf_bq", "sim_recall_ivf_bq",
    // Round-8 first-ships (no pins until this round's full-set run):
    // the persisted-code-table BQ funnel (the serving-node path — codes
    // read from the lake, corpus never re-encoded per query) and the
    // streaming face of the VARIANT extraction.
    "sim_topk_bq_persist", "ev_variant_stream",
    // Round-9 first-ship (pinned round 10 from the driver's r9 run):
    // the persisted COMPOSED IVF×BQ index — both pruning tiers read
    // from one staged (id, cell, code) lake artifact.
    "sim_topk_ivf_bq_persist",
    // Round-11 first-ships (no pins until this round's full-set run):
    // the three streamed sketch faces registered under the driver's own
    // oracle gate — per-batch partial replay + the round's
    // PartialState.compact fold inside each query, report read from
    // state alone.
    "dq_benford_stream", "dq_drift_chisq_stream", "t_cms_join_size_stream",
    // Round-11 second-wave first-ships (no pins until this round's
    // full-set run): the k-anonymity and corpus dup-rate families'
    // streamed faces (same per-batch-partial + mid-replay-compact shape
    // as the first three) and the dup-rate batch twin.
    "t_dup_rate", "t_dup_rate_stream", "dq_k_anonymity_stream",
    // The maintained-Bloom membership probe (fixed-size twin of the
    // dup-rate monitor): two-batch replay + mid-replay compact + a
    // state-only probe of the held-out third.
    "t_dedup_bloom_stream",
    // Round-11 third-wave first-ships: the last three streamed faces
    // without registered oracle queries — maintained-TVD drift (shared
    // kernel, verbatim batch oracle), KMV pairwise-from-state (oracle =
    // the batch oracle's sketch half), and the HLL distinct-count face
    // (a8_hll_merge-style boolean contract gates, union-merged state).
    "dq_drift_lang_stream", "t_kmv_overlap_stream", "a8_hll_stream")

  /** Round-4 exit per-query medians — ALL pinned from ONE full-set
    * run (sf0.1, local[32], median-of-3, every headline query in the
    * same session with pre-run block cleanup), replacing the r3 mix of
    * restricted-set and full-set pins that made two regression flags
    * incomparable (VERDICT r3 / ADVICE). Recorded in BASELINE.md.
    * Queries added after this run have no entry and are gated from the
    * round they first ship.
    */
  /** The sfDir warm-pass set (warm-up part 4, round 16): the queries
    * measured ≥ 1.1 s median in the r16 post-optimization no-warm
    * full-set run — the rep-1 cold-code storm carriers. Static by
    * design; see the part-4 comment in main for why not pin-derived.
    */
  val warmSet: Set[String] = Set(
    "a8_hll_stream", "dq_benford_stream", "dq_fd_audit", "dq_outliers_mad",
    "fi_cosine_topk", "fi_pairs", "fi_recs_user", "fi_rule_stability",
    "fi_rules", "fi_triples", "g_assortativity", "g_bfs_hops",
    "g_closure_by_degree", "g_communities", "g_concomp", "g_degree_dist",
    "g_hub_report", "g_kcore", "g_link_predict", "g_modularity",
    "g_pagerank", "g_pagerank_weighted", "g_ppr", "g_triangles",
    "g_two_hop_reach", "j4_golden_record", "olap_group_deciles",
    "olap_group_median", "pipeline_clean", "pipeline_warehouse_counts",
    "s17_zorder_box", "t_ccnet_buckets", "t_ccnet_by_lang",
    "t_cms_join_size", "t_cms_join_size_stream", "t_cross_source_overlap",
    "t_curation_funnel", "t_dedup_bloom_stream", "t_dedup_savings",
    "t_dsir_select", "t_dup_rate_stream", "t_kmv_overlap_stream",
    "t_neardup_profile", "t_setsim_incremental", "t_setsim_prefix",
    "t_training_pipeline")

  /** Per-query regression pins — re-pinned IN FULL in round 16 (the
    * r15 verdict's item 3 and BASELINE.md's deferred round-15 addendum):
    * one source, the round-16 post-optimization full-set run (209/209
    * measured, total 132.3 s, zero failures, zero regressions, load_avg
    * < 1, tmpfs scratch, 16 g pin heap, sfDir warm pass active — the
    * same methodology every future run uses). The previous map had
    * accreted r4-r14 values batch by batch; after r15's parallelization
    * and r16's native kernels, 30+ pins sat 2-10x above current
    * medians, so the 2x gate could neither catch a real regression on
    * those queries nor stop flagging environmental noise on the rest
    * (the r15 driver run flagged six phantom breaches against r14-era
    * pins). Pin history and every adjudication stays in BASELINE.md;
    * the one-pin-source rule is unchanged.
    */
  val baselineMedians: Map[String, Double] = Map(
    "a19_diff_pruned" -> 0.47, "a1_mode_first" -> 0.61,
    "a8_hll_stream" -> 0.96, "d10_genre_wins" -> 0.62,
    "d1_avg_popularity" -> 0.34, "d2_n_artists" -> 0.30,
    "d3_top_albums" -> 0.43, "d4_winning_artists" -> 0.22,
    "d5_wins_danceability" -> 0.72, "d6_year_genre_pivot" -> 0.38,
    "d7_extremes" -> 0.62, "d8_low_energy_popular" -> 0.32,
    "d9_top_artists" -> 0.41, "dq_anon_ladder" -> 0.29,
    "dq_benford" -> 0.49, "dq_benford_stream" -> 1.01,
    "dq_completeness" -> 0.41, "dq_domain_conformance" -> 0.27,
    "dq_drift_chisq" -> 0.31, "dq_drift_chisq_stream" -> 0.84,
    "dq_drift_lang_stream" -> 0.80, "dq_drift_nchars" -> 0.32,
    "dq_dup_rate_source" -> 0.27, "dq_duplicate_rows" -> 0.61,
    "dq_fd_audit" -> 1.05, "dq_fingerprint_daily" -> 0.41,
    "dq_fk_chain" -> 1.72, "dq_id_continuity" -> 0.36,
    "dq_k_anonymity_stream" -> 0.74, "dq_mfv_profile" -> 0.22,
    "dq_order_reconcile" -> 0.73, "dq_outliers_mad" -> 2.03,
    "dq_pii_luhn" -> 0.14, "dq_temporal_order" -> 0.46,
    "ev_ab_test" -> 0.20, "ev_adoption_curve" -> 0.23,
    "ev_anomaly_iqr" -> 0.52, "ev_anomaly_seasonal" -> 0.88,
    "ev_apdex" -> 0.15, "ev_asof_native" -> 0.27,
    "ev_asof_tolerance" -> 0.32, "ev_attrib_decay" -> 0.40,
    "ev_attrib_first" -> 0.33, "ev_attrib_linear" -> 0.35,
    "ev_attrib_window_sweep" -> 0.22, "ev_attribution" -> 0.26,
    "ev_audience_overlap" -> 0.24, "ev_bounce_rate" -> 0.30,
    "ev_bursts" -> 0.22, "ev_cart_abandonment" -> 0.29,
    "ev_cohort_ltv" -> 1.25, "ev_concurrency" -> 0.60,
    "ev_cusum_shift" -> 0.18, "ev_dau_wau" -> 0.41,
    "ev_dwell_time" -> 0.59, "ev_error_budget" -> 0.15,
    "ev_error_pchart" -> 0.20, "ev_ewma" -> 0.25,
    "ev_forecast_backtest" -> 0.21, "ev_funnel_latency" -> 0.41,
    "ev_growth_accounting" -> 0.31, "ev_heatmap" -> 0.21,
    "ev_interarrival_median" -> 0.68, "ev_lag_correlation" -> 0.27,
    "ev_load_error_corr" -> 0.17, "ev_markov_next" -> 0.38,
    "ev_mttr" -> 0.82, "ev_new_vs_returning" -> 0.26,
    "ev_path_conversion" -> 0.46, "ev_rfm" -> 0.20,
    "ev_seasonal_hour" -> 0.22, "ev_session_depth" -> 0.32,
    "ev_session_gap_sweep" -> 0.18, "ev_session_paths" -> 0.41,
    "ev_streaks" -> 0.24, "ev_twa" -> 0.38, "ev_user_diversity" -> 0.18,
    "ev_value_bands" -> 0.81, "ev_variant_props" -> 0.34,
    "ev_variant_stream" -> 0.36, "ev_window_funnel" -> 0.47,
    "fi_basket_stats" -> 0.79, "fi_cosine_topk" -> 1.03,
    "fi_pairs" -> 1.13, "fi_recs_user" -> 1.41,
    "fi_rule_stability" -> 1.49, "fi_rules" -> 1.08, "fi_triples" -> 1.80,
    "g_assortativity" -> 1.36, "g_bfs_hops" -> 1.20,
    "g_closure_by_degree" -> 1.48, "g_communities" -> 1.63,
    "g_concomp" -> 1.74, "g_degree_dist" -> 1.27, "g_hub_report" -> 1.31,
    "g_kcore" -> 1.67, "g_link_predict" -> 1.39, "g_modularity" -> 1.94,
    "g_pagerank" -> 0.94, "g_pagerank_weighted" -> 2.02, "g_ppr" -> 0.98,
    "g_triangles" -> 1.13, "g_two_hop_reach" -> 1.17,
    "j1_merge_indicator" -> 0.35, "j4_golden_record" -> 1.94,
    "lake_merge" -> 0.22, "mix_epoch_plan" -> 0.50, "olap_abc" -> 0.75,
    "olap_concentration" -> 0.53, "olap_corr_ols" -> 0.57,
    "olap_delta_contribution" -> 0.79, "olap_group_deciles" -> 1.13,
    "olap_group_median" -> 1.15, "olap_rollup" -> 0.55,
    "olap_running_distinct" -> 0.16, "olap_skyline" -> 0.27,
    "olap_winsorized" -> 0.85, "pipeline_clean" -> 1.09,
    "pipeline_warehouse_counts" -> 2.82, "s17_zorder_box" -> 1.36,
    "s23_snapshot_asof" -> 0.61, "s24_snapshot_diff" -> 0.70,
    "s25_xml_roundtrip" -> 0.53, "s26_binaryfile_scan" -> 0.20,
    "scd2_versions" -> 0.23, "sim_anisotropy" -> 0.17,
    "sim_bucket_balance" -> 0.19, "sim_cell_balance" -> 0.13,
    "sim_dim_variance" -> 0.23, "sim_diverse_sample" -> 0.14,
    "sim_hard_negatives" -> 0.34, "sim_label_separation" -> 0.33,
    "sim_mmr_rerank" -> 0.42, "sim_mrr_label" -> 0.83,
    "sim_ndcg_label" -> 0.85, "sim_norm_audit" -> 0.22,
    "sim_range_search" -> 0.44, "sim_recall_bq" -> 0.51,
    "sim_recall_ivf_bq" -> 0.51, "sim_recall_trunc" -> 0.84,
    "sim_topk_bq" -> 0.46, "sim_topk_bq_persist" -> 0.46,
    "sim_topk_ivf_bq" -> 0.40, "sim_topk_ivf_bq_persist" -> 0.69,
    "sim_topk_lsh" -> 0.25, "sim_topk_pq" -> 0.30,
    "t_blocklist_filter" -> 0.22, "t_bm25" -> 0.24,
    "t_boilerplate_lines" -> 0.36, "t_ccnet_buckets" -> 0.93,
    "t_ccnet_by_lang" -> 1.26, "t_chunk_overlap" -> 0.37,
    "t_cms_heavy" -> 0.31, "t_cms_join_size" -> 1.02,
    "t_cms_join_size_stream" -> 2.30, "t_collocations" -> 0.60,
    "t_context_fit" -> 0.29, "t_cross_source_overlap" -> 0.93,
    "t_curation_funnel" -> 1.98, "t_decontam" -> 0.67,
    "t_dedup_bloom" -> 0.55, "t_dedup_bloom_stream" -> 1.11,
    "t_dedup_savings" -> 0.90, "t_dsir_select" -> 0.74,
    "t_dup_rate" -> 0.22, "t_dup_rate_stream" -> 1.07,
    "t_dup_spans" -> 0.74, "t_familiarity" -> 0.52,
    "t_freq_spectrum" -> 0.24, "t_gate_ablation" -> 0.28,
    "t_gate_agreement" -> 0.26, "t_inverted_index" -> 0.21,
    "t_jaccard_threshold_sweep" -> 0.35, "t_keywords" -> 0.70,
    "t_kmv_overlap" -> 0.45, "t_kmv_overlap_stream" -> 0.94,
    "t_langid_prf" -> 0.25, "t_lexical_richness" -> 0.28,
    "t_line_dedup" -> 0.49, "t_lsh_band_sweep" -> 1.00,
    "t_mix_temperature_sweep" -> 0.24, "t_neardup_profile" -> 0.83,
    "t_ngram_coverage_curve" -> 0.29, "t_novelty" -> 0.56,
    "t_pack_sequences" -> 0.39, "t_phrase_search" -> 0.71,
    "t_proportional_sample" -> 0.39, "t_quality_calibration" -> 0.56,
    "t_quality_gopher" -> 0.26, "t_quality_logistic" -> 0.25,
    "t_quality_rank" -> 0.23, "t_rrf_fusion" -> 0.48,
    "t_setsim_incremental" -> 1.64, "t_setsim_prefix" -> 1.59,
    "t_shard_stability" -> 0.42, "t_simpson_diversity" -> 0.41,
    "t_soft_sample" -> 0.29, "t_source_cap" -> 0.19,
    "t_token_budget" -> 0.40, "t_tokens_regex" -> 0.41,
    "t_training_pipeline" -> 2.88, "t_vocab_coverage" -> 0.46,
    "t_weighted_median" -> 0.54, "t_winnow_fp" -> 0.21,
    "t_winnow_pairs" -> 0.64, "w_customer_migration" -> 0.45,
    "w_moving_avg" -> 0.19, "w_rank_change" -> 0.47,
    "w_seasonality_index" -> 0.26)

  def main(args: Array[String]): Unit = {
    val wallStart = System.nanoTime()
    def elapsedWall: Double = (System.nanoTime() - wallStart) / 1e9
    // Wall-clock budget (r7 verdict item 1b): the driver's capture window
    // killed six consecutive rounds' runs at rc=124 before the verdict
    // line printed. When the budget is exceeded mid-run the schedule
    // degrades (reps cut, scaling sweep skipped) instead of the verdict
    // being lost — the gate math (median+min vs 2× pin) survives fewer
    // reps; a missing verdict survives nothing.
    val budgetSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "2700").toDouble
    // Optional args: restrict to the named queries (local plan iteration
    // on one slow query without paying the whole headline set). Any
    // REGISTERED query is allowed here — e.g. the correctness-only
    // fixtures when measuring a scaling probe for SCALE.md — but the
    // driver passes none, so the headline set alone is what it measures.
    val only = if (args.isEmpty) headline
               else args.toSeq.distinct.filter(SparkEntry.queries.contains)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val smallDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // Stage write-heavy scratch (the lake/index parquet artifacts the
    // persistence queries build, Spark's shuffle/spill local dirs) on
    // tmpfs when the host has one: the bench measures plans, and r6's
    // only two round-over-round slowdowns (pipeline_clean,
    // t_curation_funnel) were retry-cleared disk write-back transients —
    // the confound the r6 verdict asked to remove. Must happen BEFORE
    // the session is created (Spark snapshots java.io.tmpdir for its
    // local dirs); correctness runs (graft.Verify) keep the default.
    // CAPACITY-GATED (r7 verdict item 2): a container with the default
    // 64 MiB shm would have every shuffle spill shoved into a starving
    // tmpfs — the suspected cause of the r7 driver run's staged-write
    // slowdowns. Redirect only when /dev/shm reports ≥8 GiB usable, and
    // honor SPARK_GRAFT_TMPFS=0 as an explicit opt-out; the chosen
    // tmpdir is recorded in the bench JSON either way.
    val shmFree: Long =
      try java.nio.file.Files
        .getFileStore(java.nio.file.Paths.get("/dev/shm")).getUsableSpace
      catch { case _: Throwable => -1L }
    val tmpfsWanted = !sys.env.get("SPARK_GRAFT_TMPFS").contains("0")
    if (tmpfsWanted && shmFree >= (8L << 30)) {
      val scratch = new java.io.File("/dev/shm", "graft-bench-tmp")
      scratch.mkdirs()
      sys.props("java.io.tmpdir") = scratch.getAbsolutePath
    }
    // Host-health preamble (r7 verdict item 1c): three rounds of
    // BASELINE.md adjudicated host-window drift by hand; these fields
    // make a cross-environment discrepancy self-diagnosing from the
    // JSON alone.
    val hostJson = {
      val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      val freeMem: Long = os match {
        case b: com.sun.management.OperatingSystemMXBean => b.getFreeMemorySize
        case _ => -1L
      }
      def gb(x: Long): String =
        if (x < 0) "null" else f"${x / 1073741824.0}%.1f"
      s"""{"shm_free_gb":${gb(shmFree)},"procs":${Runtime.getRuntime.availableProcessors},"load_avg":${f"${os.getSystemLoadAverage}%.2f"},"free_mem_gb":${gb(freeMem)},"heap_gb":${gb(Runtime.getRuntime.maxMemory)},"tmpdir":"${sys.props("java.io.tmpdir")}","budget_sec":${budgetSec.toInt}}"""
    }
    val spark = GraftSession.local(cpus, "graft-bench")

    def materialize(name: String, dir: String): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()

    /** One timed materialization; None if the query threw. Caches left by
      * a previous run (the warehouse pipeline persists its merge stage)
      * are dropped BEFORE the timer starts, so every timed run pays its
      * own materialization — a stale cache would report the plan's warm
      * re-read cost as its build cost. `clearCache` only drops SQL-cached
      * relations; localCheckpoint blocks (Median/Dedup/Graph loops) stay
      * in block storage until the ContextCleaner GCs them, so across a
      * 59-query run they accumulate and crowd the storage pool — the
      * reconciliation suspect behind round 3's t_weighted_median flag
      * (18.3 s under the driver's full-set run vs 0.87 s isolated).
      * Explicitly unpersisting every lingering RDD makes each timed run
      * self-contained; every query rebuilds its DataFrame fresh, so no
      * live lineage can reference the dropped blocks.
      *
      * Returns (wall, processCpu) seconds (r8 verdict item 3): in local
      * mode the executors share this JVM, so a healthy rep's CPU runs at
      * roughly wall × effective parallelism, while a host-contention rep
      * shows minutes of wall over seconds of CPU — r8's 278 s t_decontam
      * carried ~5 s of CPU when re-run, an adjudication that took a
      * manual sandbox session; the JSON now carries the proof itself.
      */
    val osBean =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
    /** None when the platform bean isn't com.sun.management or reports
      * getProcessCpuTime unsupported (-1): a 0.0 delta there would read
      * as the wall≫cpu host-contention signature and could mask a real
      * regression as contention (ADVICE r9). Unsupported reps land as
      * NaN in the rep array and print as JSON null.
      */
    def processCpuSec: Option[Double] = osBean match {
      case b: com.sun.management.OperatingSystemMXBean =>
        val t = b.getProcessCpuTime
        if (t < 0) None else Some(t / 1e9)
      case _ => None
    }
    def timeOne(name: String, dir: String): Option[(Double, Double)] = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = true))
      val c0 = processCpuSec
      val t0 = System.nanoTime()
      try {
        materialize(name, dir)
        val cpu = (for (a <- c0; b <- processCpuSec) yield b - a)
          .getOrElse(Double.NaN)
        Some(((System.nanoTime() - t0) / 1e9, cpu))
      }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        None
      }
    }

    // Warm-up (untimed), in three cheap parts instead of a full sfDir
    // pass (which was ~4-6 min of the old ~30-min full-set wall — r7
    // verdict item 4):
    //  1. materialize every query at the SMALL scale factor: generated
    //     codegen classes are plan-shape-specific but data-size-
    //     independent, so this warms JIT/codegen/classloading for every
    //     plan at ~1/10 the data — and doubles as the warm-up the
    //     scaling probe's later smallDir pass relies on;
    //  2. one noop-materialized scan per sfDir TABLE, so parquet footers
    //     and the OS page cache for the big inputs are warm before any
    //     timed run — the round-1 lesson (the first query to touch
    //     lineitem absorbed ~4 s of one-time cost its plan didn't own)
    //     addressed at the table level, where that cost actually lives;
    //  3. the two queries that stage per-(JVM, sf-dir) codebooks
    //     (trained k-means cells, PQ quantizers) run once at sfDir so no
    //     timed first rep pays a one-time training.
    // AQE can still pick different physical shapes at sf0.1 than sf0.01
    // (broadcast/sort-merge switches), so a residual first-touch JIT may
    // land on a query's first timed rep — median-of-3 absorbs it.
    only.foreach { name =>
      try materialize(name, if (smallDir != sfDir) smallDir else sfDir)
      catch { case _: Throwable => () }
    }
    Option(new java.io.File(sfDir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
      .foreach { f =>
        try spark.read.parquet(f.getAbsolutePath)
          .write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    Seq("sim_cell_balance", "sim_topk_pq").filter(only.contains)
      .foreach { name =>
        try materialize(name, sfDir) catch { case _: Throwable => () }
      }
    //  4. (round 16 — an EXPLICIT, declared methodology addition; see
    //     OPTIMIZATION_r16.md "Warm pass") one untimed materialization of
    //     the HEAVIEST pinned plans AT sfDir. The sf0.01 pass (part 1)
    //     warms each plan's pre-AQE codegen classes, but AQE finalizes
    //     DIFFERENT physical shapes at sf0.1 (broadcast/SMJ switches,
    //     coalesced stage splits), so the first sf0.1 execution still
    //     compiled and C2-warmed those shapes inside a TIMED rep —
    //     measured r15/r16 as the "rep-1 cold-code storm": first-rep
    //     process CPU 1.5-3x the steady rep on dozens of queries (e.g.
    //     pipeline_warehouse_counts 88 vs 41 CPU-s, g_triangles 34 vs
    //     14), inflating two-rep medians that record the mean. Timed
    //     reps should measure the PLAN, not first-touch JIT; results are
    //     still computed from parquet on every timed rep (timeOne drops
    //     every cache first — this warms code paths, not data).
    //     HEAVIEST ONLY, not the full set: a full-209-query sfDir warm
    //     pass was measured (r16) to leave enough heap debris that the
    //     allocation-heaviest timed queries paid a sustained GC tax
    //     (t_setsim_prefix 30 → 170+ process-CPU-s on BOTH reps) — the
    //     cure was worse than the storm. The pin threshold keeps the
    //     warm set tied to the one pin source; unpinned first-ships stay
    //     cold (their 3-rep schedule absorbs it). Skipped when the wall
    //     budget is too tight, and skipped per-query on failure exactly
    //     like part 1; an extra GC cycle drains the warm debris before
    //     the settle phase's own cycle.
    //     The warm set is a STATIC list (not pin-derived): a pin
    //     threshold would oscillate — a query whose WARMED median drops
    //     below the threshold leaves the warm set on the next run, goes
    //     cold, and can trip its own (warm-pinned) regression gate.
    //     Provenance: every headline query whose median was ≥ 1.1 s in
    //     this round's post-optimization, no-warm full-set run — the
    //     measured storm set (first-rep CPU 1.5-3× steady).
    if (budgetSec - elapsedWall > 900) {
      warmSet.filter(only.contains).toSeq.sorted.foreach { name =>
        try materialize(name, sfDir) catch { case _: Throwable => () }
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.valuesIterator
          .foreach(_.unpersist(blocking = true))
      }
      System.gc()
      Thread.sleep(1000)
    }

    // Settle phase (r4 advice, r4-vs-r5 evidence): the warm-up pass just
    // queued ~60 queries' worth of shuffle files, broadcasts, and
    // checkpoint blocks for async ContextCleaner cleanup; if the first
    // timed queries run while that backlog drains, they absorb cleanup
    // contention their plans don't own (r4's driver session flagged 16
    // phantom regressions — d1-d3 at 14-16× — that r5 re-measured at
    // 1.01× aggregate with identical code). Drop caches, force the weak-
    // reference GC the cleaner keys on, give the daemon a moment to
    // drain, then burn one sacrificial query so the first TIMED query
    // doesn't pay the post-GC warm-back either.
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.valuesIterator
      .foreach(_.unpersist(blocking = true))
    System.gc()
    Thread.sleep(3000)
    spark.range(10000000L).selectExpr("sum(id * 2)").collect()

    // Timed repetitions per query: up to 3 (single runs at this scale
    // carry ±30% scheduler/GC noise, which would drown real plan
    // regressions), run as INTERLEAVED FULL-SET PASSES (r8 verdict
    // item 1): pass 1 times rep 1 of every query, pass 2 rep 2, pass 3
    // rep 3 — so one query's observations land a whole pass (~7-8 min)
    // apart instead of back-to-back. The min+retry gate's core assumption
    // ("interference cannot inflate the min as long as ANY run was
    // clean") failed in r8's driver window precisely because all 3
    // adjacent reps sat inside one minutes-long contaminated stretch (7
    // queries breached at MIN level, every one demoted by the end-of-run
    // retry); with reps a pass apart, any transient shorter than a pass
    // can inflate at most ONE rep — it can move neither the min nor the
    // median — and the retry pass goes back to being a backstop, not the
    // verdict.
    //
    // Per-query schedules inside the passes:
    //  - adaptive early stop (r8): when both of the first two reps sit at
    //    or under 1.5× the pin, the verdict is decided and rep 3 is
    //    skipped. (A FIXED 2-rep schedule was tried in r8 and measured
    //    statistically broken — 53 false suspects on a slow window.)
    //  - budget-pressure rep-3 skip (r8 verdict item 5, tightened per
    //    ADVICE r9): when pass 1 alone used >50% of the wall budget,
    //    rep 3 is also skipped for any pinned query whose 2-rep MAX is
    //    within the 2× gate — such a query can neither flag nor leave a
    //    median-only suspect regardless of rep 3, and the saved pass
    //    keeps the scaling probe inside the budget on a slow window.
    //  - once the budget is EXCEEDED, reps degrade to 1 (sub-1 s pins) /
    //    2 (other pinned): the verdict must print before the driver's
    //    timeout. A 2-rep median records the MEAN of the two, not the
    //    upper (ADVICE r8: upper-of-2 is the bias that manufactured the
    //    false-suspect experiment's flags).
    //  - UNPINNED first-ships always take all 3 reps, budget or not
    //    (ADVICE r8): their median becomes next round's pin and must
    //    never be sourced from a degraded schedule.
    // Any failed run poisons the result to None — a broken query must
    // never report as a fast success. The MIN of the reps is kept
    // alongside: the regression gate requires BOTH median and min to
    // breach (r4's 16 phantom flags, r6's 10× ev_asof_tolerance:
    // median-only artifacts that re-measured at pin).
    val repWalls = scala.collection.mutable.LinkedHashMap(
      only.map(_ -> Vector.empty[Double]): _*)
    val repCpus = scala.collection.mutable.LinkedHashMap(
      only.map(_ -> Vector.empty[Double]): _*)
    val failedQ = scala.collection.mutable.LinkedHashSet.empty[String]

    /** Median estimate of a rep list: mean for 2 reps (an upper-of-2
      * "median" is biased high by construction — ADVICE r8), the true
      * middle element otherwise.
      */
    def medianOf(t: Seq[Double]): Double = {
      val s = t.sorted
      if (s.size == 2) (s(0) + s(1)) / 2 else s(s.size / 2)
    }
    def results: Seq[(String, Option[Double])] = only.map { n =>
      val w = repWalls(n)
      n -> (if (failedQ(n) || w.isEmpty) None else Some(medianOf(w)))
    }
    def mins: Map[String, Double] = only.iterator
      .filter(n => !failedQ(n) && repWalls(n).nonEmpty)
      .map(n => n -> repWalls(n).min).toMap
    /** CPU seconds of a query's SLOWEST rep — the one a suspect verdict
      * hangs on. Wall ≫ cpu there is the host-contention signature.
      */
    def worstRepCpu(n: String): Option[Double] = {
      val w = repWalls(n); val c = repCpus(n)
      if (w.isEmpty || c.size < w.size) None
      else Some(c(w.indexOf(w.max))).filterNot(_.isNaN)
    }

    def jnum(v: Option[Double]): String =
      v.filterNot(_.isNaN).map(d => f"$d%.3f").getOrElse("null")
    def jmap(kvs: Seq[(String, Option[Double])]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + jnum(v) }
        .mkString("{", ",", "}")
    def jarrmap(kvs: Seq[(String, Seq[Double])]): String =
      kvs.map { case (k, v) =>
        "\"" + k + "\":" +
          v.map(d => jnum(Some(d))).mkString("[", ",", "]")
      }.mkString("{", ",", "}")

    // A query that threw is NOT a regression-map no-show: it's listed by
    // name, so an empty regressions map can never be mistaken for a
    // fully-measured clean run (r5 reported `regressions: {}` while 10
    // pinned queries were null — ADVICE r5). `value` sums only measured
    // queries; `measured` says how many that is, out of `of`.
    def failedJson: String =
      failedQ.map("\"" + _ + "\"").mkString("[", ",", "]")
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    // The verdict is emitted after EVERY phase — timing (periodic,
    // partial), timed, gated (post-retry), final (post-scaling) — not
    // once at the end: six consecutive driver rounds died at rc=124 with
    // `parsed: null` because the single print sat behind retries + the
    // scaling sweep + the file write. A timeout kill now costs detail,
    // never the verdict; the driver's tail-parse takes the LAST compact
    // line, and `phase` says how far the run got. stdout stays one
    // COMPACT line per phase — no per-query map (the r3-r5 drivers' tail
    // capture choked on it); full detail (queries + per-rep walls and
    // CPU seconds + mins + scaling maps) goes to the BENCH.json file.
    // Flagged/suspect entries carry `cpu` in the compact line too: the
    // CPU seconds of the slowest rep, so a 278 s-wall/5 s-CPU contention
    // rep self-diagnoses from the verdict line alone (r8 item 3).
    def emit(phase: String, regressions: Seq[(String, Double)],
             suspects: Seq[(String, Double)],
             scaling: Seq[(String, Option[Double])]): Unit = {
      val res = results
      val total = res.flatMap(_._2).sum
      val regs = jmap(regressions.map { case (k, v) => k -> Option(v) })
      val susp = jmap(suspects.map { case (k, v) => k -> Option(v) })
      val cpu = jmap((regressions ++ suspects).map(_._1).distinct
        .map(n => n -> worstRepCpu(n)))
      val shared = s""""metric":"total","value":${f"$total%.3f"},"unit":"sec","phase":"$phase","elapsed_wall_sec":${f"$elapsedWall%.1f"},"measured":${res.count(_._2.nonEmpty)},"of":${res.size},"failed":$failedJson,"regressions":$regs,"suspect":$susp,"cpu":$cpu,"host":$hostJson,"sf":"$sfDir""""
      val full =
        s"""{$shared,"queries":${jmap(res)},"mins":${jmap(mins.toSeq.map { case (k, v) => k -> Option(v) })},"reps":${jarrmap(only.map(n => n -> repWalls(n)))},"cpu_s":${jarrmap(only.map(n => n -> repCpus(n)))},"scaling":${jmap(scaling)}}"""
      try {
        val w = new java.io.PrintWriter(outFile, "UTF-8")
        try w.println(full) finally w.close()
      } catch { case e: Throwable =>
        System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
      }
      println(s"{$shared}")
      System.out.flush()
    }
    /** Current flagged (median AND min over 2× pin) / median-only
      * breaches from whatever reps exist so far — the same rule the gate
      * applies, evaluated on partial data for the periodic `timing`
      * lines (ADVICE r8: the old posture emitted nothing if the driver
      * died inside the timed loop, the bulk of the wall). A single-rep
      * "flag" in a timing line is conservative by construction (median =
      * min = that rep); later passes and the retry demote transients.
      */
    def breaches: (Seq[(String, Double)], Seq[(String, Double)]) = {
      val m = mins
      val fl = results.collect {
        case (name, Some(t))
          if baselineMedians.get(name).exists(b =>
            t > 2 * b && m.get(name).exists(_ > 2 * b)) =>
          name -> t / baselineMedians(name)
      }
      val mo = results.collect {
        case (name, Some(t))
          if baselineMedians.get(name).exists(b =>
            t > 2 * b && m.get(name).exists(_ <= 2 * b)) =>
          name -> t / baselineMedians(name)
      }
      (fl, mo)
    }

    // The interleaved passes themselves. Pass 1 wall (the pass ALONE —
    // session build, warm-up, and settle are excluded, ADVICE r9) is the
    // yardstick for the rep-3 budget-pressure skip; a `timing` verdict
    // line lands every 30 timed runs so a kill mid-loop still leaves a
    // parseable verdict.
    var runsDone = 0
    var pass1Wall = 0.0
    val preLoopWall = elapsedWall
    for (pass <- 1 to 3) {
      for (name <- only if !failedQ(name) && repWalls(name).size < pass) {
        val pin = baselineMedians.get(name)
        val walls = repWalls(name)
        val earlyStop = pass == 3 &&
          pin.exists(p => walls.nonEmpty && walls.max <= 1.5 * p)
        // Budget-pressure rep-3 skip: only when the 2-rep MAX is also
        // inside the gate — then the mean-of-2 median can't breach 2×
        // either, so the skip can neither flag nor manufacture a
        // median-only suspect (ADVICE r9: a (1.9×, 2.2×) pair skipped at
        // min-only yielded a 2.05× suspect rep 3 would have cleared).
        val gateDecided = pass == 3 && pass1Wall > 0.5 * budgetSec &&
          pin.exists(p => walls.nonEmpty && walls.max <= 2 * p)
        val overBudget = elapsedWall > budgetSec && pin.exists(p =>
          if (p < 1.0) walls.size >= 1 else walls.size >= 2)
        if (!(earlyStop || gateDecided || overBudget)) {
          timeOne(name, sfDir) match {
            case Some((w, c)) =>
              repWalls(name) = walls :+ w
              repCpus(name) = repCpus(name) :+ c
            case None => failedQ += name
          }
          runsDone += 1
          if (runsDone % 30 == 0) {
            val (fl, mo) = breaches
            emit("timing", fl, mo, Seq.empty)
          }
        }
      }
      if (pass == 1) pass1Wall = elapsedWall - preLoopWall
    }

    // Regression = median AND min both over 2× pin (plan drift hits every
    // run). Median-only breaches are reported as `suspect` — visible, but
    // not a gate failure unless they reproduce.
    val (flagged, medianOnly) = breaches
    // Phase 1 verdict: pre-retry. `regressions` here may still be demoted
    // by the retry pass below — a kill between here and the "gated" line
    // leaves a conservative verdict, not a missing one.
    emit("timed", flagged, medianOnly, Seq.empty)

    // Re-adjudication: a flagged query gets fresh runs here at the end of
    // the session — minutes away from whatever transient inflated its
    // original block (r6 saw four full runs each inflate a DIFFERENT
    // adjacent block 2-10×, every one re-measuring at pin). The flag
    // stands only if the best observation across BOTH passes still
    // breaches 2× — a real plan regression cannot produce a single clean
    // run, while a transient cannot survive spread-out ones. With the
    // interleaved passes this is a BACKSTOP for contamination windows
    // longer than a whole pass, not the verdict's first line of defense.
    // Demoted flags land in `suspect`, not silence. Over budget, one
    // fresh run decides (a single clean observation is all a demotion
    // needs).
    val minsAtGate = mins
    val (regressions, demoted) = flagged.partition { case (name, _) =>
      val b = baselineMedians(name)
      val retryReps = if (elapsedWall > budgetSec) 1 else 3
      val retry = (1 to retryReps).flatMap(_ => timeOne(name, sfDir))
      retry.foreach { case (w, c) =>
        repWalls(name) = repWalls(name) :+ w
        repCpus(name) = repCpus(name) :+ c
      }
      (minsAtGate.get(name).toSeq ++ retry.map(_._1)).min > 2 * b
    }
    val suspects = medianOnly ++ demoted
    // Phase 2 verdict: the regression gate is now final. (Retry reps were
    // appended to the per-rep arrays for the JSON's cpu/wall detail, so
    // `queries` medians from here on may shift slightly toward the retry
    // observations — the gate above already closed on minsAtGate.)
    emit("gated", regressions, suspects, Seq.empty)

    // Scaling probe: one timed run per query at the smaller SF; report
    // elapsed ratio big/small. The data ratio is ~10×; a query whose time
    // ratio runs FAR above it has a superlinear plan. This pass is its
    // own warm-up (r7 verdict item 4: the old untimed smallDir sweep
    // doubled the probe's cost): JIT/codegen are hot from the sfDir
    // phases, so the only first-touch cost is the sf0.01 parquet footers
    // — noise that UNDERSTATES the ratio slightly, fine for a tripwire.
    // Skipped entirely once the wall budget is spent: the probe is
    // diagnostic, the gate above is the verdict.
    val bigMedians = results.toMap
    val scaling: Seq[(String, Option[Double])] =
      if (smallDir == sfDir || elapsedWall > budgetSec) Seq.empty
      else only.map { name =>
        val small = timeOne(name, smallDir).map(_._1)
        name -> (for (s <- small; b <- bigMedians(name) if s > 0) yield b / s)
      }
    // Phase 3 verdict: complete.
    emit("final", regressions, suspects, scaling)
    spark.stop()
  }
}
