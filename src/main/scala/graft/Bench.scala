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
  val baselineMedians: Map[String, Double] = Map(
    "d1_avg_popularity" -> 0.43, "d2_n_artists" -> 0.35,
    "d3_top_albums" -> 0.55, "d4_winning_artists" -> 0.32,
    "d5_wins_danceability" -> 1.01, "d6_year_genre_pivot" -> 0.52,
    "d7_extremes" -> 0.80, "d8_low_energy_popular" -> 0.37,
    "d9_top_artists" -> 0.40, "d10_genre_wins" -> 0.88,
    "j1_merge_indicator" -> 0.63, "a1_mode_first" -> 0.96,
    "pipeline_clean" -> 2.17, "pipeline_warehouse_counts" -> 9.40,
    "t_curation_funnel" -> 7.51, "t_decontam" -> 4.75,
    "sim_topk_lsh" -> 0.51, "t_pack_sequences" -> 0.75,
    "t_token_budget" -> 1.33, "t_training_pipeline" -> 16.26,
    "olap_rollup" -> 0.83, "scd2_versions" -> 0.46,
    "ev_attribution" -> 0.38, "t_chunk_overlap" -> 2.94, "t_bm25" -> 0.58,
    "t_cms_heavy" -> 0.59, "t_dedup_bloom" -> 0.43, "lake_merge" -> 0.32,
    "s17_zorder_box" -> 5.65, "g_pagerank" -> 1.22, "olap_skyline" -> 0.44,
    "fi_pairs" -> 1.90, "t_setsim_prefix" -> 12.42,
    "dq_drift_nchars" -> 0.40, "a19_diff_pruned" -> 0.66,
    "t_cms_join_size" -> 1.39, "sim_topk_pq" -> 0.44,
    "g_triangles" -> 3.00, "olap_group_median" -> 1.99,
    "olap_group_deciles" -> 2.22, "ev_concurrency" -> 1.10,
    "t_setsim_incremental" -> 12.59, "g_kcore" -> 3.78,
    "dq_outliers_mad" -> 4.69, "t_weighted_median" -> 0.67,
    "olap_corr_ols" -> 0.85, "ev_twa" -> 0.47, "t_inverted_index" -> 0.23,
    "j4_golden_record" -> 3.63, "fi_cosine_topk" -> 2.19,
    "fi_recs_user" -> 2.63, "olap_concentration" -> 0.94,
    "ev_funnel_latency" -> 0.66, "g_pagerank_weighted" -> 3.47,
    "g_communities" -> 2.96, "ev_ab_test" -> 0.29, "ev_bursts" -> 0.32,
    "dq_fk_chain" -> 0.44, "ev_cohort_ltv" -> 0.40, "ev_streaks" -> 0.27,
    "t_winnow_fp" -> 9.24, "g_bfs_hops" -> 1.16, "dq_pii_luhn" -> 0.23,
    "sim_hard_negatives" -> 0.61, "w_moving_avg" -> 0.28,
    "t_rrf_fusion" -> 1.01, "t_dup_spans" -> 6.92,
    "olap_winsorized" -> 1.12,
    // Round-6 pins for the nine queries that shipped after the r4 pin
    // run — all from ONE full-set 77-query settle-phased run (sf0.1,
    // local[32], median-of-3, quiet host; total 184.8 s, zero failures,
    // zero regressions — BASELINE.md "Round 6"). The same run measured
    // sim_topk_pq at 15.7 s, under its 17.9 pin, settling the r5 drift
    // question (host noise, not plan drift).
    "t_winnow_pairs" -> 10.15, "t_keywords" -> 0.61,
    // dq_benford refreshed 0.44 -> 0.70 in round 11 (stale-SLOW rule):
    // the pin predates the round-10 try_cast + 1-9 domain-filter
    // hardening, whose added filter work is plan-inherent (adjudicated
    // in BASELINE.md), and three consecutive clean windows read
    // 1.49x/1.73x/1.60x — the two-clean-window refresh rule fired.
    // New value = the round's fourth full-set-run median (reps
    // 0.829/0.703/0.584).
    "t_quality_gopher" -> 0.69, "dq_benford" -> 0.70,
    "ev_asof_tolerance" -> 0.42, "sim_mmr_rerank" -> 0.48,
    "olap_running_distinct" -> 0.18, "dq_completeness" -> 0.46,
    "t_tokens_regex" -> 0.63,
    // Round-6 first-ship pins, from the SECOND full-set run of the
    // round (79 queries, 165.8 s, zero failures, zero regressions —
    // the run that also confirmed the staged weighted-PageRank fix at
    // 3.79 s vs its 7.48 pin in-set).
    "t_novelty" -> 3.78, "t_dsir_select" -> 5.12,
    // Round-6 second-batch pins, from the round's THIRD full-set run
    // (85 queries, 207.5 s — inflated by a transient interference block
    // that re-measured at/below pin, see BASELINE.md "Round 6 cont.";
    // these six queries sat outside the affected block).
    "g_concomp" -> 2.63, "t_kmv_overlap" -> 0.59,
    "t_familiarity" -> 5.60, "t_source_cap" -> 0.22,
    "t_phrase_search" -> 1.21, "ev_seasonal_hour" -> 0.25,
    // Round-6 third-batch pins, from the round's FOURTH full-set run
    // (87 queries, 184.4 s, 87/87 measured, zero failures, zero
    // regressions, zero suspects — fully clean with the min+retry gate).
    "ev_value_bands" -> 1.11, "sim_recall_trunc" -> 1.07,
    // Round-6 session pins (batches 4–7), from the round's FIFTH
    // full-set run (105 queries, 221.4 s, 105/105 measured, zero
    // failures, zero regressions; four retry-cleared suspects from
    // transient host contention — BASELINE.md "Round 6 session").
    "t_quality_logistic" -> 0.42, "t_quality_rank" -> 0.36,
    "t_line_dedup" -> 0.65, "g_ppr" -> 1.04, "sim_mrr_label" -> 1.39,
    "dq_fd_audit" -> 0.99, "ev_rfm" -> 0.23, "ev_dau_wau" -> 0.47,
    "olap_abc" -> 1.03, "sim_ndcg_label" -> 1.12,
    "t_vocab_coverage" -> 0.58, "s23_snapshot_asof" -> 0.61,
    "t_blocklist_filter" -> 0.44, "t_soft_sample" -> 0.71,
    "dq_anon_ladder" -> 0.43, "ev_cusum_shift" -> 0.26,
    "w_rank_change" -> 0.65, "ev_attrib_linear" -> 0.51,
    // Round-6 session pins (batches 8–14), from the round's SIXTH
    // full-set run (124 queries, 209.6 s, 124/124 measured, zero
    // failures, zero regressions, zero suspects — BASELINE.md
    // "Round 6 session, second sweep").
    "ev_session_paths" -> 0.48, "t_simpson_diversity" -> 0.44,
    "ev_asof_native" -> 0.36, "s24_snapshot_diff" -> 0.84,
    "fi_rules" -> 1.76, "ev_bounce_rate" -> 0.52,
    "g_link_predict" -> 2.27, "g_assortativity" -> 1.93,
    "t_proportional_sample" -> 0.40, "ev_markov_next" -> 0.73,
    "ev_ewma" -> 0.25, "t_collocations" -> 0.62,
    "dq_mfv_profile" -> 0.41, "sim_range_search" -> 0.56,
    "ev_audience_overlap" -> 0.32, "t_lexical_richness" -> 0.32,
    "t_langid_prf" -> 0.32, "ev_growth_accounting" -> 0.37,
    "ev_anomaly_iqr" -> 0.98,
    // Round-6 session pins (batches 20–24), from the round's EIGHTH
    // full-set run (148 queries, 262.7 s, 148/148 measured, zero
    // failures, zero regressions, zero suspects — BASELINE.md
    // "Round 6 session, fourth sweep").
    "ev_user_diversity" -> 0.19, "t_gate_ablation" -> 0.37,
    "ev_attrib_first" -> 0.37, "ev_cart_abandonment" -> 0.33,
    "sim_dim_variance" -> 0.27, "t_cross_source_overlap" -> 3.93,
    "w_seasonality_index" -> 0.23, "olap_delta_contribution" -> 0.77,
    "sim_label_separation" -> 0.37,
    // Round-6 final pins (batch 25), from the round's NINTH full-set
    // run (149 queries, 241.9 s, 149/149 measured, zero failures,
    // zero regressions, zero suspects).
    "dq_id_continuity" -> 0.40, "t_dedup_savings" -> 4.61,
    // Round-6 closing pins (batches 26–28), from the round's TENTH
    // full-set run (155 queries, 227.2 s, 155/155 measured, zero
    // failures, zero regressions, zero suspects).
    "t_ccnet_by_lang" -> 4.73, "sim_norm_audit" -> 0.28,
    "ev_session_depth" -> 0.33, "mix_epoch_plan" -> 0.47,
    "t_boilerplate_lines" -> 0.36, "ev_interarrival_median" -> 0.73,
    // Round-6 last pins (batch 29), from the round's ELEVENTH full-set
    // run (157 queries, 241.7 s, 157/157 measured, zero failures,
    // zero regressions, zero suspects).
    "ev_new_vs_returning" -> 0.28, "g_hub_report" -> 1.95,
    // Round-6 batch 30/31 pins, from the round's TWELFTH full-set run
    // (161 queries, 267.0 s, 161/161 measured, zero failures, zero
    // regressions; t_rrf_fusion/pipeline_clean flagged suspect and
    // retry-cleared — the documented block-transient pattern).
    "dq_order_reconcile" -> 1.18, "sim_anisotropy" -> 0.31,
    "ev_forecast_backtest" -> 0.31, "dq_duplicate_rows" -> 0.91,
    // Round-6 batch 32-35 pins, from the round's THIRTEENTH full-set
    // run (169 queries, 245.2 s, 169/169 measured, zero failures,
    // zero regressions, zero suspects).
    "ev_anomaly_seasonal" -> 1.16, "dq_temporal_order" -> 0.42,
    "g_modularity" -> 3.98, "t_ngram_coverage_curve" -> 0.29,
    "ev_path_conversion" -> 0.58, "ev_load_error_corr" -> 0.18,
    "ev_window_funnel" -> 0.60, "dq_drift_chisq" -> 0.32,
    // Round-6 session pins (batches 15–19), from the round's SEVENTH
    // full-set run (138 queries, 210.0 s, 138/138 measured, zero
    // failures, zero regressions, zero suspects — BASELINE.md
    // "Round 6 session, third sweep").
    "fi_triples" -> 2.47, "ev_attrib_decay" -> 0.39,
    "ev_lag_correlation" -> 0.46, "ev_error_pchart" -> 0.21,
    "g_degree_dist" -> 1.91, "dq_dup_rate_source" -> 0.20,
    "sim_bucket_balance" -> 0.33, "fi_basket_stats" -> 0.90,
    "w_customer_migration" -> 0.56, "t_ccnet_buckets" -> 4.35,
    "t_neardup_profile" -> 4.91, "ev_heatmap" -> 0.30,
    "t_context_fit" -> 0.34, "ev_apdex" -> 0.15,
    // Round-7 pins: the 20 queries that shipped in r6 batches 36-44
    // UNPINNED (the 97.9 s ungated debt VERDICT r6 item 1 called out),
    // all from ONE full-set 189-query settle-phased run (sf0.1,
    // local[32], median-of-3, min+retry gate, tmpfs scratch — 248.5 s
    // total, 189/189 measured, zero failures, zero regressions; one
    // retry-cleared suspect. BASELINE.md "Round 7"). The same run
    // re-pinned six stale entries whose current medians sat under
    // half their r4-r6 pins after this round's plan changes (staged
    // k-means codebook: sim_topk_pq 17.91 -> 0.44; the r6 staged
    // pair-graph + this round's frequentPairsRaw switch:
    // g_pagerank_weighted 7.48 -> 3.47, g_concomp 6.67 -> 2.63,
    // g_degree_dist 4.11 -> 1.91; plus ev_seasonal_hour 0.59 -> 0.25,
    // t_kmv_overlap 1.31 -> 0.59) — a stale 18 s pin would let a 30 s
    // regression through the 2x gate unflagged.
    "sim_diverse_sample" -> 0.21, "ev_mttr" -> 0.91,
    "ev_adoption_curve" -> 0.26, "dq_domain_conformance" -> 0.32,
    "t_gate_agreement" -> 0.56, "sim_cell_balance" -> 0.15,
    "g_two_hop_reach" -> 1.99, "t_mix_temperature_sweep" -> 0.25,
    "dq_fingerprint_daily" -> 0.54, "t_shard_stability" -> 0.30,
    "ev_session_gap_sweep" -> 0.33, "ev_attrib_window_sweep" -> 0.30,
    "t_freq_spectrum" -> 0.23, "t_lsh_band_sweep" -> 3.75,
    "ev_dwell_time" -> 0.76, "g_closure_by_degree" -> 1.97,
    "ev_error_budget" -> 0.22, "t_quality_calibration" -> 0.72,
    "t_jaccard_threshold_sweep" -> 3.80, "fi_rule_stability" -> 2.29,
    // Round-7 first-ship pins (XML/binaryFile sources, VARIANT
    // extraction, the binary-quantization ANN funnels), from the
    // round's SECOND full-set run — 196 queries, 350.6 s, 196/196
    // measured, zero failures, zero regressions (BASELINE.md "Round 7,
    // second sweep"). That run landed in a degraded-host window (the
    // 189 previously-pinned queries aggregated 1.23x their pins, with
    // nine DISJOINT-from-the-prior-run median-only suspects, all
    // retry-cleared — host noise, not plan drift), so these pins carry
    // that window's safety margin rather than best-case medians.
    "s25_xml_roundtrip" -> 0.80, "s26_binaryfile_scan" -> 0.26,
    "ev_variant_props" -> 0.50, "sim_topk_bq" -> 0.66,
    "sim_recall_bq" -> 1.01, "sim_topk_ivf_bq" -> 0.64,
    "sim_recall_ivf_bq" -> 1.01,
    // Round-8 first-ship pins (persisted BQ code table, streaming
    // VARIANT face), from the round's SECOND full-set run — 198
    // queries, 343.8 s, 198/198 measured, zero failures, zero
    // regressions, five disjoint retry-class suspects (BASELINE.md
    // "Round 8"). Both windows that day ran ~1.2× of pins, so these
    // carry that margin like the r7 first-ship pins.
    "sim_topk_bq_persist" -> 0.74, "ev_variant_stream" -> 0.55,
    // Round-9 first-ship pin (persisted composed IVF×BQ index), from
    // the DRIVER's round-9 full-set run — 199 queries, 275.1 s,
    // 199/199 measured, zero failures, zero regressions, zero suspects,
    // aggregate 0.955× of pins, heap clamped to the 16 GB pin config
    // (BENCH_r09.json; BASELINE.md "Round 9"). Reps 0.965/0.679/0.682 →
    // median 0.68 — the cleanest window in project history, so this pin
    // carries no slow-day margin.
    "sim_topk_ivf_bq_persist" -> 0.68,
    // Round-11 first-ship pins (the three streamed sketch faces, each
    // replaying its source as micro-batch partials with a mid-replay
    // PartialState.compact fold), from the round's first full-set run —
    // 202 queries, 275.2 s, 202/202 measured, zero failures, zero
    // regressions, ZERO suspects, load_avg 0.88, aggregate under pins
    // (BASELINE.md "Round 11"). A pristine window: no slow-day margin.
    "dq_benford_stream" -> 1.39, "dq_drift_chisq_stream" -> 0.87,
    "t_cms_join_size_stream" -> 3.14,
    // Round-11 second-wave first-ship pins (streamed k-anonymity and
    // corpus dup-rate faces + the dup-rate batch twin), from the
    // round's fourth full-set run — 205 queries, 310.6 s, 205/205
    // measured, zero failures, zero regressions, one median-only
    // suspect (pipeline_clean, min 0.97x = window noise), load_avg
    // 1.23, aggregate 1.05x of pins (BASELINE.md "Round 11").
    "t_dup_rate" -> 0.16, "t_dup_rate_stream" -> 1.02,
    "dq_k_anonymity_stream" -> 1.00,
    // Round-11 maintained-Bloom first-ship pin, from the round's sixth
    // full-set run — 206 queries, 251.0 s, 206/206, zero failures,
    // zero regressions, ZERO suspects, aggregate 0.846x of pins,
    // load_avg 2.06 (BASELINE.md "Round 11").
    "t_dedup_bloom_stream" -> 0.77,
    // Round-11 third-wave first-ship pins (the last three streamed
    // faces brought under the oracle gate), from the round's eighth
    // full-set run — 209 queries, 262.1 s, 209/209, zero failures,
    // zero regressions, ZERO suspects, aggregate 0.872x of pins,
    // load_avg 0.32 (BASELINE.md "Round 11").
    "dq_drift_lang_stream" -> 0.82, "t_kmv_overlap_stream" -> 1.23,
    "a8_hll_stream" -> 1.34)

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
