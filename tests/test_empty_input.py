"""Zero-row robustness: a daily pipeline will eventually meet an empty
partition (no events yesterday, an empty late-arriving source), and an
operator that crashes or divides by zero on empty input takes the whole
run down. Every core-shape query must execute and return a well-formed
(possibly empty) result over an sf_dir whose tables carry the real
schemas but zero rows.

Excluded by design: ops whose contract REQUIRES data — the ANN family
seeds centroids/hyperplanes from the first vectors (llm_similarity_*),
and ingest_http_* / ingest_python_source do not read the sf_dir at all.
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from solarflare_etl_pipeline_spark.catalog import TABLES
from solarflare_etl_pipeline_spark.registry import load_all

#: One query per core plan shape — scan/filter/project, hash agg, window,
#: every join flavor the driver window holds, set ops, sessionize, the
#: text/dedup/curation family, both flagships.
CORE_QUERIES = (
    "scan_parquet",
    "filter_pred",
    "project_rename",
    "agg_hash",
    "agg_rollup",
    "win_rank",
    "win_sessionize",
    "topk_per_group",
    "join_inner",
    "join_broadcast",
    "join_asof",
    "set_union",
    "dedup_key",
    "dedup_antijoin",
    "llm_dedup_exact",
    "llm_dedup_near",
    "llm_text_stats",
    "llm_repetition_stats",
    "llm_pack_sequences_global",
    "llm_pii_scrub",
    "stream_tumbling",
    "stream_session",
    "merge_upsert",
    "merge_scd2",
    "graph_pagerank",
    "dq_expectations",
    "flagship_daily_events",
    "flagship_training_corpus",
    # round-6 extension ops with division / empty-group seams: each must
    # return an empty well-formed frame, not divide by zero or crash
    "graph_triangle_count",
    "graph_clustering_coeff",
    "markov_transitions",
    "ts_ewma_kernel",
    "ts_zscore_anomaly",
    "ts_cusum_drift",
    "ts_mad_outliers",
    "fn_minmax_scale",
    "dq_histogram_drift",
    "llm_bigram_pmi",
    "flagship_sql_corpus",
    # round-7 batch 5: empty-grid medians (levene), empty DFT series
    # (periodogram), empty frontier BFS, empty rank frame, empty
    # fingerprint self-join
    "agg_levene_bf",
    "ts_periodogram",
    "graph_shortest_hops",
    "sample_systematic",
    "llm_winnowing_overlap",
    # round-7 batch 6: zero-group sufficient stats (tukey), empty bins
    # (calibration), empty grids (sax), empty split halves (leakage),
    # empty derived CSV feed (csv_corrupt)
    "agg_tukey_hsd",
    "agg_calibration_ece",
    "ts_sax_words",
    "llm_split_leakage",
    "ingest_csv_corrupt",
    # round-7 batch 7: empty moment rows (cuped), empty FD groups,
    # empty per-user series (drawdown), empty prefix-sum frame (trim)
    "agg_cuped_adjust",
    "dq_fd_violations",
    "ts_drawdown",
    "llm_token_budget_trim",
    # round-7 batch 8: empty top-k (hill), empty term unions (theil),
    # empty rank frames (rrf fusion)
    "agg_hill_tail_index",
    "agg_theil_decomposition",
    "llm_rank_fusion_rrf",
    # round-7 batch 9: empty query sets (matryoshka), empty metadata scan
    "llm_matryoshka_eval",
    "scan_with_metadata",
    # round-7 batch 10: empty daily grid (snaive), empty user grain
    # (jackknife), empty UDF batch (compression)
    "ts_snaive_backtest",
    "agg_jackknife_ratio_se",
    "llm_compression_ratio",
    # round-7 batch 11: empty cumulative walks (sprt), empty recon
    # joins, empty tail grids (var/es)
    "agg_sprt_sequential",
    "dq_reconciliation",
    "agg_var_es_tail",
    # round-7 batch 12: empty tf/df tables (bm25), empty control grids
    "llm_bm25_topk",
    "ts_control_chart_imr",
    # round-7 batch 13
    "agg_mh_odds_ratio",
    "subq_quantified_all",
    "llm_cross_source_overlap",
    # round-7 batch 14: empty window/island/stitch chain
    "llm_dedup_span_removal",
    # round-7 batch 15: stats trio
    "agg_kruskal_wallis",
    "agg_cohens_kappa",
    "ts_ljung_box",
    # round-7 batch 16: published quality gate + blocked/changepoint ranks
    "llm_gopher_rules",
    "ts_pettitt",
    "agg_friedman_test",
    # round-7 batch 17: DP release, isotonic minimax, vocab fertility
    "agg_dp_counts",
    "ts_isotonic_daily",
    "llm_vocab_fertility",
    # round-7 batch 18: second TPC-H pass (empty joins/top-k/ratio)
    "tpch_q9_profit",
    "tpch_q10_returned",
    "tpch_q14_promo_share",
    "tpch_q19_disjunct",
    # round-7 batch 19: empty tercile grids, empty strata, empty spans
    "llm_ccnet_buckets",
    "agg_neyman_allocation",
    "fn_business_days",
    # round-7 batch 20: empty grids (gini), empty graphs (lpa)
    "agg_gini_split",
    "graph_lpa_communities",
    # round-8: empty flag grids (mcnemar/cochran), empty vocab/rank
    # frames (zipf/bigram), empty wedge joins (adamic), empty lang
    # normalizers (temperature), empty life tables (km/logrank), empty
    # gram joins (rare/crosslang), empty label summaries (centroid),
    # empty chained windows, empty TPC-H q12 join, empty bit registers
    "agg_mcnemar",
    "agg_cochran_q",
    "llm_zipf_slope",
    "llm_bigram_lm_score",
    "graph_adamic_adar",
    "llm_temperature_mixture",
    "agg_survival_km",
    "agg_logrank_test",
    "llm_rare_ngram_ratio",
    "llm_cross_lingual_contamination",
    "llm_embed_centroid_drift",
    "stream_two_level_window",
    "tpch_q12_shipmode",
    "agg_bitops",
    "llm_pca_power_portable",
    # round-8 second wave: empty folds (woe/permutation/did/power),
    # empty window series (peaks), empty hash/gram tables (feature
    # hashing, self_bleu), empty graphs (hits), empty sinks/feeds
    # (json_lines, fixed_width), empty variants (url canonicalize),
    # empty footer audit runs on the real (non-empty) schema files so
    # it is exercised by parity instead
    "fn_woe_iv",
    "agg_permutation_test",
    "agg_diff_in_diff",
    "agg_power_two_proportion",
    "ts_local_peaks",
    "llm_feature_hashing",
    "fn_target_encode_loo",
    "llm_self_bleu",
    "graph_hits",
    "sink_json_lines",
    "ingest_fixed_width",
    "llm_url_canonicalize",
    "agg_shapley_attribution",
    "flagship_ab_readout",
    "udaf_arrow_grouped",
    "udf_arrow_map",
    # round-8 third wave: empty rate folds (eb), empty prefix-sum frames
    # (running sum), empty transition tables (entropy rate), empty
    # prefix argmaxes (templates), empty chunk explodes, empty array
    # feeds (multiline json), empty hourly grids (seasonal strength)
    "agg_eb_shrunk_rates",
    "win_global_running_sum",
    "llm_bigram_entropy_rate",
    "llm_source_templates",
    "llm_chunk_sliding",
    "ingest_json_multiline",
    "ts_seasonal_strength",
    "agg_overdispersion",
    "llm_lsh_recall_curve",
    "llm_dedup_cluster_stats",
    # round-9: empty transition matrices (stationary twin), empty
    # peel ledgers (k-core twin), empty vocab walks (tokenizer twin),
    # empty capture occasions, empty decile grids, empty rank frames,
    # empty domain caps
    "markov_stationary_portable",
    "graph_k_core_portable",
    "llm_tokenizer_apply_portable",
    "agg_capture_recapture",
    "agg_lorenz_curve",
    "win_percent_rank",
    "llm_domain_cap",
    # round-9 batch 2: empty MDE baselines, empty day grids, empty
    # cardinality halves, empty duplicate censuses, empty rankings
    "agg_mde_curve",
    "cohort_dau_mau",
    "dq_cardinality_drift",
    "dq_duplicate_rows",
    "llm_ranker_agreement",
    # round-9 batch 3: empty pair folds, empty rate arms, empty
    # transpose frames
    "agg_paired_t_test",
    "agg_poisson_rate_ratio",
    "reshape_transpose",
    # round-9 batch 4: empty SQL-UDF aggregates, empty length grids,
    # empty heatmap grids
    "fn_sql_udf",
    "llm_token_len_histogram",
    "ts_dow_hour_heatmap",
    # round-9 batch 5: empty risk sets (nelson-aalen), empty incidence
    # (bipartite projection), empty vocab halves (log-odds), empty
    # count-of-counts (kneser-ney), empty seed clouds (kmeans twin),
    # empty date grids (rollover)
    "agg_survival_na",
    "graph_bipartite_projection",
    "llm_log_odds_words",
    "llm_kneser_ney_bigram",
    "llm_kmeans_portable",
    "fn_month_end_rollover",
    # round-9 batch 6: empty day grids (holt), empty order-stat ranks
    # (anderson-darling), empty ORC round-trips, empty two-phase
    # streaming restarts
    "ts_holt_linear_portable",
    "agg_anderson_darling",
    "sink_orc",
    "stream_restart_exactly_once",
    # round-9 batch 7: empty basket graphs (modularity), empty pools
    # (mmr greedy), empty vocabularies (soundex blocking)
    "graph_modularity",
    "llm_mmr_diversify_portable",
    "fn_soundex_blocking",
    # round-9 batch 8: empty payload filter banks
    "mm_audio_band_energy",
    # round-9 batch 9: empty first-seen joins, empty value grids (emd),
    # empty bigram models (kn doc scores)
    "cohort_returning_new",
    "dq_distribution_shift_emd",
    "llm_kn_doc_scores",
    # round-10: empty merge censuses (bpe ledger), empty MW domains,
    # empty demand grids (croston), empty rank pair grids (dunn,
    # wilcoxon), empty item batteries (fleiss, cronbach), empty test
    # families (holm, BY), empty correlation sums, empty OLS segments,
    # empty epoch allocations, empty packing grids, empty SFT renders,
    # empty retrieval hits (rag), empty bloom grids (zero-filled 64
    # rows), empty int8 query sets, empty holiday grids, empty TPC-H
    # joins (q3/q4/q11), empty pipe aggregates
    "llm_bpe_train_portable",
    "llm_mixture_reweight_portable",
    "ts_croston_portable",
    "agg_dunn_posthoc",
    "agg_wilcoxon_signed_rank",
    "agg_fleiss_kappa",
    "agg_cronbach_alpha",
    "agg_holm_bonferroni",
    "agg_benjamini_yekutieli",
    "agg_corr_matrix",
    "ts_interrupted_series",
    "llm_data_constrained_epochs",
    "llm_pack_efficiency_curve",
    "llm_sft_pairs",
    "llm_rag_context_assembly",
    "llm_dedup_bloom_portable",
    "llm_similarity_int8_portable",
    "ts_holiday_lift",
    "tpch_q3_priority",
    "tpch_q4_order_priority",
    "tpch_q11_important_stock",
    "sql_pipe_syntax",
    "mm_image_dct_hash",
    # round-10 late batches: empty family censuses (weights), empty
    # plant scans (canary), empty user clips (dp cap), empty sample
    # censuses (pass@k), empty word grids (bloom — zero-filled), empty
    # query sets (int8)
    "llm_influence_dedup_weights",
    "llm_canary_exposure",
    "llm_user_contribution_cap",
    "llm_eval_pass_at_k",
    "llm_dedup_bloom_portable",
    "llm_similarity_int8_portable",
    "agg_cmh_chi",
    # round-10 late batch: Q5's five-way dim join and Q22's single-row
    # positive-balance broadcast + anti join must survive zero customers
    "tpch_q5_local_supplier",
    "tpch_q22_global_sales",
    # concordance family: empty histograms / cell tables must fold to
    # the NULL-stat single row (cliff/gamma) or an empty frame (JT)
    "agg_jonckheere_terpstra",
    "agg_cliff_delta",
    "agg_gk_gamma",
    # trend/runs/sign: empty grids must fold to the NULL-stat single
    # row (sign) or empty frames (CA's nn>0, runs' n1+n2>=2 guards)
    "agg_sign_test",
    "agg_cochran_armitage",
    "agg_runs_test",
    # regression diagnostics: empty day grids / segments must fold to
    # empty frames through the n>=3/4 and n_total>0 guards
    "agg_durbin_watson",
    "agg_breusch_pagan",
    "agg_chow_test",
    # ts randomness family: empty day/hour grids must fold to empty
    # frames through the nd>0 / n>=3 / any-size guards
    "ts_variance_ratio",
    "ts_turning_points",
    "ts_hurst_rs",
    # masking/packing transforms: zero documents must yield empty
    # frames straight through the explode/window paths
    "llm_fim_transform",
    "llm_mlm_masking",
    "llm_length_bucket_padding",
    # paired-categorical + eval-SE: zero users/items must fold through
    # the n>0 guards to empty frames
    "agg_stuart_maxwell",
    "agg_bowker_test",
    "llm_eval_clustered_se",
    # AR-identification / causality / weighted sampling: empty grids
    # fold to empty frames through n>=5 / n>0 / WHERE n_chars>0
    "ts_pacf",
    "ts_granger_lag1",
    "sample_weighted_priority",
    # LR/EVT/unit-root: empty cell/block/pair tables fold to empty
    # frames through the HAVING/n>0 guards
    "agg_g_test",
    "agg_extreme_value_gumbel",
    "ts_adf",
    # spectrum/survival/graph: empty grids fold through the HAVING /
    # no-pairs-NULL / n_edges>0 guards to empty or NULL-stat frames
    "ts_spectral_entropy",
    "agg_survival_cindex",
    "graph_reciprocity",
    # blocked-rank trend + pairwise shift: empty weeks/histograms
    # fold through b>0 / tw>0 to empty frames
    "agg_page_trend",
    "agg_hodges_lehmann",
    # reliability + code-mix audit: empty per-user/source tables fold
    # through HAVING n>=2 / b>=2 / LEN>0 to empty frames
    "agg_icc",
    "llm_code_detect",
    # equivalence/diversity/safety scans: empty arms/corpora fold to
    # the NULL-verdict row or empty per-source frames
    "agg_tost_equivalence",
    "llm_lexical_diversity",
    "llm_injection_scan",
    # stratified-homogeneity / agreement / median split: empty pivots
    # and cell tables fold to zero-strata rows or empty frames
    "agg_breslow_day",
    "agg_kappa_weighted",
    "agg_mood_median",
    # iterative-ESD ledger and quantified-ANY: empty grids fold to
    # empty frames (each pick's n>=3 guard; no sibling pairs)
    "dq_outliers_gesd",
    "subq_quantified_any",
    # IPF ledger: an empty cell table folds through the rw/cw>0
    # guards to an empty weight frame
    "agg_raking_ipf",
    # two-arm CI: zero purchases fold to an empty frame
    "agg_newcombe_ci",
    # agreement + rating ledgers: empty corpora/contest tables fold
    # through nu>0 / the pair joins to empty frames
    "agg_krippendorff_alpha",
    "llm_bt_ratings_portable",
    # funnel + confusion: empty corpora/event sets fold to empty
    # frames through the source rollup and the all-zero guard
    "llm_filter_funnel",
    "agg_confusion_stats",
    # SPC + Pareto: empty day grids / part tables fold through the
    # HAVING / rollup to empty frames
    "ts_cusum_bernoulli",
    "agg_abc_classes",
    # orthogonal fit + numeric audit: empty scans fold through n>0 /
    # the source rollup to empty frames
    "agg_deming_regression",
    "llm_numeric_density",
    # update-mode stream: an empty source commits zero update rows —
    # the last-update projection must come back empty, not crash
    "stream_update_mode_live",
    # POT: zero orders fold through n_all>0 to an empty frame
    "agg_pot_gpd",
    # watermark/Brier: empty corpora/event sets fold to empty frames
    "llm_watermark_detect",
    "agg_brier_decomposition",
    # CCC: zero lineitems fold through n>0 to an empty frame
    "agg_lin_ccc",
    # complexity/isotropy: empty day grids / vector sets fold through
    # the n>0 guards to empty frames
    "ts_sample_entropy",
    "llm_embed_isotropy_portable",
    # PR sweep + tiling: empty scans fold to empty frames (the 10-cut
    # fan-out produces no groups; no gaps without blocks)
    "agg_pr_curve",
    "llm_text_tiling",
    # inequality + SCD2: empty scans fold through n>0 / HAVING
    "agg_atkinson_index",
    "dq_scd2_integrity",
    # KS-uniformity + pinball: empty grids fold through the guards
    "ts_intraday_uniformity",
    "agg_pinball_loss",
    # Good-Turing + Huber: empty corpora/value sets fold to empty
    # frames through the r<=5 grid and the n>0 round guards
    "llm_good_turing",
    "agg_huber_location_portable",
    # flow matrix + meta-z: empty corpora/streams fold to empty or
    # NULL-z frames
    "llm_dedup_source_flow",
    "agg_stouffer_combined",
    # association/OR: empty scans fold through n>0 guards
    "agg_theils_u",
    "agg_odds_ratio_ci",
    # collision entropy: empty corpora fold through n>0
    "llm_renyi_entropy",
    # hub-gini + opener stats: empty graphs/corpora fold through the
    # HAVING/n>0 guards
    "graph_degree_gini",
    "llm_first_token_stats",
    # length model: zero docs fold to an empty per-source frame
    "llm_length_lognormal_fit",
    # JSD: an empty corpus folds to an empty per-source frame
    "llm_source_jsd",
    # r11 FFD ledger: zero chunks must thread an empty run table
    # through all 32 unrolled rounds and emit an empty bin frame
    "llm_pack_ffd_portable",
    # r12 incremental pair: empty corpus -> empty persisted stores
    # (empty run table / empty label store) AND an empty batch — both
    # continuations must fold to empty well-formed frames
    "llm_pack_ffd_incremental",
    "graph_cc_incremental",
    # r12: decomposition must fold an empty day grid (no trend window
    # ever fills, no seasonal groups) and collation grouping must fold
    # zero tokens — both to empty well-formed frames
    "ts_classical_decompose",
    "fn_collation_group",
    # r12: an empty grid must fold to the empty/zero CvM frame, not a
    # divide-by-zero in the N^2*n*m denominator
    "agg_cramer_von_mises",
    # r12: ANSI TRY_* fold over zero rows -> count 0, NULL sums on
    # both engines
    "fn_ansi_try_ops",
    # r12: Theil-Sen over an empty day grid -> empty/zero medians,
    # no (n+1)/2 selection crash
    "ts_theil_sen",
    # r12: Quade over zero blocks -> empty frame, no k=0 division
    "agg_quade_test",
    # r12: the daily flagship must fold three empty component frames
    # to one all-zero readout row
    "flagship_incremental_daily",
    # r12: winsorized mean over zero rows -> empty frame, no n=0
    # division or NULL boundary crash
    "agg_winsorized_mean",
    # r11 stats/graph/analytics batch: every one must fold zero rows
    # to an empty well-formed frame through its n>0 / k>0 guard, not
    # a null-division crash
    "agg_bartlett_test",
    "agg_somers_d",
    "agg_ansari_bradley",
    "agg_yuen_trimmed_t",
    "graph_cc_portable",
    "funnel_time_to_convert",
    "ts_matrix_profile",
    "fn_variant_extract",
    # r13: the store-lifecycle ledgers must build + compact + TTL
    # EMPTY stores (zero docs/edges/runs) to all-zero ledger rows,
    # not crash on empty parquet writes or null-sum folds
    "maintenance_store_compact",
    "maintenance_store_ttl",
    # r13: an empty corpus means no seeds -> empty index -> empty
    # well-formed result, not a crash in the probe or rerank
    "llm_similarity_ivf_incremental",
)


@pytest.fixture(scope="module")
def empty_sf_dir(sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        tbl = pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))
        pq.write_table(tbl.slice(0, 0), out / f"{t}.parquet")
    return str(out)


@pytest.mark.parametrize("name", CORE_QUERIES)
def test_runs_on_empty_tables(spark, empty_sf_dir, name):
    df = load_all()[name].spark(spark, empty_sf_dir)
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) > 0
