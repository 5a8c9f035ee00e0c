"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE compact JSON line as the FINAL stdout output:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

BENCH_r06.json shipped ``parsed: null`` because the previous format (45
queries x {queries, cold} dicts at 3 decimals, followed by the recall
gate's stderr chatter) outgrew the driver's tail capture. The fixes,
per VERDICT r6 "What's wrong #1": console progress disabled for the
bench session, timings rounded to 2 decimals, the ``cold`` dict moved
to stderr + ``BENCH_cold.json`` (a side file, not the driver line),
and the recall gate runs BEFORE the print so the JSON line is the
absolute last thing on stdout.

VERDICT r13 task #2 (r14): the per-query steady map is ADDITIONALLY
printed as its own single-line JSON (``{"metric": "per_query_steady",
"queries": {...}}``) immediately before the headline line, so the
driver's PERF analysis gets per_query / n_common / scaling data back.
The headline line itself is unchanged and still the final stdout line.

Measurement protocol (labels match what is measured):
  * One untimed trivial action first warms the JVM/session so no query is
    charged for session startup.
  * Each query then runs twice. ``cold`` is the first run — it includes
    the one-time Catalyst planning + codegen compilation for that query
    shape. ``queries`` (and ``value``, their sum) is the best of the two
    runs — the steady-state number a recurring pipeline sees, and the
    driver-comparable headline.
  * ``df.count()`` is the timed action: it materializes every operator
    in the plan with no caching between runs.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from solarflare_etl_pipeline_spark.registry import load_all
from solarflare_etl_pipeline_spark.session import get_spark

#: Headline queries: one per operator family, weighted toward the
#: shuffle-heavy ones that dominate at scale.
BENCH_QUERIES = (
    "agg_hash",
    "join_multiway",
    "join_broadcast",
    "join_salted",
    "join_asof",
    "topk_per_group",
    "win_analytic",
    "dedup_key",
    "flagship_daily_events",
    "stream_session",
    "llm_dedup_exact",
    "llm_text_stats",
    "llm_dedup_near",
    "llm_similarity_topk",
    "llm_tfidf",
    "llm_dedup_cluster",
    "llm_corpus_filter",
    "llm_decontaminate",
    "llm_dedup_simhash_pairs",
    "llm_pack_sequences_global",
    "ingest_json",
    "sink_parquet",
    "agg_custdist",
    "win_sessionize",
    "stream_foreach_batch",
    # round-5 additions: runtime skew handling, partition-pruned
    # incremental dedup, real-container multimodal decode, and the
    # end-to-end corpus-build flagship
    "join_skew_aqe",
    "sink_incremental_dedup",
    "mm_decode_wav",
    "flagship_training_corpus",
    # incremental near-dedup: same semantics as llm_dedup_near restricted
    # to batch-touching pairs, at O(batch) daily cost — the per-query
    # delta vs llm_dedup_near IS the incremental win
    "llm_dedup_near_incremental",
    # round-6 additions: incremental rollup merge, gap-filled resampling
    # (spine explode + LOCF window), content-defined chunking (posexplode
    # + two windows + aggregate — the heaviest new text op)
    "sink_merge_aggregate",
    "ts_gapfill_locf",
    "llm_chunk_cdc",
    # round-6 extension batch: graph wedge join (heaviest new op),
    # stacked-window CUSUM, decode-fused audio framing, and blocked
    # edit-distance dedup (banded-threshold levenshtein inside blocks)
    "graph_triangle_count",
    "ts_cusum_drift",
    "mm_audio_energy",
    "llm_dedup_fuzzy_blocked",
    # round-6 second batch: frame-recomputed rolling percentiles (the
    # heaviest window shape), the portable CMS build (4x explode +
    # cell aggregate), and the Morton-key layout probe
    "ts_rolling_robust",
    "agg_cms_heavy_hitters",
    "maintenance_zorder",
    "llm_boilerplate_strip",
    "ts_interval_merge",
    "hierarchy_rollup",
    "flagship_span_corpus",
    "join_point_in_time",
    # round-7 additions (VERDICT r6 task #4): the four exact-rank ops
    # rewritten onto scale-safe plans (approx_percentile boundaries /
    # two-level bucketed order stats) so their cost shape is tracked, and
    # the two flagship corpus pipelines that had no bench number.
    "fn_quantile_align",
    "dq_qq_drift",
    "agg_rfm_segments",
    "agg_decile_lift",
    "flagship_multimodal_corpus",
    "flagship_sql_corpus",
    # round-7 second batch: the shingle-matrix audit (heaviest new text
    # op — one distinct-shingle self-join), the x100 bootstrap explode,
    # cluster-local semantic dedup, the deepest TPC-H join chain, and
    # the double-correlation Q21 rewrite
    "llm_contamination_report",
    "agg_bootstrap_ci",
    "llm_semdedup",
    "tpch_q7_volume",
    "tpch_q21_late_supplier",
    # r7 batch 4: the two new training-data-selection ops (explode-heavy
    # shapes worth tracking) and the distinct-value-grid order stat
    "llm_substring_dup_rate",
    "llm_importance_select",
    "agg_trimmed_mean",
    # r7 batch 5-10: the shuffle/explode-heavy additions worth tracking
    # (winnowing's gram window, leakage's shingle joins, fusion's three
    # distributed ranks, the grouped prefix-sum primitive, drawdown's
    # stacked user windows)
    "llm_winnowing_overlap",
    "llm_split_leakage",
    "llm_rank_fusion_rrf",
    "llm_token_budget_trim",
    "ts_drawdown",
    "llm_dedup_span_removal",
    # r7 batch 15-18: the heaviest new shapes — the vocabulary shuffle
    # (lang,word explode), the full-scan rule gate, the distinct-value
    # pooled ranks, and the deepest new TPC-H join
    "llm_vocab_fertility",
    "llm_gopher_rules",
    "agg_kruskal_wallis",
    "tpch_q9_profit",
    # r8 additions: the rewritten ccnet tercile plan (tracks the
    # with_grouped_prefix_sum rewrite's cost), the two new corpus-scale
    # gram joins, the wedge-join link predictor, and the chained
    # two-level streaming rollup
    "llm_ccnet_buckets",
    "llm_bigram_lm_score",
    "llm_rare_ngram_ratio",
    "graph_adamic_adar",
    "stream_two_level_window",
    # r8 second wave: the two-grain clipped-precision joins (self-bleu),
    # the hashing-trick explode, the iterative bipartite ranking, the
    # cross-language shingle join, and the survival-grid prefix sums
    "llm_self_bleu",
    "llm_feature_hashing",
    "graph_hits",
    "llm_cross_lingual_contamination",
    "agg_survival_km",
    # r9: the integer-exact twins (stationary vector, peel ledger,
    # the REAL Arrow tokenizer loop), the capped split-leakage plan,
    # two more distributed-rank consumers, and the C4 host-cap readout
    "markov_stationary_portable",
    "graph_k_core_portable",
    "llm_tokenizer_apply_portable",
    "agg_lorenz_curve",
    "win_percent_rank",
    "llm_domain_cap",
    "agg_capture_recapture",
    "cohort_dau_mau",
    "dq_cardinality_drift",
    "dq_duplicate_rows",
    "llm_ranker_agreement",
    "agg_mde_curve",
    "agg_paired_t_test",
    "agg_poisson_rate_ratio",
    "reshape_transpose",
    "fn_sql_udf",
    "llm_token_len_histogram",
    "ts_dow_hour_heatmap",
    "agg_survival_na",
    "graph_bipartite_projection",
    "llm_log_odds_words",
    "llm_kneser_ney_bigram",
    "llm_kmeans_portable",
    "fn_month_end_rollover",
    "ts_holt_linear_portable",
    "agg_anderson_darling",
    "sink_orc",
    "stream_restart_exactly_once",
    "graph_modularity",
    "llm_mmr_diversify_portable",
    "fn_soundex_blocking",
    "mm_audio_band_energy",
    "cohort_returning_new",
    "dq_distribution_shift_emd",
    "llm_kn_doc_scores",
    # r10: the BPE training ledger (3 unrolled census+merge rounds — the
    # heaviest new text shape) and the LIVE watermarked stream-stream
    # interval join (real availableNow run, state-store buffering +
    # eviction across 4 event-time-ordered micro-batches)
    "llm_bpe_train_portable",
    "stream_interval_join_live",
    # r10 batch 2: the LIVE session-window stream (state-store session
    # merge across 5 micro-batches), the fused decode+DCT perceptual
    # hash, the pairwise rank post-hoc (distinct-value grid + pair
    # join), and the classic Q3 top-k join chain
    "stream_session_live",
    "mm_image_dct_hash",
    "agg_dunn_posthoc",
    "tpch_q3_priority",
    # r10 batch 4: the join state-store audit (runs the live stream then
    # batch-scans its checkpoint), and the 3-budget packing fan-out
    "stream_join_state_audit",
    "llm_pack_efficiency_curve",
    # r10 batch 5: the third live streaming certification (windowed-agg
    # merge path) and the FWER/dependence-corrected multiple-comparison
    # pair (bounded family plans)
    "stream_tumbling_live",
    "agg_holm_bonferroni",
    "agg_benjamini_yekutieli",
    # r10 batch 9: the remaining live streaming pair (multi-assignment
    # sliding state, keyed dedup state) and the RAG assembly composition
    "stream_sliding_live",
    "stream_dedup_live",
    "llm_rag_context_assembly",
    "llm_sft_pairs",
    "agg_corr_matrix",
    "ts_croston_portable",
    "llm_mixture_reweight_portable",
    "llm_data_constrained_epochs",
    "agg_fleiss_kappa",
    "agg_wilcoxon_signed_rank",
    "agg_cronbach_alpha",
    "ts_interrupted_series",
    "tpch_q4_order_priority",
    "tpch_q11_important_stock",
    "sql_pipe_syntax",
    "llm_dedup_bloom_portable",
    "llm_similarity_int8_portable",
    "ts_holiday_lift",
    "llm_influence_dedup_weights",
    "llm_canary_exposure",
    "llm_user_contribution_cap",
    "llm_eval_pass_at_k",
    "agg_cmh_chi",
    "tpch_q5_local_supplier",
    "tpch_q22_global_sales",
    "agg_jonckheere_terpstra",
    "agg_cliff_delta",
    "agg_gk_gamma",
    "agg_sign_test",
    "agg_cochran_armitage",
    "agg_runs_test",
    "agg_durbin_watson",
    "agg_breusch_pagan",
    "agg_chow_test",
    "ts_variance_ratio",
    "ts_turning_points",
    "ts_hurst_rs",
    "llm_fim_transform",
    "llm_mlm_masking",
    "llm_length_bucket_padding",
    "agg_stuart_maxwell",
    "agg_bowker_test",
    "llm_eval_clustered_se",
    "ts_pacf",
    "ts_granger_lag1",
    "sample_weighted_priority",
    "agg_g_test",
    "agg_extreme_value_gumbel",
    "ts_adf",
    "ts_spectral_entropy",
    "agg_survival_cindex",
    "graph_reciprocity",
    "agg_page_trend",
    "agg_hodges_lehmann",
    "agg_icc",
    "llm_code_detect",
    "agg_tost_equivalence",
    "llm_lexical_diversity",
    "llm_injection_scan",
    "agg_breslow_day",
    "agg_kappa_weighted",
    "agg_mood_median",
    "dq_outliers_gesd",
    "subq_quantified_any",
    "agg_raking_ipf",
    "agg_newcombe_ci",
    "agg_krippendorff_alpha",
    "llm_bt_ratings_portable",
    "llm_filter_funnel",
    "agg_confusion_stats",
    "ts_cusum_bernoulli",
    "agg_abc_classes",
    "agg_deming_regression",
    "llm_numeric_density",
    "stream_update_mode_live",
    "mm_audio_clipping",
    "agg_pot_gpd",
    "llm_watermark_detect",
    "agg_brier_decomposition",
    "agg_lin_ccc",
    "ts_sample_entropy",
    "llm_embed_isotropy_portable",
    "agg_pr_curve",
    "llm_text_tiling",
    "agg_atkinson_index",
    "dq_scd2_integrity",
    "ts_intraday_uniformity",
    "agg_pinball_loss",
    "llm_good_turing",
    "agg_huber_location_portable",
    "llm_dedup_source_flow",
    "agg_stouffer_combined",
    "agg_theils_u",
    "agg_odds_ratio_ci",
    "llm_renyi_entropy",
    "graph_degree_gini",
    "llm_first_token_stats",
    "llm_length_lognormal_fit",
    "llm_source_jsd",
    # round-11 additions
    "llm_pack_ffd_portable",
    "agg_bartlett_test",
    "agg_somers_d",
    "agg_ansari_bradley",
    "agg_yuen_trimmed_t",
    "graph_cc_portable",
    "fn_variant_extract",
    "funnel_time_to_convert",
    "ts_matrix_profile",
    # round-12 additions: the incremental cross-run pair (VERDICT r11
    # task #6) — their deltas vs llm_pack_ffd_portable/graph_cc_portable
    # ARE the incremental win the bench should witness
    "llm_pack_ffd_incremental",
    "graph_cc_incremental",
    # round-12 new-surface pair: Spark-4 collation grouping and the
    # classical decomposition ledger
    "fn_collation_group",
    "ts_classical_decompose",
    "agg_cramer_von_mises",
    "fn_ansi_try_ops",
    "ts_theil_sen",
    "agg_quade_test",
    "flagship_incremental_daily",
    "agg_winsorized_mean",
    # round-13 additions: store lifecycle (compaction + TTL ledgers) —
    # the maintenance passes the incremental family schedules daily —
    # and the incremental ANN probe (persisted IVF index, batch-only
    # probe + in-cell rerank; its delta vs llm_similarity_ivf IS the
    # incremental win)
    "maintenance_store_compact",
    "maintenance_store_ttl",
    "llm_similarity_ivf_incremental",
    # q6 completes the classic TPC-H 22 — the min-IO pushdown readout
    "tpch_q6_forecast_revenue",
)

#: Drift-calibration CANARY (VERDICT r7 task #3): a FIXED, never-changing
#: 16-query subset — all in the bench since round 6, spanning the operator
#: families — whose total is emitted alongside the headline so every
#: future round has a query-set-invariant comparison and a normalization
#: denominator for box drift (r5→r6 measured 1.51x on unchanged code;
#: r6→r7 measured 1.17–1.35x on byte-identical queries). DO NOT add,
#: remove, or reorder entries; the whole point is cross-round identity.
CANARY_QUERIES = (
    "agg_hash",
    "join_multiway",
    "join_broadcast",
    "join_asof",
    "topk_per_group",
    "dedup_key",
    "llm_dedup_exact",
    "llm_text_stats",
    "llm_dedup_near",
    "llm_similarity_topk",
    "llm_tfidf",
    "llm_dedup_cluster",
    "llm_dedup_simhash_pairs",
    "ingest_json",
    "sink_parquet",
    "graph_triangle_count",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("solarflare-bench")
    specs = load_all()

    # Warm the JVM/codegen once (an untimed trivial action) so the first
    # timed query isn't charged for session startup.
    from solarflare_etl_pipeline_spark.catalog import table

    table(spark, sf_dir, "events").count()

    # Pre-build the incremental family's persisted stores UNTIMED
    # (VERDICT r12 "What's wrong" #4): in production the signature
    # banding store / FFD run table / CC label store are yesterday's
    # run — a daily job never pays the history build. Without this,
    # whichever of llm_dedup_near_incremental / llm_pack_ffd_incremental
    # / graph_cc_incremental / flagship_incremental_daily /
    # maintenance_store_* ran FIRST absorbed the one-time store build
    # into its cold number (BENCH_r12 read 8.0s cold vs 1.9s steady for
    # graph_cc_incremental — store build, not regression). The steady
    # numbers were always store-warm; now the cold ones are too, and
    # the store-build cost is reported separately on stderr.
    t0 = time.perf_counter()
    from solarflare_etl_pipeline_spark.operators.analytics import ensure_cc_label_store
    from solarflare_etl_pipeline_spark.operators.similarity import ensure_signature_store
    from solarflare_etl_pipeline_spark.operators.text import ensure_ffd_run_store

    from solarflare_etl_pipeline_spark.operators.similarity import ensure_ivf_index_store

    ensure_signature_store(spark, sf_dir)
    ensure_ffd_run_store(spark, sf_dir)
    ensure_cc_label_store(spark, sf_dir)
    ensure_ivf_index_store(spark, sf_dir)
    print(
        f"[bench] store build (untimed, one-time): "
        f"{time.perf_counter() - t0:.2f}s",
        file=sys.stderr,
    )

    # Diagnostic subset mode (VERDICT r10 task #4 — the suite-crowding
    # experiment): SPARK_GRAFT_BENCH_ONLY="a,b,c" times just those
    # queries, so a cohort can be measured alone vs inside the full
    # suite. Never set by the driver; the headline run is unchanged.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    bench_list = (
        tuple(q.strip() for q in only.split(",") if q.strip())
        if only
        else BENCH_QUERIES
    )

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in bench_list:
        spec = specs.get(name)
        if spec is None:
            continue
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        # Noise hardening (VERDICT r9 task #4): the driver's r9 artifact
        # carried 2-3x single-query outliers (fn_quantile_align 3.55s vs
        # 1.11s on a judge re-run of unchanged code). When the two runs
        # disagree by >1.5x, one of them was perturbed (GC pause, page
        # cache eviction, a concurrent driver process) — re-run once more
        # and keep the median of three, which discards the single outlier
        # whichever direction it landed.
        if max(runs) > 1.5 * min(runs):
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
            timings[name] = round(sorted(runs)[1], 2)
        else:
            timings[name] = round(min(runs), 2)
        cold[name] = round(runs[0], 2)
        print(f"[bench] {name}: best={timings[name]}s cold={cold[name]}s runs={len(runs)}", file=sys.stderr)
        # Untimed, between queries: drop the just-benched DataFrames so
        # the ContextCleaner releases their localCheckpoint RDD blocks
        # promptly instead of accumulating across the whole suite.
        # Quantified context (VERDICT r10 task #4, measured r11): the
        # r9->r10 +10% steady drift on unchanged code decomposes into
        # ~2% genuine suite crowding (the r9-shared 114-query cohort
        # timed in-suite vs alone on the same box/day: 1.019x) and
        # ~3-4% box/session variance (cohort alone vs the r9 recording:
        # 1.034x, with individual queries swinging BOTH directions —
        # fn_quantile_align 3.55->1.65s, llm_dedup_cluster 1.74->4.12s
        # — the same class as the documented r5->r6 1.51x and r6->r7
        # 1.17-1.35x box drift on byte-identical code). No per-query
        # code regression; the canary remains the cross-round
        # normalizer. Reproduce with SPARK_GRAFT_BENCH_ONLY.
        gc.collect()

    # Untimed recall gate (ADVICE r2) — runs BEFORE the JSON print so the
    # driver's tail capture ends exactly at the JSON line. llm_dedup_near's
    # exact-Jaccard oracle is only valid while MinHash-LSH candidate recall
    # is exactly 1.0 at the scale being run — certify that against the
    # deterministic exact algorithm (prefix-filtered set-similarity join)
    # so a fixture or scale change that drops recall fails the bench loudly
    # instead of surfacing later as an inscrutable driver hash mismatch.
    if os.environ.get("SPARK_GRAFT_BENCH_RECALL", "1") != "0":
        from solarflare_etl_pipeline_spark.operators.similarity import exact_jaccard_pairs

        lsh = {(r.doc_a, r.doc_b) for r in specs["llm_dedup_near"].spark(spark, sf_dir).collect()}
        exact = {(r.doc_a, r.doc_b) for r in exact_jaccard_pairs(spark, sf_dir).collect()}
        assert lsh == exact, (
            f"MinHash-LSH recall gate FAILED at {sf_dir}: "
            f"missed={sorted(exact - lsh)[:5]} spurious={sorted(lsh - exact)[:5]} "
            "— llm_dedup_near's exact-Jaccard oracle is no longer valid here"
        )
        print(f"[bench] recall gate: lsh==exact ({len(lsh)} pairs)", file=sys.stderr)

    total = round(sum(timings.values()), 2)
    canary_total = round(
        sum(timings[q] for q in CANARY_QUERIES if q in timings), 2
    )
    # Cold (first-run, includes per-shape Catalyst+codegen compile) timings
    # go to stderr and a side file, NOT the driver-parsed stdout line.
    print(f"[bench] cold: {json.dumps(cold, separators=(',', ':'))}", file=sys.stderr)
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_cold.json"), "w") as fh:
            json.dump({"sf": sf, "cold": cold}, fh, separators=(",", ":"))
    except OSError:
        pass
    # Per-query steady timings + the fixed canary list go to a side file
    # (the BENCH_cold.json precedent) — NOT the driver-parsed stdout line.
    # The driver's tail capture keeps only the last ~2000 chars of stdout;
    # r6 and r8 both shipped `parsed: null` when the queries dict pushed
    # the JSON line past that. VERDICT r8 task #1: keep stdout minimal and
    # hard-assert the line length so growth can never silently break
    # parseability again.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_steady.json"), "w") as fh:
            json.dump(
                {
                    "sf": sf,
                    "total": total,
                    "canary_value": canary_total,
                    "canary_queries": list(CANARY_QUERIES),
                    "queries": timings,
                },
                fh,
                separators=(",", ":"),
            )
    except OSError:
        pass
    sys.stderr.flush()
    # Per-query map as its OWN single-line JSON immediately before the
    # headline (VERDICT r13 task #2): PERF_r13 came back with empty
    # per_query / n_common=0 because the per-query timings lived only in
    # BENCH_steady.json and stderr — neither reaches the driver's
    # parser. This line is ADDITIVE (the headline line below is
    # unchanged, still last on stdout, still under its length assert);
    # the driver scans stdout for JSON lines, so the per-query map and
    # the scaling block can now be populated.
    print(
        json.dumps(
            {
                "metric": "per_query_steady",
                "queries": timings,
                "canary_value": canary_total,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            },
            separators=(",", ":"),
        ),
        flush=True,
    )
    # The compact JSON line is the absolute final stdout output.
    line = json.dumps(
        {
            "metric": "headline_queries_total_runtime_steady",
            "value": total,
            "unit": "sec",
            "n_queries": len(timings),
            "canary_value": canary_total,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        },
        separators=(",", ":"),
    )
    assert len(line) < 1800, (
        f"bench stdout JSON line is {len(line)} chars — would exceed the "
        "driver's 2000-char tail capture; move new fields to BENCH_steady.json"
    )
    print(line, flush=True)


if __name__ == "__main__":
    main()
