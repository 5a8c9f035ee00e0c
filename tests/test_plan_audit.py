"""Physical-plan audit across the entire registry (the build mandate's
"explain('formatted') and iterate" step, enforced): no accidental
cartesian products, no Python in plans that shouldn't have it, broadcast
where dimensions are joined."""

from __future__ import annotations

import pytest

from solarflare_etl_pipeline_spark.plans.explain import (
    physical_plan,
    plan_flags,
    plan_report,
)
from solarflare_etl_pipeline_spark.registry import load_all

SPECS = load_all()

#: Session-lifetime plan-string cache (r14, VERDICT r13 #3 — suite
#: wall-clock): the three registry-wide gates below each audit the SAME
#: query's plan, and building a registry DataFrame is not free — eager
#: localCheckpoints and driver-side training collects run at
#: construction (llm_similarity_ivfpq: ~24 s per build). Rendering the
#: plan once per query and sharing the STRING across the gates keeps
#: every assertion unchanged while cutting 2 of each query's 3 builds.
#: The cache LIVES IN conftest and is pre-populated by
#: test_oracle_parity (which builds every registry DataFrame anyway and
#: runs earlier in the alphabetical file order), so in a full-suite run
#: the audits rebuild nothing at all; file-local runs still populate
#: lazily here.
from tests.conftest import PLAN_STRINGS as _PLANS


def _plan(name: str, spark, sf_dir: str) -> str:
    if name not in _PLANS:
        _PLANS[name] = physical_plan(SPECS[name].spark(spark, sf_dir))
    return _PLANS[name]

#: Queries that intentionally cross-join (exact pairwise similarity —
#: the registered brute-force baselines; their scale path is the LSH op).
#: llm_dedup_embcos and fn_string_sim left this set in round 2: embcos now
#: routes candidates through the LSH bucket equi-join, string_sim through a
#: lossless length-band equi-join.
DELIBERATE_CROSS = {
    "llm_similarity_topk",
    "llm_hard_negatives",  # same exact-baseline shape; scale path = ANN mining
    "llm_matryoshka_eval",  # same 10-query broadcast exact-baseline shape
    "llm_knn_eval_portable",  # same bounded shape: 32-probe broadcast
    # exact-kNN baseline (<> self predicate makes it non-equi); the
    # all-queries scale path is the ANN family
    "join_cross",
    # SINGLE-ROW global aggregates combined for theorem booleans —
    # 1×1 (or k×1) nested-loop joins, not data-scale cross products
    "agg_sketch_mergeable",
    "agg_bitmap_distinct",
    # broadcast of a SINGLE-ROW scalar (the epoch-midpoint cut) onto the
    # stream — an N×1 broadcast nested loop, not a data-scale product
    "dq_histogram_drift",
    # broadcast of the SINGLE-ROW global-extrema aggregate onto the fact
    # scan (the constant 'one' key folds away, leaving an N×1 broadcast
    # nested loop) — same shape as dq_histogram_drift, not a product
    "maintenance_zorder",
    # SINGLE-ROW total / max-date broadcasts, same N×1 shape (9 rows ×1
    # and |customers| ×1 respectively)
    "dq_benford",
    "agg_rfm_segments",
    # SINGLE-ROW scalar threshold broadcast onto the customer scan
    # (Q22's de-correlated scalar subquery) — N×1, not a product
    "subq_scalar_threshold_anti",
    # per-FK-edge 1×1 joins of two single-row aggregates (child count
    # ⋈ orphan count) — theorem-join shape, not data-scale products
    "dq_referential_integrity",
    # SINGLE-ROW elected merge pair broadcast onto the corpus scan
    # (N×1 nested loop — the scalar-threshold shape)
    "llm_bpe_train2",
    # SINGLE-ROW corpus watermark broadcast onto the per-user table
    "dq_freshness",
    # 1×1 join of the two single-row test arms (purchase vs view)
    "agg_welch_t",
    "agg_mann_whitney",
    # r7: single-row summary ⋈ exact-count ⋈ merge-check booleans (1×1×1)
    "agg_hll_portable",
    # r7: single-row totals + single-row BH cutoff broadcast onto the
    # bounded |types|×7 cell table — N×1 theorem shapes
    "agg_bh_fdr",
    # r7: single-row language-count maximum broadcast onto the bounded
    # |langs| histogram
    "llm_oversample_mixture",
    # r7: DELIBERATE bounded product — 7 lag offsets × |days| calendar
    # rows (both dimension-sized; the data-scale stage is the daily
    # aggregate before it)
    "ts_lead_lag_corr",
    # r7: SINGLE-ROW max-ts watermark scalar broadcast onto the scan
    # (N×1, the dq_freshness shape)
    "stream_late_audit",
    # r7: SINGLE-ROW minority-class-count scalar broadcast onto the
    # ranked stream (N×1, the dq_freshness shape)
    "sample_class_balanced",
    # r7: two SINGLE-ROW token-total scalars broadcast onto the BOUNDED
    # 1024-row bucket table (1024×1×1 — dimension-sized, not data-scale)
    "llm_importance_select",
    # r7: token-first-occurrence table probed against the 10-row
    # broadcast decile-cutoff table via a RANGE predicate
    # (first_doc <= d_k) — bounded non-equi by construction
    "llm_ngram_coverage_curve",
    # r7: |distinct-values| × 9 boundary cross for bin assignment and
    # 10 × 2 bin/epoch scaffold — both bounded broadcast products
    "dq_value_drift_psi",
    # r7 batch 15/16: k-row per-group sufficient stats × SINGLE-ROW
    # global totals broadcasts (5×1, 1×1, 5×1×1×1) — theorem shapes
    "agg_kruskal_wallis",
    "agg_cohens_kappa",
    "agg_friedman_test",
    # r12: same k-row/1-row scalar broadcasts as friedman, plus the
    # broadcast day-weight table (all dimension-sized)
    "agg_quade_test",
    # r12: the daily-pipeline flagship combines its three 1-row
    # component folds via 1x1x1 broadcast cross joins
    "flagship_incremental_daily",
    # r7 batch 19: 5-row strata × SINGLE-ROW weight total broadcast
    "agg_neyman_allocation",
    # r7 batch 20: domain-bounded value grid (<=1001 rows) × SINGLE-ROW
    # per-type totals broadcast — N×1 theorem shape
    "agg_gini_split",
    # r8: |users| x |types| dense zero-completion — types is a tiny
    # enum broadcast onto the user list (N x k nested loop, the
    # cochran_q completion shape), not a data-scale product
    "agg_overdispersion",
    # r7 batch 17: DELIBERATE bounded triangle — the isotonic minimax
    # day-pair grid (j <= k over POST-AGGREGATE calendar rows, ~365/yr
    # regardless of corpus scale; the data-scale stage is the daily
    # hash agg before it)
    "ts_isotonic_daily",
    # r10: SINGLE-ROW elected merge pair broadcast per unrolled round
    # (three N×1 nested loops — the llm_bpe_train2 scalar shape), plus
    # the 1-row alphabet/corpus-total scalars into the 1-row ledger
    "llm_bpe_train_portable",
    # r10: |groups|² pair triangle over the POST-AGGREGATE 5-row rank
    # table × SINGLE-ROW totals (the tukey/kruskal theorem shape)
    "agg_dunn_posthoc",
    # r10: SINGLE-ROW nation-total scalar broadcast onto the BOUNDED
    # per-part value table (N×1 global-threshold HAVING — Q11's shape)
    "tpch_q11_important_stock",
    # r10: SINGLE-ROW harmonic-ladder + kmax scalars broadcast onto the
    # bounded 35-cell family (N×1 theorem shapes, the bh_fdr pattern);
    # Holm shares the cell construction's SINGLE-ROW totals broadcast
    "agg_benjamini_yekutieli",
    "agg_holm_bonferroni",
    # r10: SINGLE-ROW corpus-total / unfilled-budget scalars broadcast
    # onto the |sources|-bounded allocation table (N×1 ×2)
    "llm_data_constrained_epochs",
    # r10: DELIBERATE bounded 3-row budget-grid fan-out onto the placed
    # chunk table (the ts_lead_lag_corr bounded-product shape)
    "llm_pack_efficiency_curve",
    # r10: DELIBERATE k=3 hash-slice fan-out onto the corpus scan plus
    # the SINGLE-ROW popcount/exact-count summary broadcast onto the
    # 64-row word grid (N×3 and 64×1 — both bounded)
    "llm_dedup_bloom_portable",
    # r10: DELIBERATE k=5 telescoped-term fan-out onto the BOUNDED
    # per-source census (|sources|×5 — the pack_efficiency shape)
    "llm_eval_pass_at_k",
    # r10: SINGLE-ROW stratum-count/a-total summary broadcast onto the
    # 1-row pivoted chi2 fold (1×1 theorem join)
    "agg_cmh_chi",
    # r10: SINGLE-ROW positive-balance summary broadcast onto the
    # customer scan (Q22's scalar-subquery rewrite — Q11's shape)
    "tpch_q22_global_sales",
    # r10 concordance family: DELIBERATE |cells|² products over
    # POST-AGGREGATE bounded histograms (≤100 / ≤491 / ≤550 rows —
    # the dunn/kendall theorem shape) plus their 1-row scalar folds
    "agg_jonckheere_terpstra",
    "agg_cliff_delta",
    "agg_gk_gamma",
    # r10: SINGLE-ROW exact-median scalar broadcast onto the
    # CALENDAR-bounded day grid (the fn_quantile_align N×1 shape)
    "agg_runs_test",
    # r10 diagnostics: SINGLE-ROW fitted-moment scalars broadcast onto
    # the calendar-bounded day grid (DW/BP) or the 2-row segment fold
    # onto the 1-row pooled SSE (Chow) — all N×1 theorem joins
    "agg_durbin_watson",
    "agg_breusch_pagan",
    "agg_chow_test",
    # r10: DELIBERATE 3-size fan-out onto the CALENDAR-bounded day
    # grid (the ts_periodogram bounded-product shape)
    "ts_hurst_rs",
    # r10: |types|² bounded pair grid (Bowker) and SINGLE-ROW
    # total/cluster-numerator scalar folds (clustered SE) — N×1
    # theorem joins over post-aggregate bounded tables
    "agg_bowker_test",
    "llm_eval_clustered_se",
    # r10: SINGLE-ROW (n, S) moment scalars broadcast onto the
    # CALENDAR-bounded day grid (the DW/BP N×1 shape)
    "ts_pacf",
    # r10: SINGLE-ROW grand-total / df scalars broadcast onto the
    # ≤6-cell G-test term table (N×1 theorem joins)
    "agg_g_test",
    # r10: SINGLE-ROW dmax scalar onto the per-user table + the
    # bounded (score×day×ev) cell-pair product (gk_gamma shape)
    "agg_survival_cindex",
    # r10: |bins|² bounded histogram product (the cliff_delta shape)
    "agg_hodges_lehmann",
    # r10: 3×3 bounded marginal product + 1-row scalar folds (kappa);
    # exact-median scalar + k-row totals broadcast (mood)
    "agg_kappa_weighted",
    "agg_mood_median",
    # r10: three unrolled top-1 rounds over the CALENDAR-bounded day
    # grid (certified-ledger shape — single-row anti-join exclusions)
    "dq_outliers_gesd",
    # r10: SINGLE-ROW grand-total scalar broadcast onto the ≤6-cell
    # IPF weight table in each unrolled pass (N×1 theorem joins)
    "agg_raking_ipf",
    # r10: SINGLE-ROW order-count scalar onto the 1-row exceedance
    # moment fold (1×1 theorem join)
    "agg_pot_gpd",
    # r10: SINGLE-ROW totals broadcast onto the 10-bin Brier table
    # and the 1-row raw-sum fold (N×1 theorem joins)
    "agg_brier_decomposition",
    # r10: 1-row histogram folds / energy scalars (1×1 theorem joins)
    "ts_sample_entropy",
    "llm_embed_isotropy_portable",
    # r10: DELIBERATE 10-cut broadcast fan-out onto the scan (the
    # dq_value_drift_psi bounded-boundary shape)
    "agg_pr_curve",
    # r10: SINGLE-ROW exact-quantile scalars broadcast onto the scan
    # (the fn_quantile_align N×1 shape)
    "agg_pinball_loss",
    # r10: SINGLE-ROW clip-bound scalars broadcast per unrolled IRLS
    # round + the ≤6-row frequency-of-frequencies totals broadcast
    "agg_huber_location_portable",
    "llm_good_turing",
    # r10: ≤6-cell marginal/entropy folds with 1-row totals (the
    # g_test N×1 theorem shape)
    "agg_theils_u",
    # r10: 1-row totals × 1-row top-opener fold (1×1 theorem join)
    "llm_first_token_stats",
    # r10: SINGLE-ROW corpus-total scalar broadcast onto the token
    # table and the per-source fold (N×1 ×2 — the importance_select
    # token-total shape)
    "llm_source_jsd",
    # r11: bounded 16-cell product (the gk_gamma/dunn theorem shape)
    # plus a SINGLE-ROW doc-count broadcast
    "agg_somers_d",
    # r11 rewrite: the grand revenue total became a SINGLE-ROW scalar
    # broadcast onto the per-part prefix-sum table (replacing the
    # whole-table window — the dq_freshness N x 1 shape)
    "agg_abc_classes",
    # r11: SINGLE-ROW quantile fold broadcast onto the 1-row viewer
    # count (1x1 theorem join)
    "funnel_time_to_convert",
    # r11: DELIBERATE bounded O(days^2) pair triangle over the
    # CALENDAR-bounded daily grid (the ts_isotonic_daily exemption)
    "ts_matrix_profile",
    # r12: the same calendar-bounded pair triangle (all pairwise
    # slopes over the day grid), plus the 1-row median broadcasts
    "ts_theil_sen",
    # r11: the two 1-row per-arm folds combine via a 1x1 join (the
    # agg_welch_t shape)
    "agg_yuen_trimmed_t",
}

#: Queries whose plans legitimately run Python (Arrow-batched UDF/UDAF/
#: grouped-map — the sanctioned escape hatches).
PYTHON_OK = {
    "udf_scalar",
    "udaf_grouped",
    "udtf_grouped_state",
    "udtf_lateral_chunks",
    "mm_decode_features",
    "mm_decode_wav",
    "mm_decode_png",
    "mm_resize_nearest",
    "mm_audio_energy",
    "mm_image_histogram",
    "mm_audio_silence_ratio",
    "mm_phash_dedup",
    "mm_phash_dedup_planted",
    "mm_audio_zcr",
    "mm_audio_band_energy",  # decode+filter-bank fused in one Arrow stage
    "mm_audio_clipping",  # decode+rail-count in the same Arrow stage
    "mm_image_edge_density",
    "flagship_multimodal_corpus",
    "llm_tokenizer_apply",
    "llm_tokenizer_apply_portable",  # same Arrow tokenize loop, oracle-certified
    "llm_compression_ratio",  # zlib quality signal — one Arrow pandas UDF
    "udaf_arrow_grouped",  # Spark 4 applyInArrow (zero-copy grouped map)
    "udf_arrow_map",  # Spark 4 mapInArrow (zero-copy batch map)
    "mm_image_dct_hash",  # decode+resample+DCT fused in one Arrow stage
    # r13 optimization: in-cell rerank distances run as one vectorized
    # numpy mapInArrow over the candidate-pair stream (columns pruned
    # to qv/hv/qa/qb before the boundary) — the interpreted per-element
    # zip_with/aggregate form measured 2.43s vs 1.41s at sf0.1 with
    # row-identical exact-int64 output; the stage is candidate-bounded
    # (nprobe cells per batch vector), never a corpus scan
    "llm_similarity_ivf_incremental",
}

#: Queries whose executed plan contains a Sort/Window fed by an
#: `Exchange SinglePartition` — allowed ONLY because the exchanged
#: input is provably BOUNDED independent of corpus size (a
#: discretization-bounded distinct-value grid, a calendar grid, the
#: |partitions|/|groups|-row offset table inside plans/rank.py, or a
#: k-row post-aggregate summary). An ordered single-partition stage
#: over DATA-SCALE input is the classic 100 TB killer (VERDICT r6 #2;
#: five round-10 ops regressed exactly this way, VERDICT r10 #1) —
#: rewrite onto plans/rank.with_global_rank / with_grouped_prefix_sum
#: or the cumulative distinct-value grid instead of adding a key here.
SP_WINDOW_BOUNDED = {
    # plans/rank.py internals: the two-level rank/prefix-sum stitches
    # ONE ordered window over the bounded |partitions|(x|groups|)-row
    # offset table (rank.py:69-72 documents the class). These keys
    # route their data-scale order through the helper and show exactly
    # that bounded exchange:
    "win_ntile",
    "win_percent_rank",
    "win_global_running_sum",
    "sample_systematic",
    "fn_surrogate_key",
    "agg_decile_lift",
    "agg_rfm_segments",
    "agg_lorenz_curve",
    "agg_anderson_darling",
    "agg_abc_classes",
    "graph_degree_gini",
    "llm_curriculum_order",
    "llm_domain_cap",
    "llm_rank_fusion_rrf",
    "llm_ngram_coverage_curve",
    "sample_class_balanced",
    "fn_quantile_align",  # + the pooled cut-point distinct-value grid
    # two-level gap/bucket discipline: LAG over the per-bucket
    # (min, max) summary table — dimension-sized by construction
    "dq_sequence_gaps",
    # cumulative DISTINCT-VALUE grids, bounded by value discretization
    # (x1000 milli / cent quantization), never by row count:
    "agg_pinball_loss",
    "agg_huber_location_portable",
    "agg_kruskal_wallis",
    "agg_mann_whitney",
    "agg_wilcoxon_signed_rank",
    "agg_ks_test",
    # r12: same distinct-milli-value grid as agg_ks_test, integral
    # (CvM) instead of supremum — identical ordered-window class
    "agg_cramer_von_mises",
    "agg_hodges_lehmann",
    "agg_dunn_posthoc",
    "agg_gini_split",  # domain-bounded floor(value) in [0, 1000]
    "dq_distribution_shift_emd",
    "dq_value_drift_psi",
    "graph_degree_histogram",  # distinct-DEGREE grid, not node count
    "llm_token_len_histogram",  # max-word-length grid (~tens of rows)
    # CALENDAR-bounded grids (days/hours/minutes — fixed cost at any
    # corpus scale; the raw scan is a map-side-combinable agg BEFORE
    # the window):
    "agg_runs_test",
    "agg_durbin_watson",
    "agg_survival_km",
    "agg_survival_na",
    "dq_outliers_gesd",
    "dq_volume_anomaly",
    "ts_adf",
    "ts_cusum_bernoulli",
    "ts_granger_lag1",
    "ts_intraday_uniformity",
    "ts_isotonic_daily",
    "ts_pacf",
    "ts_periodogram",
    "ts_sax_words",
    "ts_spectral_entropy",
    "ts_variance_ratio",
    # k-row post-aggregate summaries (|types| x cells, |sources|,
    # |priorities| — enum/dimension-bounded):
    "agg_bh_fdr",
    "agg_chi_square",
    "agg_cramers_v",
    "agg_cuped_adjust",
    "agg_holm_bonferroni",
    "agg_proportional_allocate",
    "llm_mixture_reweight_portable",
    "llm_mixture_sample",
    "llm_rag_context_assembly",  # 3-row hit-list assembly fold
    "flagship_span_corpus",  # dimension-sized per-source window
    "win_share",  # the registered safe-shape DEMO: OVER () on a
    # pre-aggregated bounded input (its doc names the trap)
    # (r12: llm_pack_ffd_portable left both whitelists — its bounded
    # run-ledger rounds moved to driver arithmetic over the collected
    # <= CHUNK_TOKENS-row histogram, so the plan no longer contains a
    # single-partition window OR a broadcast-nested-loop stage)
    # r11: cumulative position window over the pooled distinct-value
    # grid (discretization-bounded — the mann_whitney class)
    "agg_ansari_bradley",
    # r12 (ADVICE r11 #2): row_number + MP_WINDOW LEADs over the
    # CALENDAR-bounded daily grid (~365 rows/yr at any corpus size —
    # the ts_isotonic_daily exemption class). Previously this op's
    # windows were invisible to the gate only through the
    # localCheckpoint lineage-truncation blind spot; listing it here
    # honors the audit trail the gate's docstring promises.
    "ts_matrix_profile",
    # r12: centered 7-observation trend window over the same
    # calendar-bounded day grid (the decomposition ledger)
    "ts_classical_decompose",
    # r12: day-grid row_number + the two cumulative distinct-value-
    # grid medians (slope keys / intercept offsets — the mood_median
    # discretization-bounded class)
    "ts_theil_sen",
    # r12: the |days|-row block range-rank window (calendar-bounded —
    # the friedman/quade blocked-design class)
    "agg_quade_test",
    # r11: cumulative window over the minute-quantized latency grid
    # (time-range-bounded — the pinball/quantile grid class)
    "funnel_time_to_convert",
    # r11 rewrite: the grand-median lookup runs on the cumulative
    # distinct-value grid (discretization-bounded — the
    # fn_quantile_align class); visible since the k-row classify
    # table stopped being checkpointed
    "agg_mood_median",
}

#: Queries that read a dimension table and must broadcast it.
MUST_BROADCAST = {"join_broadcast", "join_multiway"}


@pytest.mark.parametrize("name", sorted(SPECS))
def test_no_accidental_cartesian(name, spark, sf_dir):
    report = plan_flags(_plan(name, spark, sf_dir))
    if name in DELIBERATE_CROSS:
        return
    assert report["nested_loop_joins"] == 0, f"{name}: unexpected nested-loop join {report}"


@pytest.mark.parametrize("name", sorted(SPECS))
def test_no_accidental_python(name, spark, sf_dir):
    report = plan_flags(_plan(name, spark, sf_dir))
    if name in PYTHON_OK:
        assert report["python_stages"] > 0, f"{name}: expected an Arrow Python stage"
    else:
        assert report["python_stages"] == 0, f"{name}: Python leaked into the plan {report}"


@pytest.mark.parametrize("name", sorted(SPECS))
def test_no_single_partition_window(name, spark, sf_dir):
    """Registry-wide gate (VERDICT r10 task #2): no registered query's
    executed plan may contain an `Exchange SinglePartition` feeding a
    Sort/Window unless the key is whitelisted with a bounded-input
    justification above. This turns the round-10 regression class
    (five exact-median/rank ops through an unpartitioned window) into
    a test failure at commit time. localCheckpoint-hidden stages are
    out of reach here (see single_partition_ordered_stages docstring);
    tests/test_rank_plans.py pins those shapes op by op."""
    from solarflare_etl_pipeline_spark.plans.explain import (
        physical_plan,
        single_partition_ordered_stages,
    )

    hits = single_partition_ordered_stages(_plan(name, spark, sf_dir))
    if name in SP_WINDOW_BOUNDED:
        return  # bounded-input exchange, justified at the whitelist
    assert hits == [], (
        f"{name}: ordered single-partition stage(s) {hits} over a "
        f"non-whitelisted input — the 100 TB killer shape. Rewrite via "
        f"plans/rank.py or the distinct-value grid, or (only if the "
        f"input is provably bounded) whitelist with a justification."
    )


@pytest.mark.parametrize("name", sorted(MUST_BROADCAST))
def test_dimension_joins_broadcast(name, spark, sf_dir):
    report = plan_flags(_plan(name, spark, sf_dir))
    assert report["broadcast_joins"] >= 1, f"{name}: dimension join did not broadcast {report}"


#: Queries whose filters must reach the parquet scan as PushedFilters —
#: a scan that reads everything and filters afterwards is the wrong plan
#: at 100 TB even when the answer is right.
MUST_PUSH_FILTERS = {
    "filter_pred",
    "agg_filtered",
    "join_multiway",
    "agg_hash",
    # non-parquet sources push too: ORC stripe stats, JDBC remote SQL
    "scan_orc",
    "ingest_jdbc",
}


@pytest.mark.parametrize("name", sorted(MUST_PUSH_FILTERS))
def test_filters_reach_the_scan(name, spark, sf_dir):
    report = plan_flags(_plan(name, spark, sf_dir))
    assert report["has_pushed_filters"], f"{name}: no PushedFilters in scan {report}"


def test_scan_pruned_has_partition_filters(spark, sf_dir):
    """The partition-pruning claim, executable: the pruned scan's physical
    plan must carry the order_year predicate as a PartitionFilter
    (directory-level pruning), not a post-scan Filter."""
    from solarflare_etl_pipeline_spark.plans.explain import physical_plan
    from solarflare_etl_pipeline_spark.sinks import pruned_orders_scan

    plan = physical_plan(pruned_orders_scan(spark, sf_dir, year=1997))
    assert "PartitionFilters" in plan
    start = plan.index("PartitionFilters")
    segment = plan[start : plan.index("]", start) + 1]
    assert "1997" in segment, f"partition predicate not pushed: {segment}"


def test_join_dpp_prunes_dynamically(spark, sf_dir):
    """The partitioned-fact ⋈ filtered-dim join must carry a runtime
    dynamic-pruning subquery (partitions selected by the dim's surviving
    keys, not scanned wholesale)."""
    from solarflare_etl_pipeline_spark.plans.explain import physical_plan

    plan = physical_plan(SPECS["join_dpp"].spark(spark, sf_dir))
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_driver_window_ordering():
    """All 44 SURVEY §2.2 declared keys plus the 6 headline extras must be
    the first 50 entries of queries() — the driver checks exactly that
    window (round-1 finding)."""
    from solarflare_etl_pipeline_spark.registry import (
        DECLARED_INVENTORY,
        DRIVER_WINDOW,
        load_all,
    )

    ordered = list(load_all())
    assert len(DECLARED_INVENTORY) == 44
    assert len(DRIVER_WINDOW) == 50
    assert ordered[:50] == list(DRIVER_WINDOW)
    # every window query must be oracle-checked (no rows-only slot waste)
    specs = load_all()
    no_oracle = [n for n in DRIVER_WINDOW if specs[n].oracle is None]
    assert no_oracle == [], f"rows-only queries inside the driver window: {no_oracle}"


def test_join_strategy_hints_bind(spark, sf_dir):
    """The physical-strategy keys must actually get their pinned strategy:
    join_sortmerge plans a SortMergeJoin, join_shuffle_hash a
    ShuffledHashJoin — neither silently falls back to broadcast."""
    from solarflare_etl_pipeline_spark.plans.explain import physical_plan

    smj = physical_plan(SPECS["join_sortmerge"].spark(spark, sf_dir))
    assert "SortMergeJoin" in smj
    shj = physical_plan(SPECS["join_shuffle_hash"].spark(spark, sf_dir))
    assert "ShuffledHashJoin" in shj


def test_incremental_dedup_prunes_partitions(spark, sf_dir):
    """The incremental-append dedup must read sink state through a
    partition-pruned scan: only the overlap-window day directories, as a
    PartitionFilter — not a full-history scan with a post-filter."""
    from solarflare_etl_pipeline_spark.plans.explain import physical_plan
    from solarflare_etl_pipeline_spark.sinks import pruned_existing_keys

    plan = physical_plan(pruned_existing_keys(spark, sf_dir))
    assert "PartitionFilters" in plan
    start = plan.index("PartitionFilters")
    segment = plan[start : plan.index("]", start) + 1]
    assert "event_date" in segment and "2024-01-05" in segment, (
        f"overlap predicate not pushed to partition pruning: {segment}"
    )


def test_join_skew_aqe_pins_sortmerge(spark, sf_dir):
    """The skew demo must not silently broadcast its dim (at 100 TB the
    right side is fact-sized): the MERGE hint has to hold."""
    from solarflare_etl_pipeline_spark.plans.explain import plan_report

    report = plan_report(SPECS["join_skew_aqe"].spark(spark, sf_dir))
    assert report["sortmerge_joins"] >= 1 and report["broadcast_joins"] == 0, report


def test_join_skew_aqe_splits_hot_partition(spark, sf_dir, tmp_path):
    """Prove the AQE skew-split mechanism actually fires. Two fixture-scale
    gaps must be bridged without touching the operator or the shared
    session: (a) thresholds — lowered on an isolated spark.newSession();
    (b) mapper count — AQE splits a skewed reduce partition at MAP-OUTPUT
    granularity, and the single-file fixture yields exactly one shuffle
    mapper, which is unsplittable by construction. At 100 TB a table is
    thousands of files (many mappers), so the honest fixture is lineitem
    rewritten as multiple part-files in a tmp sf_dir (other tables
    symlinked). The executed adaptive plan must then mark the sort-merge
    join skew=true: the hot_key-0 partition (~75% of lineitem) was split
    across tasks at runtime."""
    import os

    import pyarrow.parquet as pq

    from solarflare_etl_pipeline_spark.catalog import TABLES

    for t in TABLES:
        if t != "lineitem":
            os.symlink(os.path.join(sf_dir, f"{t}.parquet"), tmp_path / f"{t}.parquet")
    tbl = pq.read_table(os.path.join(sf_dir, "lineitem.parquet"))
    part_dir = tmp_path / "lineitem.parquet"
    os.makedirs(part_dir)
    n_files = 4
    step = (tbl.num_rows + n_files - 1) // n_files
    for i in range(n_files):
        pq.write_table(tbl.slice(i * step, step), part_dir / f"part-{i}.parquet")

    ns = spark.newSession()
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }.items():
        ns.conf.set(k, v)
    df = SPECS["join_skew_aqe"].spark(ns, str(tmp_path))
    df.collect()  # AQE decides from runtime shuffle stats — must execute
    final_plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final_plan
    assert "skew=true" in final_plan, final_plan[:3000]


def test_join_runtime_bloom_injects_filter(spark, sf_dir):
    """Prove the runtime bloom-filter injection fires: with the
    application-side scan threshold lowered to fixture scale (isolated
    newSession, the shared session untouched) and broadcast disabled so
    the join shuffles, the probe side's scan filter must contain
    might_contain(...) — Catalyst built a bloom filter from the selective
    part predicate and pushed it into the lineitem scan."""
    ns = spark.newSession()
    for k, v in {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }.items():
        ns.conf.set(k, v)
    from solarflare_etl_pipeline_spark.plans.explain import physical_plan

    plan = physical_plan(SPECS["join_runtime_bloom"].spark(ns, sf_dir))
    assert "might_contain" in plan, plan[:3000]


def test_python_source_scan_and_pushdown(spark, sf_dir):
    """The custom Python Data Source must appear as a parallel Python
    BatchScan, and the event_type equality must be accepted by
    pushFilters — i.e. vanish from the post-scan Filter (rows are never
    generated, the Python-source analogue of PushedFilters)."""
    from solarflare_etl_pipeline_spark.plans.explain import physical_plan
    from solarflare_etl_pipeline_spark.sources.python_source import synthetic_events

    import pyspark.sql.functions as F

    df = synthetic_events(spark).where(F.col("event_type") == "view")
    plan = physical_plan(df)
    assert "BatchScan synthetic_events" in plan and "(Python)" in plan, plan[:1500]
    # the equality literal must be gone from the post-scan Filter (only the
    # unsupported isnotnull, which the reader yields back, may remain)
    assert "view" not in plan.split("BatchScan")[0], (
        f"event_type = 'view' not pushed into the source: {plan[:1500]}"
    )
    # and the pushdown changes nothing semantically
    n_pushed = df.count()
    n_plain = synthetic_events(spark).collect()
    assert n_pushed == sum(1 for r in n_plain if r.event_type == "view")


def test_merge_aggregate_is_incremental(spark, sf_dir):
    """The merge-into-aggregate rollup must be a partial-agg merge, not a
    full-history re-aggregation: exactly ONE events (raw) scan in the
    plan, carrying the pushed batch ts-filter; the other input is the
    persisted rollup parquet (state), and the merge itself is one
    hash-aggregate over rollup-sized input."""
    from solarflare_etl_pipeline_spark.plans.explain import physical_plan

    plan = physical_plan(SPECS["sink_merge_aggregate"].spark(spark, sf_dir))
    raw_scans = plan.count("events.parquet")
    assert raw_scans == 1, f"expected one raw events scan, saw {raw_scans}:\n{plan[:2000]}"
    assert "solarflare_daily_rollup" in plan, "rollup state parquet not in plan"
    # the pushed batch-cutoff predicate sits on the EVENTS scan line (the
    # state scan legitimately has PushedFilters: [])
    events_line = next(l for l in plan.splitlines() if "events.parquet" in l)
    start = events_line.index("PushedFilters")
    segment = events_line[start : events_line.index("]", start) + 1]
    assert "GreaterThanOrEqual(ts" in segment, (
        f"batch cutoff not pushed to the raw scan: {segment}"
    )
