"""Graded-query registry — the SURVEY.md §2 correctness contract.

Every graded operator registers here via the :func:`graded` decorator;
``__spark_entry__.py`` exposes the registry to the driver. A query with
``oracle`` set gets the full DuckDB hash-match check; ``oracle=None``
declares a rows-only smoke (reserved for ops DuckDB can't reproduce
deterministically: LSH, sketches, sinks, streaming).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
# Registering module per query (``fn.__module__``) — lets tooling map a
# git-changed source file back to the graded names it defines
# (tools/check_oracle.py --changed).
MODULES: dict[str, str] = {}


def graded(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn(spark, sf_dir) -> DataFrame`` as graded query ``name``.

    Rules every registrant must satisfy (SURVEY §8):
    - alias every computed column, identically in Spark and oracle SQL;
    - decimal-cast recipe for double aggregates;
    - every LIMIT / window orderBy ends with a unique key;
    - ROUND(,4) on float-vector / z-score outputs.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate graded query {name!r}")
        QUERIES[name] = fn
        MODULES[name] = fn.__module__
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Driver-sample rotation: the driver's per-round correctness check grades
# the FIRST 50 names of the registry dict. Until round 9 the window was
# steered by module import order, which cannot reach names scattered in
# the middle of large modules; from round 10 the window is an explicit
# name list applied after all modules load (names NOT listed keep their
# import-order position after the window).
#
# Round-11 window — the 19 NEW r11 operators (never sampled by
# definition) and the FINAL 31 names never driver-sampled in r01–r10
# (recomputed from the ten CORRECTNESS files: the 5 round-9 operators
# the round-9 judge re-executed directly, the 8 first-wave r10
# operators, and the 18 second-wave r10 operators). 19 new + 31
# first-time = 50 exactly; after this round the driver union is
# 349/349 with zero never-sampled names.
#
# Round-12 window — NEW r12 operators first (never sampled by
# definition), then stream_rollup_replay (the single r01–r11 union
# gap: added mid-r11 after that window was pinned; sampling it closes
# the union at 350/350 of the r11 names), then the 19 oldest verdicts
# (the r01/r02 names the r11 window displaced), then the head of the
# r05 block — trimmed from the tail so the window stays exactly 50.
#
# Round-13 window — the 15 NEW r13 operators first (never sampled by
# definition), then ALL 28 remaining r05-latest-verdict names
# (recomputed from the CORRECTNESS_r01–r12 union — the r12 plan's "24"
# undercounted), then the r06 block head (stream_tumbling_counts
# first, then alphabetical) — exactly 50.
#
# Round-14 plan: any NEW r14 operators first, then the remaining 42
# r06-latest-verdict names (alphabetical from scalar_array_extended
# onward: scalar_array_extended, scalar_binary_encode,
# scalar_bitwise, scalar_collation, scalar_date, scalar_date_format,
# scalar_levenshtein, scalar_map_entries, scalar_map_hof,
# scalar_math, scalar_regexp_extract_all, scalar_string,
# scalar_string_extended, scalar_trig, scalar_try_ops, scalar_zip_dot,
# scan_project_filter, schema_*, sink_*, stream_* smokes,
# timeseries_anomaly_zscore, window_distinct_running, … — recompute
# from the union at close), then the r07 block head.
_SAMPLE_WINDOW_R13: tuple[str, ...] = (
    # --- NEW r13 operators (prepended as they land) ---
    "analytics_auc_quality",
    "layout_encoding_stats",
    "stream_ttl_rollup_replay",
    "analytics_isotonic_calibration",
    "stream_disorder_stats",
    "udf_map_in_arrow",
    "dedup_stage_funnel",
    "analytics_mde_curve",
    "analytics_theil_index",
    "join_bloom_fpp_sweep",
    "match_fs_threshold_grid",
    "text_heaps_law",
    "graph_assortativity",
    "dedup_minhash_perm_sweep",
    "pipeline_seqlen_tradeoff_sweep",
    # --- oldest verdicts: all 28 remaining r05-latest names ---
    "agg_arg_extremes",
    "agg_histogram",
    "agg_percentile",
    "agg_pivot",
    "agg_regression_moments",
    "agg_stats",
    "agg_winsorized_stats",
    "analytics_ab_lift",
    "analytics_abandonment",
    "analytics_abc_classification",
    "analytics_attribution",
    "analytics_attribution_first",
    "analytics_gini_coefficient",
    "analytics_group_regression",
    "analytics_heatmap_2d",
    "analytics_market_basket",
    "analytics_pareto_share",
    "analytics_survival_curve",
    "analytics_time_to_convert",
    "scalar_date_extended",
    "sql_group_by_all",
    "sql_lateral_topk",
    "sql_named_parameters",
    "sql_pipe_syntax",
    "sql_recursive_cte",
    "sql_subqueries",
    "unpivot_metrics",
    "window_rank_family",
    # --- r06 refresh head (fills to 50; trimmed from the tail as new
    # r13 operators are prepended) ---
    "stream_tumbling_counts",
    "agg_group_sum",
    "csv_decode_smoke",
    "csv_roundtrip_typed",
    "explode_array",
    "explode_outer_sparse",
    "scalar_array",
)

# Round-12 window (historical — superseded by _SAMPLE_WINDOW_R13).
_SAMPLE_WINDOW_R12: tuple[str, ...] = (
    # --- NEW r12 operators (prepended as they land) ---
    "dedup_banding_grid_eval",
    "stream_novelty_replay",
    "stream_priority_sample_replay",
    "search_bm25_param_grid",
    "timeseries_theil_sen",
    "pipeline_decontam_sweep",
    "multimodal_phash_threshold_curve",
    "stream_session_gap_sweep",
    "validate_key_skew",
    "graph_degree_powerlaw",
    "analytics_fdr_bh",
    "join_asof_tolerance_sweep",
    "agg_quantile_sketch_sweep",
    "layout_compaction_target_sweep",
    "text_gopher_threshold_sweep",
    # --- union closure (1) ---
    "stream_rollup_replay",
    # --- oldest verdicts: the 19 displaced r01/r02 names ---
    "merge_upsert_apply",
    "dedup_exact",
    "jsonl_envelope_roundtrip",
    "merge_incremental_agg",
    "validate_snapshot_diff",
    "merge_idempotent_reapply",
    "source_python_datasource",
    "merge_compaction",
    "multimodal_binary_meta",
    "join_inner_agg",
    "join_broadcast_dim",
    "join_left_outer",
    "join_full_outer",
    "join_semi",
    "join_anti",
    "join_range",
    "join_five_way",
    "join_salted_skew",
    "join_null_safe",
    # --- r05 refresh head (fills to 50; trimmed from the tail as new
    # r12 operators are prepended) ---
    "agg_count_distinct",
    "agg_approx_distinct",
    "agg_rollup",
    "agg_cube",
    "agg_collect_sorted",
    "agg_approx_percentile",
    "agg_string_concat",
    "agg_grouping_sets",
    "agg_histogram_equidepth",
    "agg_mode_deterministic",
    "agg_boolean",
    "agg_robust_stats",
    "agg_weighted_percentile",
    "agg_median_distributed",
    "agg_rollup_parent_share",
)

# Round-11 window (historical — superseded by _SAMPLE_WINDOW_R12).
_SAMPLE_WINDOW_R11: tuple[str, ...] = (
    # --- NEW r11 operators (sampled immediately; each one added here
    # displaces the newest refresh slot so the window stays 50) ---
    "stream_simhash_pairs_capped",
    "analytics_diff_in_diff",
    "analytics_ridge_regression",
    "analytics_kaplan_meier",
    "analytics_sprt_boundary",
    "validate_k_anonymity",
    "agg_theta_sketch_setops",
    "sample_weighted_priority",
    "graph_betweenness_seeds",
    "dedup_threshold_sweep",
    "search_ndcg_eval",
    "vector_sq8_recall_eval",
    "text_novelty_curve",
    "pipeline_water_filling",
    "join_scd2_pointintime",
    "analytics_activity_streaks",
    "vector_ivf_nprobe_curve",
    "text_source_overlap_matrix",
    "pipeline_stage_order_eval",
    # --- 31 never-sampled (r01–r10 union gap; with the 19 new names
    # above, the r01–r11 union closes at 349/349) ---
    # round-9 operators the r9 judge re-ran directly (5)
    "dedup_simhash_recall_eval",
    "text_langid_eval",
    "vector_bq_hamming_topk",
    "vector_bq_recall_eval",
    "analytics_chi_square",
    # first-wave r10 (8)
    "stream_simhash_pairs_replay",
    "agg_quantile_sketch",
    "sample_stratified_neyman",
    "pipeline_rendezvous_resharding",
    "validate_psi_drift",
    "dedup_cluster_histogram",
    "sample_coordinated_fk",
    "dedup_simhash_cap_effect",
    # second-wave r10 (18)
    "join_bloom_prefilter",
    "merge_deletion_vectors",
    "merge_ivm_join_view",
    "merge_equality_deletes",
    "graph_pagerank_personalized",
    "graph_closeness_seeds",
    "graph_walk_corpus",
    "analytics_ks_test",
    "analytics_bootstrap_ci",
    "analytics_permutation_test",
    "analytics_mutual_information",
    "analytics_dp_counts",
    "analytics_welch_ttest",
    "analytics_power_analysis",
    "text_feature_hashing",
    "validate_join_cardinality",
    "validate_f2_ams_sketch",
    "timeseries_dft_top",
    # (dedup_exact, jsonl_envelope_roundtrip, merge_compaction,
    # merge_idempotent_reapply, merge_incremental_agg,
    # merge_upsert_apply, multimodal_binary_meta, source_python_datasource,
    # validate_snapshot_diff, join_anti, join_broadcast_dim,
    # join_five_way, join_full_outer, join_inner_agg, join_left_outer,
    # join_null_safe, join_range, join_salted_skew, join_semi displaced
    # by the nineteen new r11 operators — they keep their r01/r02
    # verdicts and head the r12 refresh list.)
)

# Round-10 window (historical — superseded by _SAMPLE_WINDOW_R11): the
# 49 first-time names of r10 + the join_interval_overlap stale-error
# clear; landed 50/50 green in CORRECTNESS_r10.json (union 299/330).
_SAMPLE_WINDOW_R10: tuple[str, ...] = (
    # enrichment tail (6)
    "pipeline_chunk_storage",
    "text_rake_keyphrases",
    "graph_hits",
    "multimodal_shard_index",
    "graph_clustering_coefficient",
    "match_fellegi_sunter",
    # streaming / timeseries (14)
    "timeseries_downsample_ohlc",
    "stream_session_capped",
    "timeseries_changepoint",
    "timeseries_seasonality",
    "timeseries_acf",
    "stream_cusum_flags",
    "timeseries_gap_stats",
    "timeseries_anomaly_iqr",
    "timeseries_xcorr",
    "timeseries_stl_lite",
    "timeseries_snaive_backtest",
    "timeseries_holt_forecast",
    "stream_window_uniques_smoke",
    "analytics_session_paths",
    # merge tail (5)
    "merge_bucketed_base",
    "merge_tombstone_gc",
    "merge_time_travel",
    "merge_changeset_stats",
    "merge_partition_overwrite",
    # multimodal (5)
    "multimodal_decode_frames",
    "multimodal_decode_stats",
    "multimodal_resize_stats",
    "multimodal_storage_budget",
    "multimodal_phash_dedup",
    # sketches (2) + layout (1)
    "agg_hll_deterministic",
    "agg_kmv_jaccard",
    "layout_skipping_eval",
    # curation tail (14)
    "vector_pq_codes",
    "vector_pq_adc_topk",
    "text_naive_bayes_quality",
    "vector_prefix_dim_recall",
    "pipeline_bpe_merges",
    "pipeline_bpe_encode",
    "pipeline_quality_funnel",
    "text_bpe_fertility",
    "pipeline_bpe_vocab_growth",
    "pipeline_mix_temperature",
    "analytics_calibration_ece",
    "text_boilerplate_ngrams",
    "text_kneser_ney_bigram",
    "sample_coreset_kcenter",
    # analytics (2)
    "analytics_ab_cuped",
    "analytics_cep_pattern",
    # stale-error clear (1)
    "join_interval_overlap",
)


def _apply_sample_window(first: tuple[str, ...]) -> None:
    """Reorder QUERIES so ``first`` occupies the driver's 50-name window.

    Raises loudly on a typo'd / unregistered name so a bad rotation list
    cannot silently shrink the sample. Relative import order is kept for
    every name outside the window.
    """
    missing = [n for n in first if n not in QUERIES]
    if missing:
        raise KeyError(f"sample window names not registered: {missing}")
    head = set(first)
    order = [*first, *(n for n in QUERIES if n not in head)]
    for mapping in (QUERIES, ORACLES, MODULES):
        reordered = {n: mapping[n] for n in order if n in mapping}
        mapping.clear()
        mapping.update(reordered)


def load_all() -> None:
    """Import every query module so registration side effects run.

    Registration order is then rewritten by :func:`_apply_sample_window`
    so the driver's first-50 correctness sample lands exactly on the
    round's rotation list (see ``_SAMPLE_WINDOW_R13``). History: r01–r05
    sampled the alphabetical head (union 77/270); r06–r09 rotated by
    module import order (union 250/304); r10 switched to the explicit
    list (union 299/330); r11's window was the 19 NEW r11 operators +
    the final 31 never-sampled names (union 349/350 — only
    ``stream_rollup_replay``, added after that window was pinned, was
    left); r12 led with it plus the new r12 operators, closing the
    union, then refreshed the oldest (r01/r02) verdicts; from r13 the
    job is verdict FRESHNESS — new operators first, then the oldest-
    latest-verdict block. New queries may land anywhere — only the
    window list pins the sample.
    """
    from .queries import (  # noqa: F401
        pipelines,
        joins_asof,
        enrichment,
        streaming,
        merge,
        multimodal,
        sketches,
        layout,
        validation,
        curation,
        dedup,
        udfs,
        setops,
        text,
        vectors,
        semistructured,
        joins,
        relational,
        scalars,
        windows,
        aggregates,
        analytics,
    )

    _apply_sample_window(_SAMPLE_WINDOW_R13)
