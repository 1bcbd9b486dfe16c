"""Query registry: every operator exposed to the driver's correctness gate.

Each entry pairs a PySpark callable ``(spark, sf_dir) -> DataFrame`` with a
DuckDB-runnable ANSI-SQL oracle string computing the same relation over the
same parquet tables. Column names are aliased identically on both sides
(the driver sorts columns by name before hashing).

FLOAT POLICY (hardened in round 2 after sf0.1 rounding flips): every
cross-engine-compared float is (a) an exact DECIMAL accumulation cast to
double (all money-like fixture columns are ≤2-decimal values, so sums and
their products are exact at small scales), (b) a raw IEEE operation on
such exact values (quotients, differences — identical inputs give
identical doubles), or (c) an integer. ``round()`` is never applied to a
compared double: Spark rounds via exact BigDecimal HALF_UP while DuckDB
multiplies by a power of ten, so identical inputs can round differently
at ties — and the fixture's 2-decimal data makes ties systematically
common, not measure-zero. The exceptions are genuinely irrational values
(entropy, z-scores, cosines) where round() acts as a tolerance far wider
than any accumulated ulp drift.

Queries whose semantics are not SQL-expressible (streaming state, LSH
banding internals) register without an oracle → the driver records a
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    if name in _QUERIES:
        raise ValueError(f"duplicate query name {name!r}")
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from orchestrated_etl_spark import queries as _q  # noqa: F401

    _q.load()


# The driver's correctness gate samples the FIRST 50 oracle-bearing entries
# in queries() iteration order (verified against CORRECTNESS_r01.json).
# Rounds 1-5 issued green rows for 197 distinct queries (r5 duplicated r4's
# sample because this list was not rotated — the round-5 verdict's #1 task).
# ROUND-6 FRONT: exactly 50 of the 94 still-never-sampled oracle queries,
# in the verdict-prescribed priority: the 11 wave-13/14 round-4 additions,
# the 20 wave-15 round-4b additions, the 10 late wave-15 entries, the 6
# final wave-15 entries (including events_pareto_8020 and text_zipf_slope,
# re-plumbed THIS round to partitioned two-phase windows — their new
# outputs need driver-issued greens), and 3 older stragglers
# (events_cep_sessionized, graph_kcore, agg_incremental_moments).
# ROUND-7 CANDIDATES (the 44 remaining never-sampled, registration order):
# train_mixture_sampling, train_chunk_documents, train_build_vocab,
# train_dedup_lines, train_dedup_lines_global, train_epoch_shuffle,
# window_range_7day_spend, agg_filtered_conditional, string_funcs_profile,
# train_split_assignment, datetime_linear_interpolate,
# ps_pandas_api_rollup, window_distribution_ranks, cogroup_click_purchase,
# sql_scalar_udf_revenue, sql_table_udf_spine, events_rfm_segmentation,
# events_dau_wau, events_anomaly_mad, events_seasonal_decompose,
# sql_collation_ci, train_e2e_incremental_refresh, search_phrase_match,
# search_bm25_store_bucketed, src_schema_evolution, agg_incremental_rollup,
# agg_incremental_join_view, agg_listagg_lines, agg_bitwise_flags,
# agg_bool_rules, agg_median_percentiles, window_nth_value,
# agg_approx_topk_exact_regime, array_fold_profile, datetime_interval_math,
# agg_grouping_id_cube, agg_regression_funcs, agg_width_bucket_histogram,
# join_shuffle_hash_hint, sql_pagination_offset, sql_regexp_count_instr,
# agg_multi_distinct, sql_parameterized_args, window_rolling_median.
_FRONT = [
    # wave-13/14 round-4 additions (11)
    "graph_bfs_frontier", "table_snapshot_diff", "join_bloom_prefilter",
    "er_match_blocked_parts", "events_cep_conversion", "skyline_price_size",
    "graph_shortest_path_weighted", "events_interval_coverage",
    "sql_pipe_syntax_rollup", "sql_lateral_correlated_topk",
    "spatial_radius_join",
    # wave-15 round-4b additions (20)
    "graph_clustering_coefficient", "graph_hits_2iter",
    "events_cusum_changepoint", "events_acf_lags",
    "agg_countmin_sketch_estimate", "dedup_cdc_chunks",
    "agg_bitmap_distinct", "stats_chi2_cells", "stats_chi2_total",
    "stats_corr_matrix", "events_km_survival", "stats_ab_welch_ttest",
    "sql_named_window_nulls", "events_holt_linear", "agg_trimmed_mean",
    "agg_gini_revenue", "events_trigram_paths", "events_max_drawdown",
    "dq_quarantine_split", "sim_label_centroid_matrix",
    # late wave-15 entries (10)
    "join_scd2_point_in_time", "train_dataset_card",
    "stream_quarantine_split", "train_bpe_merge_step", "events_bot_cadence",
    "agg_countmin_merge_incremental", "agg_bitmap_rollup_quarters",
    "train_pack_nfd_bins", "orders_basket_lift", "events_cohort_ltv",
    # final wave-15 entries (6) — pareto + zipf re-plumbed this round
    "text_pmi_collocations", "events_pareto_8020", "text_zipf_slope",
    "agg_histogram_quantile_merge", "graph_modularity",
    "approx_sampled_revenue_ci",
    # older stragglers (3)
    "events_cep_sessionized", "graph_kcore", "agg_incremental_moments",
]


def _ordered(d: dict) -> dict:
    front = {n: d[n] for n in _FRONT if n in d}
    rest = {n: v for n, v in d.items() if n not in front}
    return {**front, **rest}


def queries() -> dict[str, QueryFn]:
    _load_all()
    return _ordered(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return _ordered(_ORACLES)
