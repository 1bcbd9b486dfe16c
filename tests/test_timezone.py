"""Session-timezone contract for the datetime/streaming families.

The fixture's ``events.ts`` reads as TIMESTAMP_NTZ (parquet logical
timestamp with isAdjustedToUTC=false): WALL-CLOCK semantics, by design
independent of ``spark.sql.session.timeZone``. That is the contract that
makes the DuckDB oracles portable — DuckDB's naive TIMESTAMP has the same
wall-clock semantics regardless of host timezone — and it was previously
only exercised under the default UTC session.

These tests re-run the day-boundary-sensitive queries under an
``America/New_York`` session timezone and assert BIT-IDENTICAL results:
date_trunc / window() / session gaps over NTZ must not shift with the
session zone. If a future fixture regeneration ships ``ts`` as
timezone-adjusted TIMESTAMP (LTZ), these tests fail immediately — the
signal to revisit every day-boundary oracle (LTZ day boundaries follow
the session zone; the oracles assume wall-clock days).
"""

from __future__ import annotations

import pytest


@pytest.fixture()
def ny_tz(spark):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield
    spark.conf.set("spark.sql.session.timeZone", old)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_events_ts_is_ntz(spark, sf_dir):
    from orchestrated_etl_spark.sources.catalog import read_events

    assert dict(read_events(spark, sf_dir).dtypes)["ts"] == "timestamp_ntz"


# Every batch query whose semantics touch event timestamps or emit
# truncated date/month buckets. date_trunc on NTZ/DATE silently converts
# through the session timezone (the bug this sweep caught in
# datetime_daily_rollup, asof_join_salted, sink_clustered_write,
# sink_zorder_write, sql_q14_promo_share, agg_hll_sketch_merge).
_TZ_SENSITIVE = [
    "datetime_daily_rollup",
    "datetime_parts",
    "window_tumbling_hourly",
    "window_sliding_2h_batch",
    "sessionize_events_30m",
    "window_session_builtin",
    "datetime_gap_fill",
    "datetime_linear_interpolate",
    "events_dau_wau",
    "events_retention_cohorts",
    "funnel_view_click_purchase",
    "events_anomaly_zscore",
    "events_seasonal_decompose",
    "events_attribution_linear",
    "events_markov_transitions",
    "asof_join_purchase_click",
    "asof_join_salted",
    "range_join_clicks_before_purchase",
    "range_join_binned",
    "window_range_7day_spend",
    "events_rfm_segmentation",
    "events_rfm_quantile_cutoffs",
    "sink_clustered_write",
    "sink_zorder_write",
    "sql_q14_promo_share",
    "agg_hll_sketch_merge",
    "datetime_interval_math",
    "window_locf_ignore_nulls",
    # round 4: interval-union sweep, CEP sequence ordering (+ sessionized
    # twin) — all pure interval/ordering arithmetic over NTZ, must not
    # move with the session zone
    "events_interval_coverage",
    "events_cep_conversion",
    "events_cep_sessionized",
    # wave 15: daily-series detectors (to_date day bucketing), the KM
    # duration domain (datediff over to_date), the hour-window
    # quarantine rule, and the per-user trigram ordering — all NTZ
    # wall-clock, must not move with the session zone
    "events_cusum_changepoint",
    "events_acf_lags",
    "events_holt_linear",
    "events_max_drawdown",
    "events_km_survival",
    "events_trigram_paths",
    "dq_quarantine_split",
]


@pytest.mark.parametrize("qname", _TZ_SENSITIVE)
def test_batch_day_boundaries_tz_invariant(spark, sf_dir, qname, ny_tz):
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[qname]
    ny = _rows(fn(spark, sf_dir))
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    utc = _rows(fn(spark, sf_dir))
    assert ny == utc


def test_stream_tumbling_daily_tz_invariant(spark, sf_dir, ny_tz):
    import __spark_entry__ as entrymod

    fn = entrymod.queries()["stream_tumbling_daily"]
    ny = _rows(fn(spark, sf_dir))
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    utc = _rows(fn(spark, sf_dir))
    assert ny == utc and len(ny) > 0
