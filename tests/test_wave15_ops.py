"""Wave-15 planted-fixture semantics tests: hand-computed expectations
for the per-node graph measures and the time-series detectors, on
fixtures small enough to verify on paper (the oracle gate then checks
the same operators against DuckDB at sf0.01)."""

from __future__ import annotations

import datetime

# Planted co-purchase lineitem: orders {1,2,3}x2 and {1,4}x2 give the
# weight>=2 edge set {(1,2),(1,3),(2,3),(1,4)} — a triangle 1-2-3 with
# pendant 4 hanging off node 1.
_LINEITEM_ROWS = [
    (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3),
    (3, 1), (3, 4),
    (4, 1), (4, 4),
]


def _write_lineitem(spark, tmp_path) -> str:
    df = spark.createDataFrame(
        _LINEITEM_ROWS, "l_orderkey long, l_partkey long"
    )
    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/lineitem.parquet")
    return sf_dir


def test_clustering_coefficient_planted(spark, tmp_path):
    from orchestrated_etl_spark.queries.wave15_round4 import (
        _clustering_coefficient,
    )

    sf_dir = _write_lineitem(spark, tmp_path)
    out = {
        r["node"]: (r["degree"], r["tri_count"], r["cc"])
        for r in _clustering_coefficient(spark, sf_dir).collect()
    }
    # node 1: degree 3 (2,3,4), 1 triangle -> 2*1/(3*2) = 1/3
    assert out[1] == (3, 1, 2.0 / 6.0)
    # nodes 2,3: degree 2, 1 triangle -> fully clustered
    assert out[2] == (2, 1, 1.0)
    assert out[3] == (2, 1, 1.0)
    # pendant node 4: degree 1 -> cc pinned to 0.0, not 0/0
    assert out[4] == (1, 0, 0.0)
    assert len(out) == 4


def test_hits_2iter_planted(spark, tmp_path):
    from orchestrated_etl_spark.queries.wave15_round4 import _hits_2iter

    sf_dir = _write_lineitem(spark, tmp_path)
    out = {
        r["node"]: (r["auth_1"], r["hub_1"], r["auth_2"])
        for r in _hits_2iter(spark, sf_dir).collect()
    }
    # directed edges (low->high): 1->2, 1->3, 2->3, 1->4
    # auth1 = in-degree; hub1(u) = sum auth1 over u's out-neighbors;
    # auth2(v) = sum hub1 over v's in-neighbors.
    assert out[1] == (0, 1 + 2 + 1, 0)
    assert out[2] == (1, 2, 4)
    assert out[3] == (2, 0, 4 + 2)
    assert out[4] == (1, 0, 4)
    assert len(out) == 4


def _event(eid, day, etype="view", value=None, user=1):
    return (
        eid,
        datetime.datetime(2024, 1, day, 12, 0, 0),
        user,
        etype,
        value,
        "{}",
    )


_EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_cusum_changepoint_planted_level_shift(spark, tmp_path):
    """1 event/day on days 1-4, then 3/day on days 5-8: N=8, S=16, so
    N*c-S is -8 before and +8 after the shift; the scaled CUSUM walks
    -8,-16,-24,-32 then recovers to 0, peaking exactly at the last
    pre-shift day."""
    from orchestrated_etl_spark.queries.wave15_round4 import (
        _cusum_changepoint,
    )

    rows, eid = [], 0
    for day in range(1, 5):
        eid += 1
        rows.append(_event(eid, day))
    for day in range(5, 9):
        for _ in range(3):
            eid += 1
            rows.append(_event(eid, day))
    spark.createDataFrame(rows, _EVENT_SCHEMA).write.parquet(
        f"{tmp_path}/events.parquet"
    )
    out = {
        r["day"].day: (r["n_events"], r["cusum_scaled"], r["is_peak"])
        for r in _cusum_changepoint(spark, str(tmp_path)).collect()
    }
    assert out[1] == (1, -8, False)
    assert out[4] == (1, -32, True)
    assert out[5] == (3, -24, False)
    assert out[8] == (3, 0, False)
    assert sum(1 for _, _, p in out.values() if p) == 1


def test_acf_planted_period2_series(spark, tmp_path):
    """Alternating 10/20 daily revenue: every lag-1 pair lies exactly
    on y = 30 - x (r = -1) and every lag-2 pair on y = x (r = +1)."""
    from orchestrated_etl_spark.queries.wave15_round4 import _acf_lags

    rows = [
        _event(d, d, "purchase", 10.0 if d % 2 else 20.0)
        for d in range(1, 9)
    ]
    spark.createDataFrame(rows, _EVENT_SCHEMA).write.parquet(
        f"{tmp_path}/events.parquet"
    )
    out = {
        r["lag"]: (r["n_pairs"], r["acf_r"])
        for r in _acf_lags(spark, str(tmp_path)).collect()
    }
    assert out[1] == (7, -1.0)
    assert out[2] == (6, 1.0)
    assert out[3] == (5, -1.0)
    assert out[7] == (1, None)  # single pair: zero variance -> NULL corr
