"""Round-4 planted-fixture semantics tests (round-3 advice items):

- join_null_safe_eq must genuinely exercise the null-safe path: NULL
  keys on BOTH sides join to each other (anonymous bucket), surface the
  -1 sentinel and is_anonymous=true.
- sq8_topk's id-space contract: with exclude_self=False an external
  query whose id numerically collides with an unrelated corpus id must
  NOT lose that corpus vector as a candidate.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def test_null_safe_join_planted_null_keys(spark, tmp_path):
    """Planted events where user_id % 7 == 0 rows exist on both the
    click and purchase side: the anonymized NULL keys must merge into
    ONE anonymous row via <=>, not be dropped (plain equi-join) nor
    cross-matched per NULL (SQL NULL != NULL)."""
    from orchestrated_etl_spark.queries.sql_surface_wave12 import (
        _null_safe_join,
    )

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        # user 7 and 14 -> anonymized to NULL by the query's % 7 rule
        (1, ts, 7, "click", 1.0, "{}"),
        (2, ts, 14, "click", 1.0, "{}"),
        (3, ts, 7, "purchase", 1.0, "{}"),
        # named user on both sides
        (4, ts, 3, "click", 1.0, "{}"),
        (5, ts, 3, "purchase", 1.0, "{}"),
        # named user on one side only
        (6, ts, 5, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/events.parquet")

    out = {
        r["user_key"]: (r["n_clicks"], r["n_purchases"], r["is_anonymous"])
        for r in _null_safe_join(spark, sf_dir).collect()
    }
    # ONE anonymous row: 2 clicks (users 7,14) null-safe-joined to
    # 1 purchase (user 7); sentinel -1; is_anonymous=true.
    assert out[-1] == (2, 1, True)
    assert out[3] == (1, 1, False)
    assert out[5] == (0, 1, False)
    assert len(out) == 3


def test_sq8_topk_external_query_id_collision(spark):
    """Corpus ids 0..3; an EXTERNAL query reuses id 2. With
    exclude_self=False the unrelated corpus vector 2 stays a candidate
    (it is the query's true nearest neighbor here); with the default
    exclude_self=True it is silently dropped — the documented
    corpus-subset-only behavior."""
    from orchestrated_etl_spark.functions import similarity as SIM

    corpus = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [0.0, 0.0, 1.0, 0.0]),  # the collided-id vector
            (3, [0.0, 0.0, 0.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    # external query: id happens to equal corpus id 2, vector is nearly
    # corpus vector 2's direction
    queries = spark.createDataFrame(
        [(2, [0.0, 0.1, 1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )

    with_self = SIM.sq8_topk(
        queries, corpus, "vec_id", "embedding", 1, exclude_self=False
    ).collect()
    assert [r["neighbor_id"] for r in with_self] == [2]

    without = SIM.sq8_topk(
        queries, corpus, "vec_id", "embedding", 1
    ).collect()
    assert [r["neighbor_id"] for r in without] == [1]  # true NN excluded
