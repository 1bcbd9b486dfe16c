"""Plan and semantics tests for the wave-8 TPC-H shapes and the
search/quality queries: the point of each query is a specific Catalyst
rewrite (decorrelation, semi-join chains, null-aware anti-join) or a
hand-checkable scoring/gating rule — both are pinned here on the fixture
and on tiny hand-built frames."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# plan shapes
# ---------------------------------------------------------------------------


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_q2_correlated_min_decorrelates(spark, sf_dir):
    """The correlated ``unit_cost = (SELECT min(...) WHERE same part)``
    must decorrelate into an aggregate joined back on the correlation
    key — at scale a per-row subquery execution would be O(parts ×
    suppliers). The executed plan therefore contains a min aggregate and
    NO per-row scalar-subquery node."""
    from orchestrated_etl_spark.queries.sql_tpch_wave8 import (
        _q2_min_cost_supplier,
    )

    plan = _plan(_q2_min_cost_supplier(spark, sf_dir))
    assert "min(" in plan, plan
    assert "ScalarSubquery" not in plan, plan


def test_q16_not_in_is_anti_join(spark, sf_dir):
    """NOT IN must plan as a (null-aware) anti-join, and the distinct
    supplier count must go through the two-phase distinct expansion —
    both visible in the executed plan."""
    from orchestrated_etl_spark.queries.sql_tpch_wave8 import (
        _q16_supplier_diversity,
    )

    plan = _plan(_q16_supplier_diversity(spark, sf_dir))
    assert "LeftAnti" in plan, plan
    assert "distinct" in plan.lower(), plan


def test_q20_nested_in_is_semi_join_chain(spark, sf_dir):
    """Both IN-subqueries (supplier IN …, part IN …) must become
    left-semi joins — two of them in one plan, never a distinct
    materialization or per-row evaluation."""
    from orchestrated_etl_spark.queries.sql_tpch_wave8 import (
        _q20_excess_availability,
    )

    plan = _plan(_q20_excess_availability(spark, sf_dir))
    assert plan.count("LeftSemi") >= 2, plan


def test_bm25_query_is_posting_lookup_over_staged_index(spark, sf_dir):
    """Round 3 contract: the index (postings/df/stats) is STAGED once per
    session, so the query plan must (a) filter the checkpointed postings
    by the query terms, and (b) never rescan the corpus — 0 parquet
    scans, with stats arriving as scalar subqueries rather than a re-
    derivation. (Round 2's one-shot plan re-derived corpus stats per
    query: 6 scans.)"""
    from orchestrated_etl_spark.queries.llm_search_quality import (
        _search_bm25_topk,
    )

    import re

    plan = _plan(_search_bm25_topk(spark, sf_dir))
    # term filter on the staged posting list
    assert re.search(r"term#\d+ IN \(spark,window,merge\)", plan), plan
    # corpus is never rescanned at query time
    assert "Scan parquet" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan


# ---------------------------------------------------------------------------
# semantics on hand-built frames
# ---------------------------------------------------------------------------


def _write_docs(spark, tmp_path, rows):
    """rows: (doc_id, text, lang, source)"""
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text").cast("int"))
    sf = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    return sf


def test_bm25_matches_hand_computation(spark, tmp_path):
    """Two tiny documents, one query term: BM25 computed by hand (Lucene
    idf, k1=1.2, b=0.75) must match the query's rounded score."""
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "spark spark slow", "en", "s"),  # tf=2, dl=3
            (2, "spark fast fast fast fast", "en", "s"),  # tf=1, dl=5
            (3, "other words here", "en", "s"),  # no match
        ],
    )
    from orchestrated_etl_spark.queries.llm_search_quality import (
        _search_bm25_topk,
    )

    out = {
        r["doc_id"]: r["score"] for r in _search_bm25_topk(spark, sf).collect()
    }
    n_docs, avgdl, df_t, k1, b = 3, (3 + 5 + 3) / 3, 2, 1.2, 0.75

    def bm25(tf, dl):
        idf = math.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
        return round(
            idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 6
        )

    assert set(out) == {1, 2}
    assert abs(out[1] - bm25(2, 3)) < 1e-9
    assert abs(out[2] - bm25(1, 5)) < 1e-9
    assert out[1] > out[2]  # higher tf, shorter doc wins


def test_incremental_dedup_drops_known_content(spark, tmp_path):
    """Incoming docs (doc_id % 5 == 0) survive only if their exact text
    is absent from the history partition."""
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "already seen text", "en", "s"),  # history
            (5, "already seen text", "en", "s"),  # incoming dup → dropped
            (10, "genuinely new text", "en", "s"),  # incoming novel → kept
            (2, "other history", "en", "s"),  # history
        ],
    )
    from orchestrated_etl_spark.queries.llm_search_quality import (
        _incremental_dedup,
    )

    kept = [r["doc_id"] for r in _incremental_dedup(spark, sf).collect()]
    assert kept == [10]


def test_quality_gate_per_rule_attribution(spark, tmp_path):
    """Each rule drops exactly the documents built to violate it, and a
    document failing several rules is counted in every failing column
    but dropped once."""
    good = "the quick brown fox jumps over a lazy dog and runs far away " * 2
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, good.strip(), "en", "s"),  # passes all rules
            (2, "too short", "en", "s"),  # fails len_lo (and stopword)
            (3, " ".join(["word"] * 30), "en", "s"),  # no stopword, repetitive
        ],
    )
    from orchestrated_etl_spark.queries.llm_search_quality import (
        _quality_gopher_gate,
    )

    row = _quality_gopher_gate(spark, sf).collect()[0]
    assert row["n_docs"] == 3
    assert row["n_kept"] == 1
    assert row["drop_len_lo"] == 1  # doc 2
    assert row["drop_stopword"] == 2  # docs 2 and 3
    assert row["drop_distinct"] == 1  # doc 3 (1 unique / 30)


def test_tfidf_rank_ties_break_alphabetically(spark, tmp_path):
    """Terms with identical tf and df tie on score; the rank order must
    then be alphabetical so both engines (and reruns) agree."""
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "zebra apple zebra apple mango", "en", "s"),
            (2, "unrelated words entirely here now", "en", "s"),
        ],
    )
    from orchestrated_etl_spark.queries.llm_search_quality import (
        _tfidf_keywords,
    )

    rows = [
        (r["rank"], r["term"])
        for r in _tfidf_keywords(spark, sf).collect()
        if r["doc_id"] == 1
    ]
    # apple and zebra: tf=2, df=1 each → tied score; apple ranks first
    assert (1, "apple") in rows and (2, "zebra") in rows


def test_bm25_bucketed_store_prunes_buckets(spark, sf_dir):
    """The durable posting store must serve a 3-term query from only the
    terms' hash buckets (bucket pruning), and score identically to the
    checkpoint-staged index."""
    import re

    from orchestrated_etl_spark.queries.llm_search_quality import (
        _search_bm25_store_bucketed,
        _search_bm25_topk,
    )

    df = _search_bm25_store_bucketed(spark, sf_dir)
    plan = _plan(df)
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, plan
    assert int(m.group(1)) < int(m.group(2)), m.group(0)
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(tuple(r) for r in _search_bm25_topk(spark, sf_dir).collect())
    assert a == b
