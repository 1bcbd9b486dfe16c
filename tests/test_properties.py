"""Property-based cross-checks (hypothesis): Spark operator results must
equal a trivially-correct pure-Python computation on arbitrary small
inputs. Example counts are kept low — every example round-trips through a
Spark job — but the inputs are adversarial in ways the fixture corpus is
not (empty docs, single tokens, all-identical docs, disconnected graphs).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from orchestrated_etl_spark.functions import dedup as D

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# documents: 2-6 docs, each 0-8 tokens drawn from a 5-word vocab (forces
# collisions, empties, and identical docs)
_docs_strategy = st.lists(
    st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
             min_size=0, max_size=8),
    min_size=2,
    max_size=6,
)


def _py_jaccard(a: set, b: set) -> float:
    return len(a & b) / len(a | b) if (a | b) else 0.0


@settings(**_SETTINGS)
@given(_docs_strategy)
def test_jaccard_pairs_matches_python_sets(spark, docs):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # token-set Jaccard at threshold 0 — every sharing pair must appear
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.jaccard_pairs(
            df, "doc_id", F.array_distinct(F.split("text", " ")), 0.0
        ).collect()
    }
    # NOTE: split(' ') of "" yields [""] — the empty-string token is a
    # real element on both sides (Spark and python must agree).
    sets = {i: set(t.split(" ")) for i, t in rows}
    want = {}
    for i, a in sets.items():
        for j, b in sets.items():
            if i < j and (a & b):
                want[(i, j)] = round(_py_jaccard(a, b), 6)
    assert got == want


@settings(**_SETTINGS)
@given(
    st.integers(min_value=2, max_value=8).flatmap(
        lambda n: st.tuples(
            st.just(n),
            st.lists(
                st.tuples(
                    st.integers(0, n - 1), st.integers(0, n - 1)
                ).filter(lambda e: e[0] != e[1]),
                min_size=0,
                max_size=10,
            ),
        )
    )
)
def test_connected_components_matches_union_find(spark, graph):
    n, edges = graph
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in range(n)}
    # canonical = min node id in component
    comp_min: dict[int, int] = {}
    for i, r in want.items():
        comp_min[r] = min(comp_min.get(r, i), i)
    want = {i: comp_min[find(i)] for i in range(n)}

    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame(
        edges or [(0, 0)], "src long, dst long"
    )  # self-loop placeholder when no edges (harmless: min(label)=own)
    got = {
        r["id"]: r["component"]
        for r in D.connected_components(nodes, edf).collect()
    }
    assert got == want


@settings(**_SETTINGS)
@given(st.lists(st.sampled_from("abcde"), min_size=1, max_size=30))
def test_shingles_match_python(spark, toks):
    df = spark.createDataFrame([(0, " ".join(toks))], "doc_id long, text string")
    [row] = df.select(D.shingles("text", 3).alias("sh")).collect()
    got = sorted(row["sh"])
    if len(toks) <= 3:
        want = sorted({" ".join(toks[:3])})
    else:
        want = sorted({" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)})
    assert got == want
