"""Smoke contracts for tools/scaling_common.py (round-10 consolidation
of the measure_scaling_r* scaffolding) and the thin per-round drivers.

The round files stay committed as reproducible method records; the
machinery they share — steady-state timing, disjoint key-shift growth,
alphabet-permutation content growth, temp-sf_dir staging — now lives in
one module. These tests pin the properties the published SCALING.md
curves depend on."""

from __future__ import annotations

import py_compile
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))

import scaling_common as SC  # noqa: E402


def test_round_drivers_compile():
    """Every historical measure_scaling_r* driver must still compile
    against the consolidated module (the 'each historical tool still
    runs' clause; full runs need 16g and minutes, so the per-round
    METHODS are exercised via the shared builders below)."""
    for p in sorted((REPO / "tools").glob("measure_scaling_r*.py")):
        py_compile.compile(str(p), doraise=True)


def test_alphabet_permutations_distinct_and_bijective():
    """rot26 gives 26 distinct transforms; dihedral52 gives 52 — the
    property that lets r9's CDC measurement grow content 50x without
    duplicate copies (rotations alone cap at 26)."""
    rots = {SC.rot26(i) for i in range(26)}
    assert len(rots) == 26
    dih = {SC.dihedral52(i) for i in range(52)}
    assert len(dih) == 52
    assert all(sorted(p) == sorted("abcdefghijklmnopqrstuvwxyz")
               for p in dih), "each permutation must be a bijection"
    assert SC.dihedral52(3) == SC.rot26(3)  # rotations embed in dihedral


def test_grow_shifted_disjoint_on_sparse_ids(spark):
    """The r9 advice item: shifts must be max(key)+1, never count() —
    with SPARSE ids (max >= count), count-shifted copies collide. Pin
    that the default produces fully disjoint id spaces on sparse input."""
    df = spark.createDataFrame(
        [(0, "a"), (7, "b"), (9, "c")], ["doc_id", "text"]
    )
    grown = SC.grow_shifted(df, 3, ["doc_id"])
    rows = grown.count()
    distinct = grown.select("doc_id").distinct().count()
    assert rows == 9 and distinct == 9, "count-based shift would collide"
    assert SC.max_shift(df, "doc_id") == 10


def test_grow_permuted_docs_disjoint_ids_and_content(spark):
    df = spark.createDataFrame(
        [(0, "abc", "en"), (1, "xyz", "en")], ["doc_id", "text", "lang"]
    )
    grown = SC.grow_permuted_docs(df, 3, SC.rot26, keep=("lang",))
    assert grown.columns == ["doc_id", "text", "lang"]
    assert grown.count() == 6
    assert grown.select("doc_id").distinct().count() == 6
    # each copy is under a DIFFERENT permutation -> content grows too
    assert grown.select("text").distinct().count() == 6


def test_staged_tmpdir_and_stage_parquet_roundtrip(spark):
    df = spark.range(10).withColumnRenamed("id", "k")
    with SC.staged_tmpdir("sc_smoke_") as tmp:
        SC.stage_parquet(df, f"{tmp}/t.parquet", partitions=2)
        assert spark.read.parquet(f"{tmp}/t.parquet").count() == 10
        kept = tmp
    assert not Path(kept).exists(), "tmpdir must be removed on exit"


def test_steady_times_second_run():
    calls = []
    t = SC.steady(lambda: calls.append(1))
    assert len(calls) == 2 and t >= 0.0
