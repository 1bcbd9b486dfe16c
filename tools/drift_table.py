"""Itemize the settled-bench drift vs the r04 best-ever capture.

Round-18 (r17 verdict item 4): the gate's creep WARN says the settled
total sits ~+2.5 s over r04's 18.137 s at identical suite composition,
attributed in prose to scale-posture reworks but never itemized. This
tool prints the per-query table for SCALING.md: r04's committed value,
a settled capture's value, the delta, and — when a second capture taken
with ``SPARK_GRAFT_BENCH_REPEATS=1`` is supplied — the
protocol-isolated column that separates the round-6 MEASUREMENT change
from engine drift.

The protocol confound (discovered by this itemization): r04/r05
captures predate commit 4c9083a (round 6), which changed bench.py's
warm numbers from ONE warm pass per query (taken right after that
query's cold pass — hottest possible caches) to the MEDIAN of 3
interleaved full-suite passes. A median over interleaved passes reads
systematically higher than the old single hot pass, so part of every
query's "drift vs r04" is the ruler changing, not the engine. A
repeats=1 capture approximates the old protocol on TODAY's engine:
  delta_vs_r04      = settled - r04      (what the creep WARN sees)
  protocol_component = settled - r1      (median-of-3 vs single pass)
  engine_component   = r1 - r04          (real plan/code drift since r04)

Usage: python tools/drift_table.py SETTLED_CAPTURE [REPEATS1_CAPTURE]
(captures are raw two-line bench.py stdout files or BENCH_r*.json)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from check_bench_gate import load_bench  # noqa: E402

REPO = Path(__file__).resolve().parents[1]


def main(argv: list[str]) -> int:
    settled = load_bench(Path(argv[1]))
    r1 = load_bench(Path(argv[2])) if len(argv) > 2 else None
    r04 = load_bench(REPO / "BENCH_r04.json")
    assert settled["ok"] and r04["ok"]
    qs = sorted(
        r04["queries"],
        key=lambda k: settled["queries"][k] - r04["queries"][k],
        reverse=True,
    )
    hdr = f"| {'query':33s} | {'r04':>6s} | {'r18':>6s} | {'delta':>6s} |"
    if r1:
        hdr += f" {'r18@1':>6s} | {'proto':>6s} | {'engine':>6s} |"
    print(hdr)
    print("|" + "-" * 35 + ("|--------" * (3 + (3 if r1 else 0))) + "|")
    tot = [0.0, 0.0, 0.0]
    for k in qs:
        a, b = r04["queries"][k], settled["queries"][k]
        row = f"| {k:33s} | {a:6.3f} | {b:6.3f} | {b - a:+6.3f} |"
        tot[0] += b - a
        if r1:
            c = r1["queries"][k]
            row += f" {c:6.3f} | {b - c:+6.3f} | {c - a:+6.3f} |"
            tot[1] += b - c
            tot[2] += c - a
        print(row)
    foot = f"| {'TOTAL':33s} | {r04['value']:6.3f} | " \
           f"{settled['value']:6.3f} | {tot[0]:+6.3f} |"
    if r1:
        foot += f" {r1['value']:6.3f} | {tot[1]:+6.3f} | {tot[2]:+6.3f} |"
    print(foot)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
