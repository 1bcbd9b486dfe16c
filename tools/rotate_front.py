"""Recompute the staleness-refresh `_FRONT` list for the next round.

Coverage has been complete since round 7 (every oracle query carries a
driver-issued green row), so each round's `_FRONT` simply fronts the 50
queries whose last driver sample is OLDEST — ties broken by
registration order (the documented rule in registry.py). This tool
derives that list from the committed CORRECTNESS_r*.json files and
prints it as a paste-ready Python list literal, removing the
transcription step (the registry contract test catches names that
don't exist, but only this recomputation establishes "stalest").

Usage: python tools/rotate_front.py
Then paste the output over `_FRONT` in orchestrated_etl_spark/registry.py,
update its round comment, and run the gate-2 rehearsals
(`check_oracle.py --vanilla [--pandas] --first 50`) before shipping.
"""

from __future__ import annotations

import glob
import json
import sys
import textwrap

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402

WINDOW = 50


def main() -> None:
    last: dict[str, int] = {}
    rounds = sorted(glob.glob("/root/repo/CORRECTNESS_r*.json"))
    for path in rounds:
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        with open(path) as f:
            for name in json.load(f):
                last[name] = max(last.get(name, 0), rnd)
    reg_order = {n: i for i, n in enumerate(entry.queries())}
    oracle_names = [n for n in reg_order if n in entry.oracle_sql()]
    unsampled = [n for n in oracle_names if n not in last]
    if unsampled:
        print(f"# WARNING: {len(unsampled)} oracle queries never sampled "
              f"— they front unconditionally: {unsampled}", file=sys.stderr)
    stale = sorted(
        oracle_names, key=lambda n: (last.get(n, 0), reg_order[n])
    )[:WINDOW]
    by_round: dict[int, list[str]] = {}
    for n in stale:
        by_round.setdefault(last.get(n, 0), []).append(n)
    print(f"# {len(rounds)} correctness files read; next _FRONT by "
          f"last-sampled round: "
          f"{ {r: len(ns) for r, ns in sorted(by_round.items())} }")
    print("_FRONT = [")
    for rnd, names in sorted(by_round.items()):
        label = "never sampled" if rnd == 0 else f"last sampled round {rnd}"
        print(f"    # {len(names)} stalest: {label} (registration order)")
        body = ", ".join(f'"{n}"' for n in names) + ","
        wrapped = textwrap.fill(
            body, width=71, break_long_words=False, break_on_hyphens=False
        )
        print(textwrap.indent(wrapped, "    "))
    print("]")


if __name__ == "__main__":
    main()
