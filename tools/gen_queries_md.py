"""Regenerate QUERIES.md from the live registry.

Groups queries by defining module, marks oracle coverage, and uses the
first docstring line of each query callable as the summary.

Usage: python tools/gen_queries_md.py > QUERIES.md
"""

from __future__ import annotations

import sys
from collections import defaultdict

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry  # noqa: E402


def main() -> None:
    qs = entry.queries()
    oracles = entry.oracle_sql()

    by_module: dict[str, list[str]] = defaultdict(list)
    for name, fn in qs.items():
        mod = fn.__module__.rsplit(".", 1)[-1]
        by_module[mod].append(name)

    n, n_oracle = len(qs), len(oracles)
    out = [
        "# QUERIES — full registry catalog",
        "",
        f"All {n} registered queries; {n_oracle} are checked against a DuckDB",
        "oracle (row count + columns + order-insensitive value multiset) at sf0.01;",
        "the rest are rows-only (streaming state / estimator-specific values) and",
        "pinned against batch equivalents in tests instead. Grouped by module.",
    ]
    for mod in sorted(by_module):
        out += ["", f"## {mod}", "", "| query | oracle | summary |", "|---|---|---|"]
        for name in by_module[mod]:
            doc = (qs[name].__doc__ or "").strip().splitlines()
            summary = doc[0].strip() if doc else ""
            mark = "✓" if name in oracles else "rows-only"
            out.append(f"| `{name}` | {mark} | {summary} |")
    print("\n".join(out))


if __name__ == "__main__":
    main()
