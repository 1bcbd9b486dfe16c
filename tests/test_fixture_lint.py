"""Fixture-portability lint (round-13 rule, pinned per round-14 verdict
item 7): test fixtures feeding LTZ ``timestamp`` columns must build
UTC-AWARE datetimes, because ``createDataFrame`` interprets a naive
Python datetime in the PROCESS timezone — under TZ=Pacific/Kiritimati
(+14) a noon fixture lands on the previous UTC day and day-bucketed
assertions shift (the round-13 Kiritimati full-pytest axis caught nine
such builders across six files).

This lint makes the rule outlive round memory: every ``datetime(...)``
constructor literal in ``tests/`` must either pass ``tzinfo=`` or carry
the ``naive-ntz-ok`` marker comment on (or directly above) the call —
the documented escape hatch for fixtures feeding ``timestamp_ntz``
columns, where a NAIVE value is the correct, zone-free input and adding
tzinfo would be wrong (Spark strips it asymmetrically per process TZ).
"""

from __future__ import annotations

import ast
import pathlib

TESTS_DIR = pathlib.Path(__file__).resolve().parent
MARKER = "naive-ntz-ok"


def _is_datetime_ctor(call: ast.Call) -> bool:
    f = call.func
    if isinstance(f, ast.Name) and f.id == "datetime":
        return True  # from datetime import datetime; datetime(...)
    return isinstance(f, ast.Attribute) and f.attr == "datetime"
    # dt.datetime(...) / datetime.datetime(...); .date()/.timedelta()
    # don't match — they're zone-free by construction.


def _has_tzinfo(call: ast.Call) -> bool:
    if any(kw.arg == "tzinfo" for kw in call.keywords):
        return True
    return len(call.args) >= 8  # 8th positional IS tzinfo


def _marked(lines: list[str], call: ast.Call) -> bool:
    lo = max(0, call.lineno - 2)  # line above the call, 0-based
    hi = min(len(lines), (call.end_lineno or call.lineno))
    return any(MARKER in lines[i] for i in range(lo, hi))


def test_no_naive_datetime_literals_in_fixtures():
    violations = []
    for py in sorted(TESTS_DIR.glob("*.py")):
        src = py.read_text()
        lines = src.splitlines()
        for node in ast.walk(ast.parse(src)):
            if not (isinstance(node, ast.Call) and _is_datetime_ctor(node)):
                continue
            if len(node.args) < 3:  # not a Y/M/D literal (e.g. now(), **kw)
                continue
            if _has_tzinfo(node) or _marked(lines, node):
                continue
            violations.append(f"{py.name}:{node.lineno}")
    assert not violations, (
        "naive datetime(...) literal(s) in test fixtures — pass "
        "tzinfo=datetime.timezone.utc for LTZ `timestamp` columns, or "
        f"add a `# {MARKER}` comment when the value genuinely feeds a "
        f"timestamp_ntz column: {violations}"
    )


def test_lint_detects_naive_and_respects_marker_and_tzinfo():
    """Negative self-check: the detector must flag a naive literal and
    must pass tzinfo'd / marker'd / date-only forms."""
    src = (
        "import datetime as dt\n"
        "a = dt.datetime(2024, 1, 1, 12, 0)\n"          # flag: naive
        "b = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)\n"
        "c = dt.datetime(2024, 1, 2)  # naive-ntz-ok\n"
        "d = dt.date(2024, 1, 3)\n"                      # date: zone-free
        "e = dt.datetime(2024)\n"                        # <3 args: not Y/M/D
    )
    lines = src.splitlines()
    flagged = [
        node.lineno
        for node in ast.walk(ast.parse(src))
        if isinstance(node, ast.Call)
        and _is_datetime_ctor(node)
        and len(node.args) >= 3
        and not _has_tzinfo(node)
        and not _marked(lines, node)
    ]
    assert flagged == [2]
