"""Self-checking bench gate: the 2x rule and the noise band, from files.

Every round the judge and builder re-derived "no headline query above 2x
its best-ever driver time" and "total inside the documented ~±3 s session
band" from the committed BENCH_r*.json files by hand (the r8 and r9
verdicts each scripted it ad hoc). This tool makes those checks
mechanical and self-contained:

- reads every committed ``BENCH_r*.json`` (driver wrapper: ``{"parsed":
  <headline>, "tail": <~2 KB stdout tail>, ...}``), recovering the
  headline from the tail's last line when ``parsed`` is null (r6) and
  the telemetry object from the tail when present (r9+ bench.py emits
  loadavg/CPU/env at the end of the detail line precisely so it
  survives the tail capture);
- computes each headline query's BEST-EVER time and flags any target
  query above ``--ratio`` (default 2.0) times it;
- compares the target's total against the MEDIAN total among rounds
  with the SAME headline-query set (totals across different suite sizes
  are not comparable: r1 ran 16 queries, r4+ run 29) and flags a delta
  beyond ``--band`` seconds (default 3.0 — the session band measured
  across the r7/r8/r9 noise-log entries in SCALING.md). The median, not
  the all-time best: one lucky idle-machine run (r4's 18.137 s) would
  otherwise permanently consume the band and flag every
  normal-load session thereafter — exactly what happened to the
  driver's r10 capture, adjudicated as noise in SCALING.md (round-10
  advice). The best comparable total is still printed for context;
- prints the flagged run's telemetry so the attribution rule's inputs
  (load average, CPU count, SPARK_GRAFT_* env) are in one place;
- **demotes a total-band flag to a non-fatal WARN only when the
  capture's own telemetry EXPLAINS the excursion quantitatively**
  (round-12 advice tightened the round-11 unconditional load demotion —
  a genuine uniform regression in a loaded capture must not wave
  through). Two independent explanations, either suffices, both
  bounded:

  1. *machine speed* — the capture's ``cpu_probe_ms`` (recorded by
     bench.py since r12: 32×SHA-256 over 1 MiB, ~20 ms on this host)
     reads slower than the committed-history median probe by more than
     the probe's own ~±10% spread, AND the probe-normalised total
     (``total`` vs ``median*probe_ratio``) is back inside the band. A
     session whose probe reads 15% slow explains a 15%-slow total by
     arithmetic (SCALING.md round-12 drift bisection);
  2. *session load* — recorded ``telemetry_start.loadavg[0]`` exceeds
     ``--load-threshold`` (default 2.0) AND the delta is inside the
     load-calibrated bound ``band + --load-tax * loadavg/7`` (default
     2.4 s at loadavg 7 — the r11 adjudication's measured load tax,
     SCALING.md round-11 entry). A loaded capture whose delta exceeds
     what that calibration can explain stays a hard flag.

  3. *sustained multi-core contention* (round-15, calibrated from the
     four r14/r15 contended captures in SCALING.md) — the capture's own
     ``mt_probe_ms / cpu_probe_ms`` contention factor exceeds
     ``--mt-threshold`` (ideal ≈1x on idle cores; the r14 host class
     read 4.9-6.5x while benching ~25-28 s vs the 20.9 s history) AND
     the delta is inside ``band + --mt-tax * (min(factor, --mt-cap) -
     threshold)``. This is the signal the single-core probe is blind
     to: the r14 driver capture's single-core probe ratio was NORMAL
     while the all-core probe read 6.5x ideal. The tax factor is
     CAPPED at ``--mt-cap`` (default 7.0, just above the r14/r15
     calibration range 4.9-6.5x — round-16 advice): the uncapped
     linear tax let the r15 capture's own 15.1x factor earn ~23 s of
     slack on a ~20 s suite, so a genuine suite-wide regression
     coincident with any heavily contended host would have
     self-demoted; beyond the calibration range the slope is unbacked
     extrapolation, and whatever the capped bound cannot explain
     stays a hard flag.

  The per-query 2x check stays hard-fail under LOAD and under a slow
  single-core probe (a real single-query regression shows up under
  any load). The ONE bounded exception (round-15): a contended-host
  capture (mt factor over threshold) whose suite shows the UNIFORM
  inflation signature — the LEAVE-ONE-OUT suite-median per-query
  ratio vs best-ever (excluding the flagged query itself; round-16
  advice — on small suites the flagged query's own inflated ratio
  materially raised the median it is divided by) at or above
  ``--uniformity`` — demotes a per-query flag to WARN iff the query's
  UNROUNDED ratio NORMALISED by that leave-one-out median is back
  under the ratio gate (round-16 advice: rounding before the compare
  let a query epsilon above the gate demote on rounding alone; all
  demotion arithmetic now runs unrounded, display-only rounding).
  That is precisely the r14 adjudication arithmetic (dedup_cdc_chunks
  at 2.15x raw inside a suite uniformly at ~1.5x = 1.43x normalised,
  untouched code) made mechanical. A genuinely regressed query stays
  hard: code regressions do not move the all-core probe, and a single
  regression does not move the leave-one-out suite median at all. A total flag on an IDLE capture with normal probes
  (or no telemetry recorded) stays hard-fail. Whenever the target
  carries probes, the decision line cites them so the adjudication is
  arithmetic on record, not inference;
- emits a non-fatal CREEP warning whenever the total exceeds the BEST
  comparable total plus the band, even when the median band is clean:
  the median anchor follows the committed history, so gradual drift
  (each step under the band) would otherwise never become visible
  (round-11 advice — this restores the ratchet the best-ever anchor
  provided, as a warning rather than a gate).

A hard flag here is NOT automatically a regression — it starts the
SCALING.md attribution protocol (code changed? outside own spread?
reproduces fresh?). The tool's job is to make sure no drift goes
unnoticed, and to put the adjudication inputs on the table.

The target may also be a RAW ``python bench.py`` stdout capture (the
two-JSON-line format), so a local pre-ship run can be gated against the
committed history before the driver ever sees it.

The history defaults to every ``BENCH_r*.json`` in ``--history-dir``
(the repo root), which is the right default for gating a NEW capture —
but it makes any test that pins a committed capture's verdict depend on
files the driver drops AFTER the test was written (the r17 judge's one
red: the driver's post-ship BENCH_r17.json shifted the median band and
un-demoted r11). ``--history-files`` overrides the glob with an
explicit capture list so a pinned verdict is immune to future drops.

Usage: python tools/check_bench_gate.py [target] [--ratio 2.0] [--band 3.0]
       (target defaults to the highest-numbered committed BENCH_r*.json)
Exit codes: 0 clean, 1 flagged, 2 target unparseable.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _telemetry_from_tail(tail: str) -> dict | None:
    """Recover the telemetry objects from a truncated stdout tail.

    bench.py puts ``telemetry_start``/``telemetry_end`` at the END of
    the detail line, so even when the driver's ~2 KB tail capture cuts
    the front of that line, the telemetry survives: substring from the
    key to the line's end re-wraps into a standalone JSON object.
    """
    idx = tail.find('"telemetry_start"')
    if idx == -1:
        return None
    line_end = tail.find("\n", idx)
    frag = tail[idx: line_end if line_end != -1 else len(tail)].rstrip()
    try:
        return json.loads("{" + frag)
    except json.JSONDecodeError:
        return None


def _headline_from_lines(text: str) -> dict | None:
    """Last parseable JSON line carrying the bench headline contract."""
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(obj, dict) and "queries" in obj and "value" in obj:
            return obj
    return None


def load_bench(path: Path) -> dict:
    """Normalize a bench artifact to {label, value, queries, telemetry}.

    Accepts the driver's BENCH_r*.json wrapper OR a raw bench.py stdout
    capture. Returns ``{"ok": False, "why": ...}`` when no headline can
    be recovered (r6's wrapper has ``parsed: null`` and a tail whose
    merged detail+headline line was cut mid-object — skipped with a
    note, exactly what the judges did by hand).
    """
    text = path.read_text()
    label = path.name
    try:
        wrapper = json.loads(text)
    except json.JSONDecodeError:
        wrapper = None
    if isinstance(wrapper, dict) and "tail" in wrapper:
        headline = wrapper.get("parsed") or _headline_from_lines(
            wrapper.get("tail") or ""
        )
        telemetry = _telemetry_from_tail(wrapper.get("tail") or "")
    elif isinstance(wrapper, dict) and "queries" in wrapper:
        headline, telemetry = wrapper, None
    else:
        headline = _headline_from_lines(text)
        telemetry = _telemetry_from_tail(text)
    if not headline or not isinstance(headline.get("queries"), dict):
        return {"ok": False, "label": label, "why": "no parseable headline"}
    # Graceful-skip contract extends to a MALFORMED headline: a wrapper
    # whose parsed dict has "queries" but a missing/non-numeric "value"
    # (or query timings) must degrade to the same ok:False skip shape as
    # r6, not KeyError out of the whole history iteration (r10 advice).
    try:
        value = float(headline["value"])
        queries = {k: float(v) for k, v in headline["queries"].items()}
    except (KeyError, TypeError, ValueError):
        return {"ok": False, "label": label,
                "why": "headline missing numeric value/timings"}
    return {
        "ok": True,
        "label": label,
        "value": value,
        "queries": queries,
        "telemetry": telemetry,
    }


def evaluate(
    history: list[dict], target: dict, ratio: float, band: float
) -> dict:
    """Apply the 2x-vs-best-ever and same-suite total-band checks."""
    best: dict[str, tuple[float, str]] = {}
    for run in history + [target]:
        for name, sec in run["queries"].items():
            if name not in best or sec < best[name][0]:
                best[name] = (sec, run["label"])
    flagged_queries = []
    for name, sec in sorted(target["queries"].items()):
        b, where = best[name]
        r = sec / b if b > 0 else 1.0
        if r > ratio:
            # ratio_exact carries the unrounded value for downstream
            # arithmetic (round-16 advice: a 2dp-rounded quotient
            # compared <= gate demoted queries sitting epsilon above
            # it on rounding alone); "ratio" stays rounded for display.
            flagged_queries.append(
                {"query": name, "sec": sec, "best": b, "best_in": where,
                 "ratio": round(r, 2), "ratio_exact": r}
            )
    suite = set(target["queries"])
    comparable = [
        r for r in history
        if set(r["queries"]) == suite and r["label"] != target["label"]
    ]
    total_flag = None
    total_ctx = None
    if comparable:
        # Band is measured from the MEDIAN comparable total, not the
        # all-time best: the best is one lucky idle-machine draw (r4),
        # and anchoring there left ~0.1-0.3 s of the 3 s band at the
        # established ~20.9 s session level, flagging every normal run.
        totals = sorted(r["value"] for r in comparable)
        mid = len(totals) // 2
        median_total = (
            totals[mid]
            if len(totals) % 2
            else round((totals[mid - 1] + totals[mid]) / 2.0, 3)
        )
        best_total = min(comparable, key=lambda r: r["value"])
        delta = target["value"] - median_total
        # Context for the non-fatal creep warning: exposed even when the
        # median band is clean, because creep is precisely the case the
        # median anchor cannot flag (each committed slow round raises it).
        total_ctx = {
            "median_total": median_total,
            "best_total": best_total["value"],
            "best_in": best_total["label"],
            "delta_vs_median": round(delta, 3),
            "delta_vs_best": round(target["value"] - best_total["value"], 3),
        }
        if delta > band:
            total_flag = {
                "total": target["value"],
                "median_total": median_total,
                "best_total": best_total["value"],
                "best_in": best_total["label"],
                "delta": round(delta, 3),
                "band": band,
            }
    ratios_exact = {
        name: sec / best[name][0]
        for name, sec in target["queries"].items()
        if best[name][0] > 0
    }
    return {
        "flagged_queries": flagged_queries,
        "total_flag": total_flag,
        "total_ctx": total_ctx,
        "comparable_rounds": [r["label"] for r in comparable],
        "ratios": {n: round(r, 3) for n, r in ratios_exact.items()},
        # unrounded ratios for the demotion arithmetic (round-16
        # advice: round only for display)
        "ratios_exact": ratios_exact,
        "max_ratio": max(
            (round(r, 2) for r in ratios_exact.values()), default=0.0
        ),
    }


def _start_probe(run: dict, key: str = "cpu_probe_ms") -> float | None:
    """The capture's start-of-run probe, if recorded (cpu_probe_ms
    r12+, mt_probe_ms r14+)."""
    tel = run.get("telemetry") or {}
    probe = (tel.get("telemetry_start") or {}).get(key)
    return float(probe) if isinstance(probe, (int, float)) else None


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("target", nargs="?", default=None,
                    help="bench artifact to gate (default: newest BENCH_r*)")
    ap.add_argument("--history-dir", default=str(REPO),
                    help="directory holding committed BENCH_r*.json")
    ap.add_argument("--history-files", nargs="+", default=None,
                    help="explicit capture files to use as history "
                         "instead of the --history-dir glob; pins a "
                         "verdict against a FROZEN history so future "
                         "driver drops cannot shift the median band "
                         "(r18: the r17 judge's one red test)")
    ap.add_argument("--ratio", type=float, default=2.0,
                    help="per-query flag threshold vs best-ever")
    ap.add_argument("--band", type=float, default=3.0,
                    help="total-runtime session noise band, seconds")
    ap.add_argument("--load-threshold", type=float, default=2.0,
                    help="start loadavg above which the load-calibrated "
                         "demotion bound applies to a total-band flag "
                         "(per-query flags stay hard)")
    ap.add_argument("--load-tax", type=float, default=2.4,
                    help="measured load tax in seconds AT LOADAVG 7 "
                         "(SCALING.md round-11 adjudication: the r11 "
                         "capture read ~+2.4s at start loadavg 7.54); "
                         "scaled linearly by the capture's loadavg")
    ap.add_argument("--probe-spread", type=float, default=0.10,
                    help="cpu_probe_ms own relative spread on one host "
                         "(SCALING.md round-12: ~±10%%); probe ratios "
                         "inside it carry no machine-speed signal")
    ap.add_argument("--mt-threshold", type=float, default=3.0,
                    help="mt_probe_ms/cpu_probe_ms contention factor "
                         "above which the all-core demotion applies "
                         "(ideal ~1x on idle cores; the r14/r15 "
                         "contended captures read 4.9-6.5x, SCALING.md)")
    ap.add_argument("--mt-tax", type=float, default=1.9,
                    help="measured contention tax in seconds PER UNIT "
                         "factor above --mt-threshold (calibrated from "
                         "the r14/r15 contended captures: deltas "
                         "+4.5/+6.5/+7.5s at factors 6.5/4.9/5.5 each "
                         "need tax >= 0.4/1.8/1.8 — SCALING.md "
                         "round-15 calibration)")
    ap.add_argument("--mt-cap", type=float, default=7.0,
                    help="contention factor above which the mt tax stops "
                         "growing (round-16 advice: the r14/r15 "
                         "calibration observed factors 4.9-6.5x; beyond "
                         "~7x the linear tax is unbacked extrapolation — "
                         "a 15x host must not earn 23s of slack on a "
                         "20s suite)")
    ap.add_argument("--uniformity", type=float, default=1.2,
                    help="suite-median per-query ratio vs best-ever at "
                         "or above which a contended capture shows the "
                         "uniform-inflation signature (r14: 12+ "
                         "queries at 1.5-1.9x simultaneously); below "
                         "it per-query flags stay hard even on a "
                         "contended host")
    args = ap.parse_args(argv)

    if args.history_files is not None:
        paths = sorted(Path(p) for p in args.history_files)
    else:
        paths = sorted(Path(args.history_dir).glob("BENCH_r*.json"))
    target_path = Path(args.target) if args.target else (
        paths[-1] if paths else None
    )
    if target_path is None:
        print("no BENCH_r*.json history and no target given", file=sys.stderr)
        return 2
    target = load_bench(target_path)
    if not target["ok"]:
        print(f"target {target['label']}: {target['why']}", file=sys.stderr)
        return 2
    history = []
    for p in paths:
        if p.resolve() == target_path.resolve():
            continue
        run = load_bench(p)
        if run["ok"]:
            history.append(run)
        else:
            print(f"note: skipping {run['label']} ({run['why']})")
    verdict = evaluate(history, target, args.ratio, args.band)

    print(f"target: {target['label']}  total={target['value']}s  "
          f"queries={len(target['queries'])}  history={len(history)} rounds")
    print(f"max per-query ratio vs best-ever: {verdict['max_ratio']}  "
          f"(gate: {args.ratio})")
    # Machine-speed context (round-12 verdict item 2): whenever the
    # target carries a cpu_probe_ms, cite it against the history median
    # so every rc-0/WARN decision has the probe arithmetic on record.
    def _median(sorted_vals: list[float]) -> float:
        m = len(sorted_vals) // 2
        if len(sorted_vals) % 2:
            return sorted_vals[m]
        return round((sorted_vals[m - 1] + sorted_vals[m]) / 2.0, 3)

    target_probe = _start_probe(target)
    hist_probes = sorted(
        p for p in (_start_probe(r) for r in history) if p is not None
    )
    ref_probe = _median(hist_probes) if hist_probes else None
    probe_ratio = None
    if target_probe is not None and ref_probe:
        probe_ratio = round(target_probe / ref_probe, 3)
        print(f"probe: target cpu_probe_ms {target_probe} vs history "
              f"median {ref_probe} over {len(hist_probes)} capture(s) "
              f"(ratio {probe_ratio}; own spread ±{args.probe_spread:.0%})")
    elif target_probe is not None:
        print(f"probe: target cpu_probe_ms {target_probe} — no committed "
              f"capture carries one yet, no normalisation possible")
    # Sustained all-core probe (r14+): the capture's OWN contention
    # factor mt/single — the signal the one-shot single-core probe is
    # blind to (SCALING.md round-14: normal single-core probe, 6.5x
    # all-core, ~25-28 s totals on untouched code). Since round-15 the
    # demotion arithmetic keys on it directly; the history median is
    # printed as context.
    mt = _start_probe(target, "mt_probe_ms")
    mt_factor = None
    if mt is not None and target_probe:
        mt_factor = round(mt / target_probe, 2)
    if mt is not None:
        mt_hist = sorted(
            p for p in (_start_probe(r, "mt_probe_ms") for r in history)
            if p is not None
        )
        hist_note = (
            f"history median {_median(mt_hist)}ms over "
            f"{len(mt_hist)} capture(s)" if mt_hist
            else "no committed history yet"
        )
        print(f"mt-probe: target all-core {mt}ms (single-core "
              f"{target_probe}ms; contention factor "
              f"{mt_factor if mt_factor is not None else '?'}x — ideal "
              f"≈1x on idle cores; demotion threshold "
              f"{args.mt_threshold}x); {hist_note}")
    # Uniform-inflation signature: the suite-median per-query ratio vs
    # best-ever. A host factor inflates EVERY query; a code regression
    # inflates its own query and leaves the median alone. The median
    # used to normalise a flagged query is computed LEAVE-ONE-OUT
    # (round-16 advice: including the flagged query's own inflated
    # ratio raised the median it is divided by, materially easing its
    # own demotion on small suites — excluding it also makes the
    # 'a single regression does not move the suite median' claim
    # exactly true). All arithmetic runs on UNROUNDED ratios; values
    # are rounded only for display (round-16 advice item 3).
    ratios_exact = verdict["ratios_exact"]
    contended = mt_factor is not None and mt_factor > args.mt_threshold
    hard_queries = []
    for f in verdict["flagged_queries"]:
        loo = sorted(
            r for n, r in ratios_exact.items() if n != f["query"]
        )
        loo_median = _median(loo) if loo else None
        norm = (
            f["ratio_exact"] / loo_median
            if contended and loo_median and loo_median >= args.uniformity
            else None
        )
        if norm is not None and norm <= args.ratio:
            print(f"WARN (demoted) query {f['query']}: {f['sec']}s is "
                  f"{f['ratio']}x best-ever {f['best']}s ({f['best_in']}) "
                  f"— but the capture is contended (mt factor "
                  f"{mt_factor}x > {args.mt_threshold}x) and the rest of "
                  f"the suite is uniformly inflated (leave-one-out "
                  f"median ratio {round(loo_median, 3)}); normalised "
                  f"ratio {round(norm, 2)} is under the {args.ratio} "
                  f"gate (r14 adjudication arithmetic, SCALING.md)")
            continue
        hard_queries.append(f)
        print(f"FLAG query {f['query']}: {f['sec']}s is {f['ratio']}x "
              f"best-ever {f['best']}s ({f['best_in']})")
    tf = verdict["total_flag"]
    total_demoted = False
    if tf:
        # Bounded demotion (round-12 advice — the round-11 demotion was
        # unconditional on loadavg>2, which made the band advisory on
        # the loaded machine the driver always runs on). A total-ONLY
        # band excursion demotes iff the capture's own telemetry
        # explains it quantitatively; everything else stays hard.
        tel = target.get("telemetry") or {}
        lv = (tel.get("telemetry_start") or {}).get("loadavg") or [None]
        start_load = lv[0] if lv else None
        reason = None
        # (1) machine speed: probe slow beyond its own spread AND the
        # probe-normalised total back inside the band. Uses the START
        # probe: it samples the same session state the totals ran under.
        if (probe_ratio is not None
                and probe_ratio > 1.0 + args.probe_spread):
            norm_delta = round(
                target["value"] - tf["median_total"] * probe_ratio, 3)
            if norm_delta <= args.band:
                reason = (
                    f"capture's cpu_probe_ms ratio {probe_ratio} vs the "
                    f"history median explains it: probe-normalised delta "
                    f"{norm_delta}s is inside the ±{args.band}s band "
                    f"(machine-speed variance per SCALING.md round-12 "
                    f"bisection)")
        # (2) session load: loaded AND inside the load-calibrated bound.
        if (reason is None and isinstance(start_load, (int, float))
                and start_load > args.load_threshold):
            tax = round(args.load_tax * start_load / 7.0, 3)
            if tf["delta"] <= args.band + tax:
                reason = (
                    f"recorded start loadavg {start_load} > "
                    f"{args.load_threshold} and delta {tf['delta']}s is "
                    f"inside the load-calibrated bound {args.band}+{tax}s "
                    f"(~{args.load_tax}s tax at loadavg 7, SCALING.md "
                    f"round-11 adjudication)")
        # (3) sustained multi-core contention: the capture's own
        # all-core probe proves the host class the single-core probe
        # reads as normal (round-15, calibrated from the r14/r15
        # contended captures in SCALING.md).
        if reason is None and contended:
            # The tax factor is CAPPED at the largest calibrated
            # contention factor (round-16 advice: the linear tax was
            # unbounded — the r15 settled capture's own 15.1x factor
            # would have earned ~23s of slack on a ~20s suite, so a
            # genuine suite-wide regression coincident with any heavily
            # contended host would self-demote; beyond the r14/r15
            # calibration range [4.9, 6.5]x there is no measurement
            # backing the line's slope, so extrapolation stops at
            # --mt-cap and anything it cannot explain stays hard).
            eff_factor = min(mt_factor, args.mt_cap)
            mt_tax = round(
                args.mt_tax * (eff_factor - args.mt_threshold), 3)
            capped = " (capped at {:.1f}x)".format(args.mt_cap) \
                if mt_factor > args.mt_cap else ""
            if tf["delta"] <= args.band + mt_tax:
                reason = (
                    f"capture's all-core contention factor {mt_factor}x"
                    f"{capped} > {args.mt_threshold}x and delta "
                    f"{tf['delta']}s is inside the contention-calibrated "
                    f"bound {args.band}+{mt_tax}s ({args.mt_tax}s tax per "
                    f"unit factor up to the {args.mt_cap}x calibration "
                    f"ceiling, SCALING.md round-15 calibration)")
        kind = "WARN (demoted)" if reason else "FLAG"
        print(f"{kind} total: {tf['total']}s is +{tf['delta']}s over the "
              f"median comparable-suite total {tf['median_total']}s "
              f"(best {tf['best_total']}s in {tf['best_in']}) — outside "
              f"the ±{tf['band']}s session band")
        if reason:
            total_demoted = True
            print(f"  demoted: {reason}; rerun on an idle machine "
                  f"(loadavg < 1) before treating as drift")
    ctx = verdict.get("total_ctx")
    if ctx and ctx["delta_vs_best"] > args.band and (not tf or total_demoted):
        # Non-fatal creep visibility (round-11 advice): the median anchor
        # follows the committed history, so a slow creep where every step
        # stays inside the band never flags — surface it against the
        # best comparable total, which does not move with the creep.
        # Emitted on demoted captures too (round-12 advice): suppressing
        # it exactly when the demotion waves a capture through would hide
        # the cumulative-drift signal on the captures that need it most.
        print(f"WARN creep: total {target['value']}s is "
              f"+{ctx['delta_vs_best']}s over the best comparable total "
              f"{ctx['best_total']}s ({ctx['best_in']})"
              + (" — cumulative drift context on a demoted capture"
                 if tf else
                 " though inside the median band — cumulative drift, "
                 "not a gate failure"))
    if hard_queries or (tf and not total_demoted):
        tel = target.get("telemetry")
        print("telemetry of flagged run: "
              + (json.dumps(tel) if tel else
                 "NONE RECORDED (pre-r9 bench.py) — rerun fresh with "
                 "telemetry and apply the SCALING.md attribution rule"))
        print("next: SCALING.md attribution protocol — (a) did the code "
              "change, (b) is the delta outside the query's own spread, "
              "(c) does it reproduce in a fresh session?")
        return 1
    demoted_q = len(verdict["flagged_queries"]) - len(hard_queries)
    if total_demoted or demoted_q:
        parts = []
        if total_demoted:
            parts.append("demoted total warning")
        if demoted_q:
            parts.append(f"{demoted_q} demoted query warning(s)")
        print(f"clean (with {' + '.join(parts)}): no hard flags")
    else:
        print("clean: no query above the ratio gate, total inside the band")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
