#!/usr/bin/env python3
"""Build BENCH_FLOOR.json: the per-query MIN across same-HEAD quiet runs.

Usage: bench_floor.py [--prev <prev_floor.json>] <out.json> <run1.json> [run2.json ...]

With --prev, the artifact also carries `movers_vs_prev`: every query
whose floor rose more than the threshold (15% AND 0.3 s — the verdict
rule) against the prior round's floor artifact, so "zero movers" is a
COMPUTED fact the next judge can read directly, not prose. Queries new
since the prior floor are listed separately (`new_vs_prev`), never as
movers.

Why: full sweeps on this box show a ROTATING-VICTIM pattern — per run,
one or two multi-job iterative queries absorb a 5-11 s penalty, a
different one each run (four same-HEAD round-13 runs spread 254.6 to
310.9 s total). Any single sweep therefore misreads one or two queries
by 2-3x, and round-over-round diffs of single sweeps burn a verdict
cycle on phantom regressions (q244 in r12, q147/q148 in r13). The
per-query minimum across runs is the steady-state floor: a REAL plan
regression raises the floor (it reproduces in every run); a rotation
victim does not.

Inputs are graft.Bench JSON lines (the BENCH_LATEST.json shape: a
"queries" map of per-query seconds, plus load markers). Runs should be
same-HEAD and quiet (load_start 1-min < 1); the script records each
run's load marker so the artifact carries its own evidence.

Round-over-round comparison rule (BASELINE.md): compare FLOOR vs FLOOR.
A query is a regression candidate only if its floor moved; adjudicate
candidates with filtered bracketing runs (docs/PLANS.md round-14 entry
for the worked example).
"""
import json
import subprocess
import sys


MOVER_PCT = 0.15   # floor rose > 15% ...
MOVER_ABS = 0.3    # ... AND > 0.3 s (sub-second jitter is not a mover)


def main():
    args = sys.argv[1:]
    prev_path = None
    if args and args[0] == "--prev":
        prev_path, args = args[1], args[2:]
    if len(args) < 2:
        sys.exit(__doc__)
    out_path, run_paths = args[0], args[1:]
    runs = [json.load(open(p)) for p in run_paths]
    queries = {}
    for r in runs:
        for q, v in r["queries"].items():
            if v is None or v < 0:
                continue  # a failed query must not fake a fast floor
            queries[q] = min(queries.get(q, float("inf")), v)
    missing = [q for r in runs for q in queries if q not in r["queries"]]
    try:
        head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                              capture_output=True, text=True).stdout.strip()
    except OSError:
        head = None
    floor = {
        "metric": "floor_total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "n_runs": len(runs),
        "head": head,
        "run_totals": [r.get("value") for r in runs],
        "run_loads": [r.get("load_start") for r in runs],
        "n_queries": len(queries),
        "queries_missing_in_some_run": sorted(set(missing)),
        "queries": {q: round(v, 3) for q, v in sorted(queries.items())},
    }
    if prev_path:
        prev = json.load(open(prev_path))
        prev_q = prev.get("queries", {})
        movers = {}
        for q, v in queries.items():
            pv = prev_q.get(q)
            if pv is None or pv <= 0:
                continue
            if v - pv > MOVER_ABS and (v - pv) / pv > MOVER_PCT:
                movers[q] = {"prev": round(pv, 3), "now": round(v, 3),
                             "pct": round(100.0 * (v - pv) / pv, 1)}
        floor["prev_floor"] = {"path": prev_path, "head": prev.get("head"),
                               "value": prev.get("value"),
                               "threshold_pct": 100 * MOVER_PCT,
                               "threshold_abs_sec": MOVER_ABS}
        floor["movers_vs_prev"] = dict(sorted(
            movers.items(), key=lambda kv: -kv[1]["pct"]))
        floor["new_vs_prev"] = sorted(q for q in queries if q not in prev_q)
        floor["gone_vs_prev"] = sorted(q for q in prev_q if q not in queries)
    with open(out_path, "w") as fh:
        json.dump(floor, fh, separators=(",", ":"))
        fh.write("\n")
    print(f"floor over {len(runs)} runs: {floor['value']} s "
          f"({len(queries)} queries) -> {out_path}")
    if prev_path:
        m = floor["movers_vs_prev"]
        print(f"movers vs {prev_path}: {len(m)}"
              + ("".join(f"\n  {q} {d['prev']} -> {d['now']} (+{d['pct']}%)"
                         for q, d in m.items())))


if __name__ == "__main__":
    main()
