#!/usr/bin/env python3
"""Build BENCH_FLOOR.json: the per-query MIN across same-HEAD quiet runs.

Usage: bench_floor.py <out.json> <run1.json> [run2.json ...]

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


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    out_path, run_paths = sys.argv[1], sys.argv[2:]
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
    with open(out_path, "w") as fh:
        json.dump(floor, fh, separators=(",", ":"))
        fh.write("\n")
    print(f"floor over {len(runs)} runs: {floor['value']} s "
          f"({len(queries)} queries) -> {out_path}")


if __name__ == "__main__":
    main()
