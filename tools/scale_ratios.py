#!/usr/bin/env python3
"""Compare a 10x full-gate bench run against the sf0.1 baseline:
per-query ratios, median, and the >threshold outlier list for the
docs/SCALE.md full-gate audit table.

Usage: python3 tools/scale_ratios.py <sf01_bench.json> <10x_bench.json>
       [threshold=10]
"""
import json
import statistics
import sys


def main() -> None:
    base = json.load(open(sys.argv[1]))["queries"]
    big = json.load(open(sys.argv[2]))["queries"]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    common = sorted(set(base) & set(big) - {
        k for k in big if base.get(k, -1) < 0 or big[k] < 0})
    ratios = {}
    for q in common:
        # guard tiny denominators: a 0.05 s query's ratio is noise
        ratios[q] = big[q] / max(base[q], 0.05)
    med = statistics.median(ratios.values())
    tot_b = sum(base[q] for q in common)
    tot_x = sum(big[q] for q in common)
    print(f"common queries: {len(common)}; total {tot_b:.1f} -> {tot_x:.1f} s"
          f" ({tot_x / tot_b:.2f}x); median ratio {med:.1f}x")
    only_big = sorted(set(big) - set(base))
    if only_big:
        print("10x-only rows (no sf0.1 baseline in this file):")
        for q in only_big:
            print(f"  {q}: {big[q]:.2f} s")
    over = sorted(((r, q) for q, r in ratios.items() if r > threshold),
                  reverse=True)
    print(f"\n> {threshold:.0f}x ({len(over)}):")
    for r, q in over:
        print(f"  {q}: {base[q]:.2f} -> {big[q]:.2f} s = {r:.1f}x")
    print("\nfull table (sorted by ratio desc):")
    for q in sorted(common, key=lambda q: -ratios[q]):
        print(f"  {q}\t{base[q]:.2f}\t{big[q]:.2f}\t{ratios[q]:.1f}x")


if __name__ == "__main__":
    main()
