#!/usr/bin/env python3
"""Full-gate scale-exponent table from two Bench artifacts (1x and 10x).

Usage: exponents.py <bench_1x.json> <bench_10x.json> [--md]

Reads the `queries_min` map of each artifact (min-of-reps is the
noise-robust statistic on a shared box — r12 learning), computes
ratio = t10/max(t1, floor) and exp = log10(ratio) per query, and prints
a table sorted by exponent descending. The 0.05s denominator floor stops
pure jitter on sub-50ms queries from manufacturing huge ratios (the
ScalingBudgetSpec convention). Queries failing in either artifact
(t < 0) are listed separately — a failure at 10x only is itself a
scaling finding.
"""
import json
import math
import sys

FLOOR = 0.05


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            if d.get("metric") == "total":
                return d
    raise SystemExit(f"no metric=total line in {path}")


def main():
    a1, a10 = load(sys.argv[1]), load(sys.argv[2])
    q1 = a1.get("queries_min") or a1["queries"]
    q10 = a10.get("queries_min") or a10["queries"]
    only = sorted(set(q1) ^ set(q10))
    if only:
        print(f"(skipping {len(only)} one-sided keys: {', '.join(only)})")
    keys = sorted(set(q1) & set(q10))
    rows, bad = [], []
    for k in keys:
        t1, t10 = q1[k], q10[k]
        if t1 < 0 or t10 < 0:
            bad.append((k, t1, t10))
            continue
        ratio = t10 / max(t1, FLOOR)
        rows.append((k, t1, t10, ratio, math.log10(max(ratio, 1e-9))))
    rows.sort(key=lambda r: -r[4])
    print("| query | 1x (s) | 10x (s) | ratio | exp |")
    print("|---|---|---|---|---|")
    for k, t1, t10, ratio, e in rows:
        print(f"| {k} | {t1:.2f} | {t10:.2f} | {ratio:.2f} | {e:.2f} |")
    s1 = sum(r[1] for r in rows)
    s10 = sum(r[2] for r in rows)
    # guard: with no successful shared keys (rows empty or every shared
    # query failed) s1 is 0 — skip the TOTAL line rather than die on the
    # division so the FAILED listing and exit(1) below still run
    if rows and s1 > 0:
        print(f"| **TOTAL ({len(rows)})** | {s1:.1f} | {s10:.1f} "
              f"| {s10 / s1:.2f} | {math.log10(s10 / s1):.2f} |")
    for k, t1, t10 in bad:
        print(f"FAILED: {k} 1x={t1} 10x={t10}")
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
