#!/usr/bin/env python3
"""Bench drift gate (PLANS.md round-8 rule): compare the DRIVER's
BENCH_r{N}.json against BENCH_r{N-1}.json and list every carried-over
query that regressed by BOTH >1.3x and >0.15 s. Each listed query owes
a solo DriftAb adjudication row in PLANS.md within the round
(SPARK_GRAFT_BENCH_ONLY=<query> best-of-2, vs the prior snapshot).

Usage: python3 tools/drift.py BENCH_r06.json BENCH_r07.json
"""
import json
import re
import sys


def times(path):
    d = json.load(open(path))
    blob = d.get("parsed") or {}
    qs = blob.get("queries") if isinstance(blob, dict) else None
    if qs:
        return {k: float(v) for k, v in qs.items()}
    # driver files often keep only a tail of the stdout line: scrape
    # every "q_name":seconds pair that survived truncation
    return {m.group(1): float(m.group(2)) for m in
            re.finditer(r'"(q_\w+)":(\d+\.\d+)', d.get("tail", ""))}


def main():
    prev, cur = times(sys.argv[1]), times(sys.argv[2])
    common = sorted(set(prev) & set(cur))
    flagged = []
    for q in common:
        a, b = prev[q], cur[q]
        if b > a * 1.3 and b - a > 0.15:
            flagged.append((q, a, b, b / a))
    print(f"common queries compared: {len(common)}")
    if not flagged:
        print("no drift over the 1.3x-and-0.15s bar")
        return 0
    print(f"{len(flagged)} queries owe a DriftAb row:")
    for q, a, b, r in sorted(flagged, key=lambda t: -t[3]):
        print(f"  {q}: {a:.3f}s -> {b:.3f}s ({r:.2f}x)")
    return 1


if __name__ == "__main__":
    sys.exit(main())
