#!/usr/bin/env python3
"""Regenerate COVERAGE.md's scaling table from the committed bench JSONs.

Usage: python3 tools/scaling_table.py [bench/bench_sf0.1.json
        bench/bench_sf0.5x.json bench/bench_sf2.5x.json]

Prints (a) the markdown table for the documents/embeddings family —
the query set is whatever the 2.5x subset run measured — and (b) the
relational/event per-segment exponents + aggregate totals used by the
surrounding prose. COVERAGE's numbers must come from this script over
the committed JSONs, never from a by-hand transcription of a different
run (the round-3 verdict's finding #1).
"""
import json
import math
import sys

paths = sys.argv[1:] or [
    "bench/bench_sf0.1.json",
    "bench/bench_sf0.5x.json",
    "bench/bench_sf2.5x.json",
]
b01, b05, b25 = (json.load(open(p)) for p in paths)


def warm(b, q):
    e = b["queries"].get(q)
    return None if e is None else e["warm"]


def expo(t1, t2, factor=5.0):
    return math.log(t2 / t1) / math.log(factor)


def fmt_exp(x):
    s = f"{x:.2f}"
    return s.replace("-", "−")  # minus sign, matching the doc


print("Documents/embeddings family, all three points (warm seconds):\n")
print("| query | sf0.1 s | 0.5x s | 2.5x s | exp lo | exp hi |")
print("|-------|--------:|-------:|-------:|-------:|-------:|")
fam = sorted(b25["queries"])
for q in fam:
    t1, t2, t3 = warm(b01, q), warm(b05, q), warm(b25, q)
    print(
        f"| {q} | {t1:.2f} | {t2:.2f} | {t3:.2f} "
        f"| {fmt_exp(expo(t1, t2))} | {fmt_exp(expo(t2, t3))} |"
    )

print("\nRelational/event surface, sf0.1 -> 0.5x exponents (desc):\n")
rel = [q for q in sorted(b01["queries"]) if q not in set(fam)]
rows = []
for q in rel:
    t1, t2 = warm(b01, q), warm(b05, q)
    if t1 is None or t2 is None:
        continue
    rows.append((expo(t1, t2), q, t1, t2))
for e, q, t1, t2 in sorted(rows, reverse=True):
    print(f"  {q}: {t1:.2f} -> {t2:.2f}  exp {fmt_exp(e)}")

w1, w2 = b01["warm_total_sec"], b05["warm_total_sec"]
n1, n2 = len(b01["queries"]), len(b05["queries"])
print(
    f"\nTotals: warm {w1:.1f} s ({n1} q, sf0.1) -> {w2:.1f} s ({n2} q, 0.5x)"
    f"  aggregate exponent {expo(w1, w2):.2f}"
)
m = max(
    (warm(b25, q) / warm(b01, q), q) for q in fam if warm(b01, q) and warm(b25, q)
)
print(f"Max 25x growth ratio: {m[1]} at {m[0]:.1f}x (linear would be 25x)")
