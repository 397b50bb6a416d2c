#!/usr/bin/env python3
"""Regenerate COVERAGE.md's scaling table from the committed bench JSONs.

Usage: python3 tools/scaling_table.py [bench/bench_sf0.1.json
        bench/bench_sf0.5x.json bench/bench_sf2.5x_full.json]

From round 6 the 25x point covers the FULL surface (MakeScale full —
re-keyed orders/lineitem, time-shifted events), so every query has
three measured points and two per-5x-segment exponents. Prints (a) the
full markdown table and (b) aggregate totals + the worst growth rows
used by the surrounding prose. COVERAGE's numbers must come from this
script over the committed JSONs, never from a by-hand transcription of
a different run (the round-3 verdict's finding #1).
"""
import json
import math
import sys

paths = sys.argv[1:] or [
    "bench/bench_sf0.1.json",
    "bench/bench_sf0.5x.json",
    "bench/bench_sf2.5x_full.json",
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


print("Full surface, all three points (warm seconds):\n")
print("| query | sf0.1 s | 0.5x s | 2.5x s | exp lo | exp hi |")
print("|-------|--------:|-------:|-------:|-------:|-------:|")
for q in sorted(b25["queries"]):
    t1, t2, t3 = warm(b01, q), warm(b05, q), warm(b25, q)
    if t1 is None or t2 is None or t3 is None:
        continue
    print(
        f"| {q} | {t1:.2f} | {t2:.2f} | {t3:.2f} "
        f"| {fmt_exp(expo(t1, t2))} | {fmt_exp(expo(t2, t3))} |"
    )

w1, w2, w3 = (b["warm_total_sec"] for b in (b01, b05, b25))
n1, n2, n3 = (len(b["queries"]) for b in (b01, b05, b25))
print(
    f"\nTotals: warm {w1:.1f} s ({n1} q, sf0.1) -> {w2:.1f} s ({n2} q, 0.5x)"
    f" -> {w3:.1f} s ({n3} q, 2.5x)"
)
print(
    f"Aggregate exponents: sf0.1->0.5x {expo(w1, w2):.2f},"
    f" 0.5x->2.5x {expo(w2, w3):.2f},"
    f" sf0.1->2.5x {expo(w1, w3, 25.0):.2f}"
)

rows = [
    (expo(warm(b01, q), warm(b25, q), 25.0), q, warm(b01, q), warm(b25, q))
    for q in b25["queries"]
    if warm(b01, q) and warm(b25, q) and warm(b01, q) >= 0.3
]
print("\nHighest 1x->25x exponents (warm sf0.1 >= 0.3 s):")
for e, q, t1, t3 in sorted(rows, reverse=True)[:8]:
    print(f"  {q}: {t1:.2f} -> {t3:.2f}  exp {fmt_exp(e)}")
