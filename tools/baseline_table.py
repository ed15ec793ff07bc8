#!/usr/bin/env python3
"""Render the BASELINE.md per-query table from N graft.Bench JSON lines.

Usage: baseline_table.py BENCH_JSONL
Prints: total line + markdown rows (per-query median of the runs),
sorted by query name. Dev tool only.
"""
import json, statistics, sys

runs = [json.loads(l) for l in open(sys.argv[1]) if l.strip()]
# intersect across runs: a JSONL mixing catalog versions must not
# KeyError (new run first) or silently drop new queries (old run first)
qs = set(runs[0]["queries"])
for r in runs[1:]:
    qs &= set(r["queries"])
dropped = {q for r in runs for q in r["queries"]} - qs
if dropped:
    print(f"# WARNING: not in every run, excluded: {sorted(dropped)}")
med = {q: statistics.median([r["queries"][q] for r in runs]) for q in qs}
print(f"# runs: {len(runs)}  totals: {[round(r['value'], 1) for r in runs]}")
print(f"# per-query-median total: {sum(med.values()):.1f} s  queries: {len(med)}")
for q in sorted(med):
    print(f"| {q} | {med[q]:.2f} |")
