#!/usr/bin/env python3
"""Regenerate bench_budget.json from the last-adjudicated clean bench.

Usage: python3 tools/make_bench_budget.py [ref_json] [out_json]

Each query's budget is 2x its CLEAN-BOX MEDIAN (the suite-level 2x
budget applied per query, on the estimator least flattered by a lucky
rep): a clean run should breach nothing; a breach names the query that
regressed instead of diluting into a 256-query total. Run this whenever
bench_ref_clean.json is refreshed from a run recorded clean in
BASELINE.md. Queries newer than the reference have no row and are
exempt until the next refresh (graft.Bench treats missing rows - and a
non-matching sf - as exempt).

Bench.loadBudget parses this file with Jackson (order- and
whitespace-insensitive since the r20 hardening); the flat "budgets"
map plus the top-level "sf" string is simply the agreed schema.
"""
import json
import math
import sys

ref_path = sys.argv[1] if len(sys.argv) > 1 else "bench_ref_clean.json"
out_path = sys.argv[2] if len(sys.argv) > 2 else "bench_budget.json"

with open(ref_path) as f:
    ref = json.load(f)

medians = ref["medians"]
# CEIL to 3 decimals, never round-half: round() once produced a
# ceiling a hair BELOW 2x the true median (q144: budget 0.854 vs a
# re-measured min of 0.854107 — a 1.0001x "breach" that was pure
# quantization). Ceiling keeps every budget >= 2x median exactly.
budgets = {q: math.ceil(2000.0 * m) / 1000.0
           for q, m in sorted(medians.items()) if m > 0}
out = {
    "sf": ref["sf"],
    "source": ref_path,
    "rule": "2x clean-box median per query",
    "n": len(budgets),
    "budgets": budgets,
}
with open(out_path, "w") as f:
    json.dump(out, f, indent=1)
    f.write("\n")
print(f"wrote {out_path}: {len(budgets)} budgets from {ref_path} at {ref['sf']}")
