#!/usr/bin/env python3
"""Per-query diff of two graft.Bench JSON lines (files or raw lines).

Usage: bench_compare.py BENCH_rN.json BENCH_rM.json [threshold_pct]

Prints queries whose time changed more than threshold (default 25%),
plus totals and errors. Remember: sf0.1 single-run totals swing ±20%
from JIT/GC — treat small deltas as noise, compare medians for calls.
"""
import json, sys

def load(path):
    text = open(path).read().strip()
    # tolerate an "[info] " sbt prefix
    if "{" in text:
        text = text[text.index("{"):]
    return json.loads(text.splitlines()[0])

def main(a_path, b_path, thresh=25.0):
    a, b = load(a_path), load(b_path)
    qa, qb = a["queries"], b["queries"]
    print(f"total: {a['value']:.1f}s ({len(qa)} queries) -> "
          f"{b['value']:.1f}s ({len(qb)} queries)")
    if a.get("errors") or b.get("errors"):
        print(f"errors: {a.get('errors', [])} -> {b.get('errors', [])}")
    for q in sorted(set(qa) | set(qb)):
        if q not in qa:
            print(f"  NEW  {q:30s}        -> {qb[q]:6.2f}s")
        elif q not in qb:
            print(f"  GONE {q:30s} {qa[q]:6.2f}s")
        elif qa[q] > 0 and abs(qb[q] - qa[q]) / qa[q] * 100 >= thresh:
            sign = "+" if qb[q] > qa[q] else "-"
            print(f"  {sign}    {q:30s} {qa[q]:6.2f}s -> {qb[q]:6.2f}s "
                  f"({(qb[q]-qa[q])/qa[q]*100:+.0f}%)")
    return 0

if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 25.0
    sys.exit(main(sys.argv[1], sys.argv[2], t))
