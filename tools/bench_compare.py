#!/usr/bin/env python3
"""Compare two bench JSON artifacts (cold + warm per-query maps).

Usage: bench_compare.py A.json B.json [threshold]
Prints totals, geomean warm ratio, and per-query movers beyond the
threshold (default 1.15x) in either direction.
"""
import json
import math
import sys


def main() -> None:
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.15
    print(f"cold  {a['value']:8.1f} -> {b['value']:8.1f}")
    print(f"warm  {a['value_warm']:8.1f} -> {b['value_warm']:8.1f}")
    wa, wb = a['queries_warm'], b['queries_warm']
    common = [k for k in wa if k in wb and wa[k] > 0 and wb[k] > 0]
    rats = [wa[k] / wb[k] for k in common]
    print(f"common {len(common)}  geomean warm speedup "
          f"{math.exp(sum(math.log(r) for r in rats) / len(rats)):.3f}")
    slower = [(k, wa[k], wb[k]) for k in common
              if wb[k] > wa[k] * thr and wb[k] > 0.5]
    faster = [(k, wa[k], wb[k]) for k in common
              if wa[k] > wb[k] * thr and wa[k] > 0.5]
    print(f"faster >{thr}x ({len(faster)}):")
    for k, x, y in sorted(faster, key=lambda t: -(t[1] - t[2]))[:20]:
        print(f"  {k:32s} {x:6.2f} -> {y:6.2f}")
    print(f"slower >{thr}x ({len(slower)}):")
    for k, x, y in sorted(slower, key=lambda t: -(t[2] - t[1]))[:20]:
        print(f"  {k:32s} {x:6.2f} -> {y:6.2f}")


if __name__ == '__main__':
    main()
