#!/usr/bin/env python
"""Compare two BENCH_FULL json files (baseline vs candidate): total,
shared subset, per-query ratios sorted by speedup.

Usage: python tools/compare_bench_r15.py <baseline.json> <candidate.json>
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    ta = sum(qa[n] for n in common)
    tb = sum(qb[n] for n in common)
    print(f"common n={len(common)}  baseline={ta:.2f}s  "
          f"candidate={tb:.2f}s  ratio={tb / ta:.3f}x "
          f"(speedup {ta / tb:.3f}x)")
    rows = sorted(common, key=lambda n: qb[n] / max(qa[n], 1e-9))
    import math
    g = math.exp(sum(math.log(qa[n] / max(qb[n], 1e-9))
                     for n in common) / len(common))
    print(f"geomean per-query speedup: {g:.3f}")
    print(f"{'query':42s} {'base':>7s} {'cand':>7s} {'speedup':>8s}")
    for n in rows:
        print(f"{n:42s} {qa[n]:7.2f} {qb[n]:7.2f} "
              f"{qa[n] / max(qb[n], 1e-9):8.2f}")


if __name__ == "__main__":
    main()
