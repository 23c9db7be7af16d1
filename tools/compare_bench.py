#!/usr/bin/env python3
"""Compare two graft bench JSON files (per-query seconds) and flag
regressions.

Usage: compare_bench.py OLD.json NEW.json [ratio_gate=2.0]

Prints per-query ratios sorted worst-first, queries only in one file,
and exits 1 if any shared query exceeds the gate. Sub-second times are
reported but never gate (shared-JVM cache-pressure class, see
PROBES.md round-8 adjudications).
"""
import json
import sys


def main() -> int:
    old = json.load(open(sys.argv[1]))["queries"]
    new = json.load(open(sys.argv[2]))["queries"]
    gate = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    shared = sorted(set(old) & set(new))
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    rows = []
    for q in shared:
        if old[q] <= 0 or new[q] <= 0:  # error sentinel
            rows.append((float("inf"), q, old[q], new[q]))
        else:
            rows.append((new[q] / old[q], q, old[q], new[q]))
    rows.sort(reverse=True)
    bad = []
    for ratio, q, o, n in rows[:15]:
        flag = ""
        if ratio > gate and max(o, n) >= 1.0:
            flag = "  <-- REGRESSION"
            bad.append(q)
        elif ratio > gate:
            flag = "  (sub-second, not gated)"
        print(f"{ratio:8.2f}x  {q:36s} {o:8.2f}s -> {n:8.2f}s{flag}")
    print(f"\nshared={len(shared)} only_old={only_old} ")
    print(f"only_new={only_new}")
    to = sum(v for v in old.values() if v > 0)
    tn = sum(v for v in new.values() if v > 0)
    print(f"aggregate: {to:.1f}s -> {tn:.1f}s over respective registries")
    if bad:
        print(f"\nGATE FAIL ({gate}x): {bad}")
        return 1
    print(f"\ngate pass: no shared >= 1s query exceeds {gate}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
