#!/usr/bin/env python3
"""Per-key scaling-ratio report between two Bench JSON lines (round-13
verdict item 1: turn the 'designed for 100 TB' plan arguments into
measured curves). Typical use: numerator = the 10x replica run,
denominator = the sf0.1 run; a key scaling ~linearly in rows shows
ratio ~10, sublinear (broadcast/dimension-bound) keys less, and any
ratio well above the data factor flags a superlinear stage to triage.

Usage: python3 tools/bench_ratio.py <bench_small.json> <bench_big.json> [factor=10]
Prints keys sorted by ratio desc, worst first, plus totals.
"""
import sys, json, re


def load(path):
    txt = open(path).read()
    # tolerate sbt "[info] " prefixes and surrounding log lines
    m = re.search(r'\{"metric".*\}', txt)
    obj = json.loads(m.group(0) if m else txt)
    return obj


def main():
    small, big = load(sys.argv[1]), load(sys.argv[2])
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qs, qb = small["queries"], big["queries"]
    rows = []
    for k in sorted(qs):
        if k not in qb or qs[k] in (None, 0) or qb[k] is None:
            print(f"!! {k}: missing or errored in one run")
            continue
        rows.append((qb[k] / qs[k], qs[k], qb[k], k))
    rows.sort(reverse=True)
    print(f"{'ratio':>7} {'small_s':>8} {'big_s':>8}  key")
    for r, s, b, k in rows:
        flag = " <-- SUPERLINEAR" if r > 1.5 * factor else ""
        print(f"{r:7.2f} {s:8.3f} {b:8.3f}  {k}{flag}")
    ts, tb = sum(qs[k] for k in qs if qs[k]), sum(
        qb[k] for k in qb if qb[k])
    print(f"\ntotals: small {ts:.1f}s  big {tb:.1f}s  ratio {tb/ts:.2f} "
          f"(data factor {factor:g})")


if __name__ == "__main__":
    main()
