#!/usr/bin/env python3
"""Compare two Bench JSON lines (baseline vs scaled corpus) and print
per-query time ratios sorted descending, flagging any query whose ratio
exceeds the data growth factor.

Usage: scale_ratio.py <baseline.json> <scaled.json> <factor>
"""
import json
import sys


def main() -> int:
    base = json.load(open(sys.argv[1]))["queries"]
    scaled = json.load(open(sys.argv[2]))["queries"]
    factor = float(sys.argv[3])
    common = sorted(set(base) & set(scaled))
    rows = []
    for q in common:
        b, s = base[q], scaled[q]
        # Sub-floor queries ride the local-mode job floor (~0.1-0.2 s);
        # clamp the denominator so a 0.08 s -> 0.3 s drift doesn't read
        # as a 4x blowup.
        ratio = s / max(b, 0.2)
        rows.append((ratio, q, b, s))
    rows.sort(reverse=True)
    over = [r for r in rows if r[0] > factor]
    print(f"{len(common)} common queries; factor {factor:g}; "
          f"{len(over)} over-factor")
    print(f"{'query':32s} {'base_s':>8s} {'scaled_s':>9s} {'ratio':>7s}")
    for ratio, q, b, s in rows:
        flag = "  <-- OVER" if ratio > factor else ""
        print(f"{q:32s} {b:8.2f} {s:9.2f} {ratio:7.1f}{flag}")
    return 1 if over else 0


if __name__ == "__main__":
    sys.exit(main())
