#!/usr/bin/env python3
"""Per-query scale-ratio audit between two graft.Bench full-resolution JSONs.

Usage: ratio_audit.py <small.json> <big.json> <rows_factor> [bar_mult=2]

Flags every query whose big/small time ratio exceeds rows_factor * bar_mult
(the "within 2x of linear" bar). Sub-second small-side times are floored at
0.05 s so fixed-cost queries don't divide by noise. Dev tool only.
"""
import json, sys

small = json.load(open(sys.argv[1]))
big = json.load(open(sys.argv[2]))
factor = float(sys.argv[3])
bar = factor * (float(sys.argv[4]) if len(sys.argv) > 4 else 2.0)

sq, bq = small["queries"], big["queries"]
rows = []
for q in sorted(bq):
    if q not in sq:
        rows.append((float("inf"), q, None, bq[q], "NEW (no small-side time)"))
        continue
    s = max(sq[q], 0.05)
    r = bq[q] / s
    rows.append((r, q, sq[q], bq[q], "OVER BAR" if r > bar else ""))

rows.sort(reverse=True)
over = [r for r in rows if r[4]]
print(f"bar = {bar:.0f}x ({factor:.0f}x rows * 2x-linear); "
      f"{len(over)} of {len(rows)} queries over")
print(f"{'query':<32}{'small':>9}{'big':>9}{'ratio':>8}  flag")
for r, q, s, b, flag in rows[:40]:
    ss = f"{s:.2f}" if s is not None else "-"
    print(f"{q:<32}{ss:>9}{b:>9.1f}{r:>8.1f}  {flag}")
if big.get("errors"):
    print("\nERRORS:", big["errors"])
