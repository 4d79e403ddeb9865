#!/usr/bin/env python3
"""Per-query wall times from a campaign stderr's 'BENCH RUNNING: <q> at <ts>' lines."""
import sys, re, datetime
lines = [re.match(r"BENCH RUNNING: (\S+) at (\S+)", l) for l in open(sys.argv[1]) if l.startswith("BENCH RUNNING")]
ev = [(m.group(1), datetime.datetime.fromisoformat(m.group(2).replace("Z","+00:00"))) for m in lines if m]
out = []
for i, (q, t) in enumerate(ev):
    dur = (ev[i+1][1] - t).total_seconds() if i+1 < len(ev) else None
    out.append((q, dur))
out.sort(key=lambda x: -(x[1] or 0))
n = len(ev)
print(f"{n} queries started; top by wall time:")
for q, d in out[:int(sys.argv[2]) if len(sys.argv) > 2 else 15]:
    print(f"{d if d is not None else '...':>8} {q}" if d is None else f"{d:8.1f} {q}")
