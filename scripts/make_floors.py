#!/usr/bin/env python3
"""Regenerate BENCH_floors.json from one or more bench captures.

Usage: python3 scripts/make_floors.py BENCH_a.json [BENCH_b.json ...] > BENCH_floors.json

The floors file feeds Bench's suspect-floor cross-check: each query's
QUIET warm median becomes the floor a later (possibly contended) capture
is compared against. With several captures the floor is the elementwise
MINIMUM — this host alternates between a quiet regime and a ~1.5×
I/O-stall regime (see the GraftSession timeout scaladoc), so the min
over rounds is the best available estimate of the quiet floor. Queries
present in only some captures (newly added ones) take the min over the
captures that have them. All inputs must share the same "sf" dir.
"""
import json
import sys

srcs = [json.load(open(p)) for p in sys.argv[1:]]
sfs = {s["sf"] for s in srcs}
assert len(sfs) == 1, f"captures disagree on sf: {sfs}"
floors = {}
for s in srcs:
    for q, t in s["queries"].items():
        if t >= 0:
            floors[q] = min(t, floors.get(q, t))
out = {"_sf": sfs.pop()}
out.update(dict(sorted(floors.items())))
json.dump(out, sys.stdout, indent=1)
print()
