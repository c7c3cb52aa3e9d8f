#!/usr/bin/env python3
"""Regenerate BENCH_floors.json from a QUIET bench capture.

Usage: python3 scripts/make_floors.py BENCH_full.json > BENCH_floors.json

The floors file feeds Bench's suspect-floor cross-check: each query's
quiet warm median becomes the floor a later (possibly contended) capture
is compared against. Only run this on a capture you believe is quiet —
an already-contaminated input would bake stall-inflated floors in and
blind the check. Sanity hints: zero errors, warm_reps mostly at the
minimum (the IQ-spread loop didn't have to fight instability), total
comparable to the best prior round.
"""
import json
import sys

src = json.load(open(sys.argv[1]))
floors = {"_sf": src["sf"]}
floors.update({q: t for q, t in sorted(src["queries"].items()) if t >= 0})
json.dump(floors, sys.stdout, indent=1)
print()
