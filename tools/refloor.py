#!/usr/bin/env python3
"""Regenerate bench_guard's CEILINGS dict from a fresh quiet-host
worse-of-two sweep pair (r18 verdict item 1: re-derive the guard DOWN
with per-face provenance after r18's degraded-host re-floor passes
left median utilization at 38%).

Rule (unchanged from r17/r18): ceiling = 1.7*v + 0.8 for v < 10 s,
1.5*v + 1.0 for v >= 10, v = the committed worse-of-two reading,
rounded UP to 0.1. Faces in DRIVER_BAND keep their driver-calibrated
bars (the r18 lesson: the driver's contended host reads these families
1.6-2.9x over committed — a quiet-host rule bar would read red there
on healthy code).

Usage: python3 tools/refloor.py sweep1.json sweep2.json > ceilings.py

R20: the DRIVER_BAND carve-outs are GONE (r19 verdict item 2 — every
ceiling rule-derived). The five ex-band faces fold in through
EXTRA_READINGS instead: ceiling = rule(max(worse-of-pair, extra)),
where the extras are the last PARSEABLE driver readings — st08/st08b
survive in the BENCH_r19.json tail (5.67/13.55 s, at quiet-host level,
so the r17/r18 driver-contention era the bands hedged against did not
recur) — and g05_full/ml02/fp01, absent from every driver tail so far,
get pure quiet-host rule bars; the r20 Bench epilogue (compact
per-face + top-16 lines at the very end of the log) guarantees every
future driver capture carries all five, so the next re-floor can fold
in fresh driver numbers the same way.
"""
import json, math, sys

# last parseable DRIVER readings (BENCH_r19.json tail), folded into
# the worse() so a rule bar can never sit below what the driver host
# actually measured on healthy code.
EXTRA_READINGS = {
    "st08_linkage_gate": 5.67,
    "st08b_trickle_probe": 13.55,
}

def rule(v: float) -> float:
    c = 1.7 * v + 0.8 if v < 10 else 1.5 * v + 1.0
    return math.ceil(c * 10) / 10

def main():
    a = json.load(open(sys.argv[1]))["queries"]
    b = json.load(open(sys.argv[2]))["queries"]
    faces = sorted(set(a) | set(b))
    print("CEILINGS = {")
    for f in faces:
        va, vb = a.get(f, -1.0), b.get(f, -1.0)
        if va < 0 or vb < 0:
            print(f"    # {f}: MISSING from a sweep (a={va}, b={vb}) — "
                  "regenerate, never splice")
            continue
        worse = max(va, vb)
        extra = EXTRA_READINGS.get(f)
        if extra is not None and extra > worse:
            print(f'    "{f}": {rule(extra)},  '
                  f"# r20 rule over the r19 DRIVER tail reading "
                  f"{extra:.2f} s (quiet-host pair {va:.2f}/{vb:.2f})")
        else:
            print(f'    "{f}": {rule(worse)},  '
                  f"# r20 worse-of-two {worse:.2f} s ({va:.2f}/{vb:.2f})")
    print("}")

if __name__ == "__main__":
    main()
