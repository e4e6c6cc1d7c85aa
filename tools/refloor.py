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
"""
import json, math, sys

# driver-contention-calibrated bars, retained verbatim (provenance in
# the r18 per-bar comments + VERDICT r17/r18): quiet-host readings sit
# at 24-47% of these by design.
DRIVER_BAND = {
    "g05_link_predict_full": 98.2,
    "st08_linkage_gate": 16.6,
    "st08b_trickle_probe": 31.5,
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
        if f in DRIVER_BAND:
            print(f'    "{f}": {DRIVER_BAND[f]},  '
                  f"# DRIVER BAND retained (r18); r19 worse-of-two "
                  f"{worse:.2f} s ({va:.2f}/{vb:.2f})")
        else:
            print(f'    "{f}": {rule(worse)},  '
                  f"# r19 worse-of-two {worse:.2f} s ({va:.2f}/{vb:.2f})")
    print("}")

if __name__ == "__main__":
    main()
