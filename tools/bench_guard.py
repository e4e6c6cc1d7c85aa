#!/usr/bin/env python3
"""Per-face regression guard over a FULL-RUN bench dump (r11 verdict
item 4: "add a bench guard (f19 <= 2 s) so the family can't silently
regress a third time").

Ceilings apply to target/bench.json from a full `graft.Bench` run at
sf0.1 / 32 cpus — NOT to tools/bench_isolated.sh output: a fresh JVM
pays ~0.5-1.0 s one-time JIT per small face (measured r12: f19 1.70 s
full-run vs 2.45-3.10 s isolated), so isolated numbers would false-
alarm at these thresholds. On a loaded machine the guard is advisory
(r11's driver run inflated doc-family faces 2-5x from contention).

Usage: python3 tools/bench_guard.py [target/bench.json]
Exit 1 if any ceiling is exceeded.
"""
import json
import sys

# face -> ceiling seconds. ~1.3x of the r12 steady-state full-run
# band: catches the r10-scale f19 inflation (2.4-2.5 s) while leaving
# room for ordinary run-to-run variance.
CEILINGS = {
    "f19_risk_heatmap": 2.2,      # steady ~1.7 s (r9 1.34, r12 1.70)
    "f20_risk_distribution": 1.5,  # steady ~0.9-1.1 s
}

def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "target/bench.json"
    queries = json.load(open(path))["queries"]
    bad = []
    for face, ceiling in CEILINGS.items():
        got = queries.get(face)
        if got is None:
            print(f"SKIP {face}: not in {path}")
        elif got < 0 or got > ceiling:
            bad.append((face, got, ceiling))
            print(f"FAIL {face}: {got:.2f} s > ceiling {ceiling} s")
        else:
            print(f"ok   {face}: {got:.2f} s <= {ceiling} s")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main())
