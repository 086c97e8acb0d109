#!/usr/bin/env python
"""Attribute the BENCH_r03 -> r04 realistic-library delta (VERDICT r4
weak #1 / next-round #4).

Default-diff analysis first (static): NO r4 default touches the
realistic pixel path —
  - the tier-2 fused gate ships OFF (cds/multimask.py: CMS_MM_TIER2
    default "0"; measured x0.655 when on),
  - acc16 ships OFF (CMS_ACC16 default "0"; measured x0.990),
  - the target-partition default is 256 in BOTH rounds (r3 tree
    bf40a12 bench.py:516 == HEAD bench.py — the r4 "TPART A/B" only
    CONFIRMED the existing default against 128),
  - device-plane HBM residency happens in the gradient detail phase,
    which bench.py runs AFTER the realistic sweep, in the same process
    but after both headline measurements complete.
So the only live hypothesis is shared-chip session variance (CLAUDE.md:
2-3x between sessions, 20x windows observed). This script quantifies
it: the SAME realistic best-of-5 measurement repeated back-to-back in
one process. If the within-process spread covers the r3->r4 driver
delta (131.5K -> 111.9K, -15%), the regression is attributed to
session noise; a reproducible monotone drift would instead point at
in-process state (e.g. fragmentation) and warrant a bisect.

Usage: python scripts/profile_realistic_ab.py [repeats=3]
Prints one JSON line.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    # pin the shipped defaults explicitly so the record is unambiguous
    os.environ.setdefault("CMS_MM_TIER2", "0")
    os.environ.setdefault("CMS_ACC16", "0")
    os.environ.setdefault("CMS_BENCH_TPART", "256")
    import bench

    runs = []
    for i in range(repeats):
        best, stage, true_rate = bench._run_twophase_library(
            "realistic", 1024, 512, 5)
        runs.append(round(best, 1))
        print(f"[ab] run {i + 1}/{repeats}: {best:,.1f} pairs/s "
              f"(survivors {stage.get('survivor_rate', 0):.4f})",
              flush=True)
    spread = (max(runs) - min(runs)) / max(runs)
    print(json.dumps({
        "realistic_best_of_5_runs": runs,
        "within_process_spread_pct": round(spread * 100, 1),
        "r3_driver_capture": 131539.8,
        "r4_driver_capture": 111916.4,
        "driver_delta_pct": -15.0,
        "defaults_identical_r3_r4": True,
        "verdict": ("session-variance" if spread * 100 >= 10
                    or max(runs) >= 125000 else "needs-bisect"),
    }))


if __name__ == "__main__":
    main()
