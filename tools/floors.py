#!/usr/bin/env python3
"""Emit the BENCH.md v2 per-query floors table from Bench JSON runs.

Usage: floors.py <r4_run.json ...> -- <r5_run.json ...>
Prints a markdown table: query | r4 v2 min | r5 min | floor to date.
Rebased floors (plan changed deliberately in r5) are taken from the r5
column only and marked with a dagger; the rebase set is explicit below.
"""
import json
import sys

# Queries whose r5 plans deliberately differ from r4 (floor REBASED at r5):
#  - q24_media: the in-query stub-decode law (r5) adds per-row byte-level
#    recomputation + a sliced frame-hash check; r4's lawless floor is
#    unreachable by design.
#  - q45_drift_iv / q48_outlier_bounds / q49_asof_drift: the per-value
#    domain-cardinality guard (r5) spends one count job per ks/outlier
#    call before building the cumulative window.
REBASED_R5 = {"q24_media", "q45_drift_iv", "q48_outlier_bounds", "q49_asof_drift"}


def main() -> None:
    split = sys.argv.index("--")
    r4 = [json.load(open(f))["queries"] for f in sys.argv[1:split]]
    r5 = [json.load(open(f))["queries"] for f in sys.argv[split + 1 :]]
    qs = sorted(r5[0].keys())
    print("| query | r4 v2 min-of-%d | r5 min-of-%d | floor to date |" % (len(r4), len(r5)))
    print("|---|---|---|---|")
    tot = 0.0
    for q in qs:
        m4 = min((r[q] for r in r4 if q in r), default=None)
        m5 = min(r[q] for r in r5)
        if q in REBASED_R5 or m4 is None:
            floor, mark = m5, "†"
        else:
            floor, mark = min(m4, m5), ""
        tot += floor
        m4s = f"{m4:.2f}" if m4 is not None else "—"
        print(f"| {q} | {m4s} | {m5:.2f} | **{floor:.2f}**{mark} |")
    print(f"\nFloor sum: **{tot:.1f} s** / {len(qs)} queries.")


if __name__ == "__main__":
    main()
