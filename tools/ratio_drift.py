#!/usr/bin/env python3
"""Diff a freshly-rendered 10x wall-ratio table against the ratios last
recorded in SCALE.md, so a scale regression (a query whose 10x ratio
GREW) is flagged mechanically instead of by eyeballing two tables.

Usage: python3 tools/ratio_drift.py SCALE.md NEW_TABLE.md [growth]
           [--subset] [--flagged-out FILE]

Both inputs use bench_ratio.py's row format:
    | q01_pricing_summary | 1.23 s | 4.56 s | 3.7x |   (maybe **3.7x**)
For SCALE.md the LAST occurrence of each query's row wins (the most
recently recorded table). A query is flagged when
    new_ratio > growth * max(recorded_ratio, 1.0)
(the max() floor keeps sub-linear queries from flagging on 0.4x -> 0.9x
noise). Exit 1 when anything is flagged: either investigate the named
query or re-record the SCALE.md table with the new measurement and a
named term. New queries (no recorded row) are listed informationally.

A RECORDED query that is MISSING from the new table is itself a failure
(exit 1): bench_ratio.py renders a query that errored at either SF as an
'err' row the ROW regex skips, so "missing" usually means "fails outright
at the 10x fixture" -- the worst scale regression there is, and exactly
the one a compare-only-what-is-present diff would wave through.

--subset disables that missing check: the new table deliberately covers
only a few queries (the gate's isolated re-measure of exactly the
flagged set), so every other recorded query being absent is the point.
--flagged-out FILE writes the flagged query names one per line (empty
file when nothing flagged), which is what lets the gate re-measure
exactly the flagged set in fresh-JVM isolation and re-judge. Missing
recorded queries are written to the same file as `MISSING:<name>`
lines so the gate's exoneration path can distinguish "drift that may
exonerate in isolation" from "a recorded query with no row at all"
(which must fail outright — isolation cannot exonerate an absence).
"""
import argparse
import re
import sys

ROW = re.compile(
    r"^\|\s*(q\d+\S*)\s*\|\s*[\d.]+\s*s\s*\|\s*[\d.]+\s*s\s*\|\s*"
    r"\*{0,2}([\d.]+)x\*{0,2}\s*\|")


def ratios(path):
    out = {}
    for line in open(path):
        m = ROW.match(line.strip())
        if m:
            out[m.group(1)] = float(m.group(2))  # last occurrence wins
    return out


def main(recorded_path, new_path, growth=2.0, subset=False,
         flagged_out=None):
    rec, new = ratios(recorded_path), ratios(new_path)
    if not rec:
        print(f"no recorded ratio rows found in {recorded_path}")
        return 1
    if not new:
        print(f"no ratio rows found in {new_path}")
        return 1
    flagged, fresh = [], []
    for q, r_new in sorted(new.items()):
        if q not in rec:
            fresh.append(q)
        elif r_new > growth * max(rec[q], 1.0):
            flagged.append((q, rec[q], r_new))
    missing = [] if subset else sorted(set(rec) - set(new))
    if flagged_out is not None:
        with open(flagged_out, "w") as f:
            f.write("".join(q + "\n" for q, _, _ in flagged))
            # distinct marker lines: the gate greps these so a missing
            # row can never ride the exoneration path (which re-measures
            # only queries that HAVE a measurement to re-judge)
            f.write("".join(f"MISSING:{q}\n" for q in missing))
    print(f"{len(new)} queries in new table, {len(rec)} recorded; "
          f"growth threshold {growth}x"
          + (" (subset mode)" if subset else ""))
    if fresh:
        print(f"unrecorded (new) queries: {', '.join(fresh)}")
    if missing:
        print("MISSING — these recorded queries have no parseable row in "
              "the new table (an 'err' row means the query FAILED at one "
              "of the two SFs):")
        for q in missing:
            print(f"  {q}: recorded {rec[q]:.1f}x -> absent")
        if not flagged:
            return 1
    if flagged:
        print("RATIO DRIFT — these queries' 10x wall ratio grew since the "
              "recorded SCALE.md table (investigate or re-record):")
        for q, old, cur in flagged:
            print(f"  {q}: recorded {old:.1f}x -> now {cur:.1f}x")
        return 1
    print("no drift: every recorded query is within the growth threshold")
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser(
        description="Diff a fresh 10x wall-ratio table against SCALE.md's "
                    "recorded ratios; exit 1 on drift or missing rows.")
    p.add_argument("recorded", help="SCALE.md (last table occurrence wins)")
    p.add_argument("new_table", help="freshly rendered bench_ratio.py table")
    p.add_argument("growth", nargs="?", type=float, default=2.0,
                   help="flag when new > growth * max(recorded, 1.0)")
    p.add_argument("--subset", action="store_true",
                   help="new table deliberately covers a subset; "
                        "disable the missing-row check")
    p.add_argument("--flagged-out", metavar="FILE",
                   help="write flagged names (and MISSING:<name> marker "
                        "lines) one per line for the gate's re-judge")
    a = p.parse_args()
    sys.exit(main(a.recorded, a.new_table, a.growth,
                  subset=a.subset, flagged_out=a.flagged_out))
