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
exactly the flagged set in fresh-JVM isolation and re-judge.
"""
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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    subset = "--subset" in sys.argv
    flagged_out = None
    if "--flagged-out" in sys.argv:
        flagged_out = sys.argv[sys.argv.index("--flagged-out") + 1]
        if flagged_out in args:
            args.remove(flagged_out)
    sys.exit(main(args[0], args[1],
                  float(args[2]) if len(args) > 2 else 2.0,
                  subset=subset, flagged_out=flagged_out))
