#!/usr/bin/env python3
"""Per-query drift between two graft.Bench FILE artifacts — the
round-over-round check for the ISOLATED bench (fresh child JVM per
query), where a per-query regression is attributable to code by
construction instead of needing a hand-run session A/B.

Usage: python3 tools/bench_drift.py OLD.json NEW.json [ratio] [floor]
           [--subset] [--expect FILE] [--flagged-out FILE]

Compares the per-query minima in each artifact's "queries" map. Flags
(exit 1):
  - a query recorded in OLD that is missing from NEW or errs in NEW
    (the worst regression: it no longer runs);
  - a query whose time grew past `ratio` (default 2.0) times
    max(old, floor) — the `floor` (default 0.3 s) keeps sub-second
    scheduler jitter from flagging (0.05 s -> 0.12 s is 2.4x and
    meaningless; 0.3 s -> 0.7 s is worth a look).
New queries (in NEW only) are listed informationally. Improvements are
summarized but never flagged.

Re-measure sidecar: when `<OLD stem>_remeasure.json` exists beside
OLD, its per-query values are spliced over OLD's before comparing
(both readings are printed). This is how a load-inflated reading that
the gate's own subset re-measure exonerated is kept from ratcheting
the baseline upward: the committed artifact stays untouched as the
measurement record, the sidecar carries the idle-machine truth, and
the NEXT round's drift threshold derives from the truth (r17: q19
recorded at 2.37 s under load, exonerated at 1.14 s — without the
splice, r18's 2x threshold would be ~4.7 s, masking a real ~4x).

--subset disables the GONE check: NEW deliberately covers only a few
queries (a targeted idle-machine re-measure of a flagged set — the r17
gate's full isolated stage ran at load ~3-4 and inflated nine
sub-second queries ~2.5x; the re-measure exonerated all nine), so
every other recorded query being absent is the point. In subset mode
pass --expect FILE (the flagged-out list from the full run): any
expected query absent from NEW — neither a time nor an err — is
flagged GONE instead of silently passing as exonerated (graft.Bench's
isolate path does always write a row per requested name, but the
checker no longer has to trust that invariant).
--flagged-out FILE writes the drift-flagged names one per line (plus
MISSING:<name> markers for GONE/ERR rows, which a re-measure cannot
exonerate), so the gate can re-judge exactly the flagged set on a
quieter machine mechanically.
"""
import argparse
import json
import os
import sys


def load(path):
    b = json.load(open(path))
    qs = {k: float(v) for k, v in b["queries"].items() if v != "err"}
    errs = {k for k, v in b["queries"].items() if v == "err"}
    return qs, errs


def splice_remeasure(old_path, old):
    """Overlay `<stem>_remeasure.json` values onto OLD's, if present."""
    stem, ext = os.path.splitext(old_path)
    sidecar = f"{stem}_remeasure{ext}"
    if not os.path.exists(sidecar):
        return old, []
    re_qs, _ = load(sidecar)
    spliced = [(q, old[q], t) for q, t in sorted(re_qs.items()) if q in old]
    old = dict(old)
    old.update({q: t for q, _, t in spliced})
    return old, spliced


def read_expect(path):
    """Flagged-out file from the full run: names, minus MISSING: rows
    (those already failed the gate before any re-measure)."""
    return {ln.strip() for ln in open(path)
            if ln.strip() and not ln.startswith("MISSING:")}


def main(old_path, new_path, ratio=2.0, floor=0.3, subset=False,
         expect=None, flagged_out=None):
    old, old_errs = load(old_path)
    old, spliced = splice_remeasure(old_path, old)
    new, new_errs = load(new_path)
    fresh = sorted(set(new) - set(old) - old_errs)
    if subset:
        expected = read_expect(expect) if expect else set()
        gone = sorted((set(old) & new_errs) |
                      (expected & set(old) - set(new) - new_errs))
    else:
        gone = sorted((set(old) - set(new) - new_errs) | (set(old) & new_errs))
    flagged = [(q, old[q], new[q]) for q in sorted(set(old) & set(new))
               if new[q] > ratio * max(old[q], floor)]
    improved = sum(1 for q in set(old) & set(new) if new[q] < old[q])
    if flagged_out is not None:
        with open(flagged_out, "w") as f:
            f.write("".join(q + "\n" for q, _, _ in flagged))
            f.write("".join(f"MISSING:{q}\n" for q in gone))
    print(f"{len(new)} queries in {new_path}, {len(old)} in {old_path}; "
          f"threshold {ratio}x over max(old, {floor}s); "
          f"{improved} improved" + (" (subset mode)" if subset else ""))
    if spliced:
        print("re-measure sidecar spliced over OLD "
              "(committed reading -> idle-machine re-measure):")
        for q, rec, rem in spliced:
            print(f"  {q}: {rec:.2f}s -> {rem:.2f}s")
    if fresh:
        print(f"new queries (no old entry): {', '.join(fresh)}")
    if gone:
        print("GONE/ERR — recorded queries that no longer produce a time:")
        for q in gone:
            print(f"  {q}: was {old.get(q, float('nan')):.2f}s")
    if flagged:
        print("DRIFT — per-query time grew past the threshold "
              "(isolated mode: this is code or data, not session heap):")
        for q, o, n in flagged:
            print(f"  {q}: {o:.2f}s -> {n:.2f}s ({n / max(o, 1e-9):.1f}x)")
    return 1 if (gone or flagged) else 0


if __name__ == "__main__":
    p = argparse.ArgumentParser(
        description="Per-query drift between two graft.Bench artifacts")
    p.add_argument("old_json")
    p.add_argument("new_json")
    p.add_argument("ratio", nargs="?", type=float, default=2.0)
    p.add_argument("floor", nargs="?", type=float, default=0.3)
    p.add_argument("--subset", action="store_true",
                   help="NEW covers only a re-measured subset; "
                        "GONE applies only to --expect names")
    p.add_argument("--expect", metavar="FILE",
                   help="subset mode: the flagged-out list the re-measure "
                        "was asked to cover; absent names flag as GONE")
    p.add_argument("--flagged-out", metavar="FILE",
                   help="write flagged names (and MISSING:<name> "
                        "markers) one per line for the gate's re-judge")
    a = p.parse_args()
    sys.exit(main(a.old_json, a.new_json, a.ratio, a.floor,
                  subset=a.subset, expect=a.expect,
                  flagged_out=a.flagged_out))
