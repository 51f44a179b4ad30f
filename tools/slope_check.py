#!/usr/bin/env python3
"""Interval-ratio slope check for the corpus-build family (VERDICT
r18 #4: make the 30x slope instrument repeatable, not a one-off).

Reads three isolated-bench artifacts (sf0.1 = 5k docs, 10x = 50k,
30x = 150k), computes each query's wall-ratio intervals 10x/1x and
30x/10x, renders the SCALE.md slope table, and compares against the
recorded baseline (tools/slope30x_baseline.json). Fails when a
measured interval exceeds

    min(baseline_interval * TOL, HARD cap)

— TOL absorbs machine noise across sessions (all three points of one
run share a session, so the RATIOS are far stabler than the walls);
the HARD caps are the super-linearity tripwires regardless of
baseline: a 3x data step must not cost 3x wall (the family is
sub-linear by design — q153's caught bug read 4.49x), a 10x step must
not cost 5x.

Usage:
  python3 tools/slope_check.py base.json sf1.json sf10.json sf30.json
      [--update-baseline]   # rewrite base.json from this run (after
                            # an intentional plan change; commit it)
"""
import json
import sys

TOL = 1.5
HARD_30_10 = 3.0   # linear in docs for the 3x step
HARD_10_1 = 5.0    # 10x step: sub-linear family reads ~2-3.2


def walls(path):
    b = json.load(open(path))
    qs = b["queries"]
    return {k: float(v) for k, v in qs.items()}


def main(argv):
    update = "--update-baseline" in argv
    argv = [a for a in argv if a != "--update-baseline"]
    base_path, p1, p10, p30 = argv
    w1, w10, w30 = walls(p1), walls(p10), walls(p30)
    names = sorted(set(w1) & set(w10) & set(w30))
    if not names:
        print("FAIL: no common queries across the three artifacts",
              file=sys.stderr)
        return 1
    base = json.load(open(base_path)) if not update else {}
    if not update:
        gone = sorted(set(base) - set(names))
        if gone:
            print(f"FAIL: baseline queries missing from this run: "
                  f"{', '.join(gone)}", file=sys.stderr)
            return 1
    rows, failures, measured = [], [], {}
    for n in names:
        r10_1 = w10[n] / w1[n]
        r30_10 = w30[n] / w10[n]
        measured[n] = {"r10_1": round(r10_1, 2), "r30_10": round(r30_10, 2)}
        verdict = "ok"
        if not update and n in base:
            lim10 = min(base[n]["r10_1"] * TOL, HARD_10_1)
            lim30 = min(base[n]["r30_10"] * TOL, HARD_30_10)
            if r10_1 > lim10:
                verdict = f"FAIL 10x/1x {r10_1:.2f} > {lim10:.2f}"
            elif r30_10 > lim30:
                verdict = f"FAIL 30x/10x {r30_10:.2f} > {lim30:.2f}"
        elif not update:
            verdict = "new (no baseline)"
        if verdict.startswith("FAIL"):
            failures.append(f"{n}: {verdict}")
        rows.append((n, w1[n], w10[n], w30[n], r10_1, r30_10, verdict))
    print("| query | sf0.1 | 10x | 30x | 10x/1x | 30x/10x | slope |")
    print("|---|---|---|---|---|---|---|")
    for n, a, b_, c, r1, r3, v in rows:
        print(f"| {n} | {a:.2f} s | {b_:.2f} s | {c:.2f} s "
              f"| {r1:.2f}x | {r3:.2f}x | {v} |")
    if update:
        with open(base_path, "w") as f:
            json.dump(measured, f, indent=2, sort_keys=True)
            f.write("\n")
        print(f"\nbaseline rewritten: {base_path}")
        return 0
    if failures:
        print("\nSLOPE REGRESSION — a data term grew super-linearly "
              "vs the recorded slope:", file=sys.stderr)
        for f_ in failures:
            print(f"  {f_}", file=sys.stderr)
        return 1
    print(f"\n{len(names)} queries within recorded slopes "
          f"(tol {TOL}x, hard caps {HARD_10_1}/{HARD_30_10})")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
