#!/usr/bin/env python3
"""Render the SCALE.md full-surface 10x wall-ratio table from two bench
artifacts produced in the same session (same machine, same settings):

Usage: python3 tools/bench_ratio.py /tmp/bench_sf01_ref.json /tmp/bench_sf10x.json [threshold]

Ratios use each query's MIN-of-repeats (the steady-state number the
<=2x gate cares about). Queries with ratio > threshold (default 5.0)
are listed again below the table so every super-linear reading gets a
named explanation in SCALE.md — the way the oracle sweep caught q29.
"""
import json
import re
import sys


def main(ref_path, tenx_path, threshold=5.0):
    ref = json.load(open(ref_path))
    tenx = json.load(open(tenx_path))
    rq, tq = ref["queries"], tenx["queries"]
    names = sorted(set(rq) & set(tq),
                   key=lambda n: int(re.match(r"q(\d+)", n).group(1)))
    print("| query | sf0.1 (1x) | sf10x (10x) | wall ratio |")
    print("|---|---|---|---|")
    flagged = []
    for n in names:
        a, b = rq[n], tq[n]
        if a == "err" or b == "err":
            print(f"| {n} | {a} | {b} | err |")
            flagged.append((n, "err"))
            continue
        a, b = float(a), float(b)
        r = b / a if a > 0 else float("inf")
        cell = f"**{r:.1f}x**" if r > threshold else f"{r:.1f}x"
        print(f"| {n} | {a:.2f} s | {b:.2f} s | {cell} |")
        if r > threshold:
            flagged.append((n, r))
    print(f"\ntotals: sf0.1 {ref['value']} s (spread {ref.get('spread')}, "
          f"load {ref.get('load_start')} -> {ref.get('load_end')}); "
          f"sf10x {tenx['value']} s (spread {tenx.get('spread')}, "
          f"load {tenx.get('load_start')} -> {tenx.get('load_end')}); "
          f"{len(names)} queries")
    if flagged:
        print(f"\nratios > {threshold}x (each needs a named term in SCALE.md):")
        for n, r in flagged:
            print(f"  {n}: {r if isinstance(r, str) else f'{r:.1f}x'}")
    else:
        print(f"\nno ratio exceeds {threshold}x")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 5.0)
