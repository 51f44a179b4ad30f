#!/usr/bin/env python3
"""Derive the CHANGELOG/SCALE sweep-claim line FROM a completed
stage-5 table.md — the only sanctioned way to record a 10x sweep
result. Refuses (exit 1) when the table is missing, has no tally
line, tallies any FAIL, or covers fewer queries than the full
surface (selfcheck skips + the closure-bearing set in
tools/cc_queries.txt must both be present, so an aborted stage 4 —
r17's failure mode, where cc_oracle.py died silently and the claim
was written anyway — can never produce a claim line).

Usage: python3 tools/sweep_claim.py /tmp/sweep10x_rNN/table.md [min_queries]
Prints one line suitable for CHANGELOG verbatim.
"""
import pathlib
import re
import subprocess
import sys


def main(table_path, min_queries):
    p = pathlib.Path(table_path)
    if not p.exists():
        print(f"REFUSED: {table_path} does not exist — the sweep's "
              "stage 5 never completed; there is nothing to claim",
              file=sys.stderr)
        return 1
    text = p.read_text()
    m = re.search(r"^(\d+)/(\d+) PASS$", text, re.M)
    if not m:
        print(f"REFUSED: {table_path} has no N/M PASS tally line — "
              "stage 5 was interrupted", file=sys.stderr)
        return 1
    npass, total = int(m.group(1)), int(m.group(2))
    if npass != total:
        print(f"REFUSED: {npass}/{total} — sweep has failures; "
              "fix them before claiming", file=sys.stderr)
        return 1
    if total < min_queries:
        print(f"REFUSED: table covers only {total} queries "
              f"(< {min_queries}) — a stage died early", file=sys.stderr)
        return 1
    cc = [q.strip() for q in
          (pathlib.Path(__file__).parent / "cc_queries.txt")
          .read_text().splitlines() if q.strip()]
    missing = [q for q in cc if q not in text]
    if missing:
        print(f"REFUSED: closure-bearing queries absent from the table "
              f"({', '.join(missing)}) — stage 4 (cc_oracle) never "
              "completed", file=sys.stderr)
        return 1
    head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                          capture_output=True, text=True).stdout.strip()
    print(f"10x oracle sweep at HEAD {head}: {npass}/{total} PASS "
          f"(stage-5 table: {table_path})")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1],
                  int(sys.argv[2]) if len(sys.argv) > 2 else 150))
