#!/usr/bin/env python3
"""Derive the CHANGELOG/SCALE sweep-claim line FROM a completed
stage-5 table.md — the only sanctioned way to record a 10x sweep
result. Refuses (exit 1) when the table is missing, has no tally
line, tallies any FAIL, or covers fewer queries than the full
surface, so an aborted stage 4 — r17's failure mode, where
cc_oracle.py died silently and the claim was written anyway — can
never produce a claim line.

The expected surface is derived, not guessed: the sweep workdir's
own `out/oracle_sql.json` (written by graft.Verify next to table.md)
names every query the engine claims, and each name must appear as a
TABLE ROW (`| qname |`), not merely as a substring anywhere in the
file. The closure-bearing set (tools/cc_queries.txt) is additionally
checked row-wise. When oracle_sql.json is absent (a table copied out
of its workdir), the min_queries floor (default 154 — the full
surface) still applies.

Usage: python3 tools/sweep_claim.py /tmp/sweep10x_rNN/table.md [min_queries]
Prints one line suitable for CHANGELOG verbatim.
"""
import json
import pathlib
import re
import subprocess
import sys


def table_rows(text):
    """Query names that have a real table row, keyed row-wise."""
    return set(re.findall(r"^\|\s*(q\d+\S*)\s*\|", text, re.M))


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
    rows = table_rows(text)
    if total != len(rows):
        print(f"REFUSED: tally says {total} but the table has "
              f"{len(rows)} query rows — malformed table",
              file=sys.stderr)
        return 1
    # The authoritative surface: the sweep's own Verify dump manifest.
    oracle = p.parent / "out" / "oracle_sql.json"
    if oracle.exists():
        expected = set(json.loads(oracle.read_text()))
        missing = sorted(expected - rows)
        if missing:
            print(f"REFUSED: {len(missing)} queries in the sweep's own "
                  f"oracle_sql.json have no table row "
                  f"({', '.join(missing[:8])}{'…' if len(missing) > 8 else ''})"
                  " — a stage died early", file=sys.stderr)
            return 1
    elif total < min_queries:
        print(f"REFUSED: no {oracle} to derive the surface from and the "
              f"table covers only {total} queries (< {min_queries}) — "
              "a stage died early", file=sys.stderr)
        return 1
    cc = [q.strip() for q in
          (pathlib.Path(__file__).parent / "cc_queries.txt")
          .read_text().splitlines() if q.strip()]
    missing = [q for q in cc if q not in rows]
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
                  int(sys.argv[2]) if len(sys.argv) > 2 else 154))
