#!/usr/bin/env python3
"""Render the SCALE.md '10x-fixture oracle' per-query table from the
sweep logs (one selfcheck invocation + one cc_oracle invocation).

Usage: python3 tools/sweep_table.py /tmp/selfcheck10x_r13.log /tmp/cc10x_r13.log
"""
import re
import sys


def parse(path):
    rows = {}
    for line in open(path):
        m = re.match(r"(PASS|FAIL) (q\S+?)(?: xval)? \((\d+) rows", line)
        if m:
            rows[m.group(2)] = (m.group(1), int(m.group(3)))
        else:
            m = re.match(r"FAIL (q\S+): (.*)", line)
            if m:
                rows[m.group(1)] = ("FAIL", m.group(2)[:40])
    return rows


def main(selfcheck_log, cc_log):
    rows = parse(selfcheck_log)
    cc = parse(cc_log)
    for k, v in cc.items():
        rows[k] = (v[0], v[1], "union-find oracle (cc_oracle.py)")
    names = sorted(rows, key=lambda n: int(re.match(r"q(\d+)", n).group(1)))
    print("| query | rows at 10x | result |")
    print("|---|---|---|")
    npass = 0
    for n in names:
        r = rows[n]
        note = r[2] if len(r) > 2 else ""
        val = f"{r[1]:,}" if isinstance(r[1], int) else str(r[1])
        res = r[0] + (f" ({note})" if note else "")
        print(f"| {n} | {val} | {res} |")
        npass += r[0] == "PASS"
    print(f"\n{npass}/{len(names)} PASS")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
