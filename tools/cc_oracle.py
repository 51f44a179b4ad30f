#!/usr/bin/env python3
"""Subquadratic oracle for the closure-bearing queries (q55/q70, the
gated-corpus trio q68/q72/q82, and the novelty-composed builds
q153/q154 which share q68's closure verbatim).

The recorded oracle SQL for these computes a transitive closure via a
recursive CTE (`reach`), which is frontier-quadratic in component size:
on the 10x fixture the planted duplicate cluster is a ~2000-node
clique, so each closure iteration joins ~4M reach rows against ~2000
out-edges per node (~8e9 joined rows) — intractable in DuckDB (q70
killed at 97 CPU-min at sf0.1 round 10; q55 >35 CPU-min and q68
>165 CPU-min at 10x round 13). That is an ORACLE limitation, not an
engine one: the engine side runs label-prop / large-small-star in
O(log d) shuffle rounds.

This tool keeps the oracle's own EDGE derivation (everything up to and
including `sym` — LSH banding, cell-bounded cosine pairs — executed
verbatim in DuckDB) and replaces only the closure with a union-find
whose roots are component minima. Every consumer of `reach` in the
recorded oracles reads exactly "min node id reachable from a"
(including a itself — `sym` is symmetric, so any node with an edge
reaches itself through a 2-cycle):

  - q55/q70:  SELECT a, least(a, min(b)) FROM reach GROUP BY a
              -> (node, component min); compared directly.
  - q68/q72:  neardrop = nodes with min(b) < a
              -> uf rows with comp < node; the REST of the oracle SQL
              (rep/LM/contamination gates, source quotas) runs verbatim
              with only the reach+neardrop CTEs swapped for the
              union-find table.
  - q82:      grp = (a, least(a, min(b))) -> the uf table itself;
              the surrounding SQL (cell assignment, final projection)
              runs verbatim.

`xval` mode cross-validates the swap at a tractable SF: it runs the
ORIGINAL recursive SQL and the swapped SQL side by side and applies the
driver-equivalent compare (selfcheck.compare_frames) between them —
proving the rewrite is semantics-preserving before it is trusted at
10x. Recorded: all five queries swap==recursive at sf0.01.

Usage:
  python3 tools/cc_oracle.py /tmp/out10x /root/repo/target/sf10x
  python3 tools/cc_oracle.py /tmp/out001 /root/testdata/sf0.01 xval
  ... [only=q68_corpus_build,...]
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

from selfcheck import TABLES, compare_frames

# Per-query results must appear AS each query finishes: at 10x this
# tool runs ~45 minutes, and block-buffered stdout piped into tee
# printed nothing until completion (r17: it looked hung and was
# abandoned mid-run, leaving an empty cc.log).
sys.stdout.reconfigure(line_buffering=True)

CC_QUERIES = ("q55_dedup_components", "q70_star_components")
TAIL = "reach(a, b) AS"
# The exact projection the uf compare stands in for: if a q55/q70 oracle
# ever grows a different tail (an added filter or projection after the
# closure), the raw (node, comp) compare below would silently diverge
# from the recorded SQL — so the tail is pinned verbatim, not just the
# presence of the reach CTE.
CC_EXPECTED_TAIL = ("SELECT a AS node, least(a, min(b)) AS comp "
                    "FROM reach GROUP BY a ORDER BY node")

REACH_CTE = ("reach(a, b) AS (\n  SELECT src, dst FROM sym\n  UNION\n"
             "  SELECT r.a, s.dst FROM reach r JOIN sym s ON s.src = r.b),\n")
NEARDROP_CTE = ("neardrop AS (\n"
                "  SELECT a AS doc_id FROM reach GROUP BY a HAVING min(b) < a),\n")
GRP_CTE = ("grp AS (SELECT a AS vec_id, least(a, min(b)) AS sem_group\n"
           "        FROM reach GROUP BY a)\n")

# query -> (literal closure+consumer block, union-find replacement)
SWAPS = {
    "q68_corpus_build": (
        REACH_CTE + NEARDROP_CTE,
        "neardrop AS (SELECT node AS doc_id FROM uf WHERE comp < node),\n"),
    "q72_stream_reconcile": (
        REACH_CTE + NEARDROP_CTE,
        "neardrop AS (SELECT node AS doc_id FROM uf WHERE comp < node),\n"),
    "q153_corpus_build_novelty": (
        REACH_CTE + NEARDROP_CTE,
        "neardrop AS (SELECT node AS doc_id FROM uf WHERE comp < node),\n"),
    "q154_stream_reconcile_novelty": (
        REACH_CTE + NEARDROP_CTE,
        "neardrop AS (SELECT node AS doc_id FROM uf WHERE comp < node),\n"),
    "q82_semantic_dedup": (
        REACH_CTE + GRP_CTE,
        "grp AS (SELECT node AS vec_id, comp AS sem_group FROM uf)\n"),
}


def components(edges):
    parent = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:          # path compression
            parent[x], x = r, parent[x]
        return r

    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            # union by min so roots stay the component minimum
            if rs < rd:
                parent[rd] = rs
            else:
                parent[rs] = rd
    return {n: find(n) for n in parent}


def register_uf(con, sql):
    """Run the oracle's own edge derivation (prefix through `sym`),
    union-find it, and register the (node, comp) table as `uf`."""
    prefix = sql.split(TAIL)[0].rstrip().rstrip(",")
    edges = con.sql(prefix + "\nSELECT src, dst FROM sym").fetchall()
    comp = components(edges)
    uf = pd.DataFrame(
        {"node": pd.array(sorted(comp), dtype="int64"),
         "comp": pd.array([comp[n] for n in sorted(comp)], dtype="int64")})
    con.register("uf", uf)
    return comp, len(edges)


def main(out_dir, sf_dir, extra=()):
    only = None
    xval = False
    for a in extra:
        if a.startswith("only="):
            only = set(a[5:].split(","))
        elif a == "xval":
            xval = True
    con = duckdb.connect()
    for t in TABLES:
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0

    for name in CC_QUERIES:
        if only is not None and name not in only:
            continue
        sql = oracle[name]
        assert TAIL in sql, f"{name}: oracle shape changed — update this tool"
        assert " ".join(sql.split()).endswith(CC_EXPECTED_TAIL), (
            f"{name}: oracle tail is no longer the bare (node, comp) "
            f"projection this tool's uf compare stands in for — update "
            f"CC_EXPECTED_TAIL or route through SWAPS + compare_frames")
        comp, n_edges = register_uf(con, sql)
        exp = sorted(comp.items())
        if xval:
            # tractable SF: the recursive original IS runnable — prove
            # union-find == recursive (the full oracle SQL, whose tail
            # is exactly the (node, min-reachable) projection)
            # the recorded SQL already ends in ORDER BY node
            rec = [tuple(r) for r in con.sql(sql).fetchall()]
            ok = rec == exp
            print(f"{'PASS' if ok else 'FAIL'} {name} xval "
                  f"({len(exp)} rows, {n_edges} sym edges): "
                  + ("uf==recursive" if ok else
                     f"XVAL FAIL first diffs "
                     f"{[(g, e) for g, e in zip(rec, exp) if g != e][:3]}"))
            fails += 0 if ok else 1
            continue
        if not glob.glob(f"{out_dir}/{name}/*.parquet"):
            print(f"FAIL {name}: no output parquet")
            fails += 1
            continue
        got = con.sql(f"SELECT node, comp FROM '{out_dir}/{name}/*.parquet' "
                      f"ORDER BY node").fetchall()
        if [tuple(r) for r in got] == exp:
            print(f"PASS {name} ({len(got)} rows, {n_edges} sym edges, "
                  f"{len(set(comp.values()))} components)")
        else:
            diff = [(g, e) for g, e in zip(got, exp) if tuple(g) != e]
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}, "
                  f"first diffs {diff[:3]}")
            fails += 1

    for name, (block, repl) in SWAPS.items():
        if only is not None and name not in only:
            continue
        sql = oracle[name]
        assert sql.count(block) == 1, \
            f"{name}: oracle closure shape changed — update this tool"
        comp, n_edges = register_uf(con, sql)
        swapped = sql.replace(block, repl)
        exp = con.sql(swapped).df()
        if xval:
            # tractable SF: the recursive original IS runnable — prove
            # swap == recursive under the driver-equivalent compare
            rec = con.sql(sql).df()
            err = compare_frames(exp, rec)
            tag = "swap==recursive" if err is None else f"XVAL FAIL: {err}"
            print(f"{'PASS' if err is None else 'FAIL'} {name} xval "
                  f"({len(exp)} rows, {n_edges} sym edges): {tag}")
            fails += 0 if err is None else 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no output parquet")
            fails += 1
            continue
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        err = compare_frames(got, exp)
        if err is None:
            print(f"PASS {name} ({len(got)} rows, {n_edges} sym edges, "
                  f"{len(set(comp.values()))} components)")
        else:
            print(f"FAIL {name}: {err}")
            fails += 1
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
