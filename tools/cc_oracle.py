#!/usr/bin/env python3
"""Subquadratic oracle for the connected-components queries (q55/q70).

The recorded oracle SQL computes components via a recursive-CTE
transitive closure (`reach`), which is frontier-quadratic in component
size: on the 10x fixture the planted duplicate cluster is a 2000-node
clique, so each closure iteration joins ~4M reach rows against ~2000
out-edges per node (~8e9 joined rows) — intractable in DuckDB (killed
at 97 CPU-min at sf0.1 round 10; >35 CPU-min at 10x round 13). That is
an ORACLE limitation, not an engine one: the engine side runs
label-prop / large-small-star in O(log d) shuffle rounds.

This tool keeps the oracle's own EDGE derivation (everything up to and
including `sym` — LSH banding, planted chains — executed verbatim in
DuckDB) and replaces only the closure with a union-find, then compares
(node, comp=min node id of the component, restricted to nodes with at
least one edge) exactly against the Spark parquet output. Semantics are
identical to the recursive tail by construction:

    SELECT a AS node, least(a, min(b)) AS comp FROM reach GROUP BY a

is exactly "min node id reachable from a (including a)", over nodes
that appear in `sym`.

Usage: python3 tools/cc_oracle.py /tmp/out10x /root/repo/target/sf10x
"""
import sys
import duckdb

QUERIES = ("q55_dedup_components", "q70_star_components")
TAIL = "reach(a, b) AS"


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


def main(out_dir, sf_dir):
    import json
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name in QUERIES:
        sql = oracle[name]
        assert TAIL in sql, f"{name}: oracle shape changed — update this tool"
        prefix = sql.split(TAIL)[0].rstrip().rstrip(",")
        edges = con.sql(prefix + "\nSELECT src, dst FROM sym").fetchall()
        comp = components(edges)
        exp = sorted(comp.items())
        got = con.sql(f"SELECT node, comp FROM '{out_dir}/{name}/*.parquet' "
                      f"ORDER BY node").fetchall()
        if [tuple(r) for r in got] == exp:
            print(f"PASS {name} ({len(got)} rows, {len(edges)} sym edges, "
                  f"{len(set(comp.values()))} components)")
        else:
            diff = [(g, e) for g, e in zip(got, exp) if tuple(g) != e]
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}, "
                  f"first diffs {diff[:3]}")
            fails += 1
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
