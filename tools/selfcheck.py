#!/usr/bin/env python3
"""Self-check harness approximating the driver's DuckDB-oracle compare:
for each query dir under OUT, load our parquet and the oracle SQL result,
sort columns by name, sort rows, compare exactly (bitwise on doubles).

Usage: python3 tools/selfcheck.py /tmp/verify_out /root/testdata/sf0.01
"""
import sys, json, glob, math
import duckdb
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no output parquet"); n_fail += 1; continue
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        got, exp = norm(got), norm(exp)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(exp.columns)}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        bad = None
        for c in got.columns:
            g, e = got[c].to_numpy(), exp[c].to_numpy()
            # Vectorized first pass (the pure-Python per-cell loop was
            # O(rows) interpreter work and never finished on multi-
            # million-row outputs); the exact original rule -- equal, or
            # both float NaN -- is re-applied per cell only on the
            # (normally empty) mismatch set.
            with np.errstate(invalid="ignore"):
                eq = g == e
            if not isinstance(eq, np.ndarray):
                eq = np.array([gv == ev for gv, ev in zip(g, e)], dtype=bool)
            for i in np.nonzero(~eq.astype(bool))[0]:
                gv, ev = g[i], e[i]
                if (gv == ev) or (isinstance(gv, float) and isinstance(ev, float)
                      and math.isnan(gv) and math.isnan(ev)):
                    continue
                bad = (c, int(i), gv, ev); break
            if bad: break
        if bad:
            c, i, gv, ev = bad
            print(f"FAIL {name}: col {c} row {i}: got {gv!r} want {ev!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
