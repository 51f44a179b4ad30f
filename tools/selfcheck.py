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

# canonical stand-in for NaN inside LIST cells: NaN != NaN, but the
# compare rule says both-NaN cells match (as it does for scalar columns)
_NAN = ("__nan__",)

def _canon(v):
    if isinstance(v, (np.ndarray, list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, float) and math.isnan(v):
        return _NAN
    return v

def _tuplize(a):
    # np.array(list_of_equal_length_tuples) silently builds a 2-D array;
    # fill an object array explicitly so cells stay scalar tuples
    out = np.empty(len(a), dtype=object)
    out[:] = [_canon(v) if isinstance(v, (np.ndarray, list)) else v for v in a]
    return out

def _has_lists(vals):
    # first NON-NULL cell decides (a fixed-prefix sample misses list
    # columns whose leading rows are NULL)
    for v in vals:
        if v is not None:
            return isinstance(v, (np.ndarray, list))
    return False

def norm(df):
    df = df[sorted(df.columns)]
    # sort_values raises on list-typed cells; sort by a deterministic
    # canonical key instead so LIST columns order deterministically too
    # (repr: total order even when cells mix tuples, Nones and the NaN
    # sentinel, which '<' cannot compare)
    keys = {c: df[c].map(lambda v: repr(_canon(v)))
            for c in df.columns
            if df[c].dtype == object and _has_lists(df[c])}
    if keys:
        tagged = df.assign(**{f"__k_{c}": k for c, k in keys.items()})
        by = [f"__k_{c}" if c in keys else c for c in df.columns]
        df = tagged.sort_values(by=by).drop(columns=[f"__k_{c}" for c in keys])
    else:
        df = df.sort_values(by=list(df.columns))
    return df.reset_index(drop=True)

def compare_frames(got, exp):
    """The driver-equivalent exact compare: sort columns by name, sort
    rows, compare bitwise (both-NaN counts as equal). Returns None on
    match, else a one-line error description. Shared with cc_oracle.py
    so the union-find path applies the identical rule."""
    try:
        got, exp = norm(got), norm(exp)
    except Exception as exc:
        return f"sort error {exc!r}"
    if list(got.columns) != list(exp.columns):
        return f"cols {list(got.columns)} vs {list(exp.columns)}"
    if len(got) != len(exp):
        return f"rows {len(got)} vs {len(exp)}"
    try:
        for c in got.columns:
            g, e = got[c].to_numpy(), exp[c].to_numpy()
            # LIST-typed columns come back as object arrays of numpy
            # arrays; elementwise == then yields arrays whose truth
            # value is ambiguous. Canonicalize list-like cells to
            # tuples first so the vectorized path stays scalar.
            if (g.dtype == object or e.dtype == object) and (
                    _has_lists(g) or _has_lists(e)):
                g, e = _tuplize(g), _tuplize(e)
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
                return f"col {c} row {int(i)}: got {gv!r} want {ev!r}"
    except Exception as exc:
        # a compare error must fail THIS query, not abort the sweep
        return f"compare error {exc!r}"
    return None


def main(out_dir, sf_dir, extra=()):
    # optional filters: skip=qA,qB (the closure-bearing queries
    # q55/q70/q68/q72/q82, whose recursive-CTE oracle is
    # closure-quadratic in DuckDB on dense fixtures — q70 killed at
    # 97 CPU-min in the round-10 sf0.1 sweep, q68 at 165 CPU-min at
    # 10x; use tools/cc_oracle.py for those, which keeps the oracle's
    # edge derivation and gates and swaps only the closure for a
    # union-find) and only=qX,... to resume a partial sweep without
    # recomparing finished queries.
    skip, only = set(), None
    for a in extra:
        if a.startswith("skip="):
            skip |= set(a[5:].split(","))
        elif a.startswith("only="):
            only = set(a[5:].split(","))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if name in skip:
            print(f"SKIP {name}"); continue
        if only is not None and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no output parquet"); n_fail += 1; continue
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        err = compare_frames(got, exp)
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
