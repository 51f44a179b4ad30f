#!/usr/bin/env python3
"""10x-VOLUME scale fixture (VERDICT r9 item #7).

Unlike gen_audit_fixture.py (which widens the doc_id RANGE at constant
volume, for oracle-tractable correctness audits), this writes
target/sf10x with 10x the ROWS of sf0.1 in the two tables the heavy
query families read:

  - documents.parquet: 50 000 docs, same hash-derived text generator and
    schema as the driver's testdata (dense ids, so the modular plantings
    appear at 10x their sf0.1 multiplicity);
  - embeddings.parquet: 20 000 vectors, deterministic per-(vec_id, dim)
    hash values in [-1, 1], 10 labels;
  - events.parquet: 1 000 000 events over the same 30-day window, 15 000
    users, the same five types and {"k": int} props shape.

Since round 11 the relational tables are ALSO inflated 10x with
FK-consistent key offsets (copy c of 10 adds c*max(key) to every key
and foreign key, so join multiplicities are preserved exactly):
lineitem 6M, orders 1.5M, customer 150k, part 200k, supplier 10k;
region/nation stay the fixed TPC-H dims. That makes the fixture a full
CORRECTNESS surface, not just a wall-clock one. To run the sweep:

  python3 tools/gen_scale_fixture.py
  sbt -batch "runMain graft.Verify /root/repo/target/sf10x /tmp/out10x"
  python3 tools/selfcheck.py /tmp/out10x /root/repo/target/sf10x \
      skip=q55_dedup_components,q70_star_components,q68_corpus_build,q72_stream_reconcile,q82_semantic_dedup
  python3 tools/cc_oracle.py /tmp/out10x /root/repo/target/sf10x

(the five skipped queries' recorded oracles embed a recursive-CTE
transitive closure, which is closure-quadratic in component size — the
10x fixture's 2000-node planted clique makes it intractable in DuckDB;
cc_oracle.py keeps each oracle's edge derivation AND its downstream
gates verbatim and swaps only the closure for a union-find,
cross-validated equal to the recursive original at sf0.01.)

It catches value-domain wrap points the sf0.1 gate can't reach (the
q111 PMI and q24 centroid wraps were both found by hand-analysis at
exactly this kind of scale step; this makes the sweep mechanical).
The recorded per-query result of the most recent completed sweep lives
in SCALE.md ("10x-fixture oracle" section); treat a missing/stale
entry there as "not verified at 10x", not as implied coverage.

Wall-time comparisons of the slowest families still work the same way:

  SPARK_GRAFT_SF_DIR=/root/repo/target/sf10x SPARK_GRAFT_CPUS=16 \
    SPARK_GRAFT_BENCH_ONLY=q72_stream_reconcile,q82_semantic_dedup,q104_pca_power \
    sbt -batch "runMain graft.Bench"   # compare against the same at sf0.1

Everything is hash-derived (no RNG), so the fixture is reproducible.
"""
import os, shutil
import duckdb

OUT = "/root/repo/target/sf10x"
SRC = "/root/testdata/sf0.1"
N_DOCS = 50000
N_VECS = 20000
DIMS = 64
N_EVENTS = 1000000
N_USERS = 15000

VOCAB = ['a', 'agg', 'batch', 'big', 'column', 'customer', 'data', 'dup',
         'fast', 'filter', 'group', 'hash', 'join', 'key', 'line', 'merge',
         'order', 'part', 'query', 'row', 'scan', 'slow', 'small', 'sort',
         'spark', 'stream', 'table', 'the', 'value', 'vector', 'window']


N_COPIES = 10

# FK-consistent 10x inflation of the relational tables: every key and
# every foreign key in copy c shifts by c*(max(key of the referenced
# table)+1) — the +1 matters because the driver's keys are 0-based, so
# max(key) alone would make copy c's key 0 collide with copy c-1's max
# (9 duplicate boundary keys per table, the round-12 q29 oracle failure).
# With the half-open stride each copy joins only within itself and
# per-key join fan-out is IDENTICAL to sf0.1 — aggregate domains grow
# 10x, join semantics don't. region/nation are TPC-H's fixed dims and
# stay 1x.
INFLATE = {
    "customer": ["c_custkey + {c}*{ck} AS c_custkey", "c_name",
                 "c_nationkey", "c_acctbal", "c_mktsegment"],
    "orders":   ["o_orderkey + {c}*{ok} AS o_orderkey",
                 "o_custkey + {c}*{ck} AS o_custkey", "o_orderstatus",
                 "o_totalprice", "o_orderdate", "o_orderpriority"],
    "lineitem": ["l_orderkey + {c}*{ok} AS l_orderkey",
                 "l_partkey + {c}*{pk} AS l_partkey",
                 "l_suppkey + {c}*{sk} AS l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    "part":     ["p_partkey + {c}*{pk} AS p_partkey", "p_name", "p_brand",
                 "p_type", "p_size", "p_retailprice"],
    "supplier": ["s_suppkey + {c}*{sk} AS s_suppkey", "s_name",
                 "s_nationkey", "s_acctbal"],
}


def inflate_relational(con):
    keys = {
        short: con.execute(
            f"SELECT max({col}) + 1 FROM '{SRC}/{tbl}.parquet'").fetchone()[0]
        for short, tbl, col in (
            ("ck", "customer", "c_custkey"), ("ok", "orders", "o_orderkey"),
            ("pk", "part", "p_partkey"), ("sk", "supplier", "s_suppkey"))}
    for tbl, cols in INFLATE.items():
        selects = " UNION ALL ".join(
            "SELECT " + ", ".join(col.format(c=c, **keys) for col in cols)
            + f" FROM '{SRC}/{tbl}.parquet'" for c in range(N_COPIES))
        # ORDER BY ALL: DuckDB's sort is not stable, so ordering by the
        # shifted key alone left the ~7 lineitem rows per order in
        # run-varying relative order despite the hash-derived values --
        # every column as tiebreaker makes the parquet bytes reproducible.
        con.execute(f"COPY ({selects} ORDER BY ALL) "
                    f"TO '{OUT}/{tbl}.parquet' (FORMAT PARQUET)")


def main():
    os.makedirs(OUT, exist_ok=True)
    for f in os.listdir(SRC):
        if f.endswith(".parquet") and f.replace(".parquet", "") not in (
            list(INFLATE) + ["documents", "embeddings", "events"]):
            shutil.copy(os.path.join(SRC, f), os.path.join(OUT, f))
    con = duckdb.connect()
    inflate_relational(con)
    vocab_rows = ", ".join(f"({i}, '{w}')" for i, w in enumerate(VOCAB))
    con.execute(f"CREATE TABLE vocab(wid INT, w VARCHAR); "
                f"INSERT INTO vocab VALUES {vocab_rows}")
    con.execute(f"""
      CREATE TABLE texts AS
      WITH ids AS (SELECT range::bigint AS doc_id FROM range({N_DOCS})),
      lens AS (
        SELECT doc_id, (8 + hash(doc_id * 31 + 7) % 93)::int AS n_words
        FROM ids),
      w AS (
        SELECT doc_id, u.pos,
          (hash(doc_id * 131071 + u.pos * 7919) % 31)::int AS wid
        FROM lens, LATERAL (SELECT unnest(range(n_words)) AS pos) u)
      SELECT w.doc_id, string_agg(v.w, ' ' ORDER BY w.pos) AS text
      FROM w JOIN vocab v USING (wid) GROUP BY w.doc_id""")
    con.execute(f"""
      COPY (
        SELECT doc_id, text,
          CASE WHEN doc_id % 7 = 0 THEN 'de'
               WHEN doc_id % 5 = 0 THEN 'fr' ELSE 'en' END AS lang,
          'src' || (doc_id % 20)::varchar AS source,
          length(text)::bigint AS n_chars
        FROM texts ORDER BY doc_id
      ) TO '{OUT}/documents.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
      COPY (
        SELECT v.vec_id,
          list_transform(range({DIMS}), d ->
            ((((hash(v.vec_id * 524287 + d * 104729) % 2001)::bigint - 1000)::float
               / 1000.0))) AS embedding,
          (v.vec_id % 10)::int AS label
        FROM (SELECT range::bigint AS vec_id FROM range({N_VECS})) v
        ORDER BY v.vec_id
      ) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
      COPY (
        SELECT k AS event_id,
          TIMESTAMP '2024-01-01 00:00:00'
            + to_microseconds((hash(k * 2654435761 + 17)
                               % 2592000000000)::bigint) AS ts,
          (hash(k * 97 + 5) % {N_USERS})::bigint AS user_id,
          ['view', 'click', 'purchase', 'signup',
           'error'][(hash(k * 13 + 3) % 5 + 1)::int] AS event_type,
          ((hash(k * 31 + 9) % 56022)::bigint / 100.0)::double AS value,
          '{{"k": ' || (hash(k * 7 + 1) % 100)::varchar || '}}' AS props
        FROM (SELECT range::bigint AS k FROM range({N_EVENTS}))
        ORDER BY event_id
      ) TO '{OUT}/events.parquet' (FORMAT PARQUET)""")
    counts = {t: con.execute(
        f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        for t in ("documents", "embeddings", "events", "lineitem",
                  "orders", "customer", "part", "supplier")}
    print(f"wrote {OUT}: " +
          " ".join(f"{t}={n}" for t, n in counts.items()))


if __name__ == "__main__":
    main()
