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

No oracle runs here (DuckDB recursive CTEs would be intractable and the
operators are already hash-gated at sf0.001/sf0.01/sf0.1) - this fixture
exists to MEASURE wall-time scaling of the slowest families (q72, q82,
q104) at 1x vs 10x volume:

  python3 tools/gen_scale_fixture.py
  SPARK_GRAFT_SF_DIR=/root/repo/target/sf10x SPARK_GRAFT_CPUS=16 \
    SPARK_GRAFT_BENCH_ONLY=q72_stream_reconcile,q82_semantic_dedup,q104_pca_power \
    sbt -batch "runMain graft.Bench"   # compare against the same at sf0.1

Everything is hash-derived (no RNG), so the fixture is reproducible.
The other tables are copied from sf0.1 so Tables/selfcheck views bind.
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


def main():
    os.makedirs(OUT, exist_ok=True)
    for f in os.listdir(SRC):
        if f.endswith(".parquet") and f not in (
            "documents.parquet", "embeddings.parquet", "events.parquet"):
            shutil.copy(os.path.join(SRC, f), os.path.join(OUT, f))
    con = duckdb.connect()
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
    n1 = con.execute(f"SELECT count(*) FROM '{OUT}/documents.parquet'").fetchone()[0]
    n2 = con.execute(f"SELECT count(*) FROM '{OUT}/embeddings.parquet'").fetchone()[0]
    n3 = con.execute(f"SELECT count(*) FROM '{OUT}/events.parquet'").fetchone()[0]
    print(f"wrote {OUT}: documents={n1} embeddings={n2} events={n3}")


if __name__ == "__main__":
    main()
