#!/usr/bin/env python3
"""One-off sf1-equivalent audit fixture (VERDICT r5 item #5).

Generates target/sfaudit/documents.parquet with the SAME schema,
vocabulary and text shape as the driver's testdata, but doc_ids
spanning the full sf1 range [0, 50000):

  - a dense block 0..1999 keeps the planted chain fixtures connected
    (q55's %10==3/+10 chains, q70's %10==7 deep chains need consecutive
    decades present);
  - a sparse tail of 3000 ids (step 16 + hash jitter) covers every
    residue class of the planted modular predicates (%7 %11 %13 %17
    %19 %25 %101 ...) up to 50000 while keeping the quadratic
    recursive-CTE oracles tractable (clique ~200 members, not 2000).

Everything is hash-derived (no RNG), so the fixture is reproducible.
The other tables are copied from sf0.1 so selfcheck's views bind; only
`documents` differs. Usage:

  python3 tools/gen_audit_fixture.py
  SPARK_GRAFT_VERIFY_ONLY=q55,... sbt "runMain graft.Verify \
      /root/repo/target/sfaudit /root/repo/target/verify_audit"
  python3 tools/selfcheck.py /root/repo/target/verify_audit \
      /root/repo/target/sfaudit   # read the q55..q70 lines
"""
import os, shutil, sys
import duckdb

OUT = "/root/repo/target/sfaudit"
SRC = "/root/testdata/sf0.1"

VOCAB = ['a', 'agg', 'batch', 'big', 'column', 'customer', 'data', 'dup',
         'fast', 'filter', 'group', 'hash', 'join', 'key', 'line', 'merge',
         'order', 'part', 'query', 'row', 'scan', 'slow', 'small', 'sort',
         'spark', 'stream', 'table', 'the', 'value', 'vector', 'window']

def main():
    os.makedirs(OUT, exist_ok=True)
    for f in os.listdir(SRC):
        if f.endswith(".parquet") and f != "documents.parquet":
            shutil.copy(os.path.join(SRC, f), os.path.join(OUT, f))
    con = duckdb.connect()
    vocab_rows = ", ".join(f"({i}, '{w}')" for i, w in enumerate(VOCAB))
    con.execute(f"CREATE TABLE vocab(wid INT, w VARCHAR); "
                f"INSERT INTO vocab VALUES {vocab_rows}")
    con.execute("""
      CREATE TABLE ids AS
      SELECT range::bigint AS doc_id FROM range(2000)
      UNION ALL
      SELECT (2000 + k * 16 + hash(k * 77 + 13) % 16)::bigint
      FROM (SELECT range AS k FROM range(3000))""")
    con.execute("""
      CREATE TABLE texts AS
      WITH lens AS (
        SELECT doc_id, (8 + hash(doc_id * 31 + 7) % 93)::int AS n_words
        FROM ids),
      w AS (
        SELECT doc_id, u.pos,
          (hash(doc_id * 131071 + u.pos * 7919) % 31)::int AS wid
        FROM lens, LATERAL (SELECT unnest(range(n_words)) AS pos) u)
      SELECT doc_id, string_agg(v.w, ' ' ORDER BY w.pos) AS text
      FROM w JOIN vocab v USING (wid) GROUP BY doc_id""")
    con.execute(f"""
      COPY (
        SELECT t.doc_id, t.text,
          CASE WHEN hash('L' || t.doc_id) % 20 < 8 THEN 'en'
               WHEN hash('L' || t.doc_id) % 20 < 11 THEN 'de'
               WHEN hash('L' || t.doc_id) % 20 < 14 THEN 'fr'
               WHEN hash('L' || t.doc_id) % 20 < 17 THEN 'es'
               ELSE 'zh' END AS lang,
          'src' || (hash('S' || t.doc_id) % 20) AS source,
          len(t.text)::bigint AS n_chars
        FROM texts t ORDER BY t.doc_id
      ) TO '{OUT}/documents.parquet' (FORMAT PARQUET)""")
    n, lo, hi = con.sql(
        f"SELECT count(*), min(doc_id), max(doc_id) "
        f"FROM '{OUT}/documents.parquet'").fetchone()
    print(f"wrote {n} docs, doc_id [{lo}, {hi}]")

if __name__ == "__main__":
    sys.exit(main())
