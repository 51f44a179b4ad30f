#!/usr/bin/env python3
"""Documents-scaled fixture for the corpus-build family's wall-ratio
SLOPE measurement (VERDICT r17 #6): target/sf{MULT}x with N_DOCS
documents from the SAME hash-derived text generator as
gen_scale_fixture.py (so plantings and value domains are identical in
kind, only multiplicity grows), every other table copied verbatim
from target/sf10x (the corpus family q68/q72/q153/q154 reads ONLY
documents; the copies keep the directory a complete table set for
Verify/Bench/selfcheck).

A 10x point alone cannot distinguish "wall grows ~3.4x per 10x data"
from a hidden super-linear term that happens to pass once; the 30x
point gives the slope two intervals. Usage:

  python3 tools/gen_docs_fixture.py [n_docs] [out_dir]
  # defaults: 150000 (30x sf0.1's 5000 docs), /root/repo/target/sf30x

Requires target/sf10x (run gen_scale_fixture.py first). Hash-derived,
no RNG — byte-reproducible like the 10x fixture.
"""
import os
import shutil
import sys

import duckdb

SRC10X = "/root/repo/target/sf10x"

VOCAB = ['a', 'agg', 'batch', 'big', 'column', 'customer', 'data', 'dup',
         'fast', 'filter', 'group', 'hash', 'join', 'key', 'line', 'merge',
         'order', 'part', 'query', 'row', 'scan', 'slow', 'small', 'sort',
         'spark', 'stream', 'table', 'the', 'value', 'vector', 'window']


def main(n_docs, out):
    assert os.path.isdir(SRC10X), \
        f"{SRC10X} missing — run tools/gen_scale_fixture.py first"
    os.makedirs(out, exist_ok=True)
    for f in os.listdir(SRC10X):
        if f.endswith(".parquet") and f != "documents.parquet":
            shutil.copy(os.path.join(SRC10X, f), os.path.join(out, f))
    con = duckdb.connect()
    vocab_rows = ", ".join(f"({i}, '{w}')" for i, w in enumerate(VOCAB))
    con.execute(f"CREATE TABLE vocab(wid INT, w VARCHAR); "
                f"INSERT INTO vocab VALUES {vocab_rows}")
    con.execute(f"""
      CREATE TABLE texts AS
      WITH ids AS (SELECT range::bigint AS doc_id FROM range({n_docs})),
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
      ) TO '{out}/documents.parquet' (FORMAT PARQUET)""")
    n = con.execute(
        f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()[0]
    print(f"wrote {out}: documents={n} (other tables copied from sf10x)")


if __name__ == "__main__":
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 150000
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/sf30x"
    main(n_docs, out)
