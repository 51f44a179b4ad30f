#!/usr/bin/env bash
# One-command 10x-fixture oracle sweep (the SCALE.md "10x-fixture
# oracle" protocol) — run after any Scala change that touches query
# semantics, from a single HEAD build, in one ordering:
#
#   bash tools/run_10x_sweep.sh [workdir]
#
# 1. regenerate target/sf10x and prove it byte-reproducible;
# 2. one graft.Verify dump of all queries (plain java so sbt stays
#    free; requires `sbt Test/compile` beforehand);
# 3. one selfcheck.py invocation (driver-equivalent DuckDB compare,
#    skipping the seven closure-bearing queries);
# 4. cc_oracle.py for those seven (recursive closure swapped for a
#    union-find, cross-validated at sf0.01 — re-run `xval` mode after
#    any oracle SQL change);
# 5. render the per-query markdown table for SCALE.md.
#
# Exits non-zero on the first failing stage. Logs land in $WORK.
set -euo pipefail
cd "$(dirname "$0")/.."
WORK="${1:-/tmp/sweep10x_$(date +%H%M%S)}"
mkdir -p "$WORK"
# closure-bearing set shared with run_gate.sh — single source of truth
SKIP=$(grep -v '^\s*$' tools/cc_queries.txt | paste -sd,)
JAVAOPTS="--add-exports=java.base/sun.nio.ch=ALL-UNNAMED
  --add-opens=java.base/java.nio=ALL-UNNAMED
  --add-opens=java.base/java.util=ALL-UNNAMED
  --add-opens=java.base/java.lang=ALL-UNNAMED
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED
  --add-opens=java.base/sun.security.action=ALL-UNNAMED"

echo "== 1/5 fixture (byte-reproducibility proof)"
[ -d target/sf10x ] && md5sum target/sf10x/*.parquet | sort -k2 > "$WORK/md5_before.txt" || true
python3 tools/gen_scale_fixture.py > "$WORK/gen.log" 2>&1
md5sum target/sf10x/*.parquet | sort -k2 > "$WORK/md5_after.txt"
if [ -s "$WORK/md5_before.txt" ]; then
  diff "$WORK/md5_before.txt" "$WORK/md5_after.txt" > /dev/null \
    && echo "   byte-reproducible" \
    || { echo "   FIXTURE BYTES CHANGED (expected only after a generator edit)"; \
         diff "$WORK/md5_before.txt" "$WORK/md5_after.txt" || true; }
fi

echo "== 2/5 Verify dump -> $WORK/out"
# shellcheck disable=SC2086
java $JAVAOPTS -Xmx96g -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$PWD/target/sf10x" "$WORK/out" > "$WORK/verify.log" 2>&1
# directories only: oracle_sql.json sits beside the query dirs
n=$(find "$WORK/out" -mindepth 1 -maxdepth 1 -type d | wc -l)
echo "   $n outputs"

echo "== 3/5 selfcheck (one invocation, skip=$SKIP)"
python3 tools/selfcheck.py "$WORK/out" "$PWD/target/sf10x" "skip=$SKIP" \
  | tee "$WORK/selfcheck.log" | tail -1

echo "== 4/5 union-find oracle for the closure-bearing set"
# Unbuffered: at 10x this stage runs ~45 min in DuckDB (q55's sym
# table is ~4.1 M edges); with block-buffered stdout into tee it
# printed NOTHING until done and was abandoned mid-run in r17,
# leaving an empty cc.log under a CHANGELOG claim written early.
PYTHONUNBUFFERED=1 python3 tools/cc_oracle.py "$WORK/out" "$PWD/target/sf10x" \
  | tee "$WORK/cc.log"

echo "== 5/5 SCALE.md table -> $WORK/table.md"
python3 tools/sweep_table.py "$WORK/selfcheck.log" "$WORK/cc.log" > "$WORK/table.md"
tail -1 "$WORK/table.md"
# The ONLY sanctioned claim line: derived from the completed table,
# refusing if any stage died early. Paste sweep_claim.py's output into
# CHANGELOG/SCALE verbatim — never hand-write the sweep claim.
python3 tools/sweep_claim.py "$WORK/table.md"
