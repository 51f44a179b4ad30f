#!/usr/bin/env bash
# 30x slope stage (VERDICT r18 #4) — regenerate the 30x documents
# fixture byte-reproducibly, run the corpus-build family's union-find
# oracle at 30x, measure the family's isolated walls at all three
# scales (sf0.1 / 10x / 30x), and compare the interval ratios against
# the recorded slopes. Env-gated sibling of run_gate.sh's BENCH_ISO
# stage — run it after any change to the corpus family's plans, on a
# quiet machine (ratios are load-robust within a session, but the
# absolute walls feed the SCALE.md history table).
#
#   bash tools/run_slope30x.sh [workdir]
#
# 1. target/sf10x + target/sf30x regenerated, byte-reproducibility
#    proved (md5 diff when a previous fixture exists);
# 2. Verify dump of the four slope-bearing queries at 30x +
#    cc_oracle.py union-find compare (PASS required);
# 3. isolated fresh-JVM bench (min-of-3 per child) of the four at
#    sf0.1, 10x, 30x;
# 4. tools/slope_check.py vs tools/slope30x_baseline.json — fails on
#    a super-linear interval (the instrument that caught q153's
#    occurrence-grain join in round 18). After an INTENTIONAL plan
#    change, re-run with UPDATE_BASELINE=1 and commit the new json +
#    the table into SCALE.md's slope history.
set -euo pipefail
cd "$(dirname "$0")/.."
WORK="${1:-/tmp/slope30x_$(date +%H%M%S)}"
mkdir -p "$WORK"
SLOPE_QUERIES="q68_corpus_build,q72_stream_reconcile,q153_corpus_build_novelty,q154_stream_reconcile_novelty"
JAVAOPTS="--add-exports=java.base/sun.nio.ch=ALL-UNNAMED
  --add-opens=java.base/java.nio=ALL-UNNAMED
  --add-opens=java.base/java.util=ALL-UNNAMED
  --add-opens=java.base/java.lang=ALL-UNNAMED
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED
  --add-opens=java.base/sun.security.action=ALL-UNNAMED"

echo "== 1/4 fixtures (byte-reproducibility proof)"
[ -d target/sf10x ] || python3 tools/gen_scale_fixture.py > "$WORK/gen10x.log" 2>&1
[ -d target/sf30x ] && md5sum target/sf30x/documents.parquet > "$WORK/md5_before.txt" || true
python3 tools/gen_docs_fixture.py > "$WORK/gen30x.log" 2>&1
md5sum target/sf30x/documents.parquet > "$WORK/md5_after.txt"
if [ -s "$WORK/md5_before.txt" ]; then
  diff "$WORK/md5_before.txt" "$WORK/md5_after.txt" > /dev/null \
    && echo "   byte-reproducible" \
    || { echo "   30x FIXTURE BYTES CHANGED (expected only after a generator edit)"; \
         diff "$WORK/md5_before.txt" "$WORK/md5_after.txt" || true; }
fi

echo "== 2/4 30x correctness (Verify dump + union-find oracle)"
# shellcheck disable=SC2086
SPARK_GRAFT_VERIFY_ONLY="$SLOPE_QUERIES" SPARK_GRAFT_CPUS=16 \
  java $JAVAOPTS -Xmx96g -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$PWD/target/sf30x" "$WORK/out30x" > "$WORK/verify30x.log" 2>&1
PYTHONUNBUFFERED=1 python3 tools/cc_oracle.py "$WORK/out30x" "$PWD/target/sf30x" \
    "only=$SLOPE_QUERIES" | tee "$WORK/cc30x.log"
grep -q "FAIL" "$WORK/cc30x.log" && { echo "   30x ORACLE FAIL"; exit 1; }

echo "== 3/4 isolated walls at sf0.1 / 10x / 30x"
for sc in sf1:/root/testdata/sf0.1 sf10:$PWD/target/sf10x sf30:$PWD/target/sf30x; do
  tag="${sc%%:*}"; dir="${sc#*:}"
  echo "   $tag ($dir)"
  # shellcheck disable=SC2086
  SPARK_GRAFT_BENCH_ISOLATE="$SLOPE_QUERIES" SPARK_GRAFT_CPUS=16 \
    SPARK_GRAFT_SF_DIR="$dir" \
    SPARK_GRAFT_BENCH_OUT="$WORK/bench_$tag.json" \
    java $JAVAOPTS -Xmx96g -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Bench > "$WORK/bench_$tag.log" 2>&1 \
    || { echo "   FAIL:"; tail -5 "$WORK/bench_$tag.log"; exit 1; }
  tail -1 "$WORK/bench_$tag.log"
done

echo "== 4/4 slope table vs recorded baseline"
upd=""
[ "${UPDATE_BASELINE:-0}" = "1" ] && upd="--update-baseline"
python3 tools/slope_check.py tools/slope30x_baseline.json \
  "$WORK/bench_sf1.json" "$WORK/bench_sf10.json" "$WORK/bench_sf30.json" \
  $upd | tee "$WORK/slope_table.md"

echo "== SLOPE PASS ($WORK)"
