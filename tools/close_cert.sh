#!/bin/bash
# Session-close certification — one command that runs every gate the
# SCALE.md close-cert block lists, INCLUDING the sf1 sampled-truth rerun
# for d05/d19 whenever their implementation changed since the last
# certification (the r11 verdict's staleness hazard: sampled_truth.py
# was a manual campaign artifact, so an entry edit could silently
# invalidate the recorded sf1 certification).
#
# Usage: tools/close_cert.sh [sf1Dir]
#   sf1Dir defaults to target/sf1 (generate with
#   `tools/run.sh graft.ScaleUp /root/testdata/sf0.1 target/sf1 10 8`).
# Exit nonzero on any gate failure.
set -uo pipefail
cd "$(dirname "$0")/.."
SF1_DIR="${1:-target/sf1}"
STAMP=tools/.sampled_truth_cert
FAIL=0

echo "=== 1/5 sbt test"
sbt -batch test >/tmp/close_cert_sbt.log 2>&1 \
  || { echo "FAIL: sbt test (see /tmp/close_cert_sbt.log)"; FAIL=1; }
grep -E "Tests: succeeded|All tests passed|TESTS FAILED" /tmp/close_cert_sbt.log | tail -2

echo "=== 2/5 full catalog vs DuckDB oracle at sf0.01"
SPARK_GRAFT_CPUS=8 tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/close_cert_verify \
  >/tmp/close_cert_verify.log 2>&1 \
  || { echo "FAIL: graft.Verify (see /tmp/close_cert_verify.log)"; FAIL=1; }
grep -c "failed" /tmp/close_cert_verify.log >/dev/null && true
python3 tools/check.py /root/testdata/sf0.01 /tmp/close_cert_verify \
  >/tmp/close_cert_check.log 2>&1 \
  || { echo "FAIL: check.py ($(grep -c FAIL /tmp/close_cert_check.log) mismatches, see /tmp/close_cert_check.log)"; FAIL=1; }
tail -1 /tmp/close_cert_check.log

echo "=== 3/5 flagship smoke"
tools/run.sh graft.Smoke 2>/dev/null | tail -1 | grep -q PASS \
  || { echo "FAIL: smoke"; FAIL=1; }

echo "=== 4/5 sf1 sampled truth for d05/d19 (reruns only if their code changed)"
# Certification key: EVERY file d05/d19's plan flows through, not just the
# entry file (VERDICT r12 margin item 2: the stamp keyed on DedupQueries +
# the truth script only, so an edit to the broadcast-lookup expressions,
# the layout widener, the table loader, or the fixture generator would NOT
# invalidate it — the exact staleness class the stamp exists to kill).
CUR=$(cat src/main/scala/graft/dedup/DedupQueries.scala \
          src/main/scala/graft/functions/SortedLongContains.scala \
          src/main/scala/graft/Layout.scala \
          src/main/scala/graft/Tables.scala \
          src/main/scala/graft/ScaleUp.scala \
          tools/sampled_truth.py | md5sum | cut -d' ' -f1)
if [[ -f "$STAMP" && "$(cat "$STAMP")" == "$CUR" ]]; then
  echo "sampled-truth certification current (key $CUR)"
elif [[ ! -d "$SF1_DIR" ]]; then
  echo "FAIL: d05/d19 changed but $SF1_DIR missing — generate it and rerun"
  FAIL=1
else
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g tools/run.sh graft.Verify "$SF1_DIR" \
    /tmp/close_cert_sf1 d05_ngram_jaccard d19_containment \
    >/tmp/close_cert_sf1.log 2>&1 \
    || { echo "FAIL: sf1 Verify (see /tmp/close_cert_sf1.log)"; FAIL=1; }
  if python3 tools/sampled_truth.py "$SF1_DIR" /tmp/close_cert_sf1; then
    echo "$CUR" > "$STAMP"
  else
    echo "FAIL: sampled_truth"
    FAIL=1
  fi
fi

echo "=== 5/5 d10 recursive-CTE oracle pin (DuckDB vs driver-loop replica)"
python3 tools/d10_oracle_pin.py /tmp/close_cert_verify/oracle_sql.json \
  || { echo "FAIL: d10 oracle pin"; FAIL=1; }

[[ $FAIL == 0 ]] && echo "CLOSE-CERT: ALL GREEN" || echo "CLOSE-CERT: FAILURES ABOVE"
exit $FAIL
