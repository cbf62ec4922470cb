#!/bin/bash
# Isolated per-entry scale benching (SCALE.md protocol): one JVM per
# entry so no entry runs behind another's un-reclaimed shuffle/broadcast
# garbage.
#
# Protocol defaults (r13 falsification follow-through — d03's w1 spread
# was 9.5-13.2 s on bit-identical plans, and a cold1 sf100 record sat
# BELOW the warm min-of-3 a round later, so neither single-pass mode
# supports an A/B verdict):
#   w3  — warmup + min-of-3 + sync: THE DEFAULT for any A/B or ladder
#         row on entries under ~60 s, and for every load-bearing
#         per-decade exponent.
#   w1  — exploratory only; never cite a w1 number in a verdict.
#   1   — one cold pass: multi-minute entries only (>60 s, where JIT
#         noise is <2% and 4 passes would burn an hour for no
#         information); cold1 rows are NOT comparable across sessions —
#         mark them as such wherever recorded.
# The chosen mode lands in the artifact's protocol_default field, so
# every recorded number carries its own protocol.
#
# Usage: tools/scale_bench.sh <sfDir> <outDir> <mode> <entry> [entry...]
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR=$1; OUT_DIR=$2; MODE=$3; shift 3
mkdir -p "$OUT_DIR"
for e in "$@"; do
  tag=$(basename "$SF_DIR")
  out="$OUT_DIR/${tag}_${e}.json"
  if [[ -s "$out" ]]; then echo "skip $e (exists)"; continue; fi
  echo "=== $e @ $SF_DIR (mode=$MODE)"
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    SPARK_GRAFT_BENCH_PASSES="$MODE" SPARK_GRAFT_BENCH_OUT="$out" \
    tools/run.sh graft.Bench "$e" >/dev/null 2>&1 || echo "FAILED $e"
  cat "$out" 2>/dev/null; echo
done
