#!/bin/bash
# Isolated per-entry scale benching (SCALE.md protocol): one JVM per
# entry so no entry runs behind another's un-reclaimed shuffle/broadcast
# garbage. Mode w1 (warmup + one measured pass) for entries under ~30 s;
# mode 1 (one cold pass) for multi-minute entries where JIT noise is
# negligible and a warmup pass would double the wall for no information.
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
