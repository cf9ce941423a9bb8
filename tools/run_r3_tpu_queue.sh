#!/bin/bash
# Serialized TPU work queue for round 3: run the two pending kernel
# experiments, then refresh the benchmark. Designed to survive a flaky
# tunnel: each step is independently bounded and logged; a failed step
# does not block the next (bench last so its numbers reflect whatever
# defaults are in the tree when it runs).
#
# Usage: bash tools/run_r3_tpu_queue.sh [outdir]
set -u
OUT=${1:-/tmp/r3_tpu_queue}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

echo "== pack_boundary experiment =="
timeout 2400 python tools/experiment_pack_boundary.py \
  >"$OUT/pack_boundary.log" 2>&1
echo "pack_boundary rc=$? (log: $OUT/pack_boundary.log)"
tail -12 "$OUT/pack_boundary.log"

echo "== bwd_chunk experiment =="
timeout 2400 python tools/experiment_bwd_chunk.py \
  >"$OUT/bwd_chunk.log" 2>&1
echo "bwd_chunk rc=$? (log: $OUT/bwd_chunk.log)"
tail -12 "$OUT/bwd_chunk.log"

echo "== dispatch_k experiment =="
timeout 2400 python tools/experiment_dispatch_k.py \
  >"$OUT/dispatch_k.log" 2>&1
echo "dispatch_k rc=$? (log: $OUT/dispatch_k.log)"
tail -8 "$OUT/dispatch_k.log"

echo "== bench =="
timeout 3600 python bench.py >"$OUT/bench.log" 2>&1
echo "bench rc=$? (log: $OUT/bench.log)"
tail -3 "$OUT/bench.log"
