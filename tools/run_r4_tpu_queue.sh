#!/bin/bash
# Serialized TPU work queue for round 4 (VERDICT r3 next-round items 1 + 5):
# the three decision-pending kernel experiments, the scaled-config
# measurement, then the benchmark. Each step is independently bounded and
# logged; a failed step does not block the next (bench last so its numbers
# reflect whatever defaults are in the tree when it runs).
#
# NEVER run anything else heavy concurrently on this 1-core host.
#
# Usage: bash tools/run_r4_tpu_queue.sh [outdir]
set -u
OUT=${1:-/tmp/r4_tpu_queue}
# cd FIRST so a relative outdir resolves to the same place for this mkdir
# and for every log redirect below (they run from the repo root)
cd "$(dirname "$0")/.."
mkdir -p "$OUT"

# This host has ONE core: starting measurements while something heavy runs
# (a pytest suite, a build) contaminates every number. Wait (bounded 30 min)
# for the 1-minute load average to settle before the first experiment.
for i in $(seq 1 60); do
  load=$(cut -d' ' -f1 /proc/loadavg)
  if awk -v l="$load" 'BEGIN{exit !(l < 0.8)}'; then break; fi
  echo "host busy (load $load); delaying measurements ($i/60)"
  sleep 30
done

# Insurance against a short tunnel window: capture ONE bench number first
# (current defaults). The decisive bench still runs after the experiments
# apply their measured defaults; refresh falls back to this log only if
# that one failed.
echo "== early bench (insurance) =="
timeout 2400 python bench.py >"$OUT/bench_early.log" 2>&1
echo "bench_early rc=$? (log: $OUT/bench_early.log)"
tail -3 "$OUT/bench_early.log"

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

echo "== scaled_config experiment =="
timeout 2400 python tools/experiment_scaled_config.py \
  >"$OUT/scaled_config.log" 2>&1
echo "scaled_config rc=$? (log: $OUT/scaled_config.log)"
tail -10 "$OUT/scaled_config.log"

echo "== apply measured defaults (pack_boundary + dispatch K) =="
timeout 300 python tools/apply_queue_decisions.py "$OUT" --apply \
  >"$OUT/apply.log" 2>&1
echo "apply rc=$? (log: $OUT/apply.log; decisions: $OUT/DECISIONS.json)"
tail -6 "$OUT/apply.log"

echo "== bench =="
timeout 3600 python bench.py >"$OUT/bench.log" 2>&1
echo "bench rc=$? (log: $OUT/bench.log)"
tail -3 "$OUT/bench.log"

echo "== refresh perf claims from the captured bench =="
BENCH_LOG="$OUT/bench.log"
if ! grep -q '"metric"' "$BENCH_LOG" 2>/dev/null; then
  echo "decisive bench has no JSON line; falling back to bench_early.log"
  BENCH_LOG="$OUT/bench_early.log"
fi
timeout 300 python tools/refresh_perf_claims.py "$BENCH_LOG" --apply \
  >"$OUT/refresh_claims.log" 2>&1
echo "refresh rc=$? (log: $OUT/refresh_claims.log)"
tail -8 "$OUT/refresh_claims.log"

echo "== serve bench (informational, after the critical items) =="
timeout 1800 python tools/bench_serve.py >"$OUT/bench_serve.log" 2>&1
echo "bench_serve rc=$? (log: $OUT/bench_serve.log)"
tail -6 "$OUT/bench_serve.log"

echo "== on-chip verify pass (library + CLI train/infer/export/serve) =="
timeout 5400 bash tools/run_tpu_verify.sh "$OUT/verify"
echo "tpu_verify rc=$? (summary: $OUT/verify/VERIFY_TPU.json)"
