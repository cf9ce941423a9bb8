#!/bin/bash
# Serialized, RESUMABLE TPU work queue for round 5 (VERDICT r4 items 1, 2,
# 4, 6). The r4 queue died 2-of-7 stages in because every rerun restarted
# from scratch; here each stage is skipped when its log already ends in a
# verdict (or its .ok marker exists), so a short tunnel window always makes
# net progress. Logs live in the repo (measurements/r5_queue) so they
# survive the session.
#
# Stage order = VERDICT priority: the decision-pending kernel experiments
# and the scaled-config number first, then decisions -> decisive bench ->
# claim refresh, then the serving bench and the cold-start attribution,
# and the on-chip CLI verify pass last (longest, least decision-bearing).
#
# NEVER run anything else heavy concurrently on this 1-core host.
#
# Usage: bash tools/run_r5_tpu_queue.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-measurements/r5_queue}
mkdir -p "$OUT"

# One core: wait (bounded 15 min) for the load average to settle so the
# first measurements aren't contaminated.
for i in $(seq 1 30); do
  load=$(cut -d' ' -f1 /proc/loadavg)
  if awk -v l="$load" 'BEGIN{exit !(l < 0.8)}'; then break; fi
  echo "host busy (load $load); delaying measurements ($i/30)"
  sleep 30
done

# run_stage NAME TIMEOUT DONE_REGEX CMD...
# Skips when $OUT/NAME.ok exists or the existing log already matches
# DONE_REGEX (a prior session finished the tool but died before the
# marker). Writes NAME.ok only on rc=0 AND a matching log.
run_stage() {
  local name=$1 t=$2 done_re=$3; shift 3
  local log="$OUT/$name.log"
  if [ -f "$OUT/$name.ok" ]; then
    echo "== $name: SKIP (marker) =="; return 0
  fi
  if [ -s "$log" ] && grep -qE "$done_re" "$log"; then
    echo "== $name: SKIP (log already has verdict) =="
    touch "$OUT/$name.ok"; return 0
  fi
  echo "== $name =="
  timeout "$t" "$@" >"$log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ] && grep -qE "$done_re" "$log"; then
    touch "$OUT/$name.ok"
  fi
  echo "$name rc=$rc (log: $log)"
  tail -6 "$log"
  return $rc
}

commit_progress() { # best-effort durability after each stage
  git add -A "$OUT" 2>/dev/null
  git diff --cached --quiet 2>/dev/null || \
    git commit -q -m "r5 TPU queue: $1" 2>/dev/null
}

run_stage bwd_chunk 2400 'shift-copy cost' \
  python tools/experiment_bwd_chunk.py
commit_progress "bwd_chunk measured"

run_stage dispatch_k 2400 'K=[0-9]+: best [0-9.]+ ms/step' \
  python tools/experiment_dispatch_k.py
commit_progress "dispatch_k measured"

run_stage scaled_config 2400 'best: [0-9.]+ ms/step' \
  python tools/experiment_scaled_config.py
commit_progress "scaled_config measured"

# decisions (DECISIONS.json + applied defaults; commits internally).
# pack_boundary was measured by the r4 queue — seed its log so the
# decision record covers it too.
[ -f "$OUT/pack_boundary.log" ] || \
  cp measurements/r4/pack_boundary.log "$OUT/" 2>/dev/null
if [ ! -f "$OUT/DECISIONS.json" ]; then
  echo "== apply measured defaults =="
  timeout 300 python tools/apply_queue_decisions.py "$OUT" --apply \
    >"$OUT/apply.log" 2>&1
  echo "apply rc=$? (decisions: $OUT/DECISIONS.json)"
  tail -6 "$OUT/apply.log"
else
  echo "== apply: SKIP (DECISIONS.json exists) =="
fi
commit_progress "decisions applied"

run_stage bench 3600 '"metric"' python bench.py
commit_progress "decisive bench"

# refresh claims from the decisive bench (idempotent; commits internally)
BENCH_LOG="$OUT/bench.log"
if ! grep -q '"metric"' "$BENCH_LOG" 2>/dev/null; then
  echo "decisive bench has no JSON line; falling back to BENCH_r04.json"
  BENCH_LOG="BENCH_r04.json"
fi
echo "== refresh perf claims =="
timeout 300 python tools/refresh_perf_claims.py "$BENCH_LOG" --apply \
  >"$OUT/refresh_claims.log" 2>&1
echo "refresh rc=$? (log: $OUT/refresh_claims.log)"
tail -8 "$OUT/refresh_claims.log"

run_stage serve_bench 2400 'SERVE_BENCH' python tools/bench_serve.py
commit_progress "serving bench"

run_stage cold_start 3600 'COLD_START_SUMMARY' \
  python tools/experiment_cold_start.py
commit_progress "cold-start attribution"

# on-chip verify pass (library + CLI train/infer/export/serve); its own
# summary file is the done marker
if [ ! -f "$OUT/verify/VERIFY_TPU.json" ]; then
  echo "== on-chip verify pass =="
  timeout 5400 bash tools/run_tpu_verify.sh "$OUT/verify"
  echo "tpu_verify rc=$? (summary: $OUT/verify/VERIFY_TPU.json)"
else
  echo "== verify: SKIP (VERIFY_TPU.json exists) =="
fi
commit_progress "on-chip verify"

echo "== r5 queue complete =="
ls -la "$OUT"
