#!/bin/bash
# Real-TPU verify pass (VERDICT r3 item 7): drive the user-facing surface
# end-to-end ON THE CHIP — library step, CLI train -> infer -> export ->
# infer-from-export (byte-identical scores), serve smoke, and the edge
# cases from the verify skill — and leave a machine-readable summary.
#
# Designed to run unattended at the tail of tools/run_r4_tpu_queue.sh
# (tiny shapes: each compile is the 20-40 s axon class, not the minutes
# class). Serialized; never run concurrently with anything heavy.
#
# Usage: bash tools/run_tpu_verify.sh [outdir]
set -u
OUT=${1:-/tmp/r4_tpu_verify}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
SUMMARY="$OUT/VERIFY_TPU.json"
WORK=$(mktemp -d)
declare -A RESULT

step() { # name, then command...
  local name=$1; shift
  echo "== verify: $name =="
  if timeout 1200 "$@" >"$OUT/$name.log" 2>&1; then
    RESULT[$name]=pass
  else
    RESULT[$name]="fail(rc=$?)"
  fi
  echo "$name: ${RESULT[$name]}  (log: $OUT/$name.log)"
  tail -3 "$OUT/$name.log"
}

# 1. library train step (bf16) + edge cases (all-pad batch, B=1/T=1,
#    concat rejection) in one interpreter to share the device dial-in
step library_step python - <<'EOF'
import functools, os
import numpy as np, jax, jax.numpy as jnp
import intrepppid_tpu
if os.environ.get("VERIFY_ALLOW_CPU") != "1":  # CPU shakeout escape hatch
    assert jax.devices()[0].platform != "cpu", jax.devices()
net = intrepppid_tpu.intrepppid_network(steps_per_epoch=10, compute_dtype=jnp.bfloat16)
params = net.init(jax.random.PRNGKey(0))
rng = np.random.default_rng(0); B, T = 8, 96
mk = lambda a: jnp.asarray(a.astype(np.int32))
batch = {k: mk(rng.integers(0, 250, size=(B, T))) for k in ("p1","p2","anchor","positive","negative")}
batch["label"] = jnp.asarray((rng.random(B) > .5).astype(np.int32))
step = jax.jit(functools.partial(net.step, train=True))
loss, aux = step(params, batch, jax.random.PRNGKey(1))
print("step:", float(loss), "auroc:", float(aux["auroc"]))
# all-padding batch (max_len=0 edge in the masked scan)
pad = {k: jnp.zeros((B, T), jnp.int32) for k in ("p1","p2","anchor","positive","negative")}
pad["label"] = batch["label"]
loss2, _ = step(params, pad, jax.random.PRNGKey(2))
print("all-pad:", float(loss2))
assert np.isfinite(float(loss2))
# B=1, T=1
one = {k: jnp.ones((1, 1), jnp.int32) for k in ("p1","p2","anchor","positive","negative")}
one["label"] = jnp.ones((1,), jnp.int32)
loss3, _ = jax.jit(functools.partial(net.step, train=True))(params, one, jax.random.PRNGKey(3))
print("B1T1:", float(loss3))
# concat must raise at config time (reference-crash parity)
try:
    intrepppid_tpu.intrepppid_network(steps_per_epoch=1, bi_reduce="concat")
except ValueError as e:
    print("concat rejected OK:", str(e)[:40])
else:
    raise SystemExit("concat was not rejected")
print("LIBRARY VERIFY OK")
EOF

# 1b. learnability probe: the framework must LEARN on this device, not
#     just run (AUROC thresholds inside; ~0.97 CPU scan / ~1.0 TPU Pallas)
step learnability python tools/learnability_probe.py

# 2. CLI train (tiny fixture, 2 epochs) on the chip
step cli_train python -m intrepppid_tpu train e2e_rnn_triplet \
  --ppi_dataset_path tests/fixtures/tiny.h5 \
  --sentencepiece_path tests/fixtures/tiny_spm.model \
  --c_type 3 --num_epochs 2 --batch_size 4 --trunc_len 32 --vocab_size 38 \
  --workers 0 --seed 1 --log_path "$WORK/logs"

RUN_DIR=$(ls -d "$WORK"/logs/*/ 2>/dev/null | grep -v tensorboard | head -1)
CHKPT=$(ls -d "$RUN_DIR"chkpt/*epoch=01* 2>/dev/null | head -1)
echo "checkpoint: $CHKPT"

# 2b. eval the checkpoint on the fixture's test split (architecture
#     hyperparameters auto-read from the run's hyperparams.json)
step cli_eval python -m intrepppid_tpu eval e2e_rnn_triplet \
  --checkpoint_path "$CHKPT" --ppi_dataset_path tests/fixtures/tiny.h5 \
  --sentencepiece_path tests/fixtures/tiny_spm.model --c_type 3 \
  --batch_size 4 --out_path "$WORK/eval_metrics.json"

# 3. infer from the orbax checkpoint
cat > "$WORK/itx.csv" <<'CSV'
itx_id,id_a,id_b
i1,PA,PB
i2,PB,PC
CSV
cat > "$WORK/seqs.fasta" <<'FASTA'
>PA
MKVLAAGITTAK
>PB
MHHATSLLMKVL
>PC
MSSTKKLAVAGH
FASTA
step cli_infer python -m intrepppid_tpu infer from_csv \
  --interactions_path "$WORK/itx.csv" --sequences_path "$WORK/seqs.fasta" \
  --weights_path "$CHKPT" --spm_path tests/fixtures/tiny_spm.model \
  --out_path "$WORK/scores_orbax.csv" --trunc_len 32 --vocab_size 38 \
  --batch_size 4

# 4. export to the reference torch format, infer from the export,
#    and require byte-identical scores
step cli_export python -m intrepppid_tpu export torch_ckpt \
  --checkpoint_path "$CHKPT" --out_path "$WORK/export.ckpt"
step infer_from_export python -m intrepppid_tpu infer from_csv \
  --interactions_path "$WORK/itx.csv" --sequences_path "$WORK/seqs.fasta" \
  --weights_path "$WORK/export.ckpt" --spm_path tests/fixtures/tiny_spm.model \
  --out_path "$WORK/scores_export.csv" --trunc_len 32 --vocab_size 38 \
  --batch_size 4
if [ "${RESULT[infer_from_export]}" = pass ]; then
  if cmp -s "$WORK/scores_orbax.csv" "$WORK/scores_export.csv"; then
    RESULT[export_score_parity]=pass
  else
    RESULT[export_score_parity]=fail
    diff "$WORK/scores_orbax.csv" "$WORK/scores_export.csv" || true
  fi
  echo "export_score_parity: ${RESULT[export_score_parity]}"
fi

# 5. serve smoke: start, health, score, stop by PID (never by pattern)
echo "== verify: serve =="
timeout 900 python -m intrepppid_tpu serve start \
  --weights_path "$CHKPT" --spm_path tests/fixtures/tiny_spm.model \
  --port 8731 --trunc_len 32 --batch_size 4 --vocab_size 38 \
  >"$OUT/serve.log" 2>&1 &
SERVE_PID=$!
SERVE_OK=fail
for i in $(seq 1 150); do
  kill -0 "$SERVE_PID" 2>/dev/null || break  # server died; stop waiting
  if curl -sf -m 2 localhost:8731/healthz >/dev/null 2>&1; then
    BODY=$(curl -sf -m 60 -X POST localhost:8731/score \
      -d '{"pairs": [["MKVLAAGITTAK", "MHHATSLLMKVL"]]}') && \
      echo "score response: $BODY" && \
      echo "$BODY" | grep -q '"probabilities"' && SERVE_OK=pass
    break
  fi
  sleep 4
done
kill "$SERVE_PID" 2>/dev/null
wait "$SERVE_PID" 2>/dev/null
RESULT[serve]=$SERVE_OK
echo "serve: ${RESULT[serve]}  (log: $OUT/serve.log)"

# summary
{
  echo "{"
  first=1
  for k in "${!RESULT[@]}"; do
    [ $first -eq 0 ] && echo ","
    first=0
    printf '  "%s": "%s"' "$k" "${RESULT[$k]}"
  done
  echo ""
  echo "}"
} > "$SUMMARY"
cat "$SUMMARY"
FAILS=$(grep -c fail "$SUMMARY" || true)
echo "TPU verify: $FAILS failing step(s)"
rm -rf "$WORK"
[ "$FAILS" -eq 0 ]
