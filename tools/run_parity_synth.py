"""Execute the accuracy-parity harness end-to-end on synthetic data.

VERDICT r4 missing #3 / next-round #8: real-artifact parity (AUROC within
0.005 of the reference's published runs, BASELINE.json) stays blocked on
data/weights absent from this image, but the harness itself —
``tools/parity.py run`` + ``compare`` — had only harness-level tests
behind it. This script gives it one real execution:

1. **reference side**: train the plain-torch replica of the reference
   network (`tests/torch_reference.py`, reference step semantics from
   `/root/reference/intrepppid/e2e/e2e_triplet.py:43-187`) on the
   motif-planted ``tests/fixtures/learnable.h5`` with all model-level
   dropouts ON, logging a reference-schema ``metrics.json``
   (epoch metrics = batch-size-weighted means of batch-level values, the
   reference's torchmetrics aggregation quirk);
2. **ours**: ``tools/parity.py run`` on the same HDF5 / tokenizer /
   seed / config;
3. ``tools/parity.py compare`` on the two metrics files -> committed
   report.

Config notes: shapes shrink to the CPU-feasible fixture scale (vocab 38,
trunc 64, embedding 16, batch 16) and the optimizer is ``adamw`` — one of
the reference's supported variants — because Ranger21's AGC/stable-decay
interaction is intentionally conservative at toy gradient scales
(`optim/ranger21.py` docstring; same choice as tests/test_learnability).
Both systems run their OWN dropout RNG streams, so this is the
distributional regime: the gate is a documented synthetic-scale AUROC
band (0.05), not the 0.005 real-artifact contract, which remains carried
until the reference's data/weights are available. The 0.005-budget
comparison is still printed for the record. Losses are reported but not
gated in the synthetic arm (``--loss_rel_budget`` wide open): once both
sides converge the fixture (AUROC ~1.0 by epoch ~20), absolute BCE on
the 144-pair val split is dominated by each side's independent
dropout-RNG history — a 5% relative band on a ~0.1-absolute quantity
gates noise, not parity. The real-artifact arm keeps the strict default.

Usage: python tools/run_parity_synth.py [outdir]  (CPU; ~5 min)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

FIXTURES = REPO / "tests" / "fixtures"

SEED = 8675309
EPOCHS = 30
BATCH = 16
TRUNC = 64
VOCAB = 38
EMBED = 16
BETA = 4.0
LR = 3e-3
OPT = "adamw"


def _dm():
    from intrepppid_tpu.data.ppi_oma import IntrepppidDataModule

    dm = IntrepppidDataModule(
        batch_size=BATCH,
        dataset_path=FIXTURES / "learnable.h5",
        c_type=3,
        trunc_len=TRUNC,
        workers=0,
        vocab_size=VOCAB,
        model_file=FIXTURES / "tiny_spm.model",
        seed=SEED,
        sos=False,
        eos=False,
        negative_omid=True,
    )
    dm.setup()
    return dm


def torch_reference_run(out_path: Path) -> None:
    import numpy as np
    import torch

    from intrepppid_tpu.ops.metrics import all_binary_metrics
    from torch_reference import TorchTripletReplica

    import jax.numpy as jnp

    dm = _dm()
    torch.manual_seed(SEED)
    replica = TorchTripletReplica(
        embedding_size=EMBED,
        vocab_size=VOCAB,
        rnn_num_layers=2,
        bi_reduce="last",
        use_projection=False,
        beta_classifier=BETA,
        embedding_droprate=0.3,
        rnn_dropout_rate=0.3,
        do_rate=0.3,
    )
    torch.manual_seed(SEED + 777)
    opt = torch.optim.AdamW(replica.parameters(), lr=LR)

    def to_torch(b):
        tb = {
            k: torch.tensor(np.asarray(b[k], np.int64))
            for k in ("p1", "p2", "anchor", "positive", "negative")
        }
        tb["label"] = torch.tensor(np.asarray(b["label"], np.int64))
        return tb

    def eval_split(batches):
        """Batch-size-weighted epoch means (the reference aggregation
        quirk — quirk #14 in SURVEY.md) of loss + the five binary
        metrics, computed with the same exact-torchmetrics-semantics
        implementation the jax side logs with."""
        replica.eval()
        sums, wsum = defaultdict(float), 0.0
        with torch.no_grad():
            for b in batches:
                tb = to_torch(b)
                w = float(len(b["label"]))
                loss, logits, bce, trip = replica.step_loss(tb)
                m = all_binary_metrics(
                    jnp.asarray(logits.numpy()),
                    jnp.asarray(np.asarray(b["label"], np.float32)),
                )
                sums["loss"] += float(loss) * w
                sums["classifier_loss"] += float(bce) * w
                sums["triplet_loss"] += float(trip) * w
                for k, v in m.items():
                    sums[k] += float(v) * w
                wsum += w
        replica.train()
        return {k: v / wsum for k, v in sums.items()}

    metrics = defaultdict(list)
    step = 0
    for epoch in range(EPOCHS):
        replica.train()
        for b in dm.train_batches(epoch):
            tb = to_torch(b)
            loss, logits, bce, trip = replica.step_loss(tb)
            opt.zero_grad()
            loss.backward()
            opt.step()
            metrics["train_loss"].append(
                {"value": float(loss.detach()), "step": step}
            )
            step += 1
        vals = eval_split(dm.val_batches())
        for k, v in vals.items():
            metrics[f"val_{k}"].append({"value": v, "epoch": epoch})
        print(
            f"[torch] epoch {epoch}: val_loss {vals['loss']:.4f} "
            f"val_auroc {vals['auroc']:.4f}",
            flush=True,
        )
    tests = eval_split(dm.test_batches())
    for k, v in tests.items():
        metrics[f"test_{k}"].append({"value": v, "epoch": EPOCHS - 1})
    print(f"[torch] test: " + json.dumps(tests), flush=True)

    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(dict(metrics), indent=1))
    print(f"[torch] metrics written to {out_path}", flush=True)


def main():
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else (
        REPO / "measurements" / "parity_synth"
    )
    out.mkdir(parents=True, exist_ok=True)
    if not (FIXTURES / "learnable.h5").exists():
        subprocess.run(
            [sys.executable, str(FIXTURES / "make_fixtures.py")], check=True
        )

    ref_json = out / "ref_metrics.json"
    ours_json = out / "ours_metrics.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)

    if not ref_json.exists():
        # subprocess so the torch side also gets a CPU-pinned jax (the
        # metric helper) without touching this interpreter's backend
        subprocess.run(
            [sys.executable, __file__, "--torch-side", str(ref_json)],
            env=env, cwd=str(REPO), check=True,
        )
    else:
        print(f"[skip] {ref_json} exists")

    if not ours_json.exists():
        subprocess.run(
            [
                sys.executable, "tools/parity.py", "run",
                "--ppi_dataset_path", str(FIXTURES / "learnable.h5"),
                "--sentencepiece_path", str(FIXTURES / "tiny_spm.model"),
                "--out", str(ours_json),
                "--c_type", "3",
                "--num_epochs", str(EPOCHS),
                "--batch_size", str(BATCH),
                "--seed", str(SEED),
                "--vocab_size", str(VOCAB),
                "--trunc_len", str(TRUNC),
                "--embedding_size", str(EMBED),
                "--beta_classifier", str(BETA),
                "--lr", str(LR),
                "--optimizer_type", OPT,
                "--precision", "fp32",
                "--workers", "0",
                "--log_path", str(out / "jax_logs"),
            ],
            env=env, cwd=str(REPO), check=True,
        )
    else:
        print(f"[skip] {ours_json} exists")

    report = []
    rcs = {}
    for budget, loss_budget, tag in (
        (0.05, 1e9, "synthetic-scale gate"),
        (0.005, 0.05, "real-artifact contract, for the record"),
    ):
        proc = subprocess.run(
            [
                sys.executable, "tools/parity.py", "compare",
                "--ours", str(ours_json),
                "--reference", str(ref_json),
                "--auroc_budget", str(budget),
                "--loss_rel_budget", str(loss_budget),
            ],
            env=env, cwd=str(REPO), capture_output=True, text=True,
        )
        rcs[tag] = proc.returncode
        report.append(f"=== compare at auroc_budget {budget} ({tag}) "
                      f"-> rc={proc.returncode}\n{proc.stdout}")
        print(report[-1], flush=True)
    (out / "report.txt").write_text("\n".join(report))
    print(f"PARITY_SYNTH rc_gate={rcs['synthetic-scale gate']} "
          f"(report: {out / 'report.txt'})", flush=True)
    return rcs["synthetic-scale gate"]


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--torch-side":
        torch_reference_run(Path(sys.argv[2]))
    else:
        raise SystemExit(main())
