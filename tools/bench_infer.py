"""Offline scoring throughput: pairs/s through the `infer from_csv` CLI.

The reference's proteome-scale surface is `intrepppid infer from_csv`
(/root/reference/intrepppid/cli/infer.py:92-232), which scores pairs one
batch-of-1 forward at a time (the TODO at :216). This framework's infer
batches rows, buckets by token length, K-stacks same-shape batches into
single dispatches and trails CSV writing one dispatch behind the device —
but until round 5 no end-to-end pairs/s number for the CLI itself was
recorded anywhere (the serving bench covers the resident engine, not the
cold-start file-to-file CLI path).

This drives the REAL CLI entry (`Infer.from_csv`) on a synthetic
proteome: FASTA of realistic-length sequences + an interactions CSV, at
the manuscript model shape. Two passes in one process: pass 1 includes
jit tracing/compiles and tokenizing the sequence library; pass 2 shows
the warm-process rate (persistent compilation cache + sequence token
reuse across batches). Wall time is file-to-file: read, tokenize,
dispatch, sigmoid, write.

The last line is machine-readable: ``INFER_BENCH {...json...}``.

Usage: python tools/bench_infer.py  (on the TPU;
INTREPPPID_INFER_SMOKE=1 shrinks shapes for a CPU pre-flight)
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

_SMOKE = os.environ.get("INTREPPPID_INFER_SMOKE") == "1"
TRUNC = 64 if _SMOKE else 1500
VOCAB = 258  # golden_spm.model defines 258 pieces
EMBED = 16 if _SMOKE else 64
BATCH = 4 if _SMOKE else 64
N_SEQS = 24 if _SMOKE else 1200
N_PAIRS = 32 if _SMOKE else 4000
AAS = "ACDEFGHIKLMNPQRSTVWY"


def main():
    import jax

    if _SMOKE:
        jax.config.update("jax_platforms", "cpu")

    from intrepppid_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    from intrepppid_tpu.cli.infer import Infer
    from intrepppid_tpu.models.factory import intrepppid_network
    from intrepppid_tpu.train.checkpoint import CheckpointManager

    spm = Path(__file__).parent.parent / "tests" / "fixtures" / "golden_spm.model"
    rng = np.random.default_rng(7)
    lo, hi = (20, 60) if _SMOKE else (200, 2 * TRUNC)

    tmp = Path(tempfile.mkdtemp(prefix="bench_infer_"))
    fasta = tmp / "proteome.fasta"
    with open(fasta, "w") as f:
        for i in range(N_SEQS):
            seq = "".join(
                rng.choice(list(AAS))
                for _ in range(int(rng.integers(lo, hi)))
            )
            f.write(f">P{i:05d}\n{seq}\n")
    pairs_csv = tmp / "pairs.csv"
    with open(pairs_csv, "w") as f:
        for i in range(N_PAIRS):
            a, b = rng.integers(N_SEQS), rng.integers(N_SEQS)
            f.write(f"itx{i},P{a:05d},P{b:05d}\n")

    # manuscript-shape weights as a real orbax checkpoint (what a trained
    # run leaves behind; infer's loader path is identical either way)
    net = intrepppid_network(0, vocab_size=VOCAB, embedding_size=EMBED)
    params = net.init(jax.random.PRNGKey(0))
    mgr = CheckpointManager(tmp / "chkpt", "bench")
    ckpt = mgr.save({"params": params}, 0, 0.0)

    results = {
        "trunc_len": TRUNC, "batch": BATCH, "n_seqs": N_SEQS,
        "n_pairs": N_PAIRS,
    }
    for tag in ("cold", "warm"):
        out = tmp / f"scores_{tag}.csv"
        t0 = time.perf_counter()
        n = Infer.from_csv(
            interactions_path=pairs_csv,
            sequences_path=fasta,
            weights_path=ckpt,
            spm_path=spm,
            out_path=out,
            trunc_len=TRUNC,
            batch_size=BATCH,
            vocab_size=VOCAB,
            embedding_size=EMBED,
        )
        dt = time.perf_counter() - t0
        assert n == N_PAIRS
        lines = out.read_text().strip().splitlines()
        assert len(lines) == N_PAIRS
        results[f"{tag}_s"] = round(dt, 1)
        results[f"{tag}_pairs_per_s"] = round(N_PAIRS / dt)
        print(f"infer from_csv [{tag}]: {N_PAIRS / dt:.0f} pairs/s "
              f"({dt:.1f} s / {N_PAIRS} pairs, file-to-file)", flush=True)

    print("INFER_BENCH " + json.dumps(results))


if __name__ == "__main__":
    main()
