"""Measured torch baseline point (VERDICT r2 missing #4).

Times the REFERENCE-shaped torch model on this host's CPU at the manuscript
shape (batch 80, trunc_len 1500, vocab 250, embedding 64, 2-layer bi-LSTM):
one full quintuplet train step = 5 encoder forwards with WeightDrop-style
weight re-materialisation + embedding dropout + head dropout, triplet +
BCE beta-loss, backward, and an AdamW update. This reproduces the
reference's compute graph faithfully, including the WeightDrop trait that
matters for performance — the recurrent weight is re-dropped on every
forward, which is exactly what forces torch's LSTM off the fused path
(`intrepppid/utils/weightdrop.py:55-57`). AdamW stands in for Ranger21
(the pinned package is not installable here); Ranger21 does strictly more
work per step, so the anchor is conservative (torch would be slower).

With --jax, also times OUR framework's train step on the same host CPU at
the same shape (scan fallback path, fp32) for a same-host, same-shape
ratio that needs no cross-hardware extrapolation.

Usage: python tools/baseline_torch.py [--steps N] [--jax]
Prints one JSON line; numbers are recorded in BASELINE.md.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

BATCH, TRUNC, VOCAB, E = 80, 1500, 250, 64


def make_batch(rng):
    """Same length distribution as bench.py: ~half the window filled."""
    batch = {}
    for k in ("p1", "p2", "anchor", "positive", "negative"):
        a = rng.integers(1, VOCAB, size=(BATCH, TRUNC))
        lens = rng.integers(TRUNC // 2, TRUNC + 1, size=BATCH)
        lens[0] = TRUNC
        for i, l in enumerate(lens):
            a[i, l:] = 0
        batch[k] = a.astype(np.int64)
    batch["label"] = (rng.random(BATCH) > 0.5).astype(np.int64)
    return batch


def bench_torch(n_steps: int) -> float:
    import torch
    import torch.nn.functional as F
    from torch import nn

    torch.manual_seed(0)

    class Encoder(nn.Module):
        """Reference AWDLSTMEncoder semantics incl. the stochastic path:
        embedding dropout (vocab-row mask), WeightDrop re-materialisation
        of weight_hh_l0 per forward, dynamic truncation, bi_reduce=last."""

        def __init__(self):
            super().__init__()
            self.embedder = nn.Embedding(VOCAB, E, padding_idx=0)
            self.rnn = nn.LSTM(E, E, 2, bidirectional=True, batch_first=True)
            # WeightDrop: the raw parameter replaces weight_hh_l0
            w = self.rnn.weight_hh_l0
            del self.rnn._parameters["weight_hh_l0"]
            self.weight_hh_l0_raw = nn.Parameter(w.data)
            self.fc = nn.Linear(E, E)

        def forward(self, x):
            max_len = int(torch.max(torch.sum(x != 0, dim=1)))
            x = x[:, :max_len]
            # embedding dropout: Bernoulli row mask over the vocab dim
            mask = (
                torch.rand(VOCAB, 1) > 0.3
            ).float() / 0.7
            emb_w = self.embedder.weight * mask
            e = F.embedding(x, emb_w, padding_idx=0)
            # WeightDrop re-materialisation (per forward, like the reference)
            self.rnn._parameters["weight_hh_l0"] = F.dropout(
                self.weight_hh_l0_raw, p=0.3, training=True
            )
            _, (hn, _) = self.rnn(e)
            return self.fc(hn[-1])

    class Head(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = nn.Linear(E, E // 2)
            self.fc2 = nn.Linear(E // 2, 1)
            self.mish = nn.Mish()
            self.do = nn.Dropout(0.3)

        def forward(self, z1, z2):
            x = self.mish((z1 + z2) / 2)
            # WeightDrop (DropConnect) on both Linear weights, per forward
            x = F.linear(x, F.dropout(self.fc1.weight, 0.3, True), self.fc1.bias)
            x = self.do(self.mish(self.do(self.mish(x))))
            return F.linear(x, F.dropout(self.fc2.weight, 0.3, True), self.fc2.bias)

    enc, head = Encoder(), Head()
    params = list(enc.parameters()) + list(head.parameters())
    opt = torch.optim.AdamW(params, lr=1e-2)
    rng = np.random.default_rng(0)
    b = {k: torch.tensor(v) for k, v in make_batch(rng).items()}

    def step():
        opt.zero_grad()
        z_a, z_p, z_n = enc(b["anchor"]), enc(b["positive"]), enc(b["negative"])
        triplet = F.triplet_margin_loss(z_a, z_p, z_n, margin=1.0, p=2)
        logits = head(enc(b["p1"]), enc(b["p2"])).squeeze(-1)
        bce = F.binary_cross_entropy_with_logits(logits, b["label"].float())
        loss = 0.5 * bce + 0.5 * triplet
        loss.backward()
        opt.step()
        return float(loss.detach())

    step()  # warmup
    times = []
    for _ in range(n_steps):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    best = min(times)
    return BATCH / best


def bench_jax(n_steps: int) -> float:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from intrepppid_tpu.models.factory import intrepppid_network
    from intrepppid_tpu.models.triplet import step as triplet_step
    from intrepppid_tpu.optim import make_optimizer

    net = intrepppid_network(steps_per_epoch=100, num_epochs=100)
    params = net.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer("adamw", 1e-2, 100, 100)
    opt_state = optimizer.init(params)
    rng = np.random.default_rng(0)
    batch = {
        k: jnp.asarray(v.astype(np.int32))
        for k, v in make_batch(rng).items()
    }

    @jax.jit
    def train_step(params, opt_state, batch, key):
        def loss_fn(p):
            loss, _ = triplet_step(p, net.cfg, batch, key, train=True)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(1)
    params, opt_state, loss = train_step(params, opt_state, batch, key)
    float(loss)  # compile + run
    times = []
    for i in range(n_steps):
        t0 = time.perf_counter()
        params, opt_state, loss = train_step(
            params, opt_state, batch, jax.random.fold_in(key, i)
        )
        float(loss)
        times.append(time.perf_counter() - t0)
    return BATCH / min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--jax", action="store_true")
    args = ap.parse_args()

    out = {
        "config": f"batch {BATCH}, trunc_len {TRUNC}, vocab {VOCAB}, emb {E}, "
        "2-layer bi-LSTM, dropouts 0.3, AdamW",
        "host": "this host CPU",
        "torch_seq_pairs_per_s": round(bench_torch(args.steps), 3),
    }
    if args.jax:
        out["jax_cpu_seq_pairs_per_s"] = round(bench_jax(args.steps), 3)
        out["same_host_ratio"] = round(
            out["jax_cpu_seq_pairs_per_s"] / out["torch_seq_pairs_per_s"], 2
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
