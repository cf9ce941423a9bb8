"""Experiment: one on-chip number for the scaled config (VERDICT r3 weak #6).

BASELINE.json configs[4] — "Scaled run: embedding 256, 3-layer bi-GRU,
batch 80" — is the one shape where ``pick_plan``'s lite-backward cost model
(H >= 192 keeps the Pallas path with the reduced-save plan) actually decides
something; CPU tests cover correctness there but no TPU measurement exists.
This times the full quintuplet train step at that shape (batch 80,
trunc_len 1500, bf16, ranger21_xx) and records which plan ``pick_plan``
chose, so docs/performance.md can carry a measured entry validating the
H>=192 cost model.

Usage: python tools/experiment_scaled_config.py  (on the TPU)
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

import os

# smoke knobs (CPU pre-flight): INTREPPPID_SCALED_SMOKE=1 shrinks the run
_SMOKE = os.environ.get("INTREPPPID_SCALED_SMOKE") == "1"
BATCH = 8 if _SMOKE else 80
TRUNC = 64 if _SMOKE else 1500
VOCAB = 250
EMBED = 256
LAYERS = 3
K = 2 if _SMOKE else 10


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from intrepppid_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    from intrepppid_tpu.models.factory import intrepppid_network
    from intrepppid_tpu.models.triplet import step as triplet_step
    from intrepppid_tpu.optim import make_optimizer
    from intrepppid_tpu.ops.lstm_pallas_layer import pick_plan

    # What the kernel dispatcher will choose at this shape: groups=5
    # (quintuplet grouped weight-drop), E = 2H between layers, ny=2 for a
    # stack. Layer 0 sees E=EMBED; layers 1..L-1 see E=2H.
    for E, tag in ((EMBED, "layer0"), (2 * EMBED, "layer1+")):
        plan = pick_plan(
            5 * BATCH, TRUNC, EMBED, 5, jnp.bfloat16, E=E, nyparts=2
        )
        print(f"pick_plan B={5*BATCH} T={TRUNC} H={EMBED} G=5 E={E} ({tag}):"
              f" {plan}")

    net = intrepppid_network(
        steps_per_epoch=100, num_epochs=100, compute_dtype=jnp.bfloat16,
        optimizer_type="ranger21_xx", embedding_size=EMBED,
        rnn_num_layers=LAYERS,
    )
    params = net.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer(net.optimizer_type, net.lr, 100, 100)
    opt_state = optimizer.init(params)
    n_params = net.num_params(params)
    print(f"scaled config: embedding {EMBED}, {LAYERS}-layer, "
          f"{n_params/1e6:.2f}M params")

    rng = np.random.default_rng(0)

    def ids():
        a = rng.integers(1, VOCAB, size=(BATCH, TRUNC))
        lens = rng.integers(TRUNC // 2, TRUNC + 1, size=BATCH)
        lens[0] = TRUNC
        for i, l in enumerate(lens):
            a[i, l:] = 0
        return jnp.asarray(a.astype(np.int32))

    batch = {k: ids() for k in ("p1", "p2", "anchor", "positive", "negative")}
    batch["label"] = jnp.asarray((rng.random(BATCH) > 0.5).astype(np.int32))

    def one(carry, inp):
        params, opt_state = carry
        b, key = inp

        def loss_fn(p):
            loss, _ = triplet_step(p, net.cfg, b, key, train=True)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    def multi_step(params, opt_state, batches, keys):
        (params, opt_state), losses = jax.lax.scan(
            one, (params, opt_state), (batches, keys)
        )
        return params, opt_state, losses[-1]

    step_fn = jax.jit(multi_step, donate_argnums=(0, 1))
    kbatch = {
        k: jnp.broadcast_to(v, (K,) + v.shape) for k, v in batch.items()
    }
    key = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    params, opt_state, loss = step_fn(
        params, opt_state, kbatch, jax.random.split(key, K)
    )
    float(loss)
    print(f"compile+first dispatch: {time.perf_counter() - t0:.1f} s")

    n_dispatch = 4
    best_dt = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        for i in range(n_dispatch):
            keys = jax.random.split(jax.random.fold_in(key, r * 100 + i), K)
            params, opt_state, loss = step_fn(params, opt_state, kbatch, keys)
        float(loss)
        dt = time.perf_counter() - t0
        best_dt = min(best_dt, dt)
        rate = BATCH * n_dispatch * K / dt
        print(f"round {r}: {dt/(n_dispatch*K)*1e3:.2f} ms/step "
              f"({rate:.0f} seq-pairs/s)")
    print(f"\nbest: {best_dt/(n_dispatch*K)*1e3:.2f} ms/step  "
          f"({BATCH * n_dispatch * K / best_dt:.0f} seq-pairs/s) at "
          f"embedding {EMBED}, {LAYERS} layers, batch {BATCH}, T={TRUNC}")


if __name__ == "__main__":
    main()
