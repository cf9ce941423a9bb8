"""Experiment: one on-chip number for the ablation config.

BASELINE.json configs[2] — "use_projection true + variational_dropout true
+ bi_reduce mean" — exercises the classifier/encoder variants (the
reference's `classifier/head/mlp.py` projection branch and
`encoders/awd_lstm.py` bi_reduce/variational paths). Correctness is
test-covered on CPU (tests/test_lstm.py, tests/test_triplet.py); this
records a TPU throughput entry at the manuscript shape so every
CPU-runnable BASELINE config has a measured on-chip point: the variational
WeightDrop (per-row mask, active in eval — reference quirk #4) and the
mean-over-time reduction ride the same Pallas recurrence, so the number
should land within a few percent of the flagship `bi_reduce="last"` rate.

Usage: python tools/experiment_ablation_config.py  (on the TPU)
Smoke:  INTREPPPID_ABLATION_SMOKE=1 python tools/... (CPU pre-flight)
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

_SMOKE = os.environ.get("INTREPPPID_ABLATION_SMOKE") == "1"
BATCH = 8 if _SMOKE else 80
TRUNC = 64 if _SMOKE else 1500
VOCAB = 250
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

    net = intrepppid_network(
        steps_per_epoch=100, num_epochs=100, compute_dtype=jnp.bfloat16,
        optimizer_type="ranger21_xx", use_projection=True,
        variational_dropout=True, bi_reduce="mean",
    )
    params = net.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer(net.optimizer_type, net.lr, 100, 100)
    opt_state = optimizer.init(params)
    print(f"ablation config: projection+variational+mean, "
          f"{net.num_params(params)/1e3:.0f}k params")

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
          f"projection+variational+mean, batch {BATCH}, T={TRUNC}")


if __name__ == "__main__":
    main()
