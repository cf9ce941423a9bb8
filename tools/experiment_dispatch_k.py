"""Experiment: re-sweep steps-per-dispatch K on the current kernels.

``resolve_steps_per_dispatch`` defaults to K=10 from a v5-era sweep
(27.0/25.9/26.0 ms/step at K=5/10/20). The v6.2/v6.3 kernels cut the
train step ~40%, which moves the fixed ~45 ms/dispatch tunnel cost's
amortisation knee. This re-times the bench-config train step at
K in {5, 10, 20, 40}, interleaved best-of rounds, so the default can be
re-pinned on current numbers.

Usage: python tools/experiment_dispatch_k.py  (on the TPU)
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

BATCH = 80
TRUNC = 1500
VOCAB = 250
KS = (5, 10, 20, 40)


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
        optimizer_type="ranger21_xx",
    )
    params = net.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer(net.optimizer_type, net.lr, 100, 100)
    opt_state = optimizer.init(params)

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

    key = jax.random.PRNGKey(1)
    arms = {}
    for K in KS:
        kbatch = {
            k: jnp.broadcast_to(v, (K,) + v.shape) for k, v in batch.items()
        }
        # donate + chain state across dispatches exactly like the Trainer /
        # bench.py — each arm owns an independent state copy
        fn = jax.jit(multi_step, donate_argnums=(0, 1))
        p = jax.tree_util.tree_map(jnp.copy, params)
        s = jax.tree_util.tree_map(jnp.copy, opt_state)
        p, s, loss = fn(p, s, kbatch, jax.random.split(key, K))
        float(loss)
        arms[K] = [fn, kbatch, p, s]
        print(f"K={K}: compiled")

    def timed(K, n_steps_target=40):
        fn, kbatch, p, s = arms[K]
        n_dispatch = max(1, n_steps_target // K)
        t0 = time.perf_counter()
        loss = None
        for i in range(n_dispatch):
            keys = jax.random.split(jax.random.fold_in(key, i), K)
            p, s, loss = fn(p, s, kbatch, keys)
        float(loss)
        dt = time.perf_counter() - t0
        arms[K][2], arms[K][3] = p, s
        return dt / (n_dispatch * K) * 1e3  # ms per train step

    best = {K: np.inf for K in KS}
    for r in range(5):
        line = []
        for K in KS:
            t = timed(K)
            best[K] = min(best[K], t)
            line.append(f"K={K}:{t:.2f}ms")
        print(f"round {r}: " + "  ".join(line))
    print()
    for K in KS:
        print(f"K={K}: best {best[K]:.2f} ms/step  "
              f"({BATCH / best[K] * 1e3:.0f} seq-pairs/s)")


if __name__ == "__main__":
    main()
