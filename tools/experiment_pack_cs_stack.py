"""Experiment: packed cell-residual stream measured on the COMPOSED
2-layer stack fwd+bwd (the number production pays).

Standalone sweeps said: forward 1.18x (one DMA fewer per grid step), but
fwd+bwd per layer only ~1.01-1.02x (tools/experiment_pack_cs.py) — the
backward's full-width packed read gives most of it back. This drives
``pallas_bilstm_stack`` value_and_grad with ``PACK_CS`` on/off
(flag flipped between trace times), interleaved best-of rounds, plus a
bitwise gradient parity check.

Usage: python tools/experiment_pack_cs_stack.py  (on the TPU)
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from intrepppid_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

from intrepppid_tpu.ops import lstm_pallas_packed as P
from intrepppid_tpu.ops.lstm_pallas_layer import (
    pallas_bilstm_stack,
    pick_plan,
)
from tools.experiment_stack_vjp import make_weights


def run(B=400, T=1500, H=64, G=5, E=64, compute_dtype=jnp.bfloat16,
        n_rounds=7):
    plan = pick_plan(B, T, H, G, compute_dtype, E=E, nyparts=2)
    assert plan is not None
    Bt, C, Tp, fused = plan
    assert fused == "packed"
    print(f"plan: Bt={Bt} C={C} mode={fused}")

    key = jax.random.PRNGKey(0)
    layer_weights = (
        make_weights(jax.random.fold_in(key, 0), H, G, E),
        make_weights(jax.random.fold_in(key, 1), H, G, 2 * H),
    )
    Gs = (G, G)
    x = jax.random.normal(jax.random.fold_in(key, 2), (Tp, B, E),
                          compute_dtype)
    lengths = jnp.full((B, 1), T, jnp.int32)

    def loss_stack(layer_weights, x, lengths):
        hs_f, hs_b, hns, cns = pallas_bilstm_stack(
            (x,), layer_weights, lengths, Gs, compute_dtype, Bt, C, fused,
        )
        acc = sum(jnp.sum(hn.astype(jnp.float32) ** 2) for hn in hns)
        y = jnp.concatenate([hs_f, hs_b], axis=-1)
        return acc + jnp.sum(y.astype(jnp.float32) ** 2)

    g_sep = jax.jit(lambda *a: jax.value_and_grad(loss_stack)(*a))
    g_pk = jax.jit(lambda *a: jax.value_and_grad(loss_stack)(*a))

    # the flag is read at trace time — trace each variant under its mode
    P.PACK_CS = False
    va, grad_a = g_sep(layer_weights, x, lengths)
    P.PACK_CS = True
    vb, grad_b = g_pk(layer_weights, x, lengths)
    assert float(va) == float(vb), (float(va), float(vb))
    for a, b in zip(jax.tree_util.tree_leaves(grad_a),
                    jax.tree_util.tree_leaves(grad_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print("bitwise gradient parity: OK")

    def timed(fn, n=15):
        t0 = time.perf_counter()
        v = None
        for _ in range(n):
            v, _ = fn(layer_weights, x, lengths)
        _ = float(v)
        return (time.perf_counter() - t0) / n * 1e3

    best_a = best_b = np.inf
    for r in range(n_rounds):
        ta = timed(g_sep)
        tb = timed(g_pk)
        best_a, best_b = min(best_a, ta), min(best_b, tb)
        print(f"round {r}: separate {ta:.2f} ms  packed-cs {tb:.2f} ms")
    print(f"best: separate {best_a:.2f} ms  packed-cs {best_b:.2f} ms  "
          f"speedup {best_a / best_b:.3f}x")


if __name__ == "__main__":
    run()
