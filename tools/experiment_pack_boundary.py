"""Experiment: v7 pair-packed inter-layer boundary, composed stack fwd+bwd.

Inner stack layers emit ONE pair-packed (Tp, B, 2H) ys stream instead of
hs_f/hs_b. The pairing (row p = (f@p, b@Tp-1-p)) lets every consumer use
it directly: the upper layer's forward reads rows pos_f and pos_b under
the two maps it already uses (2 full-width streams replace 4 half-width
lane-padded ones), the layer's own backward reads the packed hp at row
p-1 (1 stream replaces 2), and the upper backward emits its input
cotangent as two pair-packed streams (2 writes replace 4) consumed
pair-packed by the lower backward's in-register dy sum.

A/B on ``pallas_bilstm_stack`` value_and_grad with ``PACK_BOUNDARY``
flipped at trace time, interleaved best-of rounds, bitwise gradient
parity check first.

Usage: python tools/experiment_pack_boundary.py  (on the TPU)
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

    g_v6 = jax.jit(lambda *a: jax.value_and_grad(loss_stack)(*a))
    g_v7 = jax.jit(lambda *a: jax.value_and_grad(loss_stack)(*a))

    P.PACK_BOUNDARY = False
    va, grad_a = g_v6(layer_weights, x, lengths)
    P.PACK_BOUNDARY = True
    vb, grad_b = g_v7(layer_weights, x, lengths)
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
        ta = timed(g_v6)
        tb = timed(g_v7)
        best_a, best_b = min(best_a, ta), min(best_b, tb)
        print(f"round {r}: v6 {ta:.2f} ms  v7 packed-boundary {tb:.2f} ms")
    print(f"best: v6 {best_a:.2f} ms  v7 {best_b:.2f} ms  "
          f"speedup {best_a / best_b:.3f}x")


if __name__ == "__main__":
    run()
