"""Experiment: stack-level VJP with in-kernel inter-layer dy summation.

Per-layer custom VJPs force two XLA ``(Tp, B, H)`` adds at every layer
boundary of the backward pass: the upper layer's per-part forward/backward
direction contributions (``dxf[p] + dxb[p]``) must be merged before JAX
hands them to the lower layer as cotangents. A device profile at the
flagship shape attributed ~1 ms/step to those adds and their materialized
outputs.

``pallas_bilstm_stack`` makes the whole stack one differentiation unit:
the packed (v6) backward kernel accepts the two streams per direction
unsummed and adds them in-register inside the sweep (where the VPU has
idle issue slots between the transcendental ops).

Usage: python tools/experiment_stack_vjp.py  (on the TPU)
A/B-interleaved timing of full fwd+bwd for the 2-layer stack, per-layer
VJP loop vs stack VJP, plus a gradient-parity check between the two.
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

from intrepppid_tpu.ops.lstm_pallas_layer import (
    pallas_bidir_layer,
    pallas_bilstm_stack,
    pick_plan,
)


def make_weights(key, H, G, E):
    ks = jax.random.split(key, 3)
    w_ih = jax.random.normal(ks[0], (2, 4 * H, E), jnp.float32) * 0.1
    bias = jax.random.normal(ks[1], (2, 4 * H), jnp.float32) * 0.1
    w_hh_t = jax.random.normal(ks[2], (2, G, H, 4 * H), jnp.float32) * 0.1
    return w_ih, bias, w_hh_t


def run(B=400, T=1500, H=64, G=5, E=64, compute_dtype=jnp.bfloat16,
        n_rounds=7):
    plan = pick_plan(B, T, H, G, compute_dtype, E=E, nyparts=2)
    assert plan is not None, "no kernel plan at this shape"
    Bt, C, Tp, fused = plan
    print(f"plan: Bt={Bt} C={C} mode={fused}")

    key = jax.random.PRNGKey(0)
    lw0 = make_weights(jax.random.fold_in(key, 0), H, G, E)
    lw1 = make_weights(jax.random.fold_in(key, 1), H, G, 2 * H)
    layer_weights = (lw0, lw1)
    Gs = (G, G)
    x = jax.random.normal(jax.random.fold_in(key, 2), (Tp, B, E),
                          compute_dtype)
    lengths = jnp.full((B, 1), T, jnp.int32)

    def loss_perlayer(layer_weights, x, lengths):
        parts = (x,)
        acc = 0.0
        for (w_ih, bias, w_hh_t), g in zip(layer_weights, Gs):
            hs_f, hs_b, hn, cn = pallas_bidir_layer(
                parts, w_ih, bias, w_hh_t, lengths, g, compute_dtype,
                Bt, C, fused,
            )
            parts = (hs_f, hs_b)
            acc = acc + jnp.sum(hn.astype(jnp.float32) ** 2)
        y = jnp.concatenate(parts, axis=-1)
        return acc + jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_stack(layer_weights, x, lengths):
        hs_f, hs_b, hns, cns = pallas_bilstm_stack(
            (x,), layer_weights, lengths, Gs, compute_dtype, Bt, C, fused,
        )
        acc = sum(jnp.sum(hn.astype(jnp.float32) ** 2) for hn in hns)
        y = jnp.concatenate([hs_f, hs_b], axis=-1)
        return acc + jnp.sum(y.astype(jnp.float32) ** 2)

    ga = jax.jit(jax.value_and_grad(loss_perlayer))
    gb = jax.jit(jax.value_and_grad(loss_stack))

    # parity first (compile included)
    va, grad_a = ga(layer_weights, x, lengths)
    vb, grad_b = gb(layer_weights, x, lengths)
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(grad_a),
                    jax.tree_util.tree_leaves(grad_b)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        denom = np.maximum(np.abs(b), 1e-3 * np.abs(b).max())
        assert float(np.median(np.abs(a - b) / denom)) < 5e-2
    print("gradient parity: OK")

    def timed(fn, n=10):
        t0 = time.perf_counter()
        for _ in range(n):
            v, _ = fn(layer_weights, x, lengths)
        _ = float(v)  # tunnel sync
        return (time.perf_counter() - t0) / n * 1e3

    best_a, best_b = np.inf, np.inf
    for r in range(n_rounds):
        ta = timed(ga)
        tb = timed(gb)
        best_a, best_b = min(best_a, ta), min(best_b, tb)
        print(f"round {r}: per-layer {ta:.2f} ms  stack {tb:.2f} ms")
    print(f"best: per-layer {best_a:.2f} ms  stack {best_b:.2f} ms  "
          f"speedup {best_a / best_b:.3f}x")


if __name__ == "__main__":
    run()
