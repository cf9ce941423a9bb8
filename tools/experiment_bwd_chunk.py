"""Experiment: chunking the BACKWARD sweep at C=2 (v7 streams make it fit).

The forward chunks at C=4 (1.08-1.10x — per-grid-step overhead
amortized); the backward historically could not chunk at Bt=400 because
its C=2 stream set exceeded VMEM. The v7 pair-packed boundary thins the
streams enough that C=2 fits (model: L1 12.2 MB, L0 ~12.6 MB of 13).

This bounds the win using the existing materialized-shift path (three
XLA shift copies of hs/cs per layer, ~0.5-0.8 ms — if the raw C=2 sweep
wins big, in-kernel boundary streams can reclaim the copy cost):

  arm A: C=1 shift-in-kernel backward (production today)
  arm B: materialized shifts + C=2 backward
  arm C: materialized shifts + C=1 backward (isolates the copy cost)

Flagship layer shapes, interleaved best-of, bitwise parity first.

Usage: python tools/experiment_bwd_chunk.py  (on the TPU)
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
from tools.experiment_saved_gates import make_layer


def run(B=400, T=1500, H=64, G=5, compute_dtype=jnp.bfloat16, n_rounds=7):
    Bt = min(400, B)
    key = jax.random.PRNGKey(0)
    # L1-top shape under v7: x packed (2H), hp unpacked, cs packed, ny=1
    wp, wihp, wihTp, bp = make_layer(
        key, B, T, H, G, 2 * H, 1, compute_dtype
    )[:4]
    xpk = jax.random.normal(jax.random.fold_in(key, 9), (T, B, 2 * H),
                            compute_dtype)
    lengths = jnp.full((B, 1), T, jnp.int32)
    kdy = jax.random.split(jax.random.PRNGKey(1), 3)
    dy_f = (jax.random.normal(kdy[0], (T, B, H), compute_dtype),)
    dy_b = (jax.random.normal(kdy[1], (T, B, H), compute_dtype),)
    dhn_p = jax.random.normal(kdy[2], (B, 2 * H), jnp.float32)
    dcn_p = jnp.zeros((B, 2 * H), jnp.float32)

    def fwd(xpk, lengths):
        return P._fwd_pallas_packed(
            (xpk,), lengths, wp, wihp, bp, Bt=Bt, C=4, G=G, H=H,
            compute_dtype=compute_dtype, with_states=True, pack_cs=True,
            x_packed=True,
        )

    def bwd(xpk, lengths, dy_f, dy_b, dhn_p, dcn_p, *, C, materialize):
        hs_f, hs_b, cs_p, _, _ = fwd(xpk, lengths)
        if materialize:
            zero = jnp.zeros_like(hs_f[:1])
            hp_f = jnp.concatenate([zero, hs_f[:-1]], axis=0)
            hp_b = jnp.concatenate([hs_b[1:], zero], axis=0)
            cp = jnp.concatenate(
                [jnp.zeros_like(cs_p[:1]), cs_p[:-1]], axis=0
            )
            shift = False
        else:
            hp_f, hp_b, cp, shift = hs_f, hs_b, cs_p, True
        return P._bwd_pallas_packed(
            (xpk,), lengths, wp, wihp, wihTp, bp,
            hp_f, cp, hp_b, None, dy_f, dy_b, dhn_p, dcn_p,
            Bt=Bt, C=C, G=G, H=H, compute_dtype=compute_dtype,
            shift_in_kernel=shift, pack_cs=True, x_packed=True,
        )

    import functools
    arms = {
        "A:C1-inkernel": jax.jit(functools.partial(
            bwd, C=1, materialize=False)),
        "B:C2-material": jax.jit(functools.partial(
            bwd, C=2, materialize=True)),
        "C:C1-material": jax.jit(functools.partial(
            bwd, C=1, materialize=True)),
    }
    args = (xpk, lengths, dy_f, dy_b, dhn_p, dcn_p)

    # Parity: C=2 vs C=1 under the SAME shift mode is bitwise (chunking
    # preserves accumulation order). The materialized-shift arms differ
    # from the in-kernel-shift arm only by f32 reassociation in the
    # dW/db accumulators (~1e-6, CPU-interpret-verified; dx/dhp bitwise).
    ref = arms["A:C1-inkernel"](*args)
    got_b = arms["B:C2-material"](*args)
    got_c = arms["C:C1-material"](*args)
    for a, b in zip(jax.tree_util.tree_leaves(got_c),
                    jax.tree_util.tree_leaves(got_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print("bitwise parity C=2 vs C=1 (materialized shifts): OK")
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got_b)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)
    print("allclose parity vs in-kernel-shift arm: OK")

    def timed(fn, n=20):
        out = None
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[-1]
                          .astype(jnp.float32)))
        return (time.perf_counter() - t0) / n * 1e3

    for fn in arms.values():
        timed(fn, n=2)
    best = {k: np.inf for k in arms}
    for r in range(n_rounds):
        line = []
        for k, fn in arms.items():
            t = timed(fn)
            best[k] = min(best[k], t)
            line.append(f"{k}={t:.2f}")
        print(f"round {r}: " + "  ".join(line))
    print()
    a, b, c = (best[k] for k in arms)
    print(f"A (C=1 in-kernel): {a:.2f} ms")
    print(f"B (C=2 + shifts):  {b:.2f} ms ({a / b:.3f}x vs A)")
    print(f"C (C=1 + shifts):  {c:.2f} ms  -> raw C=2 sweep win = "
          f"{c - b:+.2f} ms, shift-copy cost = {c - a:+.2f} ms")


if __name__ == "__main__":
    run()
