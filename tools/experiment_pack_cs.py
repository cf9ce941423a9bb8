"""Experiment: packed cell-residual stream (one (Tp, B, 2H) cs) vs two
half-width cs_f/cs_b streams.

The cell residual is consumed only by the backward, and the packed
per-row pairing (row p = (c_f @ p, c_b @ Tp-1-p)) makes the previous-
step pair exactly row p-1 — so ONE full-width stream under the existing
prev_f map/shift replaces TWO half-width (lane-padded) streams in both
sweeps, drops a DMA per grid step on each side, and removes the
backward's c_prev concat. Bytes moved are unchanged; the candidate win
is per-grid-step stream overhead (the forward runs at the measured
pipeline floor).

Interleaved rounds / best-of at the flagship layer shapes (L0: E=64
nparts=1 nyparts=2; L1: 2x64 parts, nyparts=1).

Usage: python tools/experiment_pack_cs.py   (on the TPU)
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
    Bt = 400
    key = jax.random.PRNGKey(0)
    layers = {
        "L0": dict(E=64, nparts=1, nyparts=2),
        "L1": dict(E=64, nparts=2, nyparts=1),
    }
    fns = {}
    args = {}
    for name, cfg in layers.items():
        wp, wihp, wihTp, bp, x_parts, lengths = make_layer(
            key, B, T, H, G, cfg["E"], cfg["nparts"], compute_dtype
        )
        E_total = cfg["E"] * cfg["nparts"]
        Cf = P.pick_fwd_chunk(B, T, H, G, compute_dtype, E_total, Bt)
        ny = cfg["nyparts"]
        kdy = jax.random.split(jax.random.PRNGKey(1), 2 * ny + 2)
        dy_f = tuple(
            jax.random.normal(kdy[i], (T, B, H), compute_dtype)
            for i in range(ny)
        )
        dy_b = tuple(
            jax.random.normal(kdy[ny + i], (T, B, H), compute_dtype)
            for i in range(ny)
        )
        dhn_p = jax.random.normal(kdy[-1], (B, 2 * H), jnp.float32)
        dcn_p = jnp.zeros((B, 2 * H), jnp.float32)
        args[name] = (x_parts, lengths, dy_f, dy_b, dhn_p, dcn_p)

        def fwd_sep(x_parts, lengths, wp=wp, wihp=wihp, bp=bp, Cf=Cf):
            return P._fwd_pallas_packed(
                x_parts, lengths, wp, wihp, bp, Bt=Bt, C=Cf, G=G, H=H,
                compute_dtype=compute_dtype, with_states=True,
            )

        def fwd_pk(x_parts, lengths, wp=wp, wihp=wihp, bp=bp, Cf=Cf):
            return P._fwd_pallas_packed(
                x_parts, lengths, wp, wihp, bp, Bt=Bt, C=Cf, G=G, H=H,
                compute_dtype=compute_dtype, with_states=True, pack_cs=True,
            )

        def fb_sep(x_parts, lengths, dy_f, dy_b, dhn_p, dcn_p,
                   wp=wp, wihp=wihp, wihTp=wihTp, bp=bp, fwd=fwd_sep):
            hs_f, hs_b, cs_f, cs_b, _, _ = fwd(x_parts, lengths)
            return P._bwd_pallas_packed(
                x_parts, lengths, wp, wihp, wihTp, bp,
                hs_f, cs_f, hs_b, cs_b, dy_f, dy_b, dhn_p, dcn_p,
                Bt=Bt, C=1, G=G, H=H, compute_dtype=compute_dtype,
                shift_in_kernel=True,
            )

        def fb_pk(x_parts, lengths, dy_f, dy_b, dhn_p, dcn_p,
                  wp=wp, wihp=wihp, wihTp=wihTp, bp=bp, fwd=fwd_pk):
            hs_f, hs_b, cs_p, _, _ = fwd(x_parts, lengths)
            return P._bwd_pallas_packed(
                x_parts, lengths, wp, wihp, wihTp, bp,
                hs_f, cs_p, hs_b, None, dy_f, dy_b, dhn_p, dcn_p,
                Bt=Bt, C=1, G=G, H=H, compute_dtype=compute_dtype,
                shift_in_kernel=True, pack_cs=True,
            )

        fns[(name, "fwd", "sep")] = jax.jit(fwd_sep)
        fns[(name, "fwd", "pk")] = jax.jit(fwd_pk)
        fns[(name, "fb", "sep")] = jax.jit(fb_sep)
        fns[(name, "fb", "pk")] = jax.jit(fb_pk)

    # parity: grads bitwise-equal across modes (same math, same operands)
    for name in layers:
        a = fns[(name, "fb", "sep")](*args[name])
        b = fns[(name, "fb", "pk")](*args[name])
        for ta, tb in zip(jax.tree_util.tree_leaves(a),
                          jax.tree_util.tree_leaves(b)):
            np.testing.assert_array_equal(np.asarray(ta), np.asarray(tb))
        print(f"{name}: sep-vs-pk bitwise grad parity OK")

    def timed(k, n=20):
        fn = fns[k]
        a = args[k[0]]
        call = (lambda: fn(a[0], a[1])) if k[1] == "fwd" else (lambda: fn(*a))
        out = None
        t0 = time.perf_counter()
        for _ in range(n):
            out = call()
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[-1]
                          .astype(jnp.float32)))
        return (time.perf_counter() - t0) / n * 1e3

    for k in fns:
        timed(k, n=2)
    best = {k: np.inf for k in fns}
    for r in range(n_rounds):
        line = []
        for k in fns:
            t = timed(k)
            best[k] = min(best[k], t)
            line.append(f"{k[0]}/{k[1]}/{k[2]}={t:.2f}")
        print(f"round {r}: " + "  ".join(line))
    print()
    for name in layers:
        for stage in ("fwd", "fb"):
            sep = best[(name, stage, "sep")]
            pk = best[(name, stage, "pk")]
            print(f"{name} {stage}: sep={sep:.2f} ms  packed={pk:.2f} ms "
                  f"({sep / pk:.3f}x)")


if __name__ == "__main__":
    run()
