"""Experiment: saved-gates backward (v6.3) vs in-kernel recompute (v6.2).

The packed backward recomputes the forward per cell step — 2 GEMMs
(input projection + recurrent) and 4 transcendentals (3 sigmoids + tanh)
— before the gradient math, and the sweep is VPU-transcendental-bound.
v6.3 instead has the forward save its ACTIVATED gates as one
``(Tp, B, 8H)`` packed stream (bf16) and streams them into the backward,
cutting the sweep's transcendentals from 5 to 1 (only ``tanh(c_new)``
remains) and its GEMMs from 6 to 4, at the cost of ~2x the residual HBM
traffic (gates write + read ≈ 614 MB/layer/step at the flagship shape).

This times both modes at the flagship layer shapes, interleaved rounds /
best-of (platform contention), for:
  * layer 0: nparts=1 (E=64 embedding input), nyparts=2 (the stack VJP
    threads layer 1's unsummed dxf/dxb pairs in)
  * layer 1: nparts=2 (the 2H-wide hs_f/hs_b input), nyparts=1
plus the forward with/without the gates output stream at its picked
chunk.

Usage: python tools/experiment_saved_gates.py   (on the TPU)
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


def make_layer(key, B, T, H, G, E, nparts, compute_dtype):
    ks = jax.random.split(key, 6 + nparts)
    w_ih = jax.random.normal(ks[0], (2, 4 * H, E * nparts), jnp.float32) * 0.1
    bias_f = jax.random.normal(ks[1], (2, 4 * H), jnp.float32) * 0.1
    w_hh_t = jax.random.normal(ks[2], (2, G, H, 4 * H), jnp.float32) * 0.1
    wih_t = jnp.swapaxes(w_ih, 1, 2).astype(compute_dtype)
    wp, wihp, wihTp, bp = P.pack_operands(w_hh_t, wih_t, bias_f, compute_dtype)
    x_parts = tuple(
        jax.random.normal(ks[6 + i], (T, B, E), compute_dtype)
        for i in range(nparts)
    )
    lengths = jnp.full((B, 1), T, jnp.int32)
    return wp, wihp, wihTp, bp, x_parts, lengths


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
        Cf_rc = P.pick_fwd_chunk(B, T, H, G, compute_dtype, E_total, Bt)
        Cf_sg = P.pick_fwd_chunk(
            B, T, H, G, compute_dtype, E_total, Bt, with_gates=True
        )
        print(f"{name}: fwd chunk rc={Cf_rc} saved={Cf_sg}")
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

        def fwd_rc(x_parts, lengths, wp=wp, wihp=wihp, bp=bp, Cf=Cf_rc):
            return P._fwd_pallas_packed(
                x_parts, lengths, wp, wihp, bp, Bt=Bt, C=Cf, G=G, H=H,
                compute_dtype=compute_dtype, with_states=True,
            )

        def fwd_sg(x_parts, lengths, wp=wp, wihp=wihp, bp=bp, Cf=Cf_sg):
            return P._fwd_pallas_packed(
                x_parts, lengths, wp, wihp, bp, Bt=Bt, C=Cf, G=G, H=H,
                compute_dtype=compute_dtype, with_states=True,
                with_gates=True,
            )

        def bwd_rc(x_parts, lengths, dy_f, dy_b, dhn_p, dcn_p,
                   wp=wp, wihp=wihp, wihTp=wihTp, bp=bp, fwd=fwd_rc):
            hs_f, hs_b, cs_f, cs_b, _, _ = fwd(x_parts, lengths)
            return P._bwd_pallas_packed(
                x_parts, lengths, wp, wihp, wihTp, bp,
                hs_f, cs_f, hs_b, cs_b, dy_f, dy_b, dhn_p, dcn_p,
                Bt=Bt, C=1, G=G, H=H, compute_dtype=compute_dtype,
                shift_in_kernel=True,
            )

        def bwd_sg(x_parts, lengths, dy_f, dy_b, dhn_p, dcn_p,
                   wp=wp, wihp=wihp, wihTp=wihTp, bp=bp, fwd=fwd_sg):
            hs_f, hs_b, cs_f, cs_b, gs, _, _ = fwd(x_parts, lengths)
            return P._bwd_pallas_packed(
                x_parts, lengths, wp, None, wihTp, None,
                hs_f, cs_f, hs_b, cs_b, dy_f, dy_b, dhn_p, dcn_p,
                Bt=Bt, C=1, G=G, H=H, compute_dtype=compute_dtype,
                shift_in_kernel=True, gs=gs,
            )

        fns[(name, "fwd", "rc")] = jax.jit(fwd_rc)
        fns[(name, "fwd", "sg")] = jax.jit(fwd_sg)
        fns[(name, "fb", "rc")] = jax.jit(bwd_rc)
        fns[(name, "fb", "sg")] = jax.jit(bwd_sg)

    # numeric sanity: grads close across modes (bf16 storage rounding only)
    for name in layers:
        x_parts, lengths, dy_f, dy_b, dhn_p, dcn_p = args[name]
        a = fns[(name, "fb", "rc")](x_parts, lengths, dy_f, dy_b, dhn_p, dcn_p)
        b = fns[(name, "fb", "sg")](x_parts, lengths, dy_f, dy_b, dhn_p, dcn_p)
        for ta, tb in zip(jax.tree_util.tree_leaves(a),
                          jax.tree_util.tree_leaves(b)):
            ta = np.asarray(ta, np.float32)
            tb = np.asarray(tb, np.float32)
            scale = max(np.abs(ta).max(), 1.0)
            err = np.abs(ta - tb).max() / scale
            assert err < 0.03, (name, ta.shape, err)
        print(f"{name}: rc-vs-sg grad agreement OK")

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
        timed(k, n=2)  # compile + warm
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
            rc = best[(name, stage, "rc")]
            sg = best[(name, stage, "sg")]
            print(f"{name} {stage}: rc={rc:.2f} ms  saved={sg:.2f} ms "
                  f"({rc / sg:.3f}x)")


if __name__ == "__main__":
    run()
