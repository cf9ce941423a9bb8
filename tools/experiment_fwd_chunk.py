"""Experiment: time-chunking the (floor-bound) packed FORWARD sweep.

v6 brought the forward sweep to ~3.8 us/grid-step at the flagship shape —
essentially the measured ~3.7 us/grid-step pipeline floor — so the forward
is no longer VPU-bound but grid-overhead-bound. The earlier chunking
verdict ("C=2 ~5% slower") was measured on the v5 kernels whose per-step
VPU work was twice as large; with the cell math halved the fixed per-grid-
step cost dominates and C > 1 may now pay.

The BACKWARD cannot chunk at Bt=400 (its C=2 stream set exceeds VMEM), so
this measures the forward alone: C in {1, 2, 4} at Bt=400, both with and
without cell-state residual streams (the train-path forward saves cs_f/
cs_b for BPTT; the eval path does not). Interleaved rounds, best-of, plus
a bitwise-parity check of all outputs across C.

Usage: python tools/experiment_fwd_chunk.py   (on the TPU)
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


def run(B=400, T=1500, H=64, G=5, E=64, compute_dtype=jnp.bfloat16,
        n_rounds=7):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    w_ih = jax.random.normal(ks[0], (2, 4 * H, E), jnp.float32) * 0.1
    bias_f = jax.random.normal(ks[1], (2, 4 * H), jnp.float32) * 0.1
    w_hh_t = jax.random.normal(ks[2], (2, G, H, 4 * H), jnp.float32) * 0.1
    wih_t = jnp.swapaxes(w_ih, 1, 2).astype(compute_dtype)
    wp, wihp, _, bp = P.pack_operands(w_hh_t, wih_t, bias_f, compute_dtype)
    x = jax.random.normal(ks[3], (T, B, E), compute_dtype)
    lengths = jnp.full((B, 1), T, jnp.int32)

    variants = {}
    for with_states in (False, True):
        for C in (1, 2, 4):
            if T % C:
                continue

            def fn(x, lengths, wp=wp, wihp=wihp, bp=bp, C=C,
                   with_states=with_states):
                return P._fwd_pallas_packed(
                    (x,), lengths, wp, wihp, bp, Bt=400, C=C, G=G, H=H,
                    compute_dtype=compute_dtype, with_states=with_states,
                )

            variants[(with_states, C)] = jax.jit(fn)

    # parity: identical outputs across C (same op sequence, different
    # loop blocking)
    for with_states in (False, True):
        ref = jax.tree_util.tree_leaves(
            variants[(with_states, 1)](x, lengths))
        for C in (2, 4):
            got = jax.tree_util.tree_leaves(variants[(with_states, C)](
                x, lengths))
            for a, b in zip(ref, got):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print("bitwise parity across C: OK")

    def timed(fn, n=20):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(x, lengths)
        _ = float(jnp.sum(out[-2].astype(jnp.float32)))  # hn; tunnel sync
        return (time.perf_counter() - t0) / n * 1e3

    best = {k: np.inf for k in variants}
    for r in range(n_rounds):
        line = []
        for k, fn in variants.items():
            t = timed(fn)
            best[k] = min(best[k], t)
            line.append(f"{k}={t:.2f}")
        print(f"round {r}: " + "  ".join(line))
    print()
    for with_states in (False, True):
        tag = "train-fwd(states)" if with_states else "eval-fwd"
        b1 = best[(with_states, 1)]
        for C in (1, 2, 4):
            k = (with_states, C)
            if k in best:
                print(f"{tag} C={C}: {best[k]:.2f} ms "
                      f"({b1 / best[k]:.3f}x vs C=1)")


if __name__ == "__main__":
    run()
