"""Kernel experiment: merge the input-projection and recurrent GEMMs.

The packed (v6) cell step issues two dots per chunk position — the input
projection ``xp @ wih (2E, 8H)`` and the recurrent batched dot
``h (GPT, Bgr, 2H) @ w (GPT, 2H, 8H)`` — then adds them. Concatenating
``[xp, h]`` along lanes and stacking ``[wih; w]`` into one
``(GPT, 2E + 2H, 8H)`` operand does the same contraction in ONE batched
dot: one less MXU issue and no add, at the cost of replicating the shared
``wih`` block per weight group (GPT x VMEM) and putting the (previously
off-critical-path) input projection onto the recurrent dot's latency.

Usage: python tools/experiment_merged_gemm.py  (on the TPU)
Times the production packed forward vs the merged variant at the flagship
shape, checks value parity, prints accept/reject evidence.
"""
from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from intrepppid_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

from intrepppid_tpu.ops.lstm_pallas import _interpret
from intrepppid_tpu.ops.lstm_pallas_layer import _part_specs, _resident_spec
from intrepppid_tpu.ops import lstm_pallas_packed as P


def _fwd_kernel_merged(
    *refs, nparts: int, C: int, Bt: int, H: int, compute_dtype,
):
    parts_f = refs[:nparts]
    parts_b = refs[nparts : 2 * nparts]
    len_ref, wm_ref, bias_ref = refs[2 * nparts : 2 * nparts + 3]
    (hsf_ref, hsb_ref, hn_ref, cn_ref, h_scr, c_scr) = refs[2 * nparts + 3 :]

    t = pl.program_id(1)
    nT = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    lengths = len_ref[...]
    GPT = wm_ref.shape[0]
    Bgr = Bt // GPT
    H2 = 2 * H

    def chunk_step(s):
        sb = C - 1 - s
        pos_f = t * C + s
        pos_b = (nT - 1 - t) * C + sb
        mf = jnp.where(pos_f < lengths, 1.0, 0.0).astype(jnp.float32)
        mb = jnp.where(pos_b < lengths, 1.0, 0.0).astype(jnp.float32)
        m = jnp.concatenate(
            [jnp.broadcast_to(mf, (Bt, H)), jnp.broadcast_to(mb, (Bt, H))],
            axis=1,
        )
        pf = [p[s] for p in parts_f]
        pb = [p[sb] for p in parts_b]
        xf = pf[0] if nparts == 1 else jnp.concatenate(pf, axis=-1)
        xb = pb[0] if nparts == 1 else jnp.concatenate(pb, axis=-1)
        h = h_scr[...]
        xh = jnp.concatenate(
            [xf.astype(compute_dtype), xb.astype(compute_dtype),
             h.astype(compute_dtype)],
            axis=-1,
        ).reshape(GPT, Bgr, -1)
        gates = jax.lax.dot_general(
            xh, wm_ref[...], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(Bt, 8 * H) + bias_ref[...].astype(jnp.float32)[None, :]
        i = jax.nn.sigmoid(gates[:, :H2])
        f = jax.nn.sigmoid(gates[:, H2 : 2 * H2])
        g = jnp.tanh(gates[:, 2 * H2 : 3 * H2])
        o = jax.nn.sigmoid(gates[:, 3 * H2 :])
        c = c_scr[...]
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        h_scr[...] = m * h_new + (1.0 - m) * h
        c_scr[...] = m * c_new + (1.0 - m) * c
        hsf_ref[s] = h_scr[:, :H].astype(hsf_ref.dtype)
        hsb_ref[sb] = h_scr[:, H:].astype(hsb_ref.dtype)

    for s in range(C):
        chunk_step(s)

    hn_ref[...] = h_scr[...]
    cn_ref[...] = c_scr[...]


def fwd_merged(x_parts, lengths, wm, bias_packed, *, Bt, C, G, H,
               compute_dtype):
    Tp, B, _ = x_parts[0].shape
    part_dims = [p.shape[-1] for p in x_parts]
    nB, nT = B // Bt, Tp // C
    Bg = B // G
    gpt = Bt // Bg if Bt > Bg else 1

    fwd = lambda b, t: (t, b, 0)
    mir = lambda b, t: (nT - 1 - t, b, 0)
    lmap = lambda b, t: (b, 0)
    onb = lambda b, t: (b, 0)

    st_out = pl.BlockSpec((C, Bt, H), fwd, memory_space=pltpu.VMEM)
    st_out_m = pl.BlockSpec((C, Bt, H), mir, memory_space=pltpu.VMEM)
    st_shape = jax.ShapeDtypeStruct((Tp, B, H), compute_dtype)
    kernel = functools.partial(
        _fwd_kernel_merged, nparts=len(x_parts), C=C, Bt=Bt, H=H,
        compute_dtype=compute_dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=(nB, nT),
        in_specs=(
            _part_specs(part_dims, C, Bt, fwd)
            + _part_specs(part_dims, C, Bt, mir)
            + [
                pl.BlockSpec((Bt, 1), lmap, memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (gpt, wm.shape[1], 8 * H),
                    lambda b, t: ((b * Bt) // (Bg * gpt), 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                _resident_spec((8 * H,)),
            ]
        ),
        out_specs=[
            st_out, st_out_m,
            pl.BlockSpec((Bt, 2 * H), onb, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, 2 * H), onb, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            st_shape, st_shape,
            jax.ShapeDtypeStruct((B, 2 * H), jnp.float32),
            jax.ShapeDtypeStruct((B, 2 * H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Bt, 2 * H), jnp.float32) for _ in range(2)],
        interpret=_interpret(),
    )(*x_parts, *x_parts, lengths, wm, bias_packed)


def run(B=400, T=1500, H=64, G=5, E=64, compute_dtype=jnp.bfloat16,
        n_rounds=7):
    Bt, C = B, 1
    key = jax.random.PRNGKey(0)
    w_ih = jax.random.normal(key, (2, 4 * H, E), jnp.float32) * 0.1
    bias = jax.random.normal(jax.random.fold_in(key, 1), (2, 4 * H)) * 0.1
    w_hh_t = jax.random.normal(
        jax.random.fold_in(key, 2), (2, G, H, 4 * H)) * 0.1
    x = jax.random.normal(jax.random.fold_in(key, 3), (T, B, E), compute_dtype)
    lengths = jnp.full((B, 1), T, jnp.int32)

    wih_t = jnp.swapaxes(w_ih, 1, 2)
    bias_f = bias[0] + 0.0, bias  # match production _wih_operands? simpler:
    bias_sum = bias  # (2, 4H) — production passes b_ih + b_hh combined
    wp, wihp, _, bp = P.pack_operands(w_hh_t, wih_t, bias_sum, compute_dtype)

    def prod(x, lengths, wp, wihp, bp):
        return P._fwd_pallas_packed(
            (x,), lengths, wp, wihp, bp, Bt=Bt, C=C, G=G, H=H,
            compute_dtype=compute_dtype, with_states=False,
        )

    # merged operand: (G*? , 2E + 2H, 8H): rows 0..2E = wih (replicated per
    # group), rows 2E.. = the group's packed recurrent block
    E2 = wihp.shape[0]
    wm = jnp.concatenate(
        [jnp.broadcast_to(wihp[None], (G,) + wihp.shape),
         wp.astype(compute_dtype)], axis=1,
    ).astype(compute_dtype)

    def merged(x, lengths, wm, bp):
        return fwd_merged(
            (x,), lengths, wm, bp, Bt=Bt, C=C, G=G, H=H,
            compute_dtype=compute_dtype,
        )

    ja = jax.jit(prod)
    jb = jax.jit(merged)
    oa = ja(x, lengths, wp, wihp, bp)
    ob = jb(x, lengths, wm, bp)
    for a, b in zip(oa[:2], ob[:2]):
        d = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))
        print("max|d| hs:", float(d.max()))
    np.testing.assert_allclose(
        np.asarray(oa[-2], np.float32), np.asarray(ob[-2], np.float32),
        atol=5e-2, rtol=5e-2,
    )

    def timed(fn, args, n=20):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _ = float(jnp.sum(out[-1]))
        return (time.perf_counter() - t0) / n * 1e3

    best_a = best_b = np.inf
    for r in range(n_rounds):
        ta = timed(ja, (x, lengths, wp, wihp, bp))
        tb = timed(jb, (x, lengths, wm, bp))
        best_a, best_b = min(best_a, ta), min(best_b, tb)
        print(f"round {r}: prod {ta:.2f} ms  merged {tb:.2f} ms")
    print(f"best: prod {best_a:.2f} ms  merged {best_b:.2f} ms  "
          f"ratio {best_a / best_b:.3f}x")


if __name__ == "__main__":
    run()
