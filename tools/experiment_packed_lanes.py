"""Kernel experiment: direction-packed lanes (VERDICT r2 next-round #5).

The v5 forward kernel's cell math runs on ``(2, Bt, H)`` f32 vectors — at
H=64 every elementwise op (3 sigmoids + 2 tanhs per step, the measured VPU
floor of the sweep) uses half of each 128-lane vreg. This experiment packs
the two directions into the lane axis:

* state ``(Bt, 2H)`` — fwd in lanes [0,H), bwd in [H,2H),
* gates ``(Bt, 8H)`` with gate-major interleaved columns
  ``[i_f i_b | f_f f_b | g_f g_b | o_f o_b]`` so every cell slice is a
  full-width ``(Bt, 2H)`` register row,
* both GEMMs consume/produce the packed layout directly via block-diagonal
  weights (``(2E, 8H)`` input, ``(GPT, 2H, 8H)`` recurrent batched dot with
  lane width 2H=128 — above the Mosaic batched-dot crash threshold), so no
  per-step pack/unpack anywhere except the 64-lane output writes.

The zero blocks double the GEMM FLOPs on paper, but the unpacked v5 dots
already pad their 64-wide contraction to 128 lanes, so the MXU work is the
same; the VPU transcendental count halves.

Usage: python tools/experiment_packed_lanes.py  (on the TPU)
Validates the packed forward against v5 bitwise-tolerance, then times both
at the flagship shape. Result recorded in docs/performance.md.
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

from intrepppid_tpu.ops.lstm_pallas import _interpret
from intrepppid_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()
from intrepppid_tpu.ops.lstm_pallas_layer import (
    _fwd_pallas,
    _part_specs,
    _resident_spec,
    _wih_operands,
    pick_tiles,
)


# ----------------------------------------------------------- weight packing

def pack_whh(w):
    """(2, G, H, 4H) -> (G, 2H, 8H) block-diagonal, gate-major interleaved
    columns: fwd rows [0,H) hit columns [k*2H, k*2H+H), bwd rows [H,2H)
    hit [k*2H+H, (k+1)*2H)."""
    _, G, H, H4 = w.shape
    wg = w.reshape(2, G, H, 4, H)
    out = jnp.zeros((G, 2 * H, 4, 2 * H), w.dtype)
    out = out.at[:, :H, :, :H].set(wg[0])
    out = out.at[:, H:, :, H:].set(wg[1])
    return out.reshape(G, 2 * H, 8 * H)


def pack_wih_t(wih_t):
    """(2, E, 4H) -> (2E, 8H) with the same column interleave."""
    _, E, H4 = wih_t.shape
    H = H4 // 4
    g = wih_t.reshape(2, E, 4, H)
    out = jnp.zeros((2, E, 4, 2, H), wih_t.dtype)
    out = out.at[0, :, :, 0, :].set(g[0])
    out = out.at[1, :, :, 1, :].set(g[1])
    return out.reshape(2 * E, 8 * H)


def pack_bias(bias):
    """(2, 4H) -> (8H,) interleaved."""
    H = bias.shape[1] // 4
    b = bias.reshape(2, 4, H)
    out = jnp.zeros((4, 2, H), bias.dtype)
    out = out.at[:, 0, :].set(b[0])
    out = out.at[:, 1, :].set(b[1])
    return out.reshape(8 * H)


# ------------------------------------------------------------ packed kernel

def _fwd_kernel_packed(
    *refs, nparts: int, C: int, Bt: int, H: int, compute_dtype, with_states: bool,
):
    parts_f = refs[:nparts]
    parts_b = refs[nparts : 2 * nparts]
    len_ref, w_ref, wih_ref, bias_ref = refs[2 * nparts : 2 * nparts + 4]
    rest = refs[2 * nparts + 4 :]
    if with_states:
        (hsf_ref, hsb_ref, csf_ref, csb_ref, hn_ref, cn_ref,
         h_scr, c_scr) = rest
    else:
        (hsf_ref, hsb_ref, hn_ref, cn_ref, h_scr, c_scr) = rest
        csf_ref = csb_ref = None

    t = pl.program_id(1)
    nT = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    lengths = len_ref[...]  # (Bt, 1) int32
    GPT = w_ref.shape[0]
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
        xp = jnp.concatenate([xf, xb], axis=-1).astype(compute_dtype)
        xg = jax.lax.dot_general(
            xp, wih_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias_ref[...].astype(jnp.float32)[None, :]
        h = h_scr[...]
        hb = h.astype(compute_dtype).reshape(GPT, Bgr, H2)
        rec = jax.lax.dot_general(
            hb, w_ref[...], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(Bt, 8 * H)
        gates = xg + rec
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
        if csf_ref is not None:
            csf_ref[s] = c_scr[:, :H].astype(csf_ref.dtype)
            csb_ref[sb] = c_scr[:, H:].astype(csb_ref.dtype)

    if C <= 4:
        for s in range(C):
            chunk_step(s)
    else:
        jax.lax.fori_loop(0, C, lambda s, carry: (chunk_step(s), carry)[1], 0)

    hn_ref[...] = h_scr[...]
    cn_ref[...] = c_scr[...]


def _w_spec_packed(B, Bt, G, H):
    Bg = B // G
    gpt = Bt // Bg if Bt > Bg else 1
    return pl.BlockSpec(
        (gpt, 2 * H, 8 * H),
        lambda b, t: ((b * Bt) // (Bg * gpt), 0, 0),
        memory_space=pltpu.VMEM,
    )


def _fwd_pallas_packed(x_parts, lengths, w_packed, wih_packed, bias_packed, *,
                       Bt: int, C: int, G: int, H: int, compute_dtype,
                       with_states: bool):
    Tp, B, _ = x_parts[0].shape
    part_dims = [p.shape[-1] for p in x_parts]
    nB, nT = B // Bt, Tp // C

    fwd = lambda b, t: (t, b, 0)
    mir = lambda b, t: (nT - 1 - t, b, 0)
    lmap = lambda b, t: (b, 0)
    onb = lambda b, t: (b, 0)

    st_out = pl.BlockSpec((C, Bt, H), fwd, memory_space=pltpu.VMEM)
    st_out_m = pl.BlockSpec((C, Bt, H), mir, memory_space=pltpu.VMEM)
    st_shape = jax.ShapeDtypeStruct((Tp, B, H), compute_dtype)
    out_specs = [st_out, st_out_m]
    out_shape = [st_shape, st_shape]
    if with_states:
        out_specs += [st_out, st_out_m]
        out_shape += [st_shape, st_shape]
    out_specs += [
        pl.BlockSpec((Bt, 2 * H), onb, memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, 2 * H), onb, memory_space=pltpu.VMEM),
    ]
    out_shape += [
        jax.ShapeDtypeStruct((B, 2 * H), jnp.float32),
        jax.ShapeDtypeStruct((B, 2 * H), jnp.float32),
    ]

    kernel = functools.partial(
        _fwd_kernel_packed, nparts=len(x_parts), C=C, Bt=Bt, H=H,
        compute_dtype=compute_dtype, with_states=with_states,
    )
    return pl.pallas_call(
        kernel,
        grid=(nB, nT),
        in_specs=(
            _part_specs(part_dims, C, Bt, fwd)
            + _part_specs(part_dims, C, Bt, mir)
            + [
                pl.BlockSpec((Bt, 1), lmap, memory_space=pltpu.VMEM),
                _w_spec_packed(B, Bt, G, H),
                _resident_spec(wih_packed.shape),
                _resident_spec(bias_packed.shape),
            ]
        ),
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((Bt, 2 * H), jnp.float32) for _ in range(2)],
        interpret=_interpret(),
    )(*x_parts, *x_parts, lengths, w_packed, wih_packed, bias_packed)


# ------------------------------------------------------------ packed bwd

def _bwd_kernel_packed(
    *refs, nparts: int, C: int, Bt: int, H: int, compute_dtype,
    shift_in_kernel: bool,
):
    parts_f = refs[:nparts]
    parts_b = refs[nparts : 2 * nparts]
    (len_ref, w_ref, wih_ref, wihT_ref, bias_ref,
     hpf_ref, cpf_ref, hpb_ref, cpb_ref, dyf_ref, dyb_ref,
     dhn_ref, dcn_ref) = refs[2 * nparts : 2 * nparts + 13]
    outs = refs[2 * nparts + 13 :]
    dxf_refs = outs[:nparts]
    dxb_refs = outs[nparts : 2 * nparts]
    (dw_tiles_ref, dwih_tiles_ref, dbias_tiles_ref) = outs[
        2 * nparts : 2 * nparts + 3
    ]
    dh_scr, dc_scr, dw_scr, dwih_scr, dbias_scr = outs[2 * nparts + 3 :]

    t = pl.program_id(1)
    nT = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        dh_scr[...] = dhn_ref[...]
        dc_scr[...] = dcn_ref[...]
        dw_scr[...] = jnp.zeros_like(dw_scr)
        dwih_scr[...] = jnp.zeros_like(dwih_scr)
        dbias_scr[...] = jnp.zeros_like(dbias_scr)

    lengths = len_ref[...]
    GPT = dw_scr.shape[0]
    Bgr = Bt // GPT
    H2 = 2 * H
    E2 = dwih_scr.shape[0]

    def chunk_step(i):
        s = C - 1 - i
        pos_f = (nT - 1 - t) * C + s
        pos_b = t * C + i
        h_prev = jnp.concatenate(
            [hpf_ref[s], hpb_ref[i]], axis=-1
        ).astype(jnp.float32)
        c_prev = jnp.concatenate(
            [cpf_ref[s], cpb_ref[i]], axis=-1
        ).astype(jnp.float32)
        if shift_in_kernel:
            # float mask, not bool: concatenating (Bt, H) i1 vectors trips a
            # Mosaic "Invalid vector register cast" (i1->i32 vreg bitcast)
            # on this libtpu; the float concat matches the fwd kernel's m.
            bf = jnp.float32(pos_f == 0)
            bb = jnp.float32(pos_b == nT * C - 1)
            keep = 1.0 - jnp.concatenate(
                [
                    jnp.broadcast_to(bf, (Bt, H)),
                    jnp.broadcast_to(bb, (Bt, H)),
                ],
                axis=1,
            )
            h_prev = h_prev * keep
            c_prev = c_prev * keep

        pf = [p[s] for p in parts_f]
        pb = [p[i] for p in parts_b]
        xf = pf[0] if nparts == 1 else jnp.concatenate(pf, axis=-1)
        xb = pb[0] if nparts == 1 else jnp.concatenate(pb, axis=-1)
        xp = jnp.concatenate([xf, xb], axis=-1).astype(compute_dtype)
        xg = jax.lax.dot_general(
            xp, wih_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias_ref[...].astype(jnp.float32)[None, :]
        hb = h_prev.astype(compute_dtype).reshape(GPT, Bgr, H2)
        rec = jax.lax.dot_general(
            hb, w_ref[...], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(Bt, 8 * H)
        gates = xg + rec
        ig = jax.nn.sigmoid(gates[:, :H2])
        f = jax.nn.sigmoid(gates[:, H2 : 2 * H2])
        gg_ = jnp.tanh(gates[:, 2 * H2 : 3 * H2])
        o = jax.nn.sigmoid(gates[:, 3 * H2 :])
        c_new = f * c_prev + ig * gg_

        dy = jnp.concatenate(
            [dyf_ref[s], dyb_ref[i]], axis=-1
        ).astype(jnp.float32)
        dh = dh_scr[...] + dy
        dc = dc_scr[...]
        mf = jnp.where(pos_f < lengths, 1.0, 0.0).astype(jnp.float32)
        mb = jnp.where(pos_b < lengths, 1.0, 0.0).astype(jnp.float32)
        m = jnp.concatenate(
            [jnp.broadcast_to(mf, (Bt, H)), jnp.broadcast_to(mb, (Bt, H))],
            axis=1,
        )

        tc = jnp.tanh(c_new)
        do = dh * tc
        dc_t = dc + dh * o * (1.0 - tc * tc)
        dgi = (dc_t * gg_) * ig * (1.0 - ig) * m
        dgf = (dc_t * c_prev) * f * (1.0 - f) * m
        dgg = (dc_t * ig) * (1.0 - gg_ * gg_) * m
        dgo = do * o * (1.0 - o) * m
        dgates = jnp.concatenate([dgi, dgf, dgg, dgo], axis=-1)  # (Bt, 8H)
        dgc = dgates.astype(compute_dtype)

        # dx (packed): (Bt, 8H) @ (8H, 2E) -> (Bt, 2E)
        dx = jax.lax.dot_general(
            dgc, wihT_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        offs = 0
        for p_idx in range(nparts):
            E = dxf_refs[p_idx].shape[-1]
            dxf_refs[p_idx][s] = dx[:, offs : offs + E].astype(
                dxf_refs[p_idx].dtype
            )
            dxb_refs[p_idx][i] = dx[:, E2 // 2 + offs : E2 // 2 + offs + E].astype(
                dxb_refs[p_idx].dtype
            )
            offs += E

        dwih_scr[...] += jax.lax.dot_general(
            xp, dgc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbias_scr[...] += jnp.sum(dgates, axis=0, keepdims=True)

        dgb = dgc.reshape(GPT, Bgr, 8 * H)
        # dhp via the SAME packed w block, contracting the 8H axis of both
        # operands (NT gemm) — no separate transposed-weight stream
        dhp = jax.lax.dot_general(
            dgb, w_ref[...], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(Bt, H2)
        dw_scr[...] += jax.lax.dot_general(
            hb, dgb, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dh_scr[...] = dhp + dh * (1.0 - m)
        dc_scr[...] = dc_t * f * m + dc * (1.0 - m)

    if C <= 4:
        for i in range(C):
            chunk_step(i)
    else:
        jax.lax.fori_loop(0, C, lambda i, carry: (chunk_step(i), carry)[1], 0)

    dw_tiles_ref[0] = dw_scr[...]
    dwih_tiles_ref[0] = dwih_scr[...]
    dbias_tiles_ref[0] = dbias_scr[...]


def _bwd_pallas_packed(
    x_parts, lengths, w_packed, wih_packed, wihT_packed, bias_packed,
    hp_f, cp_f, hp_b, cp_b, dy_f, dy_b, dhn_p, dcn_p,
    *, Bt: int, C: int, G: int, H: int, compute_dtype,
    shift_in_kernel: bool = False,
):
    """Packed analogue of v5's _bwd_pallas. dhn_p/dcn_p are (B, 2H);
    returns dxf, dxb, dw_packed (G,2H,8H), dwih_packed (2E,8H),
    dbias_packed (8H,)."""
    Tp, B, _ = x_parts[0].shape
    E2 = wih_packed.shape[0]
    part_dims = [p.shape[-1] for p in x_parts]
    nB, nT = B // Bt, Tp // C
    Bg = B // G
    GPT = Bt // Bg if Bt > Bg else 1

    mir = lambda b, t: (nT - 1 - t, b, 0)
    fwd = lambda b, t: (t, b, 0)
    lmap = lambda b, t: (b, 0)
    onb = lambda b, t: (b, 0)
    if shift_in_kernel:
        prev_f = lambda b, t: (jnp.maximum(nT - 2 - t, 0), b, 0)
        prev_b = lambda b, t: (jnp.minimum(t + 1, nT - 1), b, 0)
    else:
        prev_f, prev_b = mir, fwd

    kernel = functools.partial(
        _bwd_kernel_packed, nparts=len(x_parts), C=C, Bt=Bt, H=H,
        compute_dtype=compute_dtype, shift_in_kernel=shift_in_kernel,
    )
    dx_shape = [
        jax.ShapeDtypeStruct((Tp, B, E), compute_dtype) for E in part_dims
    ]
    out = pl.pallas_call(
        kernel,
        grid=(nB, nT),
        in_specs=(
            _part_specs(part_dims, C, Bt, mir)
            + _part_specs(part_dims, C, Bt, fwd)
            + [
                pl.BlockSpec((Bt, 1), lmap, memory_space=pltpu.VMEM),
                _w_spec_packed(B, Bt, G, H),
                _resident_spec(wih_packed.shape),
                _resident_spec(wihT_packed.shape),
                _resident_spec(bias_packed.shape),
                pl.BlockSpec((C, Bt, H), prev_f, memory_space=pltpu.VMEM),
                pl.BlockSpec((C, Bt, H), prev_f, memory_space=pltpu.VMEM),
                pl.BlockSpec((C, Bt, H), prev_b, memory_space=pltpu.VMEM),
                pl.BlockSpec((C, Bt, H), prev_b, memory_space=pltpu.VMEM),
                pl.BlockSpec((C, Bt, H), mir, memory_space=pltpu.VMEM),
                pl.BlockSpec((C, Bt, H), fwd, memory_space=pltpu.VMEM),
                pl.BlockSpec((Bt, 2 * H), onb, memory_space=pltpu.VMEM),
                pl.BlockSpec((Bt, 2 * H), onb, memory_space=pltpu.VMEM),
            ]
        ),
        out_specs=(
            _part_specs(part_dims, C, Bt, mir)
            + _part_specs(part_dims, C, Bt, fwd)
            + [
                pl.BlockSpec(
                    (1, GPT, 2 * H, 8 * H),
                    lambda b, t: (b, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, E2, 8 * H),
                    lambda b, t: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, 8 * H),
                    lambda b, t: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ]
        ),
        out_shape=(
            dx_shape
            + dx_shape
            + [
                jax.ShapeDtypeStruct((nB, GPT, 2 * H, 8 * H), jnp.float32),
                jax.ShapeDtypeStruct((nB, E2, 8 * H), jnp.float32),
                jax.ShapeDtypeStruct((nB, 1, 8 * H), jnp.float32),
            ]
        ),
        scratch_shapes=[
            pltpu.VMEM((Bt, 2 * H), jnp.float32),
            pltpu.VMEM((Bt, 2 * H), jnp.float32),
            pltpu.VMEM((GPT, 2 * H, 8 * H), jnp.float32),
            pltpu.VMEM((E2, 8 * H), jnp.float32),
            pltpu.VMEM((1, 8 * H), jnp.float32),
        ],
        interpret=_interpret(),
    )(*x_parts, *x_parts, lengths, w_packed, wih_packed, wihT_packed,
      bias_packed, hp_f, cp_f, hp_b, cp_b, dy_f, dy_b, dhn_p, dcn_p)

    nP = len(x_parts)
    dxf, dxb = out[:nP], out[nP : 2 * nP]
    dw_tiles, dwih_tiles, dbias_tiles = out[2 * nP : 2 * nP + 3]
    return dxf, dxb, dw_tiles, dwih_tiles, dbias_tiles


def unpack_blockdiag(p, H):
    """(..., 2R, 8H) packed -> (2, ..., R, 4H): diagonal blocks only (the
    cross blocks are accumulation garbage, never read). Works for dW_hh
    (R == H) and dW_ih (R == E_total)."""
    lead, R2 = p.shape[:-2], p.shape[-2]
    R = R2 // 2
    g = p.reshape(lead + (R2, 4, 2, H))
    f = g[..., :R, :, 0, :].reshape(lead + (R, 4 * H))
    b = g[..., R:, :, 1, :].reshape(lead + (R, 4 * H))
    return jnp.stack([f, b])


def unpack_dbias(db_packed, H):
    """(..., 8H) -> (2, ..., 4H)."""
    lead = db_packed.shape[:-1]
    g = db_packed.reshape(lead + (4, 2, H))
    return jnp.stack(
        [g[..., 0, :].reshape(lead + (4 * H,)),
         g[..., 1, :].reshape(lead + (4 * H,))]
    )


# ------------------------------------------------------------------- driver

def run(B=400, T=1500, H=64, G=5, E=64, compute_dtype=jnp.bfloat16, n_rounds=5):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.3, (T, B, E)).astype(np.float32)).astype(
        compute_dtype
    )
    lens = rng.integers(T // 2, T + 1, size=B)
    lens[0] = T
    lengths = jnp.asarray(lens.reshape(B, 1).astype(np.int32))
    w_hh_t = jnp.asarray(rng.normal(0, 0.1, (2, G, H, 4 * H)).astype(np.float32))
    w_ih = jnp.asarray(rng.normal(0, 0.1, (2, 4 * H, E)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, (2, 4 * H)).astype(np.float32))

    Bt, C, Tp = pick_tiles(B, T, H, G, compute_dtype, E)
    assert Tp == T
    print(f"tiles: Bt={Bt} C={C}")

    wih_t, _, bias_f = _wih_operands(w_ih, bias, compute_dtype)
    w_c = w_hh_t.astype(compute_dtype)

    wp = pack_whh(w_hh_t).astype(compute_dtype)
    wihp = pack_wih_t(wih_t)
    bp = pack_bias(bias_f)

    v5 = jax.jit(
        lambda x: _fwd_pallas(
            (x,), lengths, w_c, wih_t, bias_f,
            Bt=Bt, C=C, G=G, compute_dtype=compute_dtype, with_states=False,
        )
    )
    packed = jax.jit(
        lambda x: _fwd_pallas_packed(
            (x,), lengths, wp, wihp, bp,
            Bt=Bt, C=C, G=G, H=H, compute_dtype=compute_dtype,
            with_states=False,
        )
    )

    r5 = v5(x)
    rp = packed(x)
    # correctness: same values (packed GEMMs add exact zero terms)
    tol = 2e-2 if compute_dtype == jnp.bfloat16 else 1e-5
    for a, b, name in [(r5[0], rp[0], "hs_f"), (r5[1], rp[1], "hs_b")]:
        err = float(jnp.max(jnp.abs(
            np.asarray(a, np.float32) - np.asarray(b, np.float32)
        )))
        print(f"{name}: max|diff| = {err:.3e}")
        assert err < tol, (name, err)

    # hn layout differs: v5 (2,B,H); packed (B,2H) -> compare halves
    hn5 = np.asarray(r5[2])
    hnp = np.asarray(rp[2])
    np.testing.assert_allclose(hn5[0], hnp[:, :H], atol=1e-4)
    np.testing.assert_allclose(hn5[1], hnp[:, H:], atol=1e-4)

    # timing: best-of-n_rounds, 10 dispatches per round chained on the
    # hs_f output (shape == x at E == H) so the sweeps serialize
    def timeit(fn, label):
        best = float("inf")
        for _ in range(n_rounds):
            xx = x
            t0 = time.perf_counter()
            for _ in range(10):
                out = fn(xx)
                xx = out[0] if out[0].shape == x.shape else x
            float(jnp.sum(out[2].astype(jnp.float32)))
            best = min(best, (time.perf_counter() - t0) / 10)
        print(f"{label}: {best*1e3:.3f} ms/sweep")
        return best

    t5 = timeit(v5, "v5   fwd")
    tp = timeit(packed, "packed fwd")
    print(f"speedup: {t5/tp:.3f}x")
    return t5, tp


def run_bwd(B=400, T=1500, H=64, G=5, E=64, compute_dtype=jnp.bfloat16,
            n_rounds=5, Bt=None):
    from intrepppid_tpu.ops.lstm_pallas_layer import (
        _bwd_pallas,
        _reduce_dw_tiles,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.3, (T, B, E)).astype(np.float32)).astype(
        compute_dtype
    )
    lens = rng.integers(T // 2, T + 1, size=B)
    lens[0] = T
    lengths = jnp.asarray(lens.reshape(B, 1).astype(np.int32))
    w_hh_t = jnp.asarray(rng.normal(0, 0.1, (2, G, H, 4 * H)).astype(np.float32))
    w_ih = jnp.asarray(rng.normal(0, 0.1, (2, 4 * H, E)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, (2, 4 * H)).astype(np.float32))

    if Bt is None:
        Bt, C, _ = pick_tiles(B, T, H, G, compute_dtype, E)
    else:
        C = 1
    print(f"bwd tiles: Bt={Bt} C={C}")
    Bg = B // G
    GPT = Bt // Bg if Bt > Bg else 1
    nB = B // Bt

    wih_t, wih, bias_f = _wih_operands(w_ih, bias, compute_dtype)
    w_c = w_hh_t.astype(compute_dtype)
    wT_c = jnp.swapaxes(w_c, -1, -2)
    wp = pack_whh(w_hh_t).astype(compute_dtype)
    wihp = pack_wih_t(wih_t)
    wihTp = jnp.swapaxes(wihp, 0, 1)
    bp = pack_bias(bias_f)

    # residual states from the v5 forward (identical values either way)
    hs_f, hs_b, cs_f, cs_b, hn, cn = jax.jit(
        lambda x: _fwd_pallas(
            (x,), lengths, w_c, wih_t, bias_f,
            Bt=Bt, C=C, G=G, compute_dtype=compute_dtype, with_states=True,
        )
    )(x)

    dy_f = jnp.asarray(rng.normal(0, 0.2, (T, B, H)).astype(np.float32)).astype(
        compute_dtype
    )
    dy_b = jnp.asarray(rng.normal(0, 0.2, (T, B, H)).astype(np.float32)).astype(
        compute_dtype
    )
    dhn = jnp.asarray(rng.normal(0, 0.2, (2, B, H)).astype(np.float32))
    dcn = jnp.asarray(rng.normal(0, 0.2, (2, B, H)).astype(np.float32))
    dhn_p = jnp.concatenate([dhn[0], dhn[1]], axis=-1)
    dcn_p = jnp.concatenate([dcn[0], dcn[1]], axis=-1)

    # big arrays (x, residual streams, dy) are explicit jit ARGS — captured
    # closures become HLO constants, and the axon remote-compile endpoint
    # rejects the ~400 MB upload with HTTP 413
    v5 = jax.jit(
        lambda x, hs_f, cs_f, hs_b, cs_b, dy_f, dy_b: _bwd_pallas(
            (x,), lengths, w_c, wT_c, wih_t, wih, bias_f,
            hs_f, cs_f, hs_b, cs_b, dy_f, dy_b, dhn, dcn,
            Bt=Bt, C=C, G=G, compute_dtype=compute_dtype,
            shift_in_kernel=True,
        )
    )

    def packed_fn(x, hs_f, cs_f, hs_b, cs_b, dy_f, dy_b):
        dxf, dxb, dw_tiles, dwih_tiles, dbias_tiles = _bwd_pallas_packed(
            (x,), lengths, wp, wihp, wihTp, bp,
            hs_f, cs_f, hs_b, cs_b, dy_f, dy_b, dhn_p, dcn_p,
            Bt=Bt, C=C, G=G, H=H, compute_dtype=compute_dtype,
            shift_in_kernel=True,
        )
        dw_u = unpack_blockdiag(dw_tiles, H)       # (2, nB, GPT, H, 4H)
        dw = _reduce_dw_tiles(
            jnp.swapaxes(dw_u, 0, 1), nB, Bt, Bg, G, GPT, H, 4 * H
        )
        dwih = unpack_blockdiag(jnp.sum(dwih_tiles, axis=0), H)  # (2, E, 4H)
        dbias = unpack_dbias(jnp.sum(dbias_tiles, axis=(0, 1)), H)
        return dxf, dxb, dw, dwih, dbias

    packed = jax.jit(packed_fn)

    operands = (x, hs_f, cs_f, hs_b, cs_b, dy_f, dy_b)
    r5 = v5(*operands)
    rp = packed(*operands)
    names = ["dxf", "dxb", "dw", "dwih", "dbias"]
    for n, a, b in zip(names, r5, rp):
        a = a[0] if isinstance(a, (list, tuple)) else a
        b = b[0] if isinstance(b, (list, tuple)) else b
        a32, b32 = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(a32).max(), 1e-6)
        err = np.abs(a32 - b32).max() / scale
        print(f"{n}: rel max|diff| = {err:.3e}")
        assert err < 1e-2, (n, err)

    def timeit(fn, label):
        best = float("inf")
        for _ in range(n_rounds):
            t0 = time.perf_counter()
            for k in range(10):
                out = fn(*operands)
            float(jnp.sum(out[2].astype(jnp.float32)))
            best = min(best, (time.perf_counter() - t0) / 10)
        print(f"{label}: {best*1e3:.3f} ms/sweep")
        return best

    t5 = timeit(v5, "v5   bwd")
    tp = timeit(packed, "packed bwd")
    print(f"bwd speedup: {t5/tp:.3f}x")
    return t5, tp


def unpack_dbias(db_packed, H):
    """(8H,) packed -> (2, 4H)."""
    g = db_packed.reshape(4, 2, H)
    return jnp.stack(
        [g[:, 0, :].reshape(4 * H), g[:, 1, :].reshape(4 * H)]
    )


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--bwd", action="store_true")
    ap.add_argument("--bt", type=int, default=None)
    args = ap.parse_args()
    if args.bwd:
        run_bwd(Bt=args.bt)
    else:
        run()
