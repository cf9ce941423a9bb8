"""Fused bidirectional LSTM layer — time-major Pallas kernels (v3).

Three layout generations were measured on v5e at the flagship shape
(B=400, T=1500, H=64), full fwd+bwd for the 2-layer stack:

* v1 (lstm_pallas.py): time-major ``(T, 2, B, 4H)`` recurrence kernel —
  kernel ~10 ms fwd, but the XLA glue (einsum + time flip + transpose to
  time-major) adds ~23 ms/layer of HBM copies. 97.5 ms total.
* v2: natural ``(B, T, ·)`` arrays with batch-tiled blocks — no glue, but
  every block DMA becomes ~80 strided 8 KB segments and the per-step matmul
  shrinks to the batch tile. 133 ms total: worse.
* v3 (this file): **time-major, direction-split** ``(T, B, ·)`` arrays.
  The input-projection GEMM writes ``(T, B, 4H)`` directly (no transpose),
  the reverse direction reads mirrored *contiguous* blocks via its index
  map, outputs stay time-major for the next layer, and ``hn`` needs no
  rearrangement. The only transpose in the whole encoder is the initial
  ``x`` to time-major (E=64: ~1 ms).

Grid = (batch tiles, time chunks), time innermost; batch tiling engages
only when VMEM demands it (blocks stay contiguous per time row). State
(h, c) lives in VMEM scratch across each tile's time sweep. Per-call
weight-dropped recurrent weights (G groups, group-major batch) run as G
row-sliced matmuls per step. Masking uses per-row lengths compared against
the global position in-kernel.

Semantics are identical to ops/lstm.py's scan path (value + gradient
parity enforced by tests).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from intrepppid_tpu.ops.lstm_pallas import _interpret

_VMEM_BUDGET = 13 * 1024 * 1024


def pick_tiles(B: int, T: int, H: int, G: int) -> Optional[Tuple[int, int, int]]:
    """Choose (Bt, C, Tp): batch tile, time chunk, padded T.

    Bt must divide the group size B/G (or be a multiple of it) and be a
    multiple of 8 (second-minor block dim); the lane dims (4H, H) meet the
    constraints via padding. C is a free (third-from-minor) dim — only
    VMEM bounds it.
    """
    Hp = ((H + 127) // 128) * 128
    H4 = 4 * H
    Bg = B // G if G > 0 else B

    def vmem(bt: int, c: int) -> int:
        # worst case is backward: xg f/b + dxg f/b in 4H lanes, six state
        # streams in lane-padded H; x2 double buffering
        per_buffer = 4 * c * bt * H4 * 4 + 6 * c * bt * Hp * 4
        fixed = 12 * bt * Hp * 4 + 3 * 2 * G * H * H4 * 4 + 4 * 2 * G * H * H4 * 2
        return 2 * per_buffer + fixed

    candidates = [
        bt
        for bt in range(8, min(B, 1024) + 1, 8)
        if B % bt == 0 and (Bg % bt == 0 or bt % Bg == 0)
    ]
    best = None
    # C is pinned to 1: larger in-kernel time unrolls blow up Mosaic compile
    # time catastrophically (C=8 measured at ~8 min vs 2 s for C=1) while
    # the automatic block pipeline already overlaps the C=1 DMAs.
    for bt in sorted(candidates, reverse=True):
        if vmem(bt, 1) <= _VMEM_BUDGET:
            best = (bt, 1)
            break
    if best is None:
        return None
    bt, c = best
    Tp = ((T + c - 1) // c) * c
    return bt, c, Tp


def _cell(gates, c_prev):
    H = c_prev.shape[-1]
    i = jax.nn.sigmoid(gates[..., :H])
    f = jax.nn.sigmoid(gates[..., H : 2 * H])
    g = jnp.tanh(gates[..., 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[..., 3 * H :])
    c_new = f * c_prev + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new, (i, f, g, o)


def _recur(h, w_ref, d: int, G: int, Bt: int, Bg: int, tile_b, compute_dtype):
    """h (Bt,H) @ per-group weights -> (Bt,4H) f32.

    When a tile sits inside one group (Bt <= Bg) the group index derives
    from the tile index; when it spans several, each group's row slice uses
    its own weights.
    """
    hb = h.astype(compute_dtype)
    if G == 1:
        return jax.lax.dot_general(
            hb, w_ref[d, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if Bt <= Bg:
        g = (tile_b * Bt) // Bg
        return jax.lax.dot_general(
            hb, w_ref[d, g], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    per_tile_groups = Bt // Bg
    parts = []
    for j in range(per_tile_groups):
        g = tile_b * per_tile_groups + j
        parts.append(
            jax.lax.dot_general(
                hb[j * Bg : (j + 1) * Bg], w_ref[d, g],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
        )
    return jnp.concatenate(parts, axis=0)


# ------------------------------------------------------------------ forward

def _fwd_kernel(
    xg_f_ref, xg_b_ref, len_ref, w_ref,
    hsf_ref, hsb_ref, csf_ref, csb_ref, hn_ref, cn_ref,
    hf_scr, cf_scr, hb_scr, cb_scr,
    *, C: int, Bt: int, Bg: int, G: int, compute_dtype,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    nT = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        hf_scr[...] = jnp.zeros_like(hf_scr)
        cf_scr[...] = jnp.zeros_like(cf_scr)
        hb_scr[...] = jnp.zeros_like(hb_scr)
        cb_scr[...] = jnp.zeros_like(cb_scr)

    lengths = len_ref[...]  # (Bt, 1) int32

    def step(d, s_local, pos, xg_ref, h_scr, c_scr, hs_ref, cs_ref):
        m = jnp.where(pos < lengths, 1.0, 0.0).astype(jnp.float32)
        gates = xg_ref[s_local] + _recur(
            h_scr[...], w_ref, d, G, Bt, Bg, b, compute_dtype
        )
        h_new, c_new, _ = _cell(gates, c_scr[...])
        h_scr[...] = m * h_new + (1.0 - m) * h_scr[...]
        c_scr[...] = m * c_new + (1.0 - m) * c_scr[...]
        hs_ref[s_local] = h_scr[...]
        cs_ref[s_local] = c_scr[...]

    for s in range(C):
        step(0, s, t * C + s, xg_f_ref, hf_scr, cf_scr, hsf_ref, csf_ref)
        sb = C - 1 - s
        step(1, sb, (nT - 1 - t) * C + sb, xg_b_ref, hb_scr, cb_scr, hsb_ref, csb_ref)

    hn_ref[0] = hf_scr[...]
    hn_ref[1] = hb_scr[...]
    cn_ref[0] = cf_scr[...]
    cn_ref[1] = cb_scr[...]


def _fwd_pallas(xg_f, xg_b, lengths, w, *, Bt: int, C: int, G: int, compute_dtype):
    """xg_f/xg_b (Tp,B,4H) f32 (natural position order); lengths (B,1) i32;
    w (2,G,H,4H). Returns hs_f, hs_b, cs_f, cs_b (Tp,B,H), hn, cn (2,B,H)."""
    Tp, B, H4 = xg_f.shape
    H = H4 // 4
    nB, nT = B // Bt, Tp // C
    Bg = B // G

    fwd = lambda b, t: (t, b, 0)
    mir = lambda b, t: (nT - 1 - t, b, 0)
    lmap = lambda b, t: (b, 0)
    onb = lambda b, t: (0, b, 0)
    wfix = lambda b, t: (0, 0, 0, 0)

    kernel = functools.partial(
        _fwd_kernel, C=C, Bt=Bt, Bg=Bg, G=G, compute_dtype=compute_dtype
    )
    return pl.pallas_call(
        kernel,
        grid=(nB, nT),
        in_specs=[
            pl.BlockSpec((C, Bt, H4), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Bt, H4), mir, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, 1), lmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, G, H, H4), wfix, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((C, Bt, H), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Bt, H), mir, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Bt, H), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Bt, H), mir, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Bt, H), onb, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Bt, H), onb, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, B, H), jnp.float32),
            jax.ShapeDtypeStruct((Tp, B, H), jnp.float32),
            jax.ShapeDtypeStruct((Tp, B, H), jnp.float32),
            jax.ShapeDtypeStruct((Tp, B, H), jnp.float32),
            jax.ShapeDtypeStruct((2, B, H), jnp.float32),
            jax.ShapeDtypeStruct((2, B, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Bt, H), jnp.float32) for _ in range(4)],
        interpret=_interpret(),
    )(xg_f, xg_b, lengths, w)


# ----------------------------------------------------------------- backward

def _bwd_kernel(
    xg_f_ref, xg_b_ref, len_ref, w_ref, wT_ref,
    hpf_ref, cpf_ref, hpb_ref, cpb_ref, dyf_ref, dyb_ref, dhn_ref, dcn_ref,
    dxg_f_ref, dxg_b_ref, dw_ref,
    dhf_scr, dcf_scr, dhb_scr, dcb_scr, dw_scr,
    *, C: int, Bt: int, Bg: int, G: int, compute_dtype,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    nT = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        dhf_scr[...] = dhn_ref[0]
        dcf_scr[...] = dcn_ref[0]
        dhb_scr[...] = dhn_ref[1]
        dcb_scr[...] = dcn_ref[1]

        @pl.when(b == 0)
        def _():
            dw_scr[...] = jnp.zeros_like(dw_scr)

    lengths = len_ref[...]

    def _dw_accum(d, h_prev, dgb):
        hpb = h_prev.astype(compute_dtype)
        if G == 1:
            dw_scr[d, 0] += jax.lax.dot_general(
                hpb, dgb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return
        if Bt <= Bg:
            g = (b * Bt) // Bg
            dw_scr[d, g] += jax.lax.dot_general(
                hpb, dgb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return
        per_tile_groups = Bt // Bg
        for j in range(per_tile_groups):
            g = b * per_tile_groups + j
            sl = slice(j * Bg, (j + 1) * Bg)
            dw_scr[d, g] += jax.lax.dot_general(
                hpb[sl], dgb[sl], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    def _dh_prev(d, dgb):
        if G == 1:
            return jax.lax.dot_general(
                dgb, wT_ref[d, 0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if Bt <= Bg:
            g = (b * Bt) // Bg
            return jax.lax.dot_general(
                dgb, wT_ref[d, g], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        per_tile_groups = Bt // Bg
        parts = []
        for j in range(per_tile_groups):
            g = b * per_tile_groups + j
            sl = slice(j * Bg, (j + 1) * Bg)
            parts.append(
                jax.lax.dot_general(
                    dgb[sl], wT_ref[d, g], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        return jnp.concatenate(parts, axis=0)

    def direction(d, s_local, pos, xg_ref, hp_ref, cp_ref, dy_ref,
                  dh_scr, dc_scr, dxg_ref):
        h_prev = hp_ref[s_local]
        c_prev = cp_ref[s_local]
        gates = xg_ref[s_local] + _recur(
            h_prev, w_ref, d, G, Bt, Bg, b, compute_dtype
        )
        _, c_new, (i, f, gg_, o) = _cell(gates, c_prev)

        dh = dh_scr[...] + dy_ref[s_local]
        dc = dc_scr[...]
        m = jnp.where(pos < lengths, 1.0, 0.0).astype(jnp.float32)

        tc = jnp.tanh(c_new)
        do = dh * tc
        dc_t = dc + dh * o * (1.0 - tc * tc)
        dgi = (dc_t * gg_) * i * (1.0 - i)
        dgf = (dc_t * c_prev) * f * (1.0 - f)
        dgg = (dc_t * i) * (1.0 - gg_ * gg_)
        dgo = do * o * (1.0 - o)
        dgates = jnp.concatenate([dgi, dgf, dgg, dgo], axis=-1) * m
        dxg_ref[s_local] = dgates

        dgb = dgates.astype(compute_dtype)
        dhp = _dh_prev(d, dgb)
        _dw_accum(d, h_prev, dgb)
        dh_scr[...] = dhp + dh * (1.0 - m)
        dc_scr[...] = dc_t * f * m + dc * (1.0 - m)

    for s in reversed(range(C)):
        # fwd dir BPTT: walks time chunks from the end (block nT-1-t)
        direction(0, s, (nT - 1 - t) * C + s, xg_f_ref, hpf_ref, cpf_ref,
                  dyf_ref, dhf_scr, dcf_scr, dxg_f_ref)
        # bwd dir BPTT: walks position chunks from the front, ascending
        sb = C - 1 - s
        direction(1, sb, t * C + sb, xg_b_ref, hpb_ref, cpb_ref,
                  dyb_ref, dhb_scr, dcb_scr, dxg_b_ref)

    dw_ref[...] = dw_scr[...]


def _bwd_pallas(
    xg_f, xg_b, lengths, w, wT, hp_f, cp_f, hp_b, cp_b, dy_f, dy_b, dhn, dcn,
    *, Bt: int, C: int, G: int, compute_dtype,
):
    Tp, B, H4 = xg_f.shape
    H = H4 // 4
    nB, nT = B // Bt, Tp // C
    Bg = B // G

    mir = lambda b, t: (nT - 1 - t, b, 0)   # fwd-dir BPTT order
    fwd = lambda b, t: (t, b, 0)            # bwd-dir BPTT order
    lmap = lambda b, t: (b, 0)
    onb = lambda b, t: (0, b, 0)
    wfix = lambda b, t: (0, 0, 0, 0)

    kernel = functools.partial(
        _bwd_kernel, C=C, Bt=Bt, Bg=Bg, G=G, compute_dtype=compute_dtype
    )
    return pl.pallas_call(
        kernel,
        grid=(nB, nT),
        in_specs=[
            pl.BlockSpec((C, Bt, H4), mir, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Bt, H4), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, 1), lmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, G, H, H4), wfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, G, H4, H), wfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Bt, H), mir, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Bt, H), mir, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Bt, H), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Bt, H), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Bt, H), mir, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Bt, H), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Bt, H), onb, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Bt, H), onb, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((C, Bt, H4), mir, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Bt, H4), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, G, H, H4), wfix, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, B, H4), jnp.float32),
            jax.ShapeDtypeStruct((Tp, B, H4), jnp.float32),
            jax.ShapeDtypeStruct((2, G, H, H4), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Bt, H), jnp.float32) for _ in range(4)]
        + [pltpu.VMEM((2, G, H, H4), jnp.float32)],
        interpret=_interpret(),
    )(xg_f, xg_b, lengths, w, wT, hp_f, cp_f, hp_b, cp_b, dy_f, dy_b, dhn, dcn)


# ----------------------------------------------------------- layer-level op

def _input_gates(x_parts, w_ih, bias, d: int, compute_dtype):
    """Direction ``d`` input gates (Tp,B,4H) f32 from time-major parts."""
    offs = 0
    total = None
    for part in x_parts:
        E = part.shape[-1]
        wp = w_ih[d, :, offs : offs + E].astype(compute_dtype)
        contrib = jnp.einsum(
            "tbe,ge->tbg", part.astype(compute_dtype), wp,
            preferred_element_type=jnp.float32,
        )
        total = contrib if total is None else total + contrib
        offs += E
    return total + bias[d].astype(jnp.float32)[None, None, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def pallas_bidir_layer(
    x_parts, w_ih, bias, w_hh_t, lengths, G: int, compute_dtype, Bt: int, C: int
):
    """One fully fused bidirectional LSTM layer, time-major.

    :param x_parts: tuple of ``(Tp, B, E_i)`` time-major inputs whose
        feature-concat is the layer input (Tp padded to a multiple of C;
        padded positions must exceed every row's length).
    :param w_ih: ``(2, 4H, E_total)``; ``bias``: ``(2, 4H)`` (b_ih + b_hh).
    :param w_hh_t: ``(2, G, H, 4H)`` pre-transposed recurrent weights.
    :param lengths: ``(B, 1)`` int32 — positions >= length freeze the state.
    :returns: ``(hs_f (Tp,B,H), hs_b (Tp,B,H), hn (2,B,H), cn (2,B,H))``.
    """
    out, _ = _layer_fwd(x_parts, w_ih, bias, w_hh_t, lengths, G, compute_dtype, Bt, C)
    return out


def _layer_fwd(x_parts, w_ih, bias, w_hh_t, lengths, G, compute_dtype, Bt, C):
    xg_f = _input_gates(x_parts, w_ih, bias, 0, compute_dtype)
    xg_b = _input_gates(x_parts, w_ih, bias, 1, compute_dtype)
    hs_f, hs_b, cs_f, cs_b, hn, cn = _fwd_pallas(
        xg_f, xg_b, lengths, w_hh_t.astype(compute_dtype),
        Bt=Bt, C=C, G=G, compute_dtype=compute_dtype,
    )
    residuals = (
        tuple(x_parts), w_ih, w_hh_t, lengths, xg_f, xg_b, hs_f, hs_b, cs_f, cs_b
    )
    return (hs_f, hs_b, hn, cn), residuals


def _layer_bwd(G, compute_dtype, Bt, C, residuals, cots):
    (x_parts, w_ih, w_hh_t, lengths, xg_f, xg_b, hs_f, hs_b, cs_f, cs_b) = residuals
    dy_f, dy_b, dhn, dcn = cots

    w = w_hh_t.astype(compute_dtype)
    wT = jnp.swapaxes(w, -1, -2)
    zero = jnp.zeros_like(hs_f[:1])
    # fwd dir processed positions ascending: prev state at t-1
    hp_f = jnp.concatenate([zero, hs_f[:-1]], axis=0)
    cp_f = jnp.concatenate([zero, cs_f[:-1]], axis=0)
    # bwd dir processed positions descending: prev state at t+1
    hp_b = jnp.concatenate([hs_b[1:], zero], axis=0)
    cp_b = jnp.concatenate([cs_b[1:], zero], axis=0)

    dxg_f, dxg_b, dw = _bwd_pallas(
        xg_f, xg_b, lengths, w, wT, hp_f, cp_f, hp_b, cp_b, dy_f, dy_b, dhn, dcn,
        Bt=Bt, C=C, G=G, compute_dtype=compute_dtype,
    )

    dxg_fc = dxg_f.astype(compute_dtype)
    dxg_bc = dxg_b.astype(compute_dtype)
    dx_parts = []
    offs = 0
    for part in x_parts:
        E = part.shape[-1]
        wp = w_ih[:, :, offs : offs + E].astype(compute_dtype)
        dx = jnp.einsum(
            "tbg,ge->tbe", dxg_fc, wp[0], preferred_element_type=jnp.float32
        ) + jnp.einsum(
            "tbg,ge->tbe", dxg_bc, wp[1], preferred_element_type=jnp.float32
        )
        dx_parts.append(dx.astype(part.dtype))
        offs += E
    dw_ih = jnp.concatenate(
        [
            jnp.stack(
                [
                    jnp.einsum(
                        "tbg,tbe->ge", dxg_fc, part.astype(compute_dtype),
                        preferred_element_type=jnp.float32,
                    ),
                    jnp.einsum(
                        "tbg,tbe->ge", dxg_bc, part.astype(compute_dtype),
                        preferred_element_type=jnp.float32,
                    ),
                ]
            )
            for part in x_parts
        ],
        axis=-1,
    ).astype(w_ih.dtype)
    dbias = jnp.stack(
        [jnp.sum(dxg_f, axis=(0, 1)), jnp.sum(dxg_b, axis=(0, 1))]
    ).astype(w_ih.dtype)
    return tuple(dx_parts), dw_ih, dbias, dw.astype(w_hh_t.dtype), None


pallas_bidir_layer.defvjp(_layer_fwd, _layer_bwd)
