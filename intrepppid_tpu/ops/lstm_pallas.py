"""Pallas fused LSTM recurrence for TPU.

The lax.scan path (ops/lstm.py) launches one tiny fused step per timestep:
at T=1500 the per-step overhead dominates (measured ~100 ms forward /
~190 ms forward+backward for the quintuplet batch on v5e). These kernels
run the whole time loop on-chip: hidden/cell state lives in VMEM scratch,
the precomputed input gates stream HBM->VMEM in time chunks through
Pallas's automatic double-buffered pipeline, and each step issues one MXU
matmul per direction(/group).

Division of labour:
  * the big input projection ``x @ W_ih^T`` (all timesteps) stays in XLA —
    it is a single large MXU GEMM that XLA already schedules optimally;
  * the sequential recurrence (the part XLA cannot pipeline) is fused here;
  * the backward recurrence is a second kernel (BPTT with gate
    recomputation — one extra matmul per step instead of storing gates),
    wired up via ``jax.custom_vjp``.

Layout/conventions:
  * D = 2 directions stacked (forward scans chunks left->right; the caller
    time-reverses the reverse direction's inputs, exactly like the scan
    path);
  * G = weight groups (per-logical-call weight-dropped ``W_hh``; G=1 means
    shared weights). Batch is group-major, B % G == 0;
  * weights are passed pre-transposed as ``(D, G, H, 4H)`` so the kernel
    computes ``h @ w`` directly; gate order i, f, g, o (torch);
  * ``valid`` masking freezes state updates beyond each row's (per-call)
    max length — bitwise-identical semantics to the scan path.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 13 * 1024 * 1024  # VMEM is ~16 MiB/core; leave headroom


def _interpret() -> bool:
    """Pallas interpret mode off-TPU (CPU tests); compiled on tpu/axon."""
    platform = jax.devices()[0].platform.lower()
    return platform not in ("tpu", "axon")


def _pick_chunk(T: int, D: int, B: int, H: int, kind: str) -> int:
    """Largest divisor-of-T chunk whose double-buffered streamed blocks fit
    the VMEM budget, accounting for lane padding (last dim pads to 128).

    "fwd" streams xg+mask in, hs/cs out, plus hn/cn blocks and h/c scratch;
    "bwd" additionally streams hs_prev/cs_prev/dhs in and dxg out, plus dw
    scratch/out and dh/dc scratch.
    """
    Hp = ((H + 127) // 128) * 128  # lane-padded hidden
    H4p = ((4 * H + 127) // 128) * 128
    xg_t = D * B * H4p * 4
    st_t = D * B * Hp * 4  # one (D,B,H) f32 stream per step
    mask_t = D * B * 4
    state_blk = D * B * Hp * 4
    if kind == "fwd":
        per_step = xg_t + mask_t + 2 * st_t
        fixed = 2 * 2 * state_blk + 2 * state_blk  # hn/cn outs (dbl) + scratch
    else:
        per_step = 2 * xg_t + mask_t + 3 * st_t
        fixed = 2 * 2 * state_blk + 2 * state_blk + 3 * D * Hp * H4p * 4
    best = 1
    for c in range(1, min(T, 16) + 1):
        if T % c == 0 and 2 * c * per_step + fixed <= _VMEM_BUDGET:
            best = c
    return best


def _gates(xg, h, w, G: int, compute_dtype):
    """xg (D,B,4H) f32 + per-direction(/group) h @ w -> presigmoid gates."""
    D, B, H4 = xg.shape
    H = h.shape[-1]
    hb = h.astype(compute_dtype)
    outs = []
    for d in range(D):
        if G == 1:
            outs.append(
                jax.lax.dot_general(
                    hb[d], w[d, 0],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        else:
            Bg = B // G
            parts = [
                jax.lax.dot_general(
                    hb[d, g * Bg : (g + 1) * Bg], w[d, g],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for g in range(G)
            ]
            outs.append(jnp.concatenate(parts, axis=0))
    return xg + jnp.stack(outs)


def _cell(gates, c_prev):
    H = c_prev.shape[-1]
    i = jax.nn.sigmoid(gates[..., :H])
    f = jax.nn.sigmoid(gates[..., H : 2 * H])
    g = jnp.tanh(gates[..., 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[..., 3 * H :])
    c_new = f * c_prev + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new, (i, f, g, o)


# ----------------------------------------------------------------- forward

def _fwd_kernel(
    xg_ref, valid_ref, w_ref,
    hs_ref, cs_ref, hn_ref, cn_ref,
    h_scr, c_scr,
    *, C: int, G: int, compute_dtype,
):
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    for s in range(C):
        h = h_scr[...]
        c = c_scr[...]
        gates = _gates(xg_ref[s], h, w_ref[...], G, compute_dtype)
        h_new, c_new, _ = _cell(gates, c)
        # f32 mask: Mosaic cannot insert a minor dim on 1-bit vectors
        m = valid_ref[s].astype(jnp.float32)[..., None]
        h = m * h_new + (1.0 - m) * h
        c = m * c_new + (1.0 - m) * c
        h_scr[...] = h
        c_scr[...] = c
        hs_ref[s] = h
        cs_ref[s] = c

    hn_ref[...] = h_scr[...]
    cn_ref[...] = c_scr[...]


def _fwd_pallas(xg, valid, w, *, G: int, compute_dtype):
    T, D, B, H4 = xg.shape
    H = H4 // 4
    C = _pick_chunk(T, D, B, H, "fwd")
    nT = T // C

    grid_spec = dict(
        grid=(nT,),
        in_specs=[
            pl.BlockSpec((C, D, B, H4), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, D, B), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, G, H, H4), lambda t: (0, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((C, D, B, H), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, D, B, H), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, B, H), lambda t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, B, H), lambda t: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(_fwd_kernel, C=C, G=G, compute_dtype=compute_dtype)
    return pl.pallas_call(
        kernel,
        **grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, D, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, D, B, H), jnp.float32),
            jax.ShapeDtypeStruct((D, B, H), jnp.float32),
            jax.ShapeDtypeStruct((D, B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((D, B, H), jnp.float32),
            pltpu.VMEM((D, B, H), jnp.float32),
        ],
        interpret=_interpret(),
    )(xg, valid, w)


# ---------------------------------------------------------------- backward

def _bwd_kernel(
    xg_ref, valid_ref, w_ref, wT_ref,
    hs_prev_ref, cs_prev_ref, dhs_ref, dhn_ref, dcn_ref,
    dxg_ref, dw_ref,
    dh_scr, dc_scr, dw_scr,
    *, C: int, G: int, compute_dtype,
):
    k = pl.program_id(0)  # 0 .. nT-1, walking time chunks from the END

    @pl.when(k == 0)
    def _():
        dh_scr[...] = dhn_ref[...]
        dc_scr[...] = dcn_ref[...]
        dw_scr[...] = jnp.zeros_like(dw_scr)

    D, B, H = dh_scr.shape

    for s in reversed(range(C)):
        # previous-state (t-1) values come pre-shifted from XLA (zeros at t=0)
        h_prev = hs_prev_ref[s]
        c_prev = cs_prev_ref[s]

        gates = _gates(xg_ref[s], h_prev, w_ref[...], G, compute_dtype)
        _, c_new, (i, f, g, o) = _cell(gates, c_prev)

        dh = dh_scr[...] + dhs_ref[s]
        dc = dc_scr[...]
        m = valid_ref[s].astype(jnp.float32)[..., None]

        tc = jnp.tanh(c_new)
        do = dh * tc
        dc_t = dc + dh * o * (1.0 - tc * tc)
        di = dc_t * g
        dg = dc_t * i
        df = dc_t * c_prev

        dgi = di * i * (1.0 - i)
        dgf = df * f * (1.0 - f)
        dgg = dg * (1.0 - g * g)
        dgo = do * o * (1.0 - o)
        dgates = jnp.concatenate([dgi, dgf, dgg, dgo], axis=-1) * m

        # carries: masked steps pass gradients straight through
        dc_prev = dc_t * f * m + dc * (1.0 - m)
        dxg_ref[s] = dgates

        dgb = dgates.astype(compute_dtype)
        hpb = h_prev.astype(compute_dtype)
        new_dh = []
        for d in range(D):
            if G == 1:
                # dh_prev = dgates @ w^T : contract 4H
                dhp = jax.lax.dot_general(
                    dgb[d], wT_ref[d, 0],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                # dW += h_prev^T @ dgates : contract B
                dw_scr[d, 0] += jax.lax.dot_general(
                    hpb[d], dgb[d],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                Bg = B // G
                parts = []
                for gi in range(G):
                    sl = slice(gi * Bg, (gi + 1) * Bg)
                    parts.append(
                        jax.lax.dot_general(
                            dgb[d, sl], wT_ref[d, gi],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    )
                    dw_scr[d, gi] += jax.lax.dot_general(
                        hpb[d, sl], dgb[d, sl],
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                dhp = jnp.concatenate(parts, axis=0)
            new_dh.append(dhp)
        dh_prev = jnp.stack(new_dh) + dh * (1.0 - m)
        dh_scr[...] = dh_prev
        dc_scr[...] = dc_prev

    dw_ref[...] = dw_scr[...]


def _bwd_pallas(xg, valid, w, wT, hs_prev, cs_prev, dhs, dhn, dcn, *, G: int, compute_dtype):
    T, D, B, H4 = xg.shape
    H = H4 // 4
    C = _pick_chunk(T, D, B, H, "bwd")
    nT = T // C

    rev = lambda t: (nT - 1 - t, 0, 0, 0)
    rev3 = lambda t: (nT - 1 - t, 0, 0)
    fixed = lambda t: (0, 0, 0)
    fixed4 = lambda t: (0, 0, 0, 0)

    grid_spec = dict(
        grid=(nT,),
        in_specs=[
            pl.BlockSpec((C, D, B, H4), rev, memory_space=pltpu.VMEM),   # xg
            pl.BlockSpec((C, D, B), rev3, memory_space=pltpu.VMEM),      # valid
            pl.BlockSpec((D, G, H, H4), fixed4, memory_space=pltpu.VMEM),  # w
            pl.BlockSpec((D, G, H4, H), fixed4, memory_space=pltpu.VMEM),  # wT
            pl.BlockSpec((C, D, B, H), rev, memory_space=pltpu.VMEM),    # hs_prev
            pl.BlockSpec((C, D, B, H), rev, memory_space=pltpu.VMEM),    # cs_prev
            pl.BlockSpec((C, D, B, H), rev, memory_space=pltpu.VMEM),    # dhs
            pl.BlockSpec((D, B, H), fixed, memory_space=pltpu.VMEM),     # dhn
            pl.BlockSpec((D, B, H), fixed, memory_space=pltpu.VMEM),     # dcn
        ],
        out_specs=[
            pl.BlockSpec((C, D, B, H4), rev, memory_space=pltpu.VMEM),   # dxg
            pl.BlockSpec((D, G, H, H4), fixed4, memory_space=pltpu.VMEM),  # dw
        ],
    )
    kernel = functools.partial(_bwd_kernel, C=C, G=G, compute_dtype=compute_dtype)
    return pl.pallas_call(
        kernel,
        **grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, D, B, H4), jnp.float32),
            jax.ShapeDtypeStruct((D, G, H, H4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((D, B, H), jnp.float32),
            pltpu.VMEM((D, B, H), jnp.float32),
            pltpu.VMEM((D, G, H, H4), jnp.float32),
        ],
        interpret=_interpret(),
    )(xg, valid, w, wT, hs_prev, cs_prev, dhs, dhn, dcn)


# ------------------------------------------------------------- public VJP op

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_lstm_recurrence(xg, valid, w, G: int = 1, compute_dtype=jnp.bfloat16):
    """Run the masked LSTM recurrence over precomputed input gates.

    :param xg: ``(T, D, B, 4H)`` float32 — ``x @ W_ih^T + b`` per direction,
        with the reverse direction's time axis already flipped.
    :param valid: ``(T, D, B)`` int8/bool — state-update mask per step.
    :param w: ``(D, G, H, 4H)`` — recurrent weights, pre-transposed, in
        ``compute_dtype``.
    :returns: ``(hs (T,D,B,H) f32, hn (D,B,H) f32, cn (D,B,H) f32)``.
    """
    hs, cs, hn, cn = _fwd_pallas(
        xg, valid.astype(jnp.int32), w, G=G, compute_dtype=compute_dtype
    )
    return hs, hn, cn


def _fused_fwd(xg, valid, w, G, compute_dtype):
    valid8 = valid.astype(jnp.int32)
    hs, cs, hn, cn = _fwd_pallas(xg, valid8, w, G=G, compute_dtype=compute_dtype)
    return (hs, hn, cn), (xg, valid8, w, hs, cs)


def _fused_bwd(G, compute_dtype, residuals, cotangents):
    xg, valid8, w, hs, cs = residuals
    dhs, dhn, dcn = cotangents
    wT = jnp.swapaxes(w, -1, -2)
    # t-1 states, shifted in XLA (cheap HBM copy) so the backward kernel
    # streams exactly one block per tensor per chunk — no cross-chunk reads
    zero = jnp.zeros_like(hs[:1])
    hs_prev = jnp.concatenate([zero, hs[:-1]], axis=0)
    cs_prev = jnp.concatenate([zero, cs[:-1]], axis=0)
    dxg, dw = _bwd_pallas(
        xg, valid8, w, wT, hs_prev, cs_prev, dhs, dhn, dcn,
        G=G, compute_dtype=compute_dtype,
    )
    return dxg, None, dw.astype(w.dtype)


fused_lstm_recurrence.defvjp(_fused_fwd, _fused_bwd)
