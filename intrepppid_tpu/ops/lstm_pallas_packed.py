"""Direction-packed-lanes bidirectional LSTM kernels (v6).

The v5 kernels (`ops/lstm_pallas_layer.py`) operate the cell math on
``(2, Bt, H)`` f32 vectors. At the flagship H=64 that leaves half of every
128-lane vector register idle through the sweep's measured floor — the 3
sigmoids + 2 tanhs per cell step. This layout packs the two directions
into the lane axis instead:

* state ``(Bt, 2H)`` — forward direction in lanes ``[0, H)``, backward in
  ``[H, 2H)``;
* gates ``(Bt, 8H)`` with gate-major interleaved columns
  ``[i_f i_b | f_f f_b | g_f g_b | o_f o_b]`` so every cell slice
  (``gates[:, k*2H:(k+1)*2H]``) is a full-width register row;
* both GEMMs consume/produce the packed layout directly via block-diagonal
  weights — ``(2E, 8H)`` input projection and a ``(GPT, 2H, 8H)``
  recurrent batched dot at lane width 2H = 128 (at or above the width
  where this libtpu's batched-dot layout pass is safe) — so there is no
  per-step pack/unpack anywhere except the H-wide output writes.

The zero blocks double the GEMM FLOPs on paper, but the unpacked v5 dots
already pad their 64-wide contraction to 128 lanes, so the MXU work is
unchanged while the VPU transcendental count halves. Measured on v5e at
the flagship shape (B=400, T=1500, H=64, bf16): forward sweep 6.96 →
5.67 ms (1.23x), bitwise-equal outputs (the added GEMM terms are exact
zeros). See ``tools/experiment_packed_lanes.py`` for the measurement
driver and ``docs/performance.md`` for the accept/reject record.

Eligibility: ``2*H == 128`` exactly (one packed register row per cell
vector; narrower widths would re-enter the batched-dot-at-<128-lanes
Mosaic crash, wider ones already fill the VPU unpacked). Other shapes use
the v5 kernels. The backward additionally streams ONE packed weight block
(the ``dhp`` contraction reuses it transposed via dimension numbers), not
the separate ``w``+``wT`` pair v5 streams.

Same role as the cuDNN LSTM the reference reaches through
``torch.nn.LSTM(bidirectional=True)`` (`intrepppid/encoders/awd_lstm.py:35-41`).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from intrepppid_tpu.ops.lstm_pallas import _interpret
from intrepppid_tpu.ops.lstm_pallas_layer import (
    _VMEM_BUDGET,
    _PlanDims,
    _part_specs,
    _reduce_dw_tiles,
    _resident_spec,
)

# Thread the packed cell-residual stream (one (Tp, B, 2H) cs instead of two
# half-width cs_f/cs_b) through the layer/stack VJP. Forward-sweep DMA count
# drops by one (measured 1.18x on the standalone train forward); flag so the
# stack-level experiment can A/B the composed fwd+bwd.
PACK_CS = True

# v7: pair-pack the inter-layer boundary of a multi-layer stack — inner
# layers emit ONE (Tp, B, 2H) ys stream (consumed by the upper layer's
# forward under both maps, by their own backward as the packed hp, and
# mirrored by pair-packed dx/dy cotangent streams in the stack VJP).
# Requires PACK_CS. Default OFF — measured and rejected on TPU v5e:
# tools/experiment_pack_boundary.py recorded 1.014x (16.81 -> 16.58 ms
# best-of-7, bitwise gradient parity; measurements/r4/pack_boundary.log),
# inside the run-to-run noise band. At 2 layers there is exactly one
# boundary and the sweeps are already DMA-pipelined, so the single saved
# DMA per sweep doesn't show. Kept (validated) for deeper stacks where
# the boundary count grows.
PACK_BOUNDARY = False

# ----------------------------------------------------------- weight packing


def pack_whh(w):
    """``(2, G, H, 4H) -> (G, 2H, 8H)`` block-diagonal, gate-major
    interleaved columns: fwd rows ``[0, H)`` hit columns
    ``[k*2H, k*2H+H)``, bwd rows ``[H, 2H)`` hit ``[k*2H+H, (k+1)*2H)``."""
    _, G, H, H4 = w.shape
    wg = w.reshape(2, G, H, 4, H)
    out = jnp.zeros((G, 2 * H, 4, 2 * H), w.dtype)
    out = out.at[:, :H, :, :H].set(wg[0])
    out = out.at[:, H:, :, H:].set(wg[1])
    return out.reshape(G, 2 * H, 8 * H)


def pack_wih_t(wih_t):
    """``(2, E, 4H) -> (2E, 8H)`` with the same column interleave."""
    _, E, H4 = wih_t.shape
    H = H4 // 4
    g = wih_t.reshape(2, E, 4, H)
    out = jnp.zeros((2, E, 4, 2, H), wih_t.dtype)
    out = out.at[0, :, :, 0, :].set(g[0])
    out = out.at[1, :, :, 1, :].set(g[1])
    return out.reshape(2 * E, 8 * H)


def pack_bias(bias):
    """``(2, 4H) -> (8H,)`` interleaved."""
    H = bias.shape[1] // 4
    b = bias.reshape(2, 4, H)
    out = jnp.zeros((4, 2, H), bias.dtype)
    out = out.at[:, 0, :].set(b[0])
    out = out.at[:, 1, :].set(b[1])
    return out.reshape(8 * H)


def unpack_blockdiag(p, H):
    """``(..., 2R, 8H)`` packed -> ``(2, ..., R, 4H)``: diagonal blocks only
    (the cross blocks are accumulation garbage — gradients of the exact-zero
    off-diagonal weights — never read). Works for ``dW_hh`` (R == H) and
    ``dW_ih`` (R == E_total)."""
    lead, R2 = p.shape[:-2], p.shape[-2]
    R = R2 // 2
    g = p.reshape(lead + (R2, 4, 2, H))
    f = g[..., :R, :, 0, :].reshape(lead + (R, 4 * H))
    b = g[..., R:, :, 1, :].reshape(lead + (R, 4 * H))
    return jnp.stack([f, b])


def unpack_dbias(db_packed, H):
    """``(..., 8H)`` -> ``(2, ..., 4H)``."""
    lead = db_packed.shape[:-1]
    g = db_packed.reshape(lead + (4, 2, H))
    return jnp.stack(
        [g[..., 0, :].reshape(lead + (4 * H,)),
         g[..., 1, :].reshape(lead + (4 * H,))]
    )


def pack_operands(w_hh_t, wih_t, bias_f, compute_dtype):
    """All packed kernel weight operands from the v5-layout ones. Cheap
    XLA scatters on (sub-MB) weight arrays, fused into the step graph."""
    wp = pack_whh(w_hh_t).astype(compute_dtype)
    wihp = pack_wih_t(wih_t)
    return wp, wihp, jnp.swapaxes(wihp, 0, 1), pack_bias(bias_f)


# -------------------------------------------------------------- plan


def pick_tiles_packed(
    B: int, T: int, H: int, G: int, compute_dtype=jnp.float32, E: int = 0,
    nyparts: int = 1, saved_gates: bool = False,
) -> Optional[Tuple[int, int, int]]:
    """Packed-plan tile choice. Eligible only at ``2*H == 128``.

    ``nyparts`` is the number of dy contribution streams per direction the
    backward will receive (2 when the stack VJP threads the upper layer's
    unsummed dxf/dxb pairs in, 1 for a top/standalone layer).
    ``saved_gates`` budgets the saved-gates backward (activated gates
    streamed from the forward instead of recomputed in-kernel) — measured
    a WASH at the flagship shape and not used in production; see
    ``tools/experiment_saved_gates.py`` and ``docs/performance.md``.

    Exact block accounting (not the v5 ``_PlanDims`` reuse — its ``Ep`` is
    the per-part lane-PADDED stream width, which overstates the weight-side
    arrays whose rows carry the REAL concat width). At the flagship shape
    this totals ~12.0 MB at Bt=400 — measured to compile and run on v5e,
    where the v5 kernels also run Bt=400."""
    if 2 * H != 128:
        return None
    dims = _PlanDims(B, H, G, compute_dtype, E)
    sb = dims.sb
    Hp, H4 = dims.Hp, dims.H4
    Ep = dims.Ep                    # per-part lane-padded stream width
    Ew = max(2 * H, E)              # weight-side (real concat) width
    e2h8 = 2 * Ew * 8 * H           # (2E, 8H) element count

    def bwd_vmem(bt: int, c: int) -> int:
        streams = 2 * (
            2 * c * bt * Ep * sb        # x parts in, both directions
            + 2 * c * bt * Ep * sb      # dx out, both directions
            # hp/cp (x2 dirs) + nyparts dy streams (x2 dirs)
            + (4 + 2 * nyparts) * c * bt * Hp * sb
            # saved-gates mode streams the fwd's activated gates in and
            # drops the wihp resident (the xg recompute is gone)
            + (c * bt * 8 * H * sb if saved_gates else 0)
        )
        gpt = dims.gpt(bt)
        w16 = gpt * 16 * H * H          # (GPT, 2H, 8H) element count
        fixed = (
            2 * 2 * bt * 2 * H * 4      # dhn/dcn in (Bt, 2H) f32, dbl
            + 2 * w16 * sb              # packed w block, dbl
            # wihTp resident always; wihp only in recompute mode
            + (1 if saved_gates else 2) * 2 * e2h8 * sb
            + 2 * bt * 2 * H * 4        # dh/dc scratch (Bt, 2H) f32
            + 3 * w16 * 4               # dw scratch + dbl tile out
            + 3 * e2h8 * 4              # dwih scratch + dbl tile out
        )
        return streams + fixed

    def fwd_vmem(bt: int, c: int) -> int:
        return _fwd_vmem_packed(dims, bt, c, with_gates=saved_gates)

    for bt in dims.candidates():
        if max(bwd_vmem(bt, 1), fwd_vmem(bt, 1)) <= _VMEM_BUDGET:
            return bt, 1, T
    return None


def _fwd_vmem_packed(
    dims: _PlanDims, bt: int, c: int, with_gates: bool = False
) -> int:
    """VMEM footprint of the packed FORWARD sweep at chunk ``c``."""
    sb, Hp, H = dims.sb, dims.Hp, dims.H
    Ep = dims.Ep
    Ew = max(2 * H, dims.E)         # weight-side (real concat) width
    e2h8 = 2 * Ew * 8 * H
    streams = 2 * (
        2 * c * bt * Ep * sb        # x parts in
        + 4 * c * bt * Hp * sb      # hs/cs out
        + (c * bt * 8 * H * sb if with_gates else 0)  # gates out
    )
    gpt = dims.gpt(bt)
    fixed = (
        2 * 2 * bt * 2 * H * 4      # hn/cn out, dbl
        + 2 * gpt * 16 * H * H * sb
        + 2 * e2h8 * sb             # wihp resident, dbl
        + 2 * bt * 2 * H * 4        # h/c scratch
    )
    return streams + fixed


def pick_fwd_chunk(
    B: int, Tp: int, H: int, G: int, compute_dtype, E: int, Bt: int,
    with_gates: bool = False,
) -> int:
    """Independent time chunk for the packed FORWARD sweep.

    The v6 forward runs at the per-grid-step pipeline floor (~3.7 us at
    the flagship shape), so fewer-but-fatter grid steps amortize the fixed
    cost: measured on v5e, C=4 is 1.08x (eval fwd) / 1.10x (train fwd with
    state streams) over C=1, bitwise-identical outputs
    (`tools/experiment_fwd_chunk.py`). The BACKWARD cannot chunk at the
    flagship Bt (its C=2 stream set exceeds VMEM), so the plan's C stays 1
    and only the forward calls use this. Returns the largest c in (4, 2, 1)
    dividing ``Tp`` whose forward footprint fits VMEM."""
    dims = _PlanDims(B, H, G, compute_dtype, E)
    for c in (4, 2, 1):
        if (
            Tp % c == 0
            and _fwd_vmem_packed(dims, Bt, c, with_gates) <= _VMEM_BUDGET
        ):
            return c
    return 1


# ------------------------------------------------------------ forward


def _fwd_kernel_packed(
    *refs, nparts: int, C: int, Bt: int, H: int, compute_dtype,
    with_states: bool, with_gates: bool = False, pack_cs: bool = False,
    x_packed: bool = False, pack_y: bool = False,
):
    if x_packed:
        # layer input is ONE pair-packed (Tp, B, 2H) array (a lower
        # layer's pack_y output) streamed under both maps: row p pairs
        # (h_f @ p, h_b @ Tp-1-p), so rows pos_f and pos_b together hold
        # both directions' inputs at both positions (see chunk_step)
        xpkf_ref, xpkm_ref = refs[0], refs[1]
        parts_f = parts_b = None
        nin = 2
    else:
        parts_f = refs[:nparts]
        parts_b = refs[nparts : 2 * nparts]
        xpkf_ref = xpkm_ref = None
        nin = 2 * nparts
    len_ref, w_ref, wih_ref, bias_ref = refs[nin : nin + 4]
    rest = list(refs[nin + 4 :])
    hsf_ref = hsb_ref = ysp_ref = None
    if pack_y:
        ysp_ref = rest.pop(0)
    else:
        hsf_ref = rest.pop(0)
        hsb_ref = rest.pop(0)
    csf_ref = csb_ref = csp_ref = gs_ref = None
    if with_states:
        if pack_cs:
            csp_ref = rest.pop(0)
        else:
            csf_ref = rest.pop(0)
            csb_ref = rest.pop(0)
    if with_gates:
        gs_ref = rest.pop(0)
    hn_ref, cn_ref, h_scr, c_scr = rest

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
        if x_packed:
            rf = xpkf_ref[s]    # row pos_f = (f@pos_f, b@pos_b)
            rm = xpkm_ref[sb]   # row pos_b = (f@pos_b, b@pos_f)
            xf = jnp.concatenate([rf[:, :H], rm[:, H:]], axis=-1)
            xb = jnp.concatenate([rm[:, :H], rf[:, H:]], axis=-1)
        else:
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
        if ysp_ref is not None:
            # pair-packed layer output: one full-width write (the upper
            # layer and this layer's backward both consume the pairing)
            ysp_ref[s] = h_scr[...].astype(ysp_ref.dtype)
        else:
            hsf_ref[s] = h_scr[:, :H].astype(hsf_ref.dtype)
            hsb_ref[sb] = h_scr[:, H:].astype(hsb_ref.dtype)
        if csp_ref is not None:
            # one full-width write: packed row at fwd-dir time index pos_f
            # pairs (c_f @ pos_f, c_b @ Tp-1-pos_f) — c_scr's exact layout
            csp_ref[s] = c_scr[...].astype(csp_ref.dtype)
        elif csf_ref is not None:
            csf_ref[s] = c_scr[:, :H].astype(csf_ref.dtype)
            csb_ref[sb] = c_scr[:, H:].astype(csb_ref.dtype)
        if gs_ref is not None:
            # the packed row at fwd-dir time index pos_f always pairs the
            # f-dir gates at pos_f with the b-dir gates at Tp-1-pos_f,
            # for ANY chunking — exactly the pair the backward's grid step
            # nT-1-t consumes at its in-chunk index C-1-i (== this s)
            gs_ref[s] = jnp.concatenate([i, f, g, o], axis=-1).astype(
                gs_ref.dtype
            )

    if C <= 4:
        for s in range(C):
            chunk_step(s)
    else:
        jax.lax.fori_loop(0, C, lambda s, carry: (chunk_step(s), carry)[1], 0)

    hn_ref[...] = h_scr[...]
    cn_ref[...] = c_scr[...]


def _w_spec_packed(B, Bt, G, H):
    """Packed analogue of ``_w_spec``: the tile's own groups' packed
    blocks are streamed — ``(GPT, 2H, 8H)`` per tile."""
    Bg = B // G
    gpt = Bt // Bg if Bt > Bg else 1
    return pl.BlockSpec(
        (gpt, 2 * H, 8 * H),
        lambda b, t: ((b * Bt) // (Bg * gpt), 0, 0),
        memory_space=pltpu.VMEM,
    )


def _fwd_pallas_packed(x_parts, lengths, w_packed, wih_packed, bias_packed,
                       *, Bt: int, C: int, G: int, H: int, compute_dtype,
                       with_states: bool, with_gates: bool = False,
                       pack_cs: bool = False, x_packed: bool = False,
                       pack_y: bool = False):
    """Same contract as ``_bwd_pallas``'s sibling ``_fwd_pallas`` except
    ``hn``/``cn`` come back packed ``(B, 2H)`` (callers unpack with one
    cheap XLA slice-stack). ``with_gates`` additionally returns the
    activated gate stream ``gs (Tp, B, 8H)`` (packed layout, see kernel
    note) for a recompute-free backward. ``pack_cs`` returns the cell
    residual as ONE packed ``cs (Tp, B, 2H)`` stream (row at fwd-dir time
    p pairs ``c_f @ p`` with ``c_b @ Tp-1-p``) instead of the two
    half-width ``cs_f``/``cs_b`` streams.

    v7 boundary modes: ``x_packed`` takes ``x_parts`` as ONE pair-packed
    ``(Tp, B, 2H)`` array (a lower layer's ``pack_y`` output) — streamed
    under both maps, halving the x stream count; ``pack_y`` emits the
    layer output as one pair-packed ``ys (Tp, B, 2H)`` instead of
    ``hs_f``/``hs_b``."""
    assert not (with_gates and not with_states)
    assert not (pack_cs and not with_states)
    if x_packed:
        assert len(x_parts) == 1 and x_parts[0].shape[-1] == 2 * H
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
    if pack_y:
        out_specs = [pl.BlockSpec((C, Bt, 2 * H), fwd,
                                  memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((Tp, B, 2 * H), compute_dtype)]
    else:
        out_specs = [st_out, st_out_m]
        out_shape = [st_shape, st_shape]
    if with_states:
        if pack_cs:
            out_specs += [pl.BlockSpec((C, Bt, 2 * H), fwd,
                                       memory_space=pltpu.VMEM)]
            out_shape += [jax.ShapeDtypeStruct((Tp, B, 2 * H),
                                               compute_dtype)]
        else:
            out_specs += [st_out, st_out_m]
            out_shape += [st_shape, st_shape]
    if with_gates:
        out_specs += [pl.BlockSpec((C, Bt, 8 * H), fwd,
                                   memory_space=pltpu.VMEM)]
        out_shape += [jax.ShapeDtypeStruct((Tp, B, 8 * H), compute_dtype)]
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
        with_gates=with_gates, pack_cs=pack_cs, x_packed=x_packed,
        pack_y=pack_y,
    )
    if x_packed:
        x_specs = [
            pl.BlockSpec((C, Bt, 2 * H), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Bt, 2 * H), mir, memory_space=pltpu.VMEM),
        ]
    else:
        x_specs = (
            _part_specs(part_dims, C, Bt, fwd)
            + _part_specs(part_dims, C, Bt, mir)
        )
    return pl.pallas_call(
        kernel,
        grid=(nB, nT),
        in_specs=(
            x_specs
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


# ------------------------------------------------------------ backward


def _bwd_kernel_packed(
    *refs, nparts: int, nyparts: int, C: int, Bt: int, H: int,
    compute_dtype, shift_in_kernel: bool, saved_gates: bool = False,
    pack_cs: bool = False, x_packed: bool = False,
    hp_packed: bool = False, dy_packed: bool = False,
):
    rest = list(refs)
    if x_packed:
        xpkf_ref = rest.pop(0)
        xpkm_ref = rest.pop(0)
        parts_f = parts_b = None
    else:
        parts_f = tuple(rest.pop(0) for _ in range(nparts))
        parts_b = tuple(rest.pop(0) for _ in range(nparts))
        xpkf_ref = xpkm_ref = None
    len_ref = rest.pop(0)
    w_ref = rest.pop(0)
    if saved_gates:
        # no wih/bias operands: the forward's activated gates arrive as a
        # stream instead of being recomputed — drops 2 GEMMs and 4
        # transcendentals per cell step from the sweep (measured a wash
        # at the flagship shape; see tools/experiment_saved_gates.py)
        wihT_ref = rest.pop(0)
        gs_ref = rest.pop(0)
        wih_ref = bias_ref = None
    else:
        wih_ref = rest.pop(0)
        wihT_ref = rest.pop(0)
        bias_ref = rest.pop(0)
        gs_ref = None
    if hp_packed:
        hppk_ref = rest.pop(0)
        hpf_ref = hpb_ref = None
    else:
        hpf_ref = rest.pop(0)
        hppk_ref = None
    if pack_cs:
        if not hp_packed:
            hpb_ref = rest.pop(0)
        cpp_ref = rest.pop(0)
        cpf_ref = cpb_ref = None
    else:
        assert not hp_packed
        cpf_ref = rest.pop(0)
        hpb_ref = rest.pop(0)
        cpb_ref = rest.pop(0)
        cpp_ref = None
    # dy arrives as nyparts contribution streams per direction (the stack
    # VJP threads the previous layer's dxf/dxb pairs straight in; the sum
    # happens in-register below, in the sweep's shadow — the XLA adds it
    # replaces were ~1 ms/step at the flagship shape, device-profiled).
    # dy_packed: the upper layer emitted pair-packed cotangent streams —
    # nyparts full-width refs, all under the mir map, no f/b split.
    if dy_packed:
        dyp_refs = tuple(rest.pop(0) for _ in range(nyparts))
        dyf_refs = dyb_refs = None
    else:
        dyf_refs = tuple(rest.pop(0) for _ in range(nyparts))
        dyb_refs = tuple(rest.pop(0) for _ in range(nyparts))
        dyp_refs = None
    dhn_ref = rest.pop(0)
    dcn_ref = rest.pop(0)
    if x_packed:
        dxpA_ref = rest.pop(0)   # d(packed row pos_f), mir map
        dxpB_ref = rest.pop(0)   # d(packed row pos_b), fwd map
        dxf_refs = dxb_refs = None
    else:
        dxf_refs = tuple(rest.pop(0) for _ in range(nparts))
        dxb_refs = tuple(rest.pop(0) for _ in range(nparts))
        dxpA_ref = dxpB_ref = None
    (dw_tiles_ref, dwih_tiles_ref, dbias_tiles_ref) = (
        rest.pop(0), rest.pop(0), rest.pop(0)
    )
    dh_scr, dc_scr, dw_scr, dwih_scr, dbias_scr = rest

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
        if hppk_ref is not None:
            # pair-packed own-output stream: row pos_f-1 holds both
            # directions' previous hidden state (same pairing as cs)
            h_prev = hppk_ref[s].astype(jnp.float32)
        else:
            h_prev = jnp.concatenate(
                [hpf_ref[s], hpb_ref[i]], axis=-1
            ).astype(jnp.float32)
        if cpp_ref is not None:
            # packed prev pair: row pos_f-1 = (c_f @ pos_f-1, c_b @
            # Tp-1-(pos_f-1) = pos_b+1) — both directions' previous cell
            # state in one full-width read, same prev_f map/shift
            c_prev = cpp_ref[s].astype(jnp.float32)
        else:
            c_prev = jnp.concatenate(
                [cpf_ref[s], cpb_ref[i]], axis=-1
            ).astype(jnp.float32)
        if shift_in_kernel:
            # float mask, not bool: concatenating (Bt, H) i1 vectors trips
            # a Mosaic "Invalid vector register cast" (i1->i32 vreg
            # bitcast) on this libtpu; floats match the fwd kernel's m.
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

        if x_packed:
            rf = xpkf_ref[s]    # row pos_f = (f@pos_f, b@pos_b)
            rm = xpkm_ref[i]    # row pos_b = (f@pos_b, b@pos_f)
            xf = jnp.concatenate([rf[:, :H], rm[:, H:]], axis=-1)
            xb = jnp.concatenate([rm[:, :H], rf[:, H:]], axis=-1)
        else:
            pf = [p[s] for p in parts_f]
            pb = [p[i] for p in parts_b]
            xf = pf[0] if nparts == 1 else jnp.concatenate(pf, axis=-1)
            xb = pb[0] if nparts == 1 else jnp.concatenate(pb, axis=-1)
        xp = jnp.concatenate([xf, xb], axis=-1).astype(compute_dtype)
        hb = h_prev.astype(compute_dtype).reshape(GPT, Bgr, H2)
        if saved_gates:
            acts = gs_ref[s].astype(jnp.float32)
            ig = acts[:, :H2]
            f = acts[:, H2 : 2 * H2]
            gg_ = acts[:, 2 * H2 : 3 * H2]
            o = acts[:, 3 * H2 :]
        else:
            xg = jax.lax.dot_general(
                xp, wih_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bias_ref[...].astype(jnp.float32)[None, :]
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

        if dy_packed:
            # each packed cotangent stream's row pos_f is already the
            # (dy_f @ pos_f, dy_b @ pos_b) pair — no concat
            dy = dyp_refs[0][s].astype(jnp.float32)
            for r in range(1, nyparts):
                dy = dy + dyp_refs[r][s].astype(jnp.float32)
        else:
            dyf = dyf_refs[0][s].astype(jnp.float32)
            dyb = dyb_refs[0][i].astype(jnp.float32)
            for r in range(1, nyparts):
                dyf = dyf + dyf_refs[r][s].astype(jnp.float32)
                dyb = dyb + dyb_refs[r][i].astype(jnp.float32)
            dy = jnp.concatenate([dyf, dyb], axis=-1)
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
        if x_packed:
            # emit the input cotangent pair-packed: this grid step holds
            # the complete contributions of BOTH packed rows it read —
            # d(row pos_f) = (dx_xf[:, :H], dx_xb[:, H:]) and
            # d(row pos_b) = (dx_xb[:, :H], dx_xf[:, H:]). Two full-width
            # writes replace four half-width ones; the consumer (lower
            # layer's backward) sums the two streams in-register.
            dxpA_ref[s] = jnp.concatenate(
                [dx[:, :H], dx[:, 3 * H :]], axis=-1
            ).astype(dxpA_ref.dtype)
            dxpB_ref[i] = jnp.concatenate(
                [dx[:, 2 * H : 3 * H], dx[:, H : 2 * H]], axis=-1
            ).astype(dxpB_ref.dtype)
        else:
            offs = 0
            for p_idx in range(nparts):
                E = dxf_refs[p_idx].shape[-1]
                dxf_refs[p_idx][s] = dx[:, offs : offs + E].astype(
                    dxf_refs[p_idx].dtype
                )
                dxb_refs[p_idx][i] = dx[
                    :, E2 // 2 + offs : E2 // 2 + offs + E
                ].astype(dxb_refs[p_idx].dtype)
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
    shift_in_kernel: bool = False, gs=None, pack_cs: bool = False,
    x_packed: bool = False, hp_packed: bool = False,
    dy_packed: bool = False,
):
    """Packed analogue of v5's ``_bwd_pallas``. ``dhn_p``/``dcn_p`` are
    ``(B, 2H)``; returns ``dxf, dxb`` per part plus the PACKED gradient
    tiles (``(nB, GPT, 2H, 8H)``, ``(nB, 2E, 8H)``, ``(nB, 1, 8H)``) —
    callers unpack the diagonal blocks in XLA.

    ``dy_f``/``dy_b`` may each be a single ``(Tp, B, H)`` array or a tuple
    of such streams (equal length for both); streams are summed in-kernel,
    which lets the stack VJP skip the XLA adds that would otherwise merge
    the upper layer's dxf/dxb contributions.

    ``gs`` (optional): the forward's activated-gate stream ``(Tp, B, 8H)``
    (from ``_fwd_pallas_packed(with_gates=True)``). When given, the sweep
    reads gates instead of recomputing them and ``wih_packed`` /
    ``bias_packed`` are unused (pass None).

    ``pack_cs``: ``cp_f`` is the PACKED cell stream ``(Tp, B, 2H)`` from
    ``_fwd_pallas_packed(pack_cs=True)`` (``cp_b`` must be None) — one
    full-width stream under the same prev_f map/shift replaces the two
    half-width ``cp_f``/``cp_b`` streams and their in-kernel concat.

    v7 boundary modes: ``x_packed`` — ``x_parts`` is one pair-packed
    ``(Tp, B, 2H)`` array and the input cotangent comes back as TWO
    pair-packed contribution streams ``((dxpA,), (dxpB,))`` (sum = full
    d(x_packed); thread both to the lower layer's ``dy_packed``
    backward). ``hp_packed`` — ``hp_f`` is this layer's own pair-packed
    ``pack_y`` output (``hp_b`` None). ``dy_packed`` — ``dy_f`` is a
    tuple of pair-packed cotangent streams (``dy_b`` ignored)."""
    if dy_packed:
        if not isinstance(dy_f, (tuple, list)):
            dy_f = (dy_f,)
        dy_f = tuple(dy_f)
        dy_b = ()
        nyparts = len(dy_f)
    else:
        if not isinstance(dy_f, (tuple, list)):
            dy_f, dy_b = (dy_f,), (dy_b,)
        dy_f, dy_b = tuple(dy_f), tuple(dy_b)
        assert len(dy_f) == len(dy_b)
        nyparts = len(dy_f)
    Tp, B, _ = x_parts[0].shape
    E2 = wihT_packed.shape[1]
    part_dims = [p.shape[-1] for p in x_parts]
    if x_packed:
        assert len(x_parts) == 1 and part_dims[0] == 2 * H
    nB, nT = B // Bt, Tp // C
    Bg = B // G
    GPT = Bt // Bg if Bt > Bg else 1

    mir = lambda b, t: (nT - 1 - t, b, 0)
    fwd = lambda b, t: (t, b, 0)
    lmap = lambda b, t: (b, 0)
    onb = lambda b, t: (b, 0)
    if shift_in_kernel:
        # the prev maps shift by whole C-row blocks and the in-kernel
        # boundary mask covers only the first/last position — at C > 1 the
        # reads would land C-1 steps off. Callers must materialize shifted
        # streams to chunk the backward.
        assert C == 1, "shift_in_kernel requires C == 1"
        prev_f = lambda b, t: (jnp.maximum(nT - 2 - t, 0), b, 0)
        prev_b = lambda b, t: (jnp.minimum(t + 1, nT - 1), b, 0)
    else:
        prev_f, prev_b = mir, fwd

    if pack_cs:
        assert cp_b is None
    if hp_packed:
        assert pack_cs and hp_b is None
    kernel = functools.partial(
        _bwd_kernel_packed, nparts=len(x_parts), nyparts=nyparts, C=C,
        Bt=Bt, H=H, compute_dtype=compute_dtype,
        shift_in_kernel=shift_in_kernel, saved_gates=gs is not None,
        pack_cs=pack_cs, x_packed=x_packed, hp_packed=hp_packed,
        dy_packed=dy_packed,
    )
    dx_shape = [
        jax.ShapeDtypeStruct((Tp, B, E), compute_dtype) for E in part_dims
    ]
    if gs is None:
        weight_ops = [
            _resident_spec(wih_packed.shape),
            _resident_spec(wihT_packed.shape),
            _resident_spec(bias_packed.shape),
        ]
        weight_args = [wih_packed, wihT_packed, bias_packed]
    else:
        # gates streamed with the mir map: the packed row at fwd-dir time
        # index p pairs (f-dir @ p, b-dir @ Tp-1-p) for any chunking, which
        # is exactly this grid step's (pos_f, pos_b) at in-chunk index s
        weight_ops = [
            _resident_spec(wihT_packed.shape),
            pl.BlockSpec((C, Bt, 8 * H), mir, memory_space=pltpu.VMEM),
        ]
        weight_args = [wihT_packed, gs]
    pk2 = lambda m: pl.BlockSpec((C, Bt, 2 * H), m, memory_space=pltpu.VMEM)
    half = lambda m: pl.BlockSpec((C, Bt, H), m, memory_space=pltpu.VMEM)

    if x_packed:
        x_specs = [pk2(mir), pk2(fwd)]
    else:
        x_specs = (
            _part_specs(part_dims, C, Bt, mir)
            + _part_specs(part_dims, C, Bt, fwd)
        )

    if hp_packed:
        state_specs = [pk2(prev_f), pk2(prev_f)]
        state_args = (hp_f, cp_f)
    elif pack_cs:
        state_specs = [half(prev_f), half(prev_b), pk2(prev_f)]
        state_args = (hp_f, hp_b, cp_f)
    else:
        state_specs = [half(prev_f), half(prev_f), half(prev_b),
                       half(prev_b)]
        state_args = (hp_f, cp_f, hp_b, cp_b)

    if dy_packed:
        dy_specs = [pk2(mir) for _ in range(nyparts)]
    else:
        dy_specs = (
            [half(mir) for _ in range(nyparts)]
            + [half(fwd) for _ in range(nyparts)]
        )

    if x_packed:
        dx_specs = [pk2(mir), pk2(fwd)]
        dx_shapes = [
            jax.ShapeDtypeStruct((Tp, B, 2 * H), compute_dtype)
            for _ in range(2)
        ]
    else:
        dx_specs = (
            _part_specs(part_dims, C, Bt, mir)
            + _part_specs(part_dims, C, Bt, fwd)
        )
        dx_shapes = dx_shape + dx_shape

    out = pl.pallas_call(
        kernel,
        grid=(nB, nT),
        in_specs=(
            x_specs
            + [
                pl.BlockSpec((Bt, 1), lmap, memory_space=pltpu.VMEM),
                _w_spec_packed(B, Bt, G, H),
            ]
            + weight_ops
            + state_specs
            + dy_specs
            + [
                pl.BlockSpec((Bt, 2 * H), onb, memory_space=pltpu.VMEM),
                pl.BlockSpec((Bt, 2 * H), onb, memory_space=pltpu.VMEM),
            ]
        ),
        out_specs=(
            dx_specs
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
            dx_shapes
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
    )(*x_parts, *x_parts, lengths, w_packed, *weight_args,
      *state_args, *dy_f, *dy_b, dhn_p, dcn_p)

    nP = 1 if x_packed else len(x_parts)
    dxf, dxb = out[:nP], out[nP : 2 * nP]
    dw_tiles, dwih_tiles, dbias_tiles = out[2 * nP : 2 * nP + 3]
    return dxf, dxb, dw_tiles, dwih_tiles, dbias_tiles


def reduce_packed_grads(dw_tiles, dwih_tiles, dbias_tiles, *, B, Bt, G, H):
    """Unpack the packed gradient tiles to v5 layouts: ``dw (2,G,H,4H)``,
    ``dwih (2,E,4H)``, ``dbias (2,4H)``."""
    nB = B // Bt
    Bg = B // G
    GPT = Bt // Bg if Bt > Bg else 1
    dw_u = unpack_blockdiag(dw_tiles, H)  # (2, nB, GPT, H, 4H)
    dw = _reduce_dw_tiles(
        jnp.swapaxes(dw_u, 0, 1), nB, Bt, Bg, G, GPT, H, 4 * H
    )
    dwih = unpack_blockdiag(jnp.sum(dwih_tiles, axis=0), H)  # (2, E, 4H)
    dbias = unpack_dbias(jnp.sum(dbias_tiles, axis=(0, 1)), H)
    return dw, dwih, dbias
