"""Fused bidirectional LSTM layer — time-major Pallas kernels (v5).

(v6, `ops/lstm_pallas_packed.py`, packs the two directions into the lane
axis for 2H == 128 configs — `pick_plan` prefers it there; these v5
kernels remain the path for every other width and the lite large-H mode.)

Layout generations measured on v5e at the flagship shape (B=400, T=1500,
H=64), full fwd+bwd for the 2-layer stack:

* v1 (lstm_pallas.py): time-major ``(T, 2, B, 4H)`` recurrence kernel —
  kernel ~10 ms fwd, but the XLA glue (einsum + time flip + transpose to
  time-major) adds ~23 ms/layer of HBM copies. 97.5 ms total.
* v2: natural ``(B, T, ·)`` arrays with batch-tiled blocks — no glue, but
  every block DMA becomes ~80 strided 8 KB segments and the per-step matmul
  shrinks to the batch tile. 133 ms total: worse.
* v3: time-major, direction-split ``(T, B, ·)`` arrays; the input-projection
  GEMM runs in XLA and writes ``(T, B, 4H)`` gate streams the kernels then
  re-read. 62.4 ms total.
* v5 (this file): **input projection and input-side gradients fused into
  the kernels**. The forward kernel reads the raw ``(T, B, E)`` input
  streams (E = 64/128 vs the 256-wide gate streams) and computes
  ``x @ W_ih^T + b`` per step on the MXU — the per-step GEMM rides in the
  shadow of the sweep's fixed cost, while the ``xg`` HBM round-trip
  (~1.2 GB/layer at the flagship shape, plus ~600 MB of saved residuals)
  disappears. The backward kernel recomputes the gates the same way and
  additionally emits ``dx`` per direction (E-wide, not 4H-wide) and
  accumulates ``dW_ih``/``dbias`` in VMEM scratch — removing the four XLA
  glue GEMMs (gates fwd, dx, dW_ih, dbias: ~8 ms/step measured via a
  device profile at the flagship shape).

Structure:

* grid = (batch tiles, time chunks), time innermost; h/c state lives in
  VMEM scratch across each tile's time sweep. Each grid step runs C cell
  steps through an in-kernel ``fori_loop`` (a Python unroll at C=8 blew
  Mosaic compile time to ~8 min; the loop keeps it flat) — C=1 measured
  ~5 us/grid-step of fixed cost against ~1-2 us of real work, and chunking
  (C>1) measured slower at the flagship shape, so C=1 is the default. All
  time streams (x parts in, hs/cs out, dy in, dx out) are ``compute_dtype``
  — bf16 halves the dominant HBM traffic AND the VMEM block footprint; h/c
  state and all gate math stay f32 in scratch (the input GEMM accumulates
  f32 on the MXU, so the fused path is *closer* to the f32 scan reference
  than v3's bf16 XLA gate streams were).
* the layer input arrives as feature-``parts`` (the 2H inter-layer concat
  is threaded as two (T,B,H) parts and never materialised); each part is
  streamed twice per grid step — once per direction, at that direction's
  position — and concatenated along lanes in-register.
* per-call weight-dropped recurrent weights (G groups, group-major batch):
  when a tile sits inside one group (Bt <= Bg) its group's weights are
  *streamed* per tile through the BlockSpec index map (so VMEM holds one
  group's matrices, not all G) and ``dW_hh`` accumulates per tile into a
  small scratch, emitted per tile and segment-summed by group in XLA.
  ``W_ih``/``bias`` are direction-only (not grouped) and stay resident.
* masking: per-row lengths compared against the global position in-kernel
  (positions >= length freeze the state) — identical semantics to the scan
  path (value + gradient parity enforced by tests).
* eval forwards (outside autodiff) skip the cell-state output streams —
  one third less output bandwidth for inference.

Replaces the cuDNN LSTM the reference reaches through
``torch.nn.LSTM(bidirectional=True)`` (`intrepppid/encoders/awd_lstm.py:35-41`).
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from intrepppid_tpu.ops.lstm_pallas import _cell, _interpret

_VMEM_BUDGET = 13 * 1024 * 1024


def pick_tiles(
    B: int, T: int, H: int, G: int, compute_dtype=jnp.float32, E: int = 0
) -> Optional[Tuple[int, int, int]]:
    """Choose (Bt, C, Tp): batch tile, time chunk, C-padded T.

    Bt must divide B, be a multiple of 8 (second-minor block dim), and
    either divide the group size B/G or be a multiple of it. C > 1 runs C
    cell steps per grid iteration (an in-kernel ``fori_loop``). Measured on
    v5e at the flagship shape (B=400, T=1500, H=64, G=5, bf16): the sweep is
    VPU-bound on the cell math, so fewer-but-fatter grid steps do NOT win —
    (Bt=80, C=16; 470 steps) ran 10% slower than (Bt=400, C=1; 1500 steps).
    The heuristic is therefore: largest Bt that fits VMEM at C=1 (biggest
    batched matmul + widest VPU rows). The C machinery stays for shapes
    where a batch doesn't fill the VPU (callers can tune via this function).
    Returns None if B is untileable (caller falls back to the scan path).
    """
    dims = _PlanDims(B, H, G, compute_dtype, E)

    def vmem(bt: int, c: int) -> int:
        # backward pass is the peak: x parts in x2 dirs + dx out x2 dirs +
        # hp/cp/dy in, plus the input-weight operands and dW_ih accumulator
        streams = 2 * (
            2 * c * bt * dims.Ep * dims.sb    # x parts, both directions
            + 2 * c * bt * dims.Ep * dims.sb  # dx, both directions
            + 6 * c * bt * dims.Hp * dims.sb  # hp/cp (x2) + dy (x2)
        )
        fixed = (
            dims.fixed(bt)
            + 3 * 2 * dims.Ep * dims.H4 * 4          # dW_ih scratch + dbl out
            + 2 * 2 * 2 * dims.Ep * dims.H4 * dims.sb  # wih + wihT (dbl)
        )
        return streams + fixed

    for bt in dims.candidates():
        if vmem(bt, 1) <= _VMEM_BUDGET:
            return bt, 1, T
    return None


class _PlanDims:
    """Shared geometry for the kernel VMEM models (one source of truth for
    the terms common to the fused, lite-backward and fused-forward costs)."""

    def __init__(self, B, H, G, compute_dtype, E):
        self.sb = 2 if compute_dtype == jnp.bfloat16 else 4
        self.Hp = ((H + 127) // 128) * 128
        self.H = H
        self.H4 = 4 * H
        self.H4p = ((self.H4 + 127) // 128) * 128
        # lane-padded bound for the concatenated input parts: layer 0's
        # width is the embedding dim E (not bounded by H), deeper layers 2H
        self.Ep = max(2 * self.Hp, ((E + 127) // 128) * 128)
        self.B = B
        self.Bg = B // G if G > 0 else B
        self.E = E

    def gpt(self, bt: int) -> int:
        return bt // self.Bg if bt > self.Bg else 1

    def common(self, bt: int) -> int:
        """Every sweep pays: hn/cn-style (2,Bt,H) blocks (dbl) + two
        (2,Bt,H) f32 state scratches."""
        return 8 * bt * self.Hp * 4 + 4 * bt * self.Hp * 4

    def w_stream(self, bt: int, n_mats: int) -> int:
        """n per-tile streamed recurrent weight matrices, double-buffered
        (forward uses w only; backward also wT)."""
        return n_mats * 2 * 2 * self.gpt(bt) * self.H * self.H4 * self.sb

    def dw_terms(self, bt: int) -> int:
        """Backward-only dW_hh scratch + double-buffered tile output."""
        return 3 * 2 * self.gpt(bt) * self.H * self.H4 * 4

    def fixed(self, bt: int) -> int:
        """The fused-backward fixed terms (the historical peak model)."""
        return self.common(bt) + self.dw_terms(bt) + self.w_stream(bt, 2)

    def fwd_fused(self, bt: int, c: int) -> int:
        """The (always input-fused) forward sweep with state outputs: no
        dW scratch, w only (no wT), wih_t resident."""
        streams = 2 * (
            2 * c * bt * self.Ep * self.sb    # x parts, both directions
            + 4 * c * bt * self.Hp * self.sb  # hs/cs out, both directions
        )
        return (
            streams
            + self.common(bt)
            + self.w_stream(bt, 1)
            + 2 * 2 * self.Ep * self.H4 * self.sb  # wih_t (dbl)
        )

    def candidates(self):
        return sorted(
            [
                bt
                for bt in range(8, min(self.B, 1024) + 1, 8)
                if self.B % bt == 0
                and (self.Bg % bt == 0 or bt % self.Bg == 0)
            ],
            reverse=True,
        )


def _pick_tiles_lite(
    B: int, T: int, H: int, G: int, compute_dtype=jnp.float32, E: int = 0
) -> Optional[Tuple[int, int, int]]:
    """Tile choice for the lite (large-H) backward: f32 gate streams in,
    dgates streams out, no W_ih residency or (2, E, 4H) scratch in the
    backward — VMEM stays bounded as H grows, so configs the fused model
    rejects (H >= ~192 at 13 MB) still run on the kernel path instead of
    the ~3x scan. The forward is STILL the input-fused kernel, so the plan
    must fit its (E-dependent) footprint too — otherwise huge-E configs
    would trade the graceful scan fallback for a Mosaic VMEM error."""
    dims = _PlanDims(B, H, G, compute_dtype, E)

    def bwd(bt: int, c: int) -> int:
        streams = 2 * (
            2 * c * bt * dims.H4p * 4    # xg in (f32), both directions
            + 2 * c * bt * dims.H4p * 4  # dgates out (f32), both directions
            + 6 * c * bt * dims.Hp * dims.sb
        )
        return streams + dims.fixed(bt)

    for bt in dims.candidates():
        if max(bwd(bt, 1), dims.fwd_fused(bt, 1)) <= _VMEM_BUDGET:
            return bt, 1, T
    return None


def pick_plan(
    B: int, T: int, H: int, G: int, compute_dtype=jnp.float32, E: int = 0,
    nyparts: int = 1,
) -> Optional[Tuple[int, int, int, object]]:
    """(Bt, C, Tp, mode). mode is ``"packed"`` (direction-packed lanes,
    v6 — 2H == 128 configs, measured fastest), ``True`` (v5 fused), or
    ``False`` (lite large-H backward); None means scan fallback.

    ``nyparts``: dy streams per direction the packed backward must budget
    for (2 when a multi-layer stack threads unsummed upper-layer streams)."""
    from intrepppid_tpu.ops.lstm_pallas_packed import pick_tiles_packed

    packed = pick_tiles_packed(B, T, H, G, compute_dtype, E, nyparts=nyparts)
    tiles = pick_tiles(B, T, H, G, compute_dtype, E)
    # prefer packed only at an equal-or-fatter batch tile: wider rows feed
    # the VPU better (measured), so a VMEM-squeezed narrow packed tile must
    # not displace a fat v5 tile
    if packed is not None and (tiles is None or packed[0] >= tiles[0]):
        return packed + ("packed",)
    if tiles is not None:
        return tiles + (True,)
    tiles = _pick_tiles_lite(B, T, H, G, compute_dtype, E)
    if tiles is not None:
        return tiles + (False,)
    return None


def _recur2(h2, w_ref, Bt: int, compute_dtype):
    """Both directions' recurrent matmul as ONE batched dot_general.

    ``h2`` (2, Bt, H) f32; ``w_ref`` block (2, GPT, H, 4H) — the tile's own
    groups, streamed by the BlockSpec index map. Per-group small matmuls
    issued sequentially were the measured critical path of the sweep (G=5
    meant 10 MXU issues per fwd grid step); folding direction x group into
    the dot_general batch dimension issues once.
    """
    GPT = w_ref.shape[1]
    H, H4 = w_ref.shape[2], w_ref.shape[3]
    Bgr = Bt // GPT
    hb = h2.astype(compute_dtype).reshape(2 * GPT, Bgr, H)
    w = w_ref[...].reshape(2 * GPT, H, H4)
    out = jax.lax.dot_general(
        hb, w, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(2, Bt, H4)


def _xg2(parts_f, parts_b, wih_t_ref, bias_ref, compute_dtype):
    """Input gates for both directions, fused in-kernel.

    ``parts_f``/``parts_b`` are the per-part (Bt, E_i) values at each
    direction's current position. Returns ``(xg (2,Bt,4H) f32, x2
    (2,Bt,E) compute_dtype)`` — ``x2`` is reused by the backward kernel's
    dW_ih accumulation. The MXU accumulates f32; forward and backward run
    the identical op sequence, so the gate recompute matches bitwise.
    """
    xf = parts_f[0] if len(parts_f) == 1 else jnp.concatenate(parts_f, axis=-1)
    xb = parts_b[0] if len(parts_b) == 1 else jnp.concatenate(parts_b, axis=-1)
    x2 = jnp.stack([xf, xb]).astype(compute_dtype)
    # Two plain 2D matmuls, not one batch-2 dot_general: Mosaic's
    # vector-layout pass (this libtpu) aborts on batched dots whose
    # per-batch LHS spans several sublane tiles at lane width < 128
    # ("Check failed: limits[i] <= dim(i)"); 2D GEMMs lower cleanly.
    xg = jnp.stack(
        [
            jax.lax.dot_general(
                x2[d], wih_t_ref[d], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for d in range(2)
        ]
    )
    return xg + bias_ref[...].astype(jnp.float32)[:, None, :], x2


# ------------------------------------------------------------------ forward

def _fwd_kernel(
    *refs, nparts: int, C: int, Bt: int, compute_dtype, with_states: bool,
):
    parts_f = refs[:nparts]
    parts_b = refs[nparts : 2 * nparts]
    len_ref, w_ref, wih_t_ref, bias_ref = refs[2 * nparts : 2 * nparts + 4]
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

    def chunk_step(s):
        sb = C - 1 - s
        pos_f = t * C + s
        pos_b = (nT - 1 - t) * C + sb
        m = jnp.stack(
            [
                jnp.where(pos_f < lengths, 1.0, 0.0),
                jnp.where(pos_b < lengths, 1.0, 0.0),
            ]
        ).astype(jnp.float32)  # (2, Bt, 1)
        xg, _ = _xg2(
            [p[s] for p in parts_f], [p[sb] for p in parts_b],
            wih_t_ref, bias_ref, compute_dtype,
        )
        gates = xg + _recur2(h_scr[...], w_ref, Bt, compute_dtype)
        h_new, c_new, _ = _cell(gates, c_scr[...])
        h_scr[...] = m * h_new + (1.0 - m) * h_scr[...]
        c_scr[...] = m * c_new + (1.0 - m) * c_scr[...]
        hsf_ref[s] = h_scr[0].astype(hsf_ref.dtype)
        hsb_ref[sb] = h_scr[1].astype(hsb_ref.dtype)
        if csf_ref is not None:
            csf_ref[s] = c_scr[0].astype(csf_ref.dtype)
            csb_ref[sb] = c_scr[1].astype(csb_ref.dtype)

    if C <= 4:
        # static unroll: literal block indices, no dynamic-slice overhead
        for s in range(C):
            chunk_step(s)
    else:
        # fori_loop (not a Python unroll): Mosaic compile time stays flat in C
        jax.lax.fori_loop(
            0, C, lambda s, carry: (chunk_step(s), carry)[1], 0
        )

    hn_ref[...] = h_scr[...]
    cn_ref[...] = c_scr[...]


def _w_spec(B, Bt, G, H, H4, transposed=False):
    """BlockSpec for recurrent weights: exactly the tile's own groups are
    streamed — (2, GPT, H, 4H) per tile. When several tiles share a group
    (Bt <= Bg) the block index repeats; when a tile spans GPT groups the
    block advances by GPT. VMEM weight residency is independent of G."""
    Bg = B // G
    gpt = Bt // Bg if Bt > Bg else 1
    block = (2, gpt, H4, H) if transposed else (2, gpt, H, H4)
    return pl.BlockSpec(
        block,
        lambda b, t: (0, (b * Bt) // (Bg * gpt), 0, 0),
        memory_space=pltpu.VMEM,
    )


def _resident_spec(shape):
    """Whole-array block pinned at the origin — stays VMEM-resident across
    the grid (W_ih, bias: direction-only, not grouped)."""
    zero = (0,) * len(shape)
    return pl.BlockSpec(shape, lambda b, t: zero, memory_space=pltpu.VMEM)


def _part_specs(part_dims: Sequence[int], C: int, Bt: int, imap):
    return [
        pl.BlockSpec((C, Bt, E), imap, memory_space=pltpu.VMEM)
        for E in part_dims
    ]


def _fwd_pallas(x_parts, lengths, w, wih_t, bias, *, Bt: int, C: int, G: int,
                compute_dtype, with_states: bool):
    """x_parts: per-part (Tp,B,E_i) time-major inputs; lengths (B,1) i32;
    w (2,G,H,4H); wih_t (2,E,4H); bias (2,4H) f32.
    Returns hs_f, hs_b[, cs_f, cs_b] (Tp,B,H), hn, cn (2,B,H)."""
    Tp, B, _ = x_parts[0].shape
    H, H4 = w.shape[2], w.shape[3]
    part_dims = [p.shape[-1] for p in x_parts]
    nB, nT = B // Bt, Tp // C

    fwd = lambda b, t: (t, b, 0)
    mir = lambda b, t: (nT - 1 - t, b, 0)
    lmap = lambda b, t: (b, 0)
    onb = lambda b, t: (0, b, 0)

    st_out = pl.BlockSpec((C, Bt, H), fwd, memory_space=pltpu.VMEM)
    st_out_m = pl.BlockSpec((C, Bt, H), mir, memory_space=pltpu.VMEM)
    st_shape = jax.ShapeDtypeStruct((Tp, B, H), compute_dtype)
    out_specs = [st_out, st_out_m]
    out_shape = [st_shape, st_shape]
    if with_states:
        out_specs += [st_out, st_out_m]
        out_shape += [st_shape, st_shape]
    out_specs += [
        pl.BlockSpec((2, Bt, H), onb, memory_space=pltpu.VMEM),
        pl.BlockSpec((2, Bt, H), onb, memory_space=pltpu.VMEM),
    ]
    out_shape += [
        jax.ShapeDtypeStruct((2, B, H), jnp.float32),
        jax.ShapeDtypeStruct((2, B, H), jnp.float32),
    ]

    kernel = functools.partial(
        _fwd_kernel, nparts=len(x_parts), C=C, Bt=Bt,
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
                _w_spec(B, Bt, G, H, H4),
                _resident_spec(wih_t.shape),
                _resident_spec(bias.shape),
            ]
        ),
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((2, Bt, H), jnp.float32) for _ in range(2)],
        interpret=_interpret(),
        # each part is passed twice: same array, two BlockSpecs (one per
        # direction's position order)
    )(*x_parts, *x_parts, lengths, w, wih_t, bias)


# ----------------------------------------------------------------- backward

def _bwd_kernel(
    *refs, nparts: int, C: int, Bt: int, compute_dtype, shift_in_kernel: bool,
    fused_input: bool = True,
):
    parts_f = refs[:nparts]           # mir order (fwd-dir BPTT)
    parts_b = refs[nparts : 2 * nparts]  # fwd order (bwd-dir BPTT)
    if fused_input:
        (len_ref, w_ref, wT_ref, wih_t_ref, wih_ref, bias_ref,
         hpf_ref, cpf_ref, hpb_ref, cpb_ref, dyf_ref, dyb_ref,
         dhn_ref, dcn_ref) = refs[2 * nparts : 2 * nparts + 14]
        outs = refs[2 * nparts + 14 :]
        dxf_refs = outs[:nparts]
        dxb_refs = outs[nparts : 2 * nparts]
        (dw_tiles_ref, dwih_tiles_ref,
         dbias_tiles_ref) = outs[2 * nparts : 2 * nparts + 3]
        dh_scr, dc_scr, dw_scr, dwih_scr, dbias_scr = outs[2 * nparts + 3 :]
    else:
        # lite mode (large-H configs): parts are the XLA-precomputed gate
        # streams (parts_f=(xg_f,) at mir order, parts_b=(xg_b,) at fwd
        # order); the kernel emits masked dgates streams and dW_hh only —
        # dx/dW_ih/dbias run as XLA GEMMs outside. No W_ih residency, no
        # (2, E, 4H) scratch: VMEM stays bounded as H grows.
        (len_ref, w_ref, wT_ref,
         hpf_ref, cpf_ref, hpb_ref, cpb_ref, dyf_ref, dyb_ref,
         dhn_ref, dcn_ref) = refs[2 * nparts : 2 * nparts + 11]
        outs = refs[2 * nparts + 11 :]
        dgf_ref, dgb_ref, dw_tiles_ref = outs[:3]
        dh_scr, dc_scr, dw_scr = outs[3:]
        wih_t_ref = wih_ref = bias_ref = None
        dwih_scr = dbias_scr = None

    t = pl.program_id(1)
    nT = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        dh_scr[...] = dhn_ref[...]
        dc_scr[...] = dcn_ref[...]
        dw_scr[...] = jnp.zeros_like(dw_scr)
        if fused_input:
            dwih_scr[...] = jnp.zeros_like(dwih_scr)
            dbias_scr[...] = jnp.zeros_like(dbias_scr)

    lengths = len_ref[...]
    GPT = dw_scr.shape[1]  # groups per tile (1 when tiles sit inside groups)
    Bgr = Bt // GPT
    H = dh_scr.shape[-1]
    H4 = 4 * H

    def chunk_step(i):
        # fwd dir BPTT walks time chunks from the end (block nT-1-t); bwd dir
        # walks position chunks from the front, ascending.
        s = C - 1 - i
        pos_f = (nT - 1 - t) * C + s
        pos_b = t * C + i
        h_prev = jnp.stack([hpf_ref[s], hpb_ref[i]]).astype(jnp.float32)
        c_prev = jnp.stack([cpf_ref[s], cpb_ref[i]]).astype(jnp.float32)
        if shift_in_kernel:
            # hp/cp refs are the hs/cs arrays read at t∓1 block offsets
            # (clamped); the initial state of each direction's sweep — fwd
            # position 0, bwd position Tp-1, both at grid step nT-1 — is
            # zeros, masked here instead of materializing shifted copies.
            boundary = jnp.stack(
                [
                    jnp.full((Bt, 1), pos_f == 0),
                    jnp.full((Bt, 1), pos_b == nT * C - 1),
                ]
            )
            h_prev = jnp.where(boundary, 0.0, h_prev)
            c_prev = jnp.where(boundary, 0.0, c_prev)
        if fused_input:
            xg, x2 = _xg2(
                [p[s] for p in parts_f], [p[i] for p in parts_b],
                wih_t_ref, bias_ref, compute_dtype,
            )
        else:
            xg = jnp.stack(
                [parts_f[0][s], parts_b[0][i]]
            ).astype(jnp.float32)
            x2 = None
        gates = xg + _recur2(h_prev, w_ref, Bt, compute_dtype)
        _, c_new, (ig, f, gg_, o) = _cell(gates, c_prev)

        dy = jnp.stack([dyf_ref[s], dyb_ref[i]]).astype(jnp.float32)
        dh = dh_scr[...] + dy
        dc = dc_scr[...]
        m = jnp.stack(
            [
                jnp.where(pos_f < lengths, 1.0, 0.0),
                jnp.where(pos_b < lengths, 1.0, 0.0),
            ]
        ).astype(jnp.float32)  # (2, Bt, 1)

        tc = jnp.tanh(c_new)
        do = dh * tc
        dc_t = dc + dh * o * (1.0 - tc * tc)
        dgi = (dc_t * gg_) * ig * (1.0 - ig)
        dgf = (dc_t * c_prev) * f * (1.0 - f)
        dgg = (dc_t * ig) * (1.0 - gg_ * gg_)
        dgo = do * o * (1.0 - o)
        dgates = jnp.concatenate([dgi, dgf, dgg, dgo], axis=-1) * m
        dgb = dgates.astype(compute_dtype).reshape(2 * GPT, Bgr, H4)

        if fused_input:
            # dx = dgates @ W_ih per direction (2D GEMMs; see _xg2's note)
            dgc = dgates.astype(compute_dtype)
            dx = jnp.stack(
                [
                    jax.lax.dot_general(
                        dgc[d], wih_ref[d], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    for d in range(2)
                ]
            )  # (2, Bt, E_total)
            offs = 0
            for p_idx in range(nparts):
                E = dxf_refs[p_idx].shape[-1]
                dxf_refs[p_idx][s] = dx[0, :, offs : offs + E].astype(
                    dxf_refs[p_idx].dtype
                )
                dxb_refs[p_idx][i] = dx[1, :, offs : offs + E].astype(
                    dxb_refs[p_idx].dtype
                )
                offs += E

            # input-weight and bias gradients accumulate in VMEM scratch
            dwih_scr[...] += jnp.stack(
                [
                    jax.lax.dot_general(
                        x2[d], dgc[d], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    for d in range(2)
                ]
            )  # (2, E_total, 4H)
            dbias_scr[...] += jnp.sum(dgates, axis=1)
        else:
            dgf_ref[s] = dgates[0].astype(dgf_ref.dtype)
            dgb_ref[i] = dgates[1].astype(dgb_ref.dtype)

        hpb = h_prev.astype(compute_dtype).reshape(2 * GPT, Bgr, H)
        # both directions x all tile groups in ONE batched matmul each
        dhp = jax.lax.dot_general(
            dgb, wT_ref[...].reshape(2 * GPT, H4, H),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(2, Bt, H)
        dw_scr[...] += jax.lax.dot_general(
            hpb, dgb, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(2, GPT, H, H4)
        dh_scr[...] = dhp + dh * (1.0 - m)
        dc_scr[...] = dc_t * f * m + dc * (1.0 - m)

    if C <= 4:
        for i in range(C):
            chunk_step(i)
    else:
        jax.lax.fori_loop(0, C, lambda i, carry: (chunk_step(i), carry)[1], 0)

    dw_tiles_ref[0] = dw_scr[...]
    if fused_input:
        dwih_tiles_ref[0] = dwih_scr[...]
        dbias_tiles_ref[0] = dbias_scr[...]


def _bwd_pallas(
    x_parts, lengths, w, wT, wih_t, wih, bias,
    hp_f, cp_f, hp_b, cp_b, dy_f, dy_b, dhn, dcn,
    *, Bt: int, C: int, G: int, compute_dtype, shift_in_kernel: bool = False,
):
    Tp, B, _ = x_parts[0].shape
    H, H4 = w.shape[2], w.shape[3]
    E_total = wih_t.shape[1]
    part_dims = [p.shape[-1] for p in x_parts]
    nB, nT = B // Bt, Tp // C
    Bg = B // G
    GPT = Bt // Bg if Bt > Bg else 1

    mir = lambda b, t: (nT - 1 - t, b, 0)   # fwd-dir BPTT order
    fwd = lambda b, t: (t, b, 0)            # bwd-dir BPTT order
    lmap = lambda b, t: (b, 0)
    onb = lambda b, t: (0, b, 0)
    if shift_in_kernel:
        # previous-state reads straight from hs/cs at t∓1 block offsets
        # (C == 1 only; boundary blocks clamp and are zero-masked in-kernel)
        prev_f = lambda b, t: (jnp.maximum(nT - 2 - t, 0), b, 0)
        prev_b = lambda b, t: (jnp.minimum(t + 1, nT - 1), b, 0)
    else:
        prev_f, prev_b = mir, fwd

    kernel = functools.partial(
        _bwd_kernel, nparts=len(x_parts), C=C, Bt=Bt,
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
                _w_spec(B, Bt, G, H, H4),
                _w_spec(B, Bt, G, H, H4, transposed=True),
                _resident_spec(wih_t.shape),
                _resident_spec(wih.shape),
                _resident_spec(bias.shape),
                pl.BlockSpec((C, Bt, H), prev_f, memory_space=pltpu.VMEM),
                pl.BlockSpec((C, Bt, H), prev_f, memory_space=pltpu.VMEM),
                pl.BlockSpec((C, Bt, H), prev_b, memory_space=pltpu.VMEM),
                pl.BlockSpec((C, Bt, H), prev_b, memory_space=pltpu.VMEM),
                pl.BlockSpec((C, Bt, H), mir, memory_space=pltpu.VMEM),
                pl.BlockSpec((C, Bt, H), fwd, memory_space=pltpu.VMEM),
                pl.BlockSpec((2, Bt, H), onb, memory_space=pltpu.VMEM),
                pl.BlockSpec((2, Bt, H), onb, memory_space=pltpu.VMEM),
            ]
        ),
        out_specs=(
            _part_specs(part_dims, C, Bt, mir)
            + _part_specs(part_dims, C, Bt, fwd)
            + [
                pl.BlockSpec(
                    (1, 2, GPT, H, H4),
                    lambda b, t: (b, 0, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 2, E_total, H4),
                    lambda b, t: (b, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 2, H4),
                    lambda b, t: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ]
        ),
        out_shape=(
            dx_shape
            + dx_shape
            + [
                jax.ShapeDtypeStruct((nB, 2, GPT, H, H4), jnp.float32),
                jax.ShapeDtypeStruct((nB, 2, E_total, H4), jnp.float32),
                jax.ShapeDtypeStruct((nB, 2, H4), jnp.float32),
            ]
        ),
        scratch_shapes=[
            pltpu.VMEM((2, Bt, H), jnp.float32),
            pltpu.VMEM((2, Bt, H), jnp.float32),
            pltpu.VMEM((2, GPT, H, H4), jnp.float32),
            pltpu.VMEM((2, E_total, H4), jnp.float32),
            pltpu.VMEM((2, H4), jnp.float32),
        ],
        interpret=_interpret(),
    )(*x_parts, *x_parts, lengths, w, wT, wih_t, wih, bias,
      hp_f, cp_f, hp_b, cp_b, dy_f, dy_b, dhn, dcn)

    nP = len(x_parts)
    dxf, dxb = out[:nP], out[nP : 2 * nP]
    dw_tiles, dwih_tiles, dbias_tiles = out[2 * nP : 2 * nP + 3]

    dw = _reduce_dw_tiles(dw_tiles, nB, Bt, Bg, G, GPT, H, H4)
    dwih = jnp.sum(dwih_tiles, axis=0)    # (2, E_total, 4H)
    dbias = jnp.sum(dbias_tiles, axis=0)  # (2, 4H)
    return dxf, dxb, dw, dwih, dbias


def _reduce_dw_tiles(dw_tiles, nB, Bt, Bg, G, GPT, H, H4):
    """Per-tile dW_hh -> per-group dW in XLA."""
    if GPT == 1:
        if G == 1:
            return jnp.sum(dw_tiles, axis=0)  # (2,1,H,H4) — GPT axis is G
        groups = (jnp.arange(nB) * Bt) // Bg
        dw = jax.ops.segment_sum(
            dw_tiles[:, :, 0], groups, num_segments=G
        )  # (G,2,H,H4)
        return jnp.swapaxes(dw, 0, 1)
    # tile b covers groups [b*GPT, (b+1)*GPT): exact partition, no sum
    return jnp.swapaxes(dw_tiles, 0, 1).reshape(2, G, H, H4)


def _bwd_pallas_lite(
    xg_f, xg_b, lengths, w, wT,
    hp_f, cp_f, hp_b, cp_b, dy_f, dy_b, dhn, dcn,
    *, Bt: int, C: int, G: int, compute_dtype, shift_in_kernel: bool = False,
):
    """Large-H backward sweep: gate streams in, masked dgates streams +
    dW_hh out. Input-side gradients (dx, dW_ih, dbias) are computed from
    the returned dgates by XLA GEMMs in ``_layer_bwd`` — MXU-bound at the
    widths where this mode activates, and VMEM no longer has to hold W_ih
    operands or a (2, E, 4H) accumulator."""
    Tp, B, H4 = xg_f.shape
    H = w.shape[2]
    nB, nT = B // Bt, Tp // C
    Bg = B // G
    GPT = Bt // Bg if Bt > Bg else 1

    mir = lambda b, t: (nT - 1 - t, b, 0)
    fwd = lambda b, t: (t, b, 0)
    lmap = lambda b, t: (b, 0)
    onb = lambda b, t: (0, b, 0)
    if shift_in_kernel:
        prev_f = lambda b, t: (jnp.maximum(nT - 2 - t, 0), b, 0)
        prev_b = lambda b, t: (jnp.minimum(t + 1, nT - 1), b, 0)
    else:
        prev_f, prev_b = mir, fwd

    kernel = functools.partial(
        _bwd_kernel, nparts=1, C=C, Bt=Bt, compute_dtype=compute_dtype,
        shift_in_kernel=shift_in_kernel, fused_input=False,
    )
    xg_spec = pl.BlockSpec((C, Bt, H4), mir, memory_space=pltpu.VMEM)
    xg_spec_b = pl.BlockSpec((C, Bt, H4), fwd, memory_space=pltpu.VMEM)
    dgf, dgb, dw_tiles = pl.pallas_call(
        kernel,
        grid=(nB, nT),
        in_specs=[
            xg_spec,
            xg_spec_b,
            pl.BlockSpec((Bt, 1), lmap, memory_space=pltpu.VMEM),
            _w_spec(B, Bt, G, H, H4),
            _w_spec(B, Bt, G, H, H4, transposed=True),
            pl.BlockSpec((C, Bt, H), prev_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Bt, H), prev_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Bt, H), prev_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Bt, H), prev_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Bt, H), mir, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Bt, H), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Bt, H), onb, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Bt, H), onb, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((C, Bt, H4), mir, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Bt, H4), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 2, GPT, H, H4),
                lambda b, t: (b, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, B, H4), xg_f.dtype),
            jax.ShapeDtypeStruct((Tp, B, H4), xg_f.dtype),
            jax.ShapeDtypeStruct((nB, 2, GPT, H, H4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, Bt, H), jnp.float32),
            pltpu.VMEM((2, Bt, H), jnp.float32),
            pltpu.VMEM((2, GPT, H, H4), jnp.float32),
        ],
        interpret=_interpret(),
    )(xg_f, xg_b, lengths, w, wT, hp_f, cp_f, hp_b, cp_b, dy_f, dy_b, dhn, dcn)

    dw = _reduce_dw_tiles(dw_tiles, nB, Bt, Bg, G, GPT, H, H4)
    return dgf, dgb, dw


# ----------------------------------------------------------- layer-level op

def _wih_operands(w_ih, bias, compute_dtype):
    """Kernel-ready input-weight operands: ``wih_t (2,E,4H)`` for the gate
    GEMM, ``wih (2,4H,E)`` for dx, ``bias (2,4H)`` f32."""
    wih = w_ih.astype(compute_dtype)
    return jnp.swapaxes(wih, -1, -2), wih, bias.astype(jnp.float32)


def _input_gates(x_parts, w_ih, bias, d: int, compute_dtype, out_dtype):
    """Direction ``d`` input gates ``(Tp, B, 4H)`` as one XLA GEMM — the
    lite (large-H) backward's gate recompute. ``out_dtype=f32`` keeps the
    stream at full accumulator precision so the recomputed gates track the
    forward kernel's f32-accumulated in-kernel GEMM closely."""
    offs = 0
    total = bias[d].astype(out_dtype)[None, None, :]
    for part in x_parts:
        E = part.shape[-1]
        wp = w_ih[d, :, offs : offs + E].astype(compute_dtype)
        total = total + jnp.einsum(
            "tbe,ge->tbg", part.astype(compute_dtype), wp,
            preferred_element_type=out_dtype,
        )
        offs += E
    return total


def _unpack_state(s2, H):
    """Packed final state ``(B, 2H)`` -> v5 layout ``(2, B, H)``."""
    return jnp.stack([s2[:, :H], s2[:, H:]])


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def pallas_bidir_layer(
    x_parts, w_ih, bias, w_hh_t, lengths, G: int, compute_dtype, Bt: int,
    C: int, fused=True,
):
    """One fully fused bidirectional LSTM layer, time-major.

    :param x_parts: tuple of ``(Tp, B, E_i)`` time-major inputs whose
        feature-concat is the layer input (Tp padded to a multiple of C;
        padded positions must exceed every row's length).
    :param w_ih: ``(2, 4H, E_total)``; ``bias``: ``(2, 4H)`` (b_ih + b_hh).
    :param w_hh_t: ``(2, G, H, 4H)`` pre-transposed recurrent weights.
    :param lengths: ``(B, 1)`` int32 — positions >= length freeze the state.
    :param fused: kernel generation — ``"packed"`` (v6 direction-packed
        lanes), ``True`` (v5 fused), ``False`` (lite large-H backward).
    :returns: ``(hs_f (Tp,B,H), hs_b (Tp,B,H), hn (2,B,H), cn (2,B,H))``.
    """
    wih_t, _, bias_f = _wih_operands(w_ih, bias, compute_dtype)
    H = w_hh_t.shape[2]
    if fused == "packed":
        from intrepppid_tpu.ops import lstm_pallas_packed as P

        wp, wihp, _, bp = P.pack_operands(w_hh_t, wih_t, bias_f, compute_dtype)
        # the forward sweep runs at the pipeline floor: chunk it harder
        # than the (VMEM-bound) backward — bitwise identical, measured
        # ~1.08x (tools/experiment_fwd_chunk.py)
        Cf = P.pick_fwd_chunk(
            x_parts[0].shape[1], x_parts[0].shape[0], H, G, compute_dtype,
            sum(p.shape[-1] for p in x_parts), Bt,
        )
        hs_f, hs_b, hn2, cn2 = P._fwd_pallas_packed(
            tuple(x_parts), lengths, wp, wihp, bp,
            Bt=Bt, C=(Cf if C == 1 else C), G=G, H=H,
            compute_dtype=compute_dtype,
            with_states=False,
        )
        return hs_f, hs_b, _unpack_state(hn2, H), _unpack_state(cn2, H)
    # eval/primal path: skip the cell-state residual streams
    hs_f, hs_b, hn, cn = _fwd_pallas(
        tuple(x_parts), lengths, w_hh_t.astype(compute_dtype), wih_t, bias_f,
        Bt=Bt, C=C, G=G, compute_dtype=compute_dtype, with_states=False,
    )
    return hs_f, hs_b, hn, cn


def _layer_fwd(
    x_parts, w_ih, bias, w_hh_t, lengths, G, compute_dtype, Bt, C,
    fused=True, x_packed=False, pack_y=False,
):
    wih_t, _, bias_f = _wih_operands(w_ih, bias, compute_dtype)
    H = w_hh_t.shape[2]
    if fused == "packed":
        from intrepppid_tpu.ops import lstm_pallas_packed as P

        wp, wihp, _, bp = P.pack_operands(w_hh_t, wih_t, bias_f, compute_dtype)
        # forward-only chunking (see pallas_bidir_layer primal): the
        # residual streams' layout is C-independent, so the C=1 backward
        # consumes them unchanged
        Cf = P.pick_fwd_chunk(
            x_parts[0].shape[1], x_parts[0].shape[0], H, G, compute_dtype,
            sum(p.shape[-1] for p in x_parts), Bt,
        )
        if P.PACK_CS:
            # one full-width cell-residual stream instead of two
            # half-width ones (cs_b slot carries None to mark the mode);
            # pack_y (v7 inner stack layers) additionally emits the layer
            # output as one pair-packed ys (hs_b slot carries None)
            outs = P._fwd_pallas_packed(
                tuple(x_parts), lengths, wp, wihp, bp,
                Bt=Bt, C=(Cf if C == 1 else C), G=G, H=H,
                compute_dtype=compute_dtype,
                with_states=True, pack_cs=True,
                x_packed=x_packed, pack_y=pack_y,
            )
            if pack_y:
                ys, cs_p, hn2, cn2 = outs
                hs_f, hs_b = ys, None
            else:
                hs_f, hs_b, cs_p, hn2, cn2 = outs
            cs_a, cs_b = cs_p, None
        else:
            assert not (x_packed or pack_y)
            hs_f, hs_b, cs_a, cs_b, hn2, cn2 = P._fwd_pallas_packed(
                tuple(x_parts), lengths, wp, wihp, bp,
                Bt=Bt, C=(Cf if C == 1 else C), G=G, H=H,
                compute_dtype=compute_dtype,
                with_states=True,
            )
        residuals = (
            tuple(x_parts), w_ih, bias, w_hh_t, lengths,
            hs_f, hs_b, cs_a, cs_b,
        )
        return (
            hs_f, hs_b, _unpack_state(hn2, H), _unpack_state(cn2, H)
        ), residuals
    hs_f, hs_b, cs_f, cs_b, hn, cn = _fwd_pallas(
        tuple(x_parts), lengths, w_hh_t.astype(compute_dtype), wih_t, bias_f,
        Bt=Bt, C=C, G=G, compute_dtype=compute_dtype, with_states=True,
    )
    # NOTE: no gate streams in the residuals — the backward recomputes them
    # from the (much narrower) x parts (in-kernel when fused, one XLA GEMM
    # per direction in the lite mode).
    residuals = (
        tuple(x_parts), w_ih, bias, w_hh_t, lengths, hs_f, hs_b, cs_f, cs_b
    )
    return (hs_f, hs_b, hn, cn), residuals


def _prev_states(hs_f, cs_f, hs_b, cs_b, C):
    """Previous-step state streams for the backward. At C == 1 they are
    read in-kernel from hs/cs at shifted block indices — no materialized
    shift copies (4 x (Tp,B,H) writes+reads saved)."""
    if C == 1:
        return hs_f, cs_f, hs_b, cs_b, True
    zero = jnp.zeros_like(hs_f[:1])
    # fwd dir processed positions ascending: prev state at t-1
    hp_f = jnp.concatenate([zero, hs_f[:-1]], axis=0)
    cp_f = jnp.concatenate([zero, cs_f[:-1]], axis=0)
    # bwd dir processed positions descending: prev state at t+1
    hp_b = jnp.concatenate([hs_b[1:], zero], axis=0)
    cp_b = jnp.concatenate([cs_b[1:], zero], axis=0)
    return hp_f, cp_f, hp_b, cp_b, False


def _packed_bwd_streams(
    residuals, dyf_streams, dyb_streams, dhn, dcn, *, G, compute_dtype,
    Bt, C, x_packed=False, dy_packed=False,
):
    """Packed (v6) layer backward taking dy as tuples of UNSUMMED
    contribution streams per direction (summed in-register inside the
    sweep). Returns ``(dxf, dxb, dw_ih, dbias, dw)`` with the per-part
    dx contributions likewise unsummed, so a stack VJP can thread them
    straight into the next (lower) layer's backward.

    v7 boundary modes: a ``pack_y`` layer's residuals carry the packed
    ``ys`` in the hs_f slot (hs_b None) — consumed as the packed hp;
    ``dy_packed`` takes ``dyf_streams`` as pair-packed cotangent streams
    (``dyb_streams`` ignored); ``x_packed`` emits the dx cotangent as two
    pair-packed streams ``((dxA,), (dxB,))``."""
    (x_parts, w_ih, bias, w_hh_t, lengths, hs_f, hs_b, cs_a, cs_b) = residuals
    pack_cs = cs_b is None
    hp_packed = hs_b is None
    if hp_packed:
        assert pack_cs
        if C == 1:
            hp_f, cp_f, shift_in_kernel = hs_f, cs_a, True
        else:
            hp_f = jnp.concatenate(
                [jnp.zeros_like(hs_f[:1]), hs_f[:-1]], axis=0
            )
            cp_f = jnp.concatenate(
                [jnp.zeros_like(cs_a[:1]), cs_a[:-1]], axis=0
            )
            shift_in_kernel = False
        hp_b = cp_b = None
    elif pack_cs:
        if C == 1:
            hp_f, hp_b, cp_f, shift_in_kernel = hs_f, hs_b, cs_a, True
        else:
            zero = jnp.zeros_like(hs_f[:1])
            hp_f = jnp.concatenate([zero, hs_f[:-1]], axis=0)
            hp_b = jnp.concatenate([hs_b[1:], zero], axis=0)
            # packed prev: row p holds the pair for fwd-dir position p, so
            # ONE forward shift serves both directions (see kernel note)
            cp_f = jnp.concatenate(
                [jnp.zeros_like(cs_a[:1]), cs_a[:-1]], axis=0
            )
            shift_in_kernel = False
        cp_b = None
    else:
        hp_f, cp_f, hp_b, cp_b, shift_in_kernel = _prev_states(
            hs_f, cs_a, hs_b, cs_b, C
        )
    from intrepppid_tpu.ops import lstm_pallas_packed as P

    H = w_hh_t.shape[2]
    B = hs_f.shape[1]
    wih_t, _, bias_f = _wih_operands(w_ih, bias, compute_dtype)
    wp, wihp, wihTp, bp = P.pack_operands(
        w_hh_t, wih_t, bias_f, compute_dtype
    )
    dhn_p = jnp.concatenate([dhn[0], dhn[1]], axis=-1)
    dcn_p = jnp.concatenate([dcn[0], dcn[1]], axis=-1)
    dxf, dxb, dw_tiles, dwih_tiles, dbias_tiles = P._bwd_pallas_packed(
        x_parts, lengths, wp, wihp, wihTp, bp,
        hp_f, cp_f, hp_b, cp_b, dyf_streams, dyb_streams, dhn_p, dcn_p,
        Bt=Bt, C=C, G=G, H=H, compute_dtype=compute_dtype,
        shift_in_kernel=shift_in_kernel, pack_cs=pack_cs,
        x_packed=x_packed, hp_packed=hp_packed, dy_packed=dy_packed,
    )
    dw, dwih, dbias = P.reduce_packed_grads(
        dw_tiles, dwih_tiles, dbias_tiles, B=B, Bt=Bt, G=G, H=H
    )
    dw_ih = jnp.swapaxes(dwih, -1, -2).astype(w_ih.dtype)
    return (
        dxf, dxb, dw_ih, dbias.astype(w_ih.dtype), dw.astype(w_hh_t.dtype)
    )


def _layer_bwd(G, compute_dtype, Bt, C, fused, residuals, cots):
    (x_parts, w_ih, bias, w_hh_t, lengths, hs_f, hs_b, cs_f, cs_b) = residuals
    dy_f, dy_b, dhn, dcn = cots

    if fused == "packed":
        dxf, dxb, dw_ih, dbias, dw = _packed_bwd_streams(
            residuals, (dy_f,), (dy_b,), dhn, dcn,
            G=G, compute_dtype=compute_dtype, Bt=Bt, C=C,
        )
        dx_parts = tuple(
            (f + b).astype(p.dtype) for f, b, p in zip(dxf, dxb, x_parts)
        )
        return dx_parts, dw_ih, dbias, dw, None

    w = w_hh_t.astype(compute_dtype)
    wT = jnp.swapaxes(w, -1, -2)
    hp_f, cp_f, hp_b, cp_b, shift_in_kernel = _prev_states(
        hs_f, cs_f, hs_b, cs_b, C
    )

    if fused:
        wih_t, wih, bias_f = _wih_operands(w_ih, bias, compute_dtype)
        dxf, dxb, dw, dwih, dbias = _bwd_pallas(
            x_parts, lengths, w, wT, wih_t, wih, bias_f,
            hp_f, cp_f, hp_b, cp_b, dy_f, dy_b, dhn, dcn,
            Bt=Bt, C=C, G=G, compute_dtype=compute_dtype,
            shift_in_kernel=shift_in_kernel,
        )
        dx_parts = tuple(
            (f + b).astype(p.dtype) for f, b, p in zip(dxf, dxb, x_parts)
        )
        dw_ih = jnp.swapaxes(dwih, -1, -2).astype(w_ih.dtype)  # (2, 4H, E)
        dbias = dbias.astype(w_ih.dtype)
        return dx_parts, dw_ih, dbias, dw.astype(w_hh_t.dtype), None

    # lite (large-H) mode: gate streams recomputed by XLA, kernel emits
    # masked dgates, input-side gradients as XLA GEMMs
    xg_f = _input_gates(x_parts, w_ih, bias, 0, compute_dtype, jnp.float32)
    xg_b = _input_gates(x_parts, w_ih, bias, 1, compute_dtype, jnp.float32)
    dxg_f, dxg_b, dw = _bwd_pallas_lite(
        xg_f, xg_b, lengths, w, wT,
        hp_f, cp_f, hp_b, cp_b, dy_f, dy_b, dhn, dcn,
        Bt=Bt, C=C, G=G, compute_dtype=compute_dtype,
        shift_in_kernel=shift_in_kernel,
    )

    dxg_fc = dxg_f.astype(compute_dtype)
    dxg_bc = dxg_b.astype(compute_dtype)
    dx_parts = []
    offs = 0
    for part in x_parts:
        E = part.shape[-1]
        wp = w_ih[:, :, offs : offs + E].astype(compute_dtype)
        pref = part.dtype if part.dtype == compute_dtype else jnp.float32
        dx = jnp.einsum(
            "tbg,ge->tbe", dxg_fc, wp[0], preferred_element_type=pref
        ) + jnp.einsum(
            "tbg,ge->tbe", dxg_bc, wp[1], preferred_element_type=pref
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
        [
            jnp.sum(dxg_f, axis=(0, 1), dtype=jnp.float32),
            jnp.sum(dxg_b, axis=(0, 1), dtype=jnp.float32),
        ]
    ).astype(w_ih.dtype)
    return tuple(dx_parts), dw_ih, dbias, dw.astype(w_hh_t.dtype), None


pallas_bidir_layer.defvjp(_layer_fwd, _layer_bwd)


# ------------------------------------------------- whole-stack custom VJP


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def pallas_bilstm_stack(
    x_parts, layer_weights, lengths, Gs, compute_dtype, Bt: int, C: int,
    fused=True,
):
    """The full bidirectional LSTM stack as ONE differentiation unit.

    Functionally identical to looping :func:`pallas_bidir_layer`, but in
    the packed (v6) mode the backward threads each upper layer's UNSUMMED
    per-direction dx contributions (``dxf[part], dxb[part]``) straight
    into the lower layer's backward kernel as two dy streams, where they
    are summed in-register inside the sweep. That removes the two XLA
    ``(Tp, B, H)`` adds per layer boundary plus their materialized
    outputs (~1 ms/step at the flagship shape, device-profiled).

    :param x_parts: tuple of ``(Tp, B, E_i)`` time-major layer-0 inputs.
    :param layer_weights: tuple of ``(w_ih, bias, w_hh_t)`` per layer —
        shapes as in :func:`pallas_bidir_layer`, layer ``l > 0`` consuming
        the ``(hs_f, hs_b)`` two-part 2H-wide input.
    :param Gs: per-layer weight-group counts (static tuple).
    :returns: ``(hs_f_top, hs_b_top, hns, cns)`` with ``hns``/``cns``
        tuples of per-layer ``(2, B, H)`` final states.
    """
    v7 = _pack_boundary_active(fused, len(layer_weights))
    L = len(layer_weights)
    parts = tuple(x_parts)
    hns, cns = [], []
    for l, ((w_ih, bias, w_hh_t), G) in enumerate(zip(layer_weights, Gs)):
        if v7:
            hs_f, hs_b, hn, cn = _eval_packed_layer(
                parts, w_ih, bias, w_hh_t, lengths, G, compute_dtype, Bt,
                C, x_packed=l > 0, pack_y=l < L - 1,
            )
            parts = (hs_f,) if l < L - 1 else (hs_f, hs_b)
        else:
            hs_f, hs_b, hn, cn = pallas_bidir_layer(
                parts, w_ih, bias, w_hh_t, lengths, G, compute_dtype, Bt,
                C, fused,
            )
            parts = (hs_f, hs_b)
        hns.append(hn)
        cns.append(cn)
    return parts[0], parts[1], tuple(hns), tuple(cns)


def _pack_boundary_active(fused, n_layers: int) -> bool:
    """v7 pair-packed inter-layer boundary eligibility (multi-layer
    packed stacks with the packed-cs residual enabled)."""
    if fused != "packed" or n_layers <= 1:
        return False
    from intrepppid_tpu.ops import lstm_pallas_packed as P

    return P.PACK_BOUNDARY and P.PACK_CS


def _eval_packed_layer(
    x_parts, w_ih, bias, w_hh_t, lengths, G, compute_dtype, Bt, C,
    x_packed, pack_y,
):
    """Eval/primal forward of one packed layer with the v7 boundary
    modes (no residual streams). Returns ``(ys, None, hn, cn)`` for
    ``pack_y`` layers, ``(hs_f, hs_b, hn, cn)`` otherwise."""
    from intrepppid_tpu.ops import lstm_pallas_packed as P

    wih_t, _, bias_f = _wih_operands(w_ih, bias, compute_dtype)
    H = w_hh_t.shape[2]
    wp, wihp, _, bp = P.pack_operands(w_hh_t, wih_t, bias_f, compute_dtype)
    Cf = P.pick_fwd_chunk(
        x_parts[0].shape[1], x_parts[0].shape[0], H, G, compute_dtype,
        sum(p.shape[-1] for p in x_parts), Bt,
    )
    outs = P._fwd_pallas_packed(
        tuple(x_parts), lengths, wp, wihp, bp,
        Bt=Bt, C=(Cf if C == 1 else C), G=G, H=H,
        compute_dtype=compute_dtype, with_states=False,
        x_packed=x_packed, pack_y=pack_y,
    )
    if pack_y:
        ys, hn2, cn2 = outs
        return ys, None, _unpack_state(hn2, H), _unpack_state(cn2, H)
    hs_f, hs_b, hn2, cn2 = outs
    return hs_f, hs_b, _unpack_state(hn2, H), _unpack_state(cn2, H)


def _stack_fwd(
    x_parts, layer_weights, lengths, Gs, compute_dtype, Bt, C, fused=True
):
    v7 = _pack_boundary_active(fused, len(layer_weights))
    L = len(layer_weights)
    parts = tuple(x_parts)
    residuals, hns, cns = [], [], []
    for l, ((w_ih, bias, w_hh_t), G) in enumerate(zip(layer_weights, Gs)):
        (hs_f, hs_b, hn, cn), res = _layer_fwd(
            parts, w_ih, bias, w_hh_t, lengths, G, compute_dtype, Bt, C,
            fused, x_packed=v7 and l > 0, pack_y=v7 and l < L - 1,
        )
        residuals.append(res)
        parts = (hs_f,) if (v7 and l < L - 1) else (hs_f, hs_b)
        hns.append(hn)
        cns.append(cn)
    return (parts[0], parts[1], tuple(hns), tuple(cns)), tuple(residuals)


def _stack_bwd(Gs, compute_dtype, Bt, C, fused, residuals, cots):
    dyf_top, dyb_top, dhns, dcns = cots
    L = len(residuals)
    v7 = _pack_boundary_active(fused, L)
    dyf_streams, dyb_streams = (dyf_top,), (dyb_top,)
    dy_packed = False
    d_weights = [None] * L
    dx0 = None
    for l in reversed(range(L)):
        res = residuals[l]
        if fused == "packed":
            dxf, dxb, dw_ih, dbias, dw = _packed_bwd_streams(
                res, dyf_streams, dyb_streams, dhns[l], dcns[l],
                G=Gs[l], compute_dtype=compute_dtype, Bt=Bt, C=C,
                x_packed=v7 and l > 0, dy_packed=dy_packed,
            )
            if l > 0:
                if v7:
                    # this (x_packed) layer emitted its input cotangent
                    # as two pair-packed contribution streams — thread
                    # them straight into the lower layer's packed dy
                    dyf_streams = (dxf[0], dxb[0])
                    dyb_streams = None
                    dy_packed = True
                else:
                    # lower layer's hs_f cotangent = this layer's part-0
                    # contributions from BOTH directions — threaded
                    # unsummed
                    dyf_streams = (dxf[0], dxb[0])
                    dyb_streams = (dxf[1], dxb[1])
            else:
                x0 = res[0]
                dx0 = tuple(
                    (f + b).astype(p.dtype)
                    for f, b, p in zip(dxf, dxb, x0)
                )
        else:
            dy_f = dyf_streams[0]
            dy_b = dyb_streams[0]
            for s in dyf_streams[1:]:
                dy_f = dy_f + s
            for s in dyb_streams[1:]:
                dy_b = dy_b + s
            dx_parts, dw_ih, dbias, dw, _ = _layer_bwd(
                Gs[l], compute_dtype, Bt, C, fused, res,
                (dy_f, dy_b, dhns[l], dcns[l]),
            )
            if l > 0:
                dyf_streams = (dx_parts[0],)
                dyb_streams = (dx_parts[1],)
            else:
                dx0 = dx_parts
        d_weights[l] = (dw_ih, dbias, dw)
    return dx0, tuple(d_weights), None


pallas_bilstm_stack.defvjp(_stack_fwd, _stack_bwd)
