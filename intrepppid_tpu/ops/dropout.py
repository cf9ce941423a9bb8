"""Stochastic regularisation ops as pure functions of (key, array).

The reference has four distinct stochastic mechanisms (see SURVEY.md §7):

* AWD-LSTM *embedding dropout* — Bernoulli mask over whole vocabulary rows
  (`intrepppid/utils/embedding_do.py:20-44`).
* *DropConnect* weight dropout — per-element mask over a weight matrix
  (`intrepppid/utils/weightdrop.py:100-102`).
* *Variational* weight dropout — per-row mask expanded across columns
  (`intrepppid/utils/weightdrop.py:88-95`). NOTE the reference hardcodes
  ``training=True`` for the variational path so it is active even in eval;
  we replicate that quirk (SURVEY.md Appendix A #4) — callers do not gate
  the variational mask on ``train``.
* Plain activation dropout (``nn.Dropout`` in the MLP head,
  `intrepppid/classifier/head/mlp.py:49-51`).

All masks use inverted-dropout scaling ``1/(1-p)`` like
``torch.nn.functional.dropout``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def dropout(key: jax.Array, x: jnp.ndarray, p: float, train: bool) -> jnp.ndarray:
    """Standard inverted dropout, identity when ``not train`` or ``p == 0``."""
    if not train or p == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), 0.0).astype(x.dtype)


def dropconnect_weight(key: jax.Array, w: jnp.ndarray, p: float, train: bool) -> jnp.ndarray:
    """Per-element weight dropout (DropConnect, the AWD-LSTM paper's scheme).

    Equivalent to ``F.dropout(raw_w, p, training=train)`` in the reference
    (`intrepppid/utils/weightdrop.py:100-102`): identity in eval.
    """
    if not train or p == 0.0:
        return w
    keep = jax.random.bernoulli(key, 1.0 - p, w.shape)
    return jnp.where(keep, w / (1.0 - p), 0.0).astype(w.dtype)


def variational_weight(key: jax.Array, w: jnp.ndarray, p: float) -> jnp.ndarray:
    """Per-row weight dropout (Gal & Ghahramani variational dropout).

    Mask shape ``(rows, 1)`` expanded across columns, scaled ``1/(1-p)``.
    Deliberately NOT gated on ``train``: the reference applies it with
    ``training=True`` unconditionally (`intrepppid/utils/weightdrop.py:94`),
    so the variational path is active at eval time too. We keep that
    behaviour for parity (manuscript runs use ``variational_dropout=false``).
    """
    if p == 0.0:
        return w
    keep = jax.random.bernoulli(key, 1.0 - p, (w.shape[0], 1))
    return jnp.where(keep, w / (1.0 - p), 0.0).astype(w.dtype)


# Vocabulary size up to which the lookup itself runs as a one-hot GEMM:
# TPU row gathers run at a fraction of HBM bandwidth (profiled 3.3 ms/step
# — 32 GB/s — for the grouped (5,250,64)-table lookup at the flagship
# shape), while the one-hot contraction fuses the iota-compare into the
# MXU operand tiles and measures at the memory floor (~0.3 ms).
_ONEHOT_GATHER_MAX_VOCAB = 4096


def _lookup(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    vocab = table.shape[0]
    if vocab > _ONEHOT_GATHER_MAX_VOCAB:
        return jnp.take(table, ids, axis=0)
    onehot = jax.nn.one_hot(ids.reshape(-1), vocab, dtype=table.dtype)
    rows = jax.lax.dot_general(
        onehot, table, (((1,), (0,)), ((), ())),
        preferred_element_type=table.dtype,
    )
    return rows.reshape(ids.shape + (table.shape[-1],))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def embedding_gather(
    table: jnp.ndarray, ids: jnp.ndarray, out_dtype=None
) -> jnp.ndarray:
    """``table[ids]`` (rows in ``out_dtype``) with an MXU-friendly forward
    AND backward.

    Forward: the (tiny) table is cast to ``out_dtype`` first — casting
    before the lookup is value-identical to casting the gathered rows
    after, but the (B,T,E) result moves at half the bytes under bf16 —
    and for small vocabularies the lookup is the exact one-hot contraction
    ``onehot(ids) @ table`` (1.0 x row on the MXU — identical values to a
    gather, several times faster than TPU's serialised row gather).
    Backward: XLA's autodiff of a gather is a scatter-add, which serialises
    on TPU (measured ~90 ms per train step at the flagship shape); the VJP
    here is the algebraic equivalent one-hot contraction ``dtable =
    onehot(ids)^T @ dout`` — one small GEMM, accumulated AND emitted in the
    table's own dtype (folding the cast into the op keeps the f32 param's
    gradient f32 instead of rounding the per-row sums through bf16).
    """
    t = table.astype(out_dtype) if out_dtype is not None else table
    return _lookup(t, ids)


def _embedding_gather_fwd(table, ids, out_dtype):
    t = table.astype(out_dtype) if out_dtype is not None else table
    # zero-size dtype witness: residual leaves must be JAX values, and the
    # backward must emit the cotangent in the (f32 param) table's dtype
    witness = jnp.zeros((0,), table.dtype)
    return _lookup(t, ids), (ids, table.shape[0], witness)


def _embedding_gather_bwd(out_dtype, residuals, dout):
    ids, vocab, witness = residuals
    onehot = jax.nn.one_hot(ids.reshape(-1), vocab, dtype=dout.dtype)
    dtable = jax.lax.dot_general(
        onehot, dout.reshape(-1, dout.shape[-1]),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(witness.dtype)
    return dtable, None


embedding_gather.defvjp(_embedding_gather_fwd, _embedding_gather_bwd)


def embedding_dropout(
    key: jax.Array,
    embedding: jnp.ndarray,
    ids: jnp.ndarray,
    p: float,
    train: bool,
    padding_idx: int = 0,
    out_dtype=None,
) -> jnp.ndarray:
    """AWD-LSTM embedding dropout: drop whole token *types* per batch.

    Bernoulli keep-mask of shape ``(vocab, 1)`` over the embedding table,
    scaled by ``1/(1-p)``, then a plain gather — mirrors
    `intrepppid/utils/embedding_do.py:20-44`. The ``padding_idx`` row of a
    torch ``nn.Embedding`` is zero-initialised with masked grads, so we
    force that row to zero in the lookup result for exact equivalence.
    ``out_dtype`` requests lookup rows in the compute dtype while keeping
    the table's gradient in the table's own (param) dtype.
    """
    if train and p > 0.0:
        keep = jax.random.bernoulli(key, 1.0 - p, (embedding.shape[0], 1))
        table = jnp.where(keep, embedding / (1.0 - p), 0.0).astype(embedding.dtype)
    else:
        table = embedding
    out = embedding_gather(table, ids, out_dtype)
    if padding_idx is not None:
        out = jnp.where((ids == padding_idx)[..., None], 0.0, out)
    return out
