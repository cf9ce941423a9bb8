"""AWD-LSTM encoder as pure init/apply functions.

TPU-native rebuild of ``AWDLSTMEncoder``/``AWDLSTM``/``Projection``
(`intrepppid/encoders/awd_lstm.py:23-155`):

* embedding lookup with AWD-style embedding dropout
  (`awd_lstm.py:144-152`, `utils/embedding_do.py`),
* 2-layer bidirectional LSTM with hidden == embedding size and weight drop
  on ``weight_hh_l0`` only — the layer-0 *forward* recurrent matrix; the
  reverse and deeper matrices are undropped (`awd_lstm.py:43-45`,
  SURVEY.md Appendix A #3),
* ``bi_reduce`` over the final hidden states of the last layer's two
  directions (`awd_lstm.py:58-69`). ``"concat"`` would crash the
  reference's ``fc`` (2E into an E->E Linear, Appendix A #5) — we reject it
  at config time instead of at runtime,
* a final ``Linear(E, E)``; the trailing Mish is commented out in the
  reference (`awd_lstm.py:72`) and therefore absent here,
* the *dead* ``Projection`` MLP (`awd_lstm.py:140-142`): instantiated but
  never called in the reference; its parameters still affect param counts,
  optimizer state and checkpoints, so we initialise them too (toggleable
  via ``include_dead_projection``).

Instead of the reference's dynamic-shape truncation to the longest non-pad
sequence (`awd_lstm.py:149-150`), the padded block stays static-shape and
truncation becomes masked state-freezing inside the scan (see ops/lstm.py),
with the batch's (or each logical call-group's) max length passed as a
dynamic scalar — XLA compiles one program for all batches.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from intrepppid_tpu.ops.dropout import (
    dropconnect_weight,
    embedding_dropout,
    variational_weight,
)
from intrepppid_tpu.ops.lstm import bilstm, init_lstm_params

BI_REDUCE_MODES = ("concat", "max", "mean", "last")


@dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int = 250
    embedding_size: int = 64
    rnn_num_layers: int = 2
    rnn_dropout_rate: float = 0.3
    variational_dropout: bool = False
    bi_reduce: str = "last"
    embedding_droprate: float = 0.3
    include_dead_projection: bool = True
    compute_dtype: Any = jnp.float32

    def __post_init__(self):
        if self.bi_reduce not in BI_REDUCE_MODES:
            raise ValueError(
                f"bi_reduce must be one of {BI_REDUCE_MODES}, got {self.bi_reduce!r}"
            )
        if self.bi_reduce == "concat":
            # Parity with the reference where "concat" produces a 2E vector
            # that crashes the E->E fc (`awd_lstm.py:58-60` vs `:47`).
            raise ValueError(
                'bi_reduce="concat" is rejected: in the reference it feeds a '
                "2*embedding vector into an embedding->embedding Linear and "
                "crashes; only max/mean/last are viable."
            )


def _linear_init(key: jax.Array, out_dim: int, in_dim: int, dtype=jnp.float32):
    """torch ``nn.Linear`` default init: U(-1/sqrt(in), 1/sqrt(in)) for w and b."""
    k1, k2 = jax.random.split(key)
    bound = 1.0 / (in_dim ** 0.5)
    return {
        "w": jax.random.uniform(k1, (out_dim, in_dim), dtype, -bound, bound),
        "b": jax.random.uniform(k2, (out_dim,), dtype, -bound, bound),
    }


def linear(params: Dict[str, jnp.ndarray], x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    w = params["w"]
    b = params["b"]
    if compute_dtype is not None:
        w = w.astype(compute_dtype)
        x = x.astype(compute_dtype)
    return (
        jnp.einsum("...i,oi->...o", x, w, preferred_element_type=jnp.float32)
        + b.astype(jnp.float32)
    )


def init_projection(key: jax.Array, in_dim: int, out_dim: int, num_layers: int):
    """The reference's dead Projection MLP (`awd_lstm.py:77-105`)."""
    diff_dim = (out_dim - in_dim) // num_layers
    layers = []
    dim = in_dim
    for _ in range(num_layers - 1):
        key, sub = jax.random.split(key)
        layers.append(_linear_init(sub, dim + diff_dim, dim))
        dim += diff_dim
    key, sub = jax.random.split(key)
    layers.append(_linear_init(sub, out_dim, dim))
    return layers


def apply_projection(layers, x: jnp.ndarray) -> jnp.ndarray:
    for p in layers[:-1]:
        x = jnp.maximum(linear(p, x), 0.0)
    return linear(layers[-1], x)


def init_encoder(key: jax.Array, cfg: EncoderConfig) -> Dict[str, Any]:
    k_emb, k_lstm, k_fc, k_proj = jax.random.split(key, 4)
    E = cfg.embedding_size
    embedding = jax.random.normal(k_emb, (cfg.vocab_size, E), jnp.float32)
    embedding = embedding.at[0].set(0.0)  # padding_idx=0 row zeroed, as torch
    params = {
        "embedding": embedding,
        "lstm": init_lstm_params(k_lstm, E, E, cfg.rnn_num_layers),
        "fc": _linear_init(k_fc, E, E),
    }
    if cfg.include_dead_projection:
        params["projection"] = init_projection(k_proj, E, 2 * E, 3)
    return params


def _apply_weight_drop(params, cfg: EncoderConfig, key: jax.Array, train: bool, groups: int):
    """Weight-drop ``weight_hh_l0`` (layer-0 forward) like the reference.

    With ``groups > 1`` an independent mask is drawn per logical encoder
    call (the reference re-draws the mask on every forward,
    `utils/weightdrop.py:65-111`; a quintuplet step makes 5 calls).
    Returns lstm params with the (possibly grouped) dropped ``w_hh``.
    """
    lstm = [dict(l) for l in params["lstm"]]
    lstm[0] = dict(lstm[0])
    fwd = dict(lstm[0]["fwd"])
    raw = fwd["w_hh"]
    p = cfg.rnn_dropout_rate

    if cfg.variational_dropout:
        # Active even at eval — reference quirk (Appendix A #4).
        if groups > 1:
            keys = jax.random.split(key, groups)
            fwd["w_hh"] = jnp.stack(
                [variational_weight(k, raw, p) for k in keys]
            )
            bwd = dict(lstm[0]["bwd"])
            bwd["w_hh"] = jnp.broadcast_to(
                bwd["w_hh"], (groups,) + bwd["w_hh"].shape
            )
            lstm[0]["bwd"] = bwd
        else:
            fwd["w_hh"] = variational_weight(key, raw, p)
    elif train and p > 0.0:
        if groups > 1:
            keys = jax.random.split(key, groups)
            fwd["w_hh"] = jnp.stack(
                [dropconnect_weight(k, raw, p, True) for k in keys]
            )
            bwd = dict(lstm[0]["bwd"])
            bwd["w_hh"] = jnp.broadcast_to(
                bwd["w_hh"], (groups,) + bwd["w_hh"].shape
            )
            lstm[0]["bwd"] = bwd
        else:
            fwd["w_hh"] = dropconnect_weight(key, raw, p, True)

    lstm[0]["fwd"] = fwd
    return lstm


def group_max_lengths(ids: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Per-row max-length vector replicating per-call truncation.

    ``ids`` is group-major ``(G*Bg, T)``; each group's rows get that
    group's longest non-pad length (`awd_lstm.py:149-150` per call).
    """
    B, _ = ids.shape
    lens = jnp.sum(ids != 0, axis=1).astype(jnp.int32)
    if groups <= 1:
        return jnp.broadcast_to(jnp.max(lens), (B,))
    gmax = jnp.max(lens.reshape(groups, B // groups), axis=1)
    return jnp.repeat(gmax, B // groups, total_repeat_length=B)


def apply_encoder(
    params: Dict[str, Any],
    cfg: EncoderConfig,
    ids: jnp.ndarray,
    key: Optional[jax.Array],
    train: bool,
    groups: int = 1,
) -> jnp.ndarray:
    """Encode token ids ``(B, T)`` into ``(B, E)`` sequence embeddings.

    ``groups`` > 1 marks the batch as ``G`` stacked logical encoder calls
    (group-major); dropout masks and truncation lengths are drawn/computed
    per group so one physical scan reproduces G reference forwards.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    k_emb, k_wd = jax.random.split(key)

    max_len = group_max_lengths(ids, groups)

    # Embedding lookup emits compute_dtype rows (the table is cast inside
    # embedding_gather, so the (B,T,E) result, its time-major transpose and
    # the first input-gate GEMM all move at half the bytes under bf16 while
    # the table's gradient stays in the f32 param dtype).
    # Embedding dropout: fresh vocab-row mask per logical call.
    if groups > 1 and train and cfg.embedding_droprate > 0.0:
        G = groups
        B, T = ids.shape
        Bg = B // G
        emb_keys = jax.random.split(k_emb, G)
        ids_g = ids.reshape(G, Bg, T)
        x = jax.vmap(
            lambda k, i: embedding_dropout(
                k, params["embedding"], i, cfg.embedding_droprate, True,
                out_dtype=cfg.compute_dtype,
            )
        )(emb_keys, ids_g).reshape(B, T, -1)
    else:
        x = embedding_dropout(
            k_emb, params["embedding"], ids, cfg.embedding_droprate, train,
            out_dtype=cfg.compute_dtype,
        )

    needs_groups = groups > 1 and (
        cfg.variational_dropout or (train and cfg.rnn_dropout_rate > 0.0)
    )
    lstm = _apply_weight_drop(
        params, cfg, k_wd, train, groups if needs_groups else 1
    )

    _, hn, _ = bilstm(lstm, x, max_len, cfg.compute_dtype)

    # Final-layer direction states: hn[-2] forward, hn[-1] reverse.
    h_fwd, h_bwd = hn[-2], hn[-1]
    if cfg.bi_reduce == "max":
        z = jnp.maximum(h_fwd, h_bwd)
    elif cfg.bi_reduce == "mean":
        z = (h_fwd + h_bwd) / 2.0
    else:  # "last": the reverse-direction final state only (Appendix A #5)
        z = h_bwd
    return linear(params["fc"], z, cfg.compute_dtype)
