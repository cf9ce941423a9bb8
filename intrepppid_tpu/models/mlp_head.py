"""MLP pair-classifier head (`intrepppid/classifier/head/mlp.py:22-68`).

Order-invariant: averages the two sequence embeddings (`mlp.py:66`), then
``Mish -> WeightDrop(Linear(E, E/2)) -> Mish -> Dropout -> Mish -> Dropout
-> WeightDrop(Linear(E/2, 1))`` (`mlp.py:35-63`; note the back-to-back
Mish/Dropout with no Linear between is a reference quirk, Appendix A #8).
Both Linear weights use DropConnect (per-element, train-only); biases are
undropped.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from intrepppid_tpu.models.awd_lstm import _linear_init, linear
from intrepppid_tpu.ops.activations import mish
from intrepppid_tpu.ops.dropout import dropconnect_weight, dropout


def init_mlp_head(key: jax.Array, embedding_size: int) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    return {
        "fc1": _linear_init(k1, embedding_size // 2, embedding_size),
        "fc2": _linear_init(k2, 1, embedding_size // 2),
    }


def apply_mlp_head(
    params: Dict[str, Any],
    z1: jnp.ndarray,
    z2: jnp.ndarray,
    key: jax.Array,
    do_rate: float,
    train: bool,
    compute_dtype=None,
) -> jnp.ndarray:
    """Returns a single logit per pair, shape ``(B, 1)``."""
    k_w1, k_w2, k_d1, k_d2 = jax.random.split(key, 4)
    x = (z1 + z2) / 2.0
    x = mish(x)
    fc1 = {
        "w": dropconnect_weight(k_w1, params["fc1"]["w"], do_rate, train),
        "b": params["fc1"]["b"],
    }
    x = linear(fc1, x, compute_dtype)
    x = mish(x)
    x = dropout(k_d1, x, do_rate, train)
    x = mish(x)
    x = dropout(k_d2, x, do_rate, train)
    fc2 = {
        "w": dropconnect_weight(k_w2, params["fc2"]["w"], do_rate, train),
        "b": params["fc2"]["b"],
    }
    return linear(fc2, x, compute_dtype)
