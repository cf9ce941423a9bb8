"""Activation functions.

TPU-native equivalents of the activations used by the reference
(``nn.Mish`` in `intrepppid/classifier/head/mlp.py:38` and
`intrepppid/encoders/awd_lstm.py:48`, ``nn.ReLU`` in the dead Projection MLP).
"""
from __future__ import annotations

import jax.numpy as jnp
import jax


def mish(x: jnp.ndarray) -> jnp.ndarray:
    """Mish activation: ``x * tanh(softplus(x))``.

    Matches ``torch.nn.Mish`` (Misra 2019). ``jax.nn.softplus`` is
    numerically stable for large ``|x|`` which keeps bf16 training sane.
    """
    return x * jnp.tanh(jax.nn.softplus(x))


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0)
