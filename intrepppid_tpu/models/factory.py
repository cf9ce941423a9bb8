"""Top-level model factory — the public API mirror of the reference's
``intrepppid_network()`` (`intrepppid/__init__.py:23-88`), with the same
manuscript defaults (vocab 250, embedding 64, 2 layers, dropouts 0.3,
``bi_reduce="last"``, β=2, lr=1e-2, ``ranger21_xx``).

Returns an :class:`IntrepppidNetwork` — a functional bundle of config plus
``init``/``forward``/``step`` methods (JAX has no stateful nn.Module; the
params pytree is explicit).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from intrepppid_tpu.models.awd_lstm import EncoderConfig
from intrepppid_tpu.models.triplet import (
    TripletE2EConfig,
    forward as triplet_forward,
    init_triplet_e2e,
    step as triplet_step,
)


@dataclass(frozen=True)
class IntrepppidNetwork:
    cfg: TripletE2EConfig
    num_epochs: int
    steps_per_epoch: int
    optimizer_type: str
    lr: float

    def init(self, key: jax.Array) -> Dict[str, Any]:
        return init_triplet_e2e(key, self.cfg)

    def forward(
        self,
        params: Dict[str, Any],
        x1: jnp.ndarray,
        x2: jnp.ndarray,
        key: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        return triplet_forward(params, self.cfg, x1, x2, key, train)

    def step(self, params, batch, key, train: bool):
        return triplet_step(params, self.cfg, batch, key, train)

    def num_params(self, params) -> int:
        return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


def intrepppid_network(
    steps_per_epoch: int,
    vocab_size: int = 250,
    embedding_size: int = 64,
    rnn_num_layers: int = 2,
    rnn_dropout_rate: float = 0.3,
    variational_dropout: bool = False,
    bi_reduce: str = "last",
    embedding_droprate: float = 0.3,
    num_epochs: int = 100,
    do_rate: float = 0.3,
    beta_classifier: float = 2,
    lr: float = 1e-2,
    use_projection: bool = False,
    optimizer_type: str = "ranger21_xx",
    compute_dtype: Any = jnp.float32,
) -> IntrepppidNetwork:
    """Assemble the manuscript INTREPPPID network (same signature and
    defaults as the reference factory, plus a TPU ``compute_dtype`` knob —
    pass ``jnp.bfloat16`` for mixed precision, the TPU analogue of the
    reference's fp16 AMP)."""
    encoder = EncoderConfig(
        vocab_size=vocab_size,
        embedding_size=embedding_size,
        rnn_num_layers=rnn_num_layers,
        rnn_dropout_rate=rnn_dropout_rate,
        variational_dropout=variational_dropout,
        bi_reduce=bi_reduce,
        embedding_droprate=embedding_droprate,
        compute_dtype=compute_dtype,
    )
    cfg = TripletE2EConfig(
        encoder=encoder,
        do_rate=do_rate,
        beta_classifier=float(beta_classifier),
        use_projection=use_projection,
    )
    return IntrepppidNetwork(
        cfg=cfg,
        num_epochs=num_epochs,
        steps_per_epoch=steps_per_epoch,
        optimizer_type=optimizer_type,
        lr=lr,
    )
