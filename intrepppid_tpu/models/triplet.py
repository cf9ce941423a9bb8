"""The quintuplet end-to-end network (`intrepppid/e2e/e2e_triplet.py:43-187`).

One shared encoder is applied five times per step: to the interaction pair
(PPI classification, BCE loss) and to the anchor/positive/negative
orthologue triplet (triplet margin loss). The total loss is the β-weighted
sum, code semantics — classifier ``(1 - 1/β)``, triplet ``1/β``
(`e2e_triplet.py:133-136`, Appendix A #1).

TPU design: the five logical encoder calls are stacked group-major into ONE
physical ``(5B, T)`` batch and run through a single scan — 5x the batch
parallelism instead of 5 sequential tiny scans. Per-call truncation lengths
and per-call dropout masks are preserved via the ``groups=5`` machinery in
models/awd_lstm.py. The reference's call order (anchor, positive, negative,
then p1, p2 — `e2e_triplet.py:116-129`) only affects RNG draws, which
differ from torch anyway; parity is distributional (SURVEY.md §7).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from intrepppid_tpu.models.awd_lstm import (
    EncoderConfig,
    _linear_init,
    apply_encoder,
    init_encoder,
    linear,
)
from intrepppid_tpu.models.mlp_head import apply_mlp_head, init_mlp_head
from intrepppid_tpu.ops.activations import mish
from intrepppid_tpu.ops.losses import (
    bce_with_logits,
    combined_triplet_loss,
    triplet_margin_loss,
)
from intrepppid_tpu.ops.metrics import all_binary_metrics


@dataclass(frozen=True)
class TripletE2EConfig:
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    do_rate: float = 0.3
    beta_classifier: float = 2.0
    use_projection: bool = False
    triplet_margin: float = 1.0

    @property
    def embedding_size(self) -> int:
        return self.encoder.embedding_size


def init_triplet_e2e(key: jax.Array, cfg: TripletE2EConfig) -> Dict[str, Any]:
    k_enc, k_head, k_proj = jax.random.split(key, 3)
    params = {
        "encoder": init_encoder(k_enc, cfg.encoder),
        "head": init_mlp_head(k_head, cfg.embedding_size),
    }
    if cfg.use_projection:
        # triplet_projection = Mish -> Linear(E, E)  (`e2e_triplet.py:82-85`)
        params["triplet_projection"] = _linear_init(
            k_proj, cfg.embedding_size, cfg.embedding_size
        )
    return params


def apply_triplet_projection(params, x: jnp.ndarray) -> jnp.ndarray:
    return linear(params["triplet_projection"], mish(x))


def forward(
    params: Dict[str, Any],
    cfg: TripletE2EConfig,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    key: Optional[jax.Array] = None,
    train: bool = False,
) -> jnp.ndarray:
    """Pair -> logit, mirroring ``TripletE2ENet.forward`` (`e2e_triplet.py:105-111`).

    The two encoder calls are stacked into one groups=2 batch.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    k_enc, k_head = jax.random.split(key)
    B = x1.shape[0]
    ids = jnp.concatenate([x1, x2], axis=0)
    z = apply_encoder(params["encoder"], cfg.encoder, ids, k_enc, train, groups=2)
    z1, z2 = z[:B], z[B:]
    return apply_mlp_head(params["head"], z1, z2, k_head, cfg.do_rate, train)


def step(
    params: Dict[str, Any],
    cfg: TripletE2EConfig,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    train: bool,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One quintuplet step: returns (loss, aux) with the reference's logged
    quantities (`e2e_triplet.py:113-187`).

    ``batch``: dict with ``p1, p2, anchor, positive, negative`` int32
    ``(B, T)`` arrays and ``label`` ``(B,)``; an optional ``weight`` ``(B,)``
    float masks rows out of losses and metrics (used for batches padded up
    to the device count — padded rows get weight 0, so multi-device results
    match the reference's unpadded computation exactly).
    """
    k_enc, k_head = jax.random.split(key)
    B = batch["p1"].shape[0]
    ids = jnp.concatenate(
        [batch["anchor"], batch["positive"], batch["negative"], batch["p1"], batch["p2"]],
        axis=0,
    )
    z = apply_encoder(params["encoder"], cfg.encoder, ids, k_enc, train, groups=5)
    z_anchor, z_positive, z_negative, z1, z2 = jnp.split(z, 5, axis=0)

    if cfg.use_projection:
        z_anchor = apply_triplet_projection(params, z_anchor)
        z_positive = apply_triplet_projection(params, z_positive)
        z_negative = apply_triplet_projection(params, z_negative)

    weights = batch.get("weight")
    triplet_loss = triplet_margin_loss(
        z_anchor, z_positive, z_negative, margin=cfg.triplet_margin, weights=weights
    )

    logits = apply_mlp_head(
        params["head"], z1, z2, k_head, cfg.do_rate, train
    ).squeeze(-1)
    y = batch["label"].astype(jnp.float32)
    classifier_loss = bce_with_logits(logits, y, weights)

    loss = combined_triplet_loss(classifier_loss, triplet_loss, cfg.beta_classifier)

    aux = {
        "loss": loss,
        "classifier_loss": classifier_loss,
        "triplet_loss": triplet_loss,
    }
    aux.update(all_binary_metrics(logits, y, weights))
    return loss, aux
