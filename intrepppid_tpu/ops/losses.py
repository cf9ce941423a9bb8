"""Loss functions matching the reference's torch criteria.

* ``bce_with_logits`` — ``nn.BCEWithLogitsLoss`` (mean reduction),
  `intrepppid/e2e/e2e_triplet.py:76,131`.
* ``triplet_margin_loss`` — ``nn.TripletMarginLoss(margin=1.0, p=2)``,
  `intrepppid/e2e/e2e_triplet.py:80,125-127`. torch computes distances via
  ``F.pairwise_distance`` which adds ``eps=1e-6`` to the elementwise
  difference before the norm; we replicate that for golden parity.
* ``combined_triplet_loss`` — the β-weighted sum. NOTE the reference's
  docstrings state the opposite weighting to the code; the code wins
  (SURVEY.md Appendix A #1): classifier gets ``1 - 1/β``, triplet ``1/β``
  (`intrepppid/e2e/e2e_triplet.py:133-136`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(
    logits: jnp.ndarray, targets: jnp.ndarray, weights: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Mean binary cross-entropy on logits, numerically stable.

    Uses ``max(x,0) - x*y + log1p(exp(-|x|))`` like torch. Optional per-row
    ``weights`` turn the mean into a weighted mean (used to mask padded rows
    in multi-device batches; all-ones == unweighted).
    """
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    loss = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if weights is None:
        return jnp.mean(loss)
    w = weights.astype(jnp.float32)
    return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1e-9)


def pairwise_distance(x1: jnp.ndarray, x2: jnp.ndarray, p: float = 2.0, eps: float = 1e-6) -> jnp.ndarray:
    """``torch.nn.functional.pairwise_distance``: ``||x1 - x2 + eps||_p`` row-wise."""
    diff = x1 - x2 + eps
    return jnp.sum(jnp.abs(diff) ** p, axis=-1) ** (1.0 / p)


def triplet_margin_loss(
    anchor: jnp.ndarray,
    positive: jnp.ndarray,
    negative: jnp.ndarray,
    margin: float = 1.0,
    p: float = 2.0,
    eps: float = 1e-6,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    anchor = anchor.astype(jnp.float32)
    positive = positive.astype(jnp.float32)
    negative = negative.astype(jnp.float32)
    d_ap = pairwise_distance(anchor, positive, p, eps)
    d_an = pairwise_distance(anchor, negative, p, eps)
    hinge = jnp.maximum(d_ap - d_an + margin, 0.0)
    if weights is None:
        return jnp.mean(hinge)
    w = weights.astype(jnp.float32)
    return jnp.sum(hinge * w) / jnp.maximum(jnp.sum(w), 1e-9)


def combined_triplet_loss(
    classifier_loss: jnp.ndarray, triplet_loss: jnp.ndarray, beta_classifier: float
) -> jnp.ndarray:
    """β-weighted total loss exactly as coded in the reference."""
    norm_beta_ssl = 1.0 / beta_classifier
    norm_beta_classifier = 1.0 - norm_beta_ssl
    return norm_beta_classifier * classifier_loss + norm_beta_ssl * triplet_loss
