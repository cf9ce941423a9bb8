"""Binary classification metrics, jit-safe, matching torchmetrics semantics.

The reference computes torchmetrics ``AUROC``, ``AveragePrecision``,
``MatthewsCorrCoef(threshold=0.5)``, ``Precision`` and ``Recall`` (all
``task="binary"``) **per batch** and logs with ``on_epoch=True``, so the
epoch value is the *mean of batch-level metrics*, not a pooled epoch-global
metric (`intrepppid/e2e/e2e_triplet.py:87-91,172-185`; SURVEY.md Appendix A
#14). These functions compute the batch-level values; the trainer averages
them across batches to reproduce that aggregation.

All functions take raw logits; thresholded metrics use ``sigmoid(x) > 0.5``
(equivalently ``x > 0``). Rank metrics (AUROC/AP) are invariant under the
monotone sigmoid so it is skipped there.

Degenerate batches (no positives or no negatives) return 0.0, matching
torchmetrics' zero-division behaviour.
"""
from __future__ import annotations

import jax.numpy as jnp


def _tie_averaged_ranks(scores: jnp.ndarray) -> jnp.ndarray:
    """1-based ranks with ties assigned the average rank of their group."""
    n = scores.shape[0]
    order = jnp.argsort(scores)
    sorted_s = scores[order]
    lo = jnp.searchsorted(sorted_s, sorted_s, side="left")
    hi = jnp.searchsorted(sorted_s, sorted_s, side="right")
    avg_rank_sorted = (lo + 1 + hi) / 2.0
    return jnp.zeros(n, scores.dtype).at[order].set(avg_rank_sorted.astype(scores.dtype))


def binary_auroc(
    logits: jnp.ndarray, targets: jnp.ndarray, weights: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Exact ROC AUC (tie-corrected). Optional per-row sample ``weights``
    (used to mask padded rows in multi-device batches; all-ones reproduces
    the unweighted value exactly)."""
    logits = logits.astype(jnp.float32)
    y = targets.astype(jnp.float32)
    if weights is None:
        n_pos = jnp.sum(y)
        n_neg = jnp.sum(1.0 - y)
        ranks = _tie_averaged_ranks(logits)
        u = jnp.sum(ranks * y) - n_pos * (n_pos + 1.0) / 2.0
        denom = n_pos * n_neg
        return jnp.where(denom > 0, u / jnp.maximum(denom, 1.0), 0.0)
    w = weights.astype(jnp.float32)
    # weighted Mann-Whitney: for each positive, the negative weight strictly
    # below it plus half the tied negative weight
    order = jnp.argsort(logits)
    s = logits[order]
    ws = w[order]
    ys = y[order]
    wneg = ws * (1.0 - ys)
    prefix = jnp.concatenate([jnp.zeros(1), jnp.cumsum(wneg)])  # inclusive, padded
    lo = jnp.searchsorted(s, s, side="left")
    hi = jnp.searchsorted(s, s, side="right")
    neg_below = prefix[lo]
    neg_tied = prefix[hi] - prefix[lo]
    contrib = ws * ys * (neg_below + 0.5 * neg_tied)
    w_pos = jnp.sum(w * y)
    w_neg = jnp.sum(w * (1.0 - y))
    denom = w_pos * w_neg
    return jnp.where(denom > 0, jnp.sum(contrib) / jnp.maximum(denom, 1e-12), 0.0)


def binary_average_precision(
    logits: jnp.ndarray, targets: jnp.ndarray, weights: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Average precision (area under the PR curve, step interpolation).

    Matches sklearn/torchmetrics: thresholds are the unique scores in
    descending order; within a tie group precision is evaluated at the end
    of the group. Optional sample ``weights`` (all-ones == unweighted).
    """
    logits = logits.astype(jnp.float32)
    y = targets.astype(jnp.float32)
    w = jnp.ones_like(y) if weights is None else weights.astype(jnp.float32)
    order = jnp.argsort(-logits)
    s_desc = logits[order]
    y_desc = y[order]
    w_desc = w[order]
    tps = jnp.cumsum(w_desc * y_desc)
    fps = jnp.cumsum(w_desc * (1.0 - y_desc))
    precision = tps / jnp.maximum(tps + fps, 1e-12)
    # index of the last element of each tie group in the descending order
    neg = -s_desc
    group_end = jnp.searchsorted(neg, neg, side="right") - 1
    prec_at_group_end = precision[group_end]
    w_pos = jnp.sum(w * y)
    delta_recall = w_desc * y_desc / jnp.maximum(w_pos, 1e-12)
    ap = jnp.sum(delta_recall * prec_at_group_end)
    return jnp.where(w_pos > 0, ap, 0.0)


def _confusion(logits: jnp.ndarray, targets: jnp.ndarray, weights=None):
    pred = (logits > 0.0).astype(jnp.float32)
    y = targets.astype(jnp.float32)
    w = jnp.ones_like(y) if weights is None else weights.astype(jnp.float32)
    tp = jnp.sum(w * pred * y)
    fp = jnp.sum(w * pred * (1.0 - y))
    fn = jnp.sum(w * (1.0 - pred) * y)
    tn = jnp.sum(w * (1.0 - pred) * (1.0 - y))
    return tp, fp, fn, tn


def binary_mcc(logits, targets, weights=None) -> jnp.ndarray:
    tp, fp, fn, tn = _confusion(logits.astype(jnp.float32), targets, weights)
    denom = jnp.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    return jnp.where(denom > 0, (tp * tn - fp * fn) / jnp.maximum(denom, 1e-38), 0.0)


def binary_precision(logits, targets, weights=None) -> jnp.ndarray:
    tp, fp, _, _ = _confusion(logits.astype(jnp.float32), targets, weights)
    return jnp.where(tp + fp > 0, tp / jnp.maximum(tp + fp, 1e-12), 0.0)


def binary_recall(logits, targets, weights=None) -> jnp.ndarray:
    tp, _, fn, _ = _confusion(logits.astype(jnp.float32), targets, weights)
    return jnp.where(tp + fn > 0, tp / jnp.maximum(tp + fn, 1e-12), 0.0)


def all_binary_metrics(
    logits: jnp.ndarray, targets: jnp.ndarray, weights: jnp.ndarray | None = None
) -> dict:
    """The reference's five-metric set, computed in one pass."""
    return {
        "auroc": binary_auroc(logits, targets, weights),
        "ap": binary_average_precision(logits, targets, weights),
        "mcc": binary_mcc(logits, targets, weights),
        "precision": binary_precision(logits, targets, weights),
        "rec": binary_recall(logits, targets, weights),
    }
