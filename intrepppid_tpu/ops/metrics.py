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


def binary_auroc(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Exact ROC AUC via the Mann-Whitney U statistic with tie correction."""
    logits = logits.astype(jnp.float32)
    y = targets.astype(jnp.float32)
    n_pos = jnp.sum(y)
    n_neg = jnp.sum(1.0 - y)
    ranks = _tie_averaged_ranks(logits)
    u = jnp.sum(ranks * y) - n_pos * (n_pos + 1.0) / 2.0
    denom = n_pos * n_neg
    return jnp.where(denom > 0, u / jnp.maximum(denom, 1.0), 0.0)


def binary_average_precision(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Average precision (area under the PR curve, step interpolation).

    Matches sklearn/torchmetrics: thresholds are the unique scores in
    descending order; within a tie group precision is evaluated at the end
    of the group.
    """
    logits = logits.astype(jnp.float32)
    y = targets.astype(jnp.float32)
    n = logits.shape[0]
    order = jnp.argsort(-logits)
    s_desc = logits[order]
    y_desc = y[order]
    tps = jnp.cumsum(y_desc)
    fps = jnp.cumsum(1.0 - y_desc)
    precision = tps / jnp.maximum(tps + fps, 1.0)
    # index of the last element of each tie group in the descending order
    neg = -s_desc
    group_end = jnp.searchsorted(neg, neg, side="right") - 1
    prec_at_group_end = precision[group_end]
    n_pos = jnp.sum(y)
    delta_recall = y_desc / jnp.maximum(n_pos, 1.0)
    ap = jnp.sum(delta_recall * prec_at_group_end)
    return jnp.where(n_pos > 0, ap, 0.0)


def _confusion(logits: jnp.ndarray, targets: jnp.ndarray):
    pred = (logits > 0.0).astype(jnp.float32)
    y = targets.astype(jnp.float32)
    tp = jnp.sum(pred * y)
    fp = jnp.sum(pred * (1.0 - y))
    fn = jnp.sum((1.0 - pred) * y)
    tn = jnp.sum((1.0 - pred) * (1.0 - y))
    return tp, fp, fn, tn


def binary_mcc(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    tp, fp, fn, tn = _confusion(logits.astype(jnp.float32), targets)
    denom = jnp.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    return jnp.where(denom > 0, (tp * tn - fp * fn) / jnp.maximum(denom, 1e-38), 0.0)


def binary_precision(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    tp, fp, _, _ = _confusion(logits.astype(jnp.float32), targets)
    return jnp.where(tp + fp > 0, tp / jnp.maximum(tp + fp, 1.0), 0.0)


def binary_recall(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    tp, _, fn, _ = _confusion(logits.astype(jnp.float32), targets)
    return jnp.where(tp + fn > 0, tp / jnp.maximum(tp + fn, 1.0), 0.0)


def all_binary_metrics(logits: jnp.ndarray, targets: jnp.ndarray) -> dict:
    """The reference's five-metric set, computed in one pass."""
    return {
        "auroc": binary_auroc(logits, targets),
        "ap": binary_average_precision(logits, targets),
        "mcc": binary_mcc(logits, targets),
        "precision": binary_precision(logits, targets),
        "rec": binary_recall(logits, targets),
    }
