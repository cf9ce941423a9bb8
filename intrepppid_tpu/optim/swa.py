"""Stochastic Weight Averaging.

The reference attaches Lightning's ``StochasticWeightAveraging(swa_lrs=1e-2)``
callback (`intrepppid/e2e/e2e_triplet.py:390`): from 80% of training, a
running average of the weights accumulates each epoch and replaces the model
at fit end, while the LR anneals toward ``swa_lr`` (cosine, 10 epochs).

Functional equivalent: an :class:`SWAState` updated at epoch boundaries and
an LR-multiplier for the annealing phase. The averaged params are used for
the final test pass, like Lightning's weight swap before ``trainer.test``.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp


@dataclass
class SWAConfig:
    swa_lr: float = 1e-2
    swa_epoch_start: float = 0.8
    annealing_epochs: int = 10


class SWAState:
    def __init__(self, cfg: SWAConfig, num_epochs: int):
        self.cfg = cfg
        self.start_epoch = int(math.ceil(cfg.swa_epoch_start * num_epochs))
        self.num_epochs = num_epochs
        self.n_averaged = 0
        self.avg_params: Optional[Any] = None

    def active(self, epoch: int) -> bool:
        return epoch >= self.start_epoch

    def update(self, epoch: int, params) -> None:
        """Call at the end of each epoch with the current params."""
        if not self.active(epoch):
            return
        if self.avg_params is None:
            # must be a distinct buffer: params get DONATED by the jitted
            # train step, so an aliasing snapshot (astype on same-dtype is a
            # no-op view) would be deleted out from under us next step
            self.avg_params = jax.tree_util.tree_map(
                lambda p: jnp.array(p, dtype=jnp.float32, copy=True), params
            )
            self.n_averaged = 1
            return
        n = self.n_averaged

        self.avg_params = jax.tree_util.tree_map(
            lambda avg, p: avg + (p.astype(jnp.float32) - avg) / (n + 1),
            self.avg_params, params,
        )
        self.n_averaged = n + 1

    def lr_scale(self, epoch: int, base_lr: float) -> float:
        """Cosine annealing multiplier from base_lr toward swa_lr."""
        if not self.active(epoch):
            return 1.0
        t = min((epoch - self.start_epoch) / max(self.cfg.annealing_epochs, 1), 1.0)
        target = self.cfg.swa_lr
        lr = target + (base_lr - target) * (1 + math.cos(math.pi * t)) / 2
        return lr / base_lr if base_lr > 0 else 1.0

    def final_params(self, params):
        """Averaged params if any were accumulated, else the input params."""
        if self.avg_params is None:
            return params
        return jax.tree_util.tree_map(
            lambda avg, p: avg.astype(p.dtype), self.avg_params, params
        )
