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
    """Lightning-parity SWA arithmetic, re-indexed to end-of-epoch hooks.

    Lightning 1.9's ``StochasticWeightAveraging`` resolves a float
    ``swa_epoch_start`` to ``int(max_epochs * swa_epoch_start)`` (truncation,
    not ceil) and averages the module weights in ``on_train_epoch_start`` for
    0-based epochs ``swa_start .. max_epochs-1`` where
    ``swa_start = max(int(...) - 1, 0)``. Our trainer hook runs at epoch
    *ends*; the params at the end of epoch ``e`` are the params at the start
    of epoch ``e+1``, so the equivalent end-of-epoch update window is
    ``swa_start-1 .. max_epochs-2`` — in particular the final epoch's
    post-training weights never enter the average, exactly like Lightning.
    Corner (ADVICE r3): if ``swa_start == 0`` (num_epochs <= 2 at the 0.8
    default) Lightning averages the *initial* weights at the start of epoch
    0, which an end-of-epoch hook cannot observe — the trainer calls
    :meth:`seed_initial` with the initial params before the first epoch so
    that term is not lost.

    The SWALR annealing (``lr_scale``) keys on ``swa_start`` directly: the
    LR used *during* epoch ``e`` corresponds to Lightning's epoch ``e``.
    """

    def __init__(self, cfg: SWAConfig, num_epochs: int):
        self.cfg = cfg
        # Lightning: 0-based first epoch whose START is averaged
        self.swa_start = max(int(cfg.swa_epoch_start * num_epochs) - 1, 0)
        # our end-of-epoch update window [update_start, update_end]
        self.update_start = self.swa_start - 1
        self.update_end = num_epochs - 2
        self.num_epochs = num_epochs
        self.n_averaged = 0
        self.avg_params: Optional[Any] = None

    def seed_initial(self, params) -> None:
        """Seed the average with the *initial* params when ``swa_start == 0``
        (Lightning averages them at the start of epoch 0 — before any
        training — which the end-of-epoch hook can never see). Call once,
        before the first epoch of a fresh (non-resumed) fit; a no-op in
        every other configuration."""
        if self.swa_start != 0 or self.avg_params is not None:
            return
        self.avg_params = jax.tree_util.tree_map(
            lambda p: jnp.array(p, dtype=jnp.float32, copy=True), params
        )
        self.n_averaged = 1

    def active(self, epoch: int) -> bool:
        """Whether the end-of-epoch hook at 0-based ``epoch`` should average."""
        return self.update_start <= epoch <= self.update_end

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
        if epoch < self.swa_start:
            return 1.0
        t = min((epoch - self.swa_start) / max(self.cfg.annealing_epochs, 1), 1.0)
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
