"""LR schedules matching the reference's torch schedulers.

* ``onecycle``: ``torch.optim.lr_scheduler.OneCycleLR`` defaults
  (pct_start=0.3, cosine anneal, div_factor=25, final_div_factor=1e4) —
  `intrepppid/e2e/e2e_triplet.py:233-242`.
* ``cosine_warm_restarts``: ``CosineAnnealingWarmRestarts(T_0=10, T_mult=2,
  eta_min=1e-6)`` stepped **per epoch** (Lightning's default scheduler
  interval) — `e2e_triplet.py:244-250`.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import optax


def onecycle(
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
) -> optax.Schedule:
    """Exact ``torch.optim.lr_scheduler.OneCycleLR`` (cos anneal) formula:
    phase boundaries at ``pct_start*total - 1`` and ``total - 1``,
    ``_annealing_cos(start, end, pct) = end + (start-end)/2*(1+cos(pi*pct))``.
    """
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    up_steps = float(pct_start * total_steps) - 1.0
    down_steps = float(total_steps - 1) - up_steps

    def _cos(start, end, pct):
        return end + (start - end) / 2.0 * (1.0 + jnp.cos(jnp.pi * pct))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        pct1 = jnp.clip(step / jnp.maximum(up_steps, 1e-9), 0.0, 1.0)
        pct2 = jnp.clip((step - up_steps) / jnp.maximum(down_steps, 1e-9), 0.0, 1.0)
        return jnp.where(
            step <= up_steps,
            _cos(initial_lr, max_lr, pct1),
            _cos(max_lr, min_lr, pct2),
        )

    return schedule


def cosine_warm_restarts(
    base_lr: float,
    steps_per_epoch: int,
    t_0: int = 10,
    t_mult: int = 2,
    eta_min: float = 1e-6,
) -> optax.Schedule:
    """Per-epoch SGDR schedule as a function of the global step."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        epoch = jnp.floor(step / steps_per_epoch)
        # find the restart cycle: epochs accumulate t_0, t_0*t_mult, ...
        # closed form for t_mult > 1: n = floor(log_tm(epoch*(tm-1)/t0 + 1))
        if t_mult == 1:
            t_cur = jnp.mod(epoch, t_0)
            t_i = float(t_0)
        else:
            n = jnp.floor(
                jnp.log(epoch * (t_mult - 1) / t_0 + 1.0) / math.log(t_mult)
            )
            start = t_0 * (t_mult**n - 1.0) / (t_mult - 1.0)
            t_cur = epoch - start
            t_i = t_0 * (t_mult**n)
        return eta_min + (base_lr - eta_min) * (1.0 + jnp.cos(jnp.pi * t_cur / t_i)) / 2.0

    return schedule
