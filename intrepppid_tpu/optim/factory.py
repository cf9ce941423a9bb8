"""Optimizer factory — the five ``optimizer_type`` variants of the
reference's ``configure_optimizers`` (`intrepppid/e2e/e2e_triplet.py:198-255`):

* ``ranger21``     — Ranger21, no warmup, no warmdown, weight_decay=1e-2
* ``ranger21_xx``  — Ranger21 with warmup + warmdown(start=0.72)
* ``adamw``        — torch-default AdamW (betas .9/.999, eps 1e-8, wd 1e-2)
* ``adamw_1cycle`` — AdamW + OneCycleLR over the full run
* ``adamw_cosine`` — AdamW + CosineAnnealingWarmRestarts (per-epoch)
"""
from __future__ import annotations

import optax

from intrepppid_tpu.optim.ranger21 import ranger21, ranger21_lr_schedule
from intrepppid_tpu.optim.schedules import cosine_warm_restarts, onecycle

OPTIMIZER_TYPES = ("ranger21", "ranger21_xx", "adamw", "adamw_1cycle", "adamw_cosine")

# torch.optim.AdamW defaults (the reference passes only lr)
_ADAMW_KW = dict(b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-2)


def make_optimizer(
    optimizer_type: str,
    lr: float,
    steps_per_epoch: int,
    num_epochs: int,
) -> optax.GradientTransformation:
    total_steps = max(steps_per_epoch * num_epochs, 1)

    if optimizer_type == "ranger21":
        return ranger21(
            lr,
            num_iterations=total_steps,
            weight_decay=1e-2,
            use_warmup=False,
            warmdown_active=False,
            warmdown_start_pct=0.72,
        )
    if optimizer_type == "ranger21_xx":
        return ranger21(
            lr,
            num_iterations=total_steps,
            weight_decay=1e-2,
            use_warmup=True,
            warmdown_active=True,
            warmdown_start_pct=0.72,
        )
    if optimizer_type == "adamw":
        return optax.adamw(lr, **_ADAMW_KW)
    if optimizer_type == "adamw_1cycle":
        return optax.adamw(onecycle(lr, total_steps), **_ADAMW_KW)
    if optimizer_type == "adamw_cosine":
        return optax.adamw(
            cosine_warm_restarts(lr, steps_per_epoch), **_ADAMW_KW
        )
    raise ValueError(
        'Expected one of "ranger21", "adamw", "ranger21_xx", "adamw_1cycle", '
        f'or "adamw_cosine" as the optimizer type, got {optimizer_type!r}.'
    )


def get_lr_schedule(
    optimizer_type: str,
    lr: float,
    steps_per_epoch: int,
    num_epochs: int,
):
    """The LR-vs-step curve for the LearningRateMonitor equivalent
    (`intrepppid/e2e/e2e_triplet.py:389`). Returns a callable step -> lr."""
    total_steps = max(steps_per_epoch * num_epochs, 1)
    if optimizer_type == "ranger21":
        return lambda step: lr
    if optimizer_type == "ranger21_xx":
        return ranger21_lr_schedule(lr, total_steps, True, True)
    if optimizer_type == "adamw":
        return lambda step: lr
    if optimizer_type == "adamw_1cycle":
        return onecycle(lr, total_steps)
    if optimizer_type == "adamw_cosine":
        return cosine_warm_restarts(lr, steps_per_epoch)
    raise ValueError(optimizer_type)
