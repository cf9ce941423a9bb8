"""Hand-ported numpy oracle of the pinned Ranger21 optimizer.

Port of ``Ranger21.step()`` from lessw2020/Ranger21 at commit ``1a96777``
(the exact pin in `/root/reference/requirements.txt:65`, consumed by
`/root/reference/intrepppid/e2e/e2e_triplet.py:200-226`), restricted to the
configuration space the reference uses: adam core (no madgrad, no
adabelief), pnm momentum, AGC + GC + stable weight decay + norm loss +
softplus denominator + lookahead, with/without linear warmup & warmdown.

The port preserves the package's quirks on purpose, so the test pins them:

* ``torch.max(max_variance_ma, variance_ma, out=variance_ma)`` writes into
  ``variance_ma`` while ``max_variance_ma`` stays all-zero forever — the
  amsgrad-style max is a no-op (v >= 0), replicated by simply not doing it.
* the PNM noise normalizer is ``sqrt((1+beta2)^2 + beta2^2)`` (beta2=0.999),
  NOT ``sqrt((1+pnm_factor)^2 + pnm_factor^2)`` — the pnm factor only scales
  the numerator.
* auto warmup length: ``ceil(2/(1-beta2))`` unless that exceeds 45% of the
  run, then ``int(0.22*total)``.
* warmdown: starts at ``int(pct*total)`` of the 1-based step counter, decays
  linearly by ``(step+1-start)/(total-start+1)``, floored at ``min_lr``, and
  *overrides* the warmup-dampened lr.
* AGC mutates ``p.grad`` in place, and gradient centralization mutates it
  again — so phase 2 (and the PNM EMAs) consume the clipped+centralized
  gradient.
* norm-loss correction is ``2*factor*(1 - 1/(unit_norm(p)+eps))`` applied as
  ``p *= 1 - lr*correction`` AFTER stable weight decay.
* unit_norm reduces axis 1 for ndim 2 and 3, axes (1,2,3) for ndim 4.

All arithmetic in float64 — this is a semantic spec, not a bitwise one.
"""
from __future__ import annotations

import math

import numpy as np


def _softplus(x: np.ndarray, beta: float) -> np.ndarray:
    # torch.nn.functional.softplus: linear above threshold=20 on beta*x.
    bx = beta * x
    return np.where(bx > 20.0, x, np.log1p(np.exp(np.minimum(bx, 20.0))) / beta)


def _unit_norm(x: np.ndarray) -> np.ndarray:
    if x.ndim <= 1:
        return np.linalg.norm(x)
    if x.ndim in (2, 3):
        axes: tuple = (1,)
    elif x.ndim == 4:
        axes = (1, 2, 3)
    else:
        axes = tuple(range(1, x.ndim))
    return np.sqrt(np.sum(x * x, axis=axes, keepdims=True))


class Ranger21Oracle:
    def __init__(
        self,
        params,
        lr: float,
        num_batches_per_epoch: int,
        num_epochs: int,
        use_warmup: bool = True,
        warmdown_active: bool = True,
        weight_decay: float = 1e-2,
        warmdown_start_pct: float = 0.72,
        betas=(0.9, 0.999),
        eps: float = 1e-8,
        num_warmup_iterations=None,
        warmdown_min_lr: float = 3e-5,
        agc_clipping_value: float = 1e-2,
        agc_eps: float = 1e-3,
        beta_softplus: float = 50.0,
        normloss_factor: float = 1e-4,
        momentum_pnm_factor: float = 1.0,
        lookahead_mergetime: int = 5,
        lookahead_blending_alpha: float = 0.5,
    ):
        self.params = [np.array(p, np.float64) for p in params]
        self.state = [
            dict(
                step=0,
                grad_ma=np.zeros_like(p),
                neg_grad_ma=np.zeros_like(p),
                variance_ma=np.zeros_like(p),
                lookahead_params=p.copy(),
            )
            for p in self.params
        ]
        self.starting_lr = lr
        self.beta1, self.beta2 = betas
        self.eps = eps
        self.weight_decay = weight_decay
        self.agc_clip = agc_clipping_value
        self.agc_eps = agc_eps
        self.beta_softplus = beta_softplus
        self.normloss_factor = normloss_factor
        self.pnm_factor = momentum_pnm_factor
        self.la_mergetime = lookahead_mergetime
        self.la_alpha = lookahead_blending_alpha

        self.total_iterations = num_batches_per_epoch * num_epochs
        self.use_warmup = use_warmup
        if num_warmup_iterations is None:
            beta_warmup_iters = math.ceil(2.0 / (1.0 - self.beta2))
            if beta_warmup_iters / self.total_iterations > 0.45:
                self.num_warmup_iters = int(0.22 * self.total_iterations)
            else:
                self.num_warmup_iters = beta_warmup_iters
        else:
            self.num_warmup_iters = num_warmup_iterations
        self.warmdown_active = warmdown_active
        self.min_lr = warmdown_min_lr
        self.start_warm_down = int(warmdown_start_pct * self.total_iterations)
        self.warmdown_total_iterations = (
            self.total_iterations - self.start_warm_down
        )

    # ----------------------------------------------------------- components
    def _agc(self, p: np.ndarray, grad: np.ndarray) -> np.ndarray:
        p_norm = np.maximum(_unit_norm(p), self.agc_eps)
        g_norm = _unit_norm(grad)
        max_norm = p_norm * self.agc_clip
        clipped = grad * (max_norm / np.maximum(g_norm, 1e-6))
        return np.where(g_norm > max_norm, clipped, grad)

    def _warmup_dampening(self, lr: float, step: int) -> float:
        return lr * min(1.0, step / self.num_warmup_iters)

    def _get_warm_down(self, lr: float, step: int) -> float:
        if step < self.start_warm_down:
            return lr
        warmdown_iteration = max((step + 1) - self.start_warm_down, 1)
        pct = min(warmdown_iteration / (self.warmdown_total_iterations + 1), 1.0)
        return max(self.starting_lr - pct * (self.starting_lr - self.min_lr),
                   self.min_lr)

    # ----------------------------------------------------------------- step
    def step(self, grads) -> None:
        grads = [np.array(g, np.float64) for g in grads]
        param_size = sum(p.size for p in self.params)
        variance_ma_sum = 0.0

        # phase 1: AGC + GC (both mutate p.grad in the torch package), second
        # moment update, pooled bias-corrected variance sum.
        processed = []
        for p, g, st in zip(self.params, grads, self.state):
            g = self._agc(p, g)
            if g.ndim > 1:
                g = g - g.mean(axis=tuple(range(1, g.ndim)), keepdims=True)
            processed.append(g)
            st["step"] += 1
            bias_correction2 = 1.0 - self.beta2 ** st["step"]
            st["variance_ma"] = (
                self.beta2 * st["variance_ma"] + (1.0 - self.beta2) * g * g
            )
            variance_ma_sum += (st["variance_ma"] / bias_correction2).sum()

        variance_normalized = math.sqrt(variance_ma_sum / param_size)

        # phase 2: lr schedule, stable decay, pnm/adam update, norm loss,
        # lookahead.
        for i, (g, st) in enumerate(zip(processed, self.state)):
            step = st["step"]
            lr = self.starting_lr
            if self.use_warmup:
                lr = self._warmup_dampening(lr, step)
            if self.warmdown_active:
                lr = self._get_warm_down(lr, step)

            p = self.params[i]
            if self.weight_decay:
                p = p * (1.0 - self.weight_decay * lr / variance_normalized)

            bias_correction1 = 1.0 - self.beta1 ** step
            bias_correction2 = 1.0 - self.beta2 ** step

            # max_variance_ma no-op quirk: variance_ma unchanged.
            denom = np.sqrt(st["variance_ma"] / bias_correction2) + self.eps
            denom = _softplus(denom, self.beta_softplus)

            noise_norm = math.sqrt((1.0 + self.beta2) ** 2 + self.beta2 ** 2)
            step_size = lr / bias_correction1

            cur, prev = ("grad_ma", "neg_grad_ma") if step % 2 == 1 else (
                "neg_grad_ma", "grad_ma")
            b1sq = self.beta1 ** 2
            st[cur] = b1sq * st[cur] + (1.0 - b1sq) * g

            unorm = _unit_norm(p)
            correction = 2.0 * self.normloss_factor * (
                1.0 - 1.0 / (unorm + self.eps))
            p = p * (1.0 - lr * correction)

            pnmomentum = (
                (1.0 + self.pnm_factor) * st[cur]
                - self.pnm_factor * st[prev]
            ) / noise_norm
            p = p - step_size * pnmomentum / denom

            if step % self.la_mergetime == 0:
                slow = st["lookahead_params"]
                slow = slow + self.la_alpha * (p - slow)
                st["lookahead_params"] = slow
                p = slow.copy()

            self.params[i] = p
