"""Ranger21 optimizer, reimplemented from scratch in optax.

The reference pins ``ranger21==0.1.0`` (Wright & Demeure, "Ranger21: a
synergistic deep learning optimizer", arXiv:2106.13731) and instantiates it
with ``lr, weight_decay=1e-2, warmdown_start_pct=0.72`` in two variants:
``ranger21`` (no warmup/warmdown) and ``ranger21_xx`` (linear warmup +
linear warmdown) — `intrepppid/e2e/e2e_triplet.py:200-226`.

Components (paper §2, matching the pinned implementation's defaults):

* adaptive gradient clipping (AGC): per-unit clip of ``g`` to
  ``0.01 * max(unit_norm(p), 1e-3)``,
* gradient centralization: subtract the mean over all non-output dims of
  gradients with ndim > 1,
* positive-negative momentum (PNM): two first-moment EMAs updated on
  alternating steps with ``beta1^2``; update direction
  ``((1+γ)·m_cur − γ·m_prev)/sqrt((1+γ)² + γ²)`` with γ = 1,
* Adam second moment with bias correction and a softplus-smoothed
  denominator (``softplus(sqrt(v̂) + eps, beta=50)``),
* stable weight decay: decay scaled by the RMS of the *global* (all
  parameters pooled) bias-corrected second moment,
* norm loss: soft constraint pulling each unit's norm toward 1,
* lookahead (k=5, alpha=0.5),
* linear warmup (default ``min(ceil(2/(1-beta2)), 0.22·total)`` iterations)
  and linear warmdown from ``warmdown_start_pct`` of training to
  ``warmdown_min_lr``.

Step-exactness is validated against a hand-ported numpy oracle of the
pinned package (tests/ranger21_oracle.py, ported from
lessw2020/Ranger21@1a96777): tests/test_ranger21_oracle.py asserts
update-by-update identity (rtol 1e-9 in float64) for both shipped variants
across warmup, plateau, warmdown, lookahead syncs and both PNM parities —
including the package's quirks (beta2-based PNM noise norm, the 0.45-rule
for auto warmup length, warmdown overriding warmup, the no-op
max_variance_ma, norm-loss eps placement, axis-1-only unit norms for 3-D).

Scale caveat (property of the algorithm, reproduced faithfully): AGC ties
gradient magnitude to ``||p||`` while stable weight decay divides the decay
by the gradient RMS, so at toy scales (tiny inits / tiny gradients) the
effective decay fraction ``wd*lr/rms(v̂)`` can reach or exceed 1 and collapse
the weights; the softplus denominator floor (ln2/beta) additionally removes
Adam's scale invariance for gradients below ~1e-2. Both are benign at the
reference model's real scales. ``stable_decay_max_fraction`` offers an
opt-in clamp for small-scale experiments (None = faithful behaviour).
"""
from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax


def _unit_norm(x: jnp.ndarray) -> jnp.ndarray:
    """Ranger21's unit-wise norm (``Ranger21.unit_norm`` in the pinned repo,
    lessw2020/Ranger21@1a96777): whole-tensor for ndim<=1, axis 1 only for
    ndim 2 and 3 (linear layers), axes (1,2,3) for ndim 4 (conv kernels), all
    trailing axes otherwise. Keepdims for ndim>1."""
    if x.ndim <= 1:
        return jnp.linalg.norm(x)
    if x.ndim in (2, 3):
        axes: tuple = (1,)
    elif x.ndim == 4:
        axes = (1, 2, 3)
    else:
        axes = tuple(range(1, x.ndim))
    return jnp.sqrt(jnp.sum(x * x, axis=axes, keepdims=True))


def adaptive_gradient_clip(grad: jnp.ndarray, param: jnp.ndarray,
                           clip: float = 1e-2, eps: float = 1e-3) -> jnp.ndarray:
    p_norm = jnp.maximum(_unit_norm(param), eps)
    g_norm = _unit_norm(grad)
    max_norm = p_norm * clip
    clipped = grad * (max_norm / jnp.maximum(g_norm, 1e-6))
    return jnp.where(g_norm > max_norm, clipped, grad)


def centralize_gradient(grad: jnp.ndarray) -> jnp.ndarray:
    if grad.ndim <= 1:
        return grad
    axes = tuple(range(1, grad.ndim))
    return grad - jnp.mean(grad, axis=axes, keepdims=True)


def ranger21_lr_schedule(
    learning_rate: float,
    num_iterations: int,
    use_warmup: bool,
    warmdown_active: bool,
    beta2: float = 0.999,
    num_warmup_iterations: Optional[int] = None,
    warmdown_start_pct: float = 0.72,
    warmdown_min_lr: float = 3e-5,
):
    """The warmup/warmdown LR curve as a standalone schedule (1-based step).

    Ported from the pinned package's ``warmup_dampening``/``get_warm_down``
    (lessw2020/Ranger21@1a96777), including its quirks: auto warmup length is
    ``ceil(2/(1-beta2))`` unless that exceeds 45% of training, in which case
    ``int(0.22*total)``; warmdown starts at ``int(pct*total)`` (1-based step),
    runs as ``(step+1-start)/(total-start+1)``, and *overrides* the
    warmup-dampened lr rather than taking a min.
    """
    if use_warmup:
        if num_warmup_iterations is None:
            beta_based = math.ceil(2.0 / (1.0 - beta2))
            if beta_based / num_iterations > 0.45:
                warmup_iters = int(0.22 * num_iterations)
            else:
                warmup_iters = beta_based
        else:
            warmup_iters = num_warmup_iterations
        warmup_iters = max(warmup_iters, 1)
    else:
        warmup_iters = 0
    warmdown_start = int(warmdown_start_pct * num_iterations)

    def lr_at(step):
        dtype = jnp.result_type(float)
        step = jnp.asarray(step, dtype)
        lr = jnp.asarray(learning_rate, dtype)
        if use_warmup and warmup_iters > 0:
            lr = lr * jnp.minimum(1.0, step / warmup_iters)
        if warmdown_active:
            total_down = num_iterations - warmdown_start
            wd_iter = jnp.maximum(step + 1.0 - warmdown_start, 1.0)
            pct = jnp.minimum(wd_iter / (total_down + 1), 1.0)
            down_lr = jnp.maximum(
                learning_rate - pct * (learning_rate - warmdown_min_lr),
                warmdown_min_lr,
            )
            lr = jnp.where(step >= warmdown_start, down_lr, lr)
        return lr

    return lr_at


class Ranger21State(NamedTuple):
    count: chex.Array
    grad_ma: Any        # positive-step EMA
    neg_grad_ma: Any    # negative-step EMA
    variance_ma: Any
    slow_params: Any    # lookahead slow weights


def ranger21(
    learning_rate: float,
    *,
    num_iterations: int,
    weight_decay: float = 1e-4,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    use_warmup: bool = True,
    num_warmup_iterations: Optional[int] = None,
    warmdown_active: bool = True,
    warmdown_start_pct: float = 0.72,
    warmdown_min_lr: float = 3e-5,
    use_adaptive_gradient_clipping: bool = True,
    agc_clipping_value: float = 1e-2,
    agc_eps: float = 1e-3,
    using_gc: bool = True,
    normloss_active: bool = True,
    normloss_factor: float = 1e-4,
    use_softplus: bool = True,
    beta_softplus: float = 50.0,
    pnm_momentum_factor: float = 1.0,
    lookahead_active: bool = True,
    lookahead_mergetime: int = 5,
    lookahead_blending_alpha: float = 0.5,
    stable_decay_max_fraction: Optional[float] = None,
) -> optax.GradientTransformation:
    """Build the Ranger21 optax transformation.

    ``num_iterations`` = total train steps (steps_per_epoch * epochs), used
    by the warmup/warmdown schedule and required like the torch package's
    ``num_batches_per_epoch``/``num_epochs``.
    """
    beta1, beta2 = betas

    lr_at = ranger21_lr_schedule(
        learning_rate,
        num_iterations,
        use_warmup,
        warmdown_active,
        beta2=beta2,
        num_warmup_iterations=num_warmup_iterations,
        warmdown_start_pct=warmdown_start_pct,
        warmdown_min_lr=warmdown_min_lr,
    )

    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        # slow weights must be a distinct buffer (not an alias of params) so
        # both can be donated to the jitted train step
        slow = (
            jax.tree_util.tree_map(lambda p: jnp.array(p, copy=True), params)
            if lookahead_active
            else None
        )
        return Ranger21State(
            count=jnp.zeros([], jnp.int32),
            grad_ma=zeros,
            neg_grad_ma=jax.tree_util.tree_map(jnp.zeros_like, params),
            variance_ma=jax.tree_util.tree_map(jnp.zeros_like, params),
            slow_params=slow,
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("ranger21 requires params")
        step = state.count + 1
        stepf = step.astype(jnp.result_type(float))
        is_odd = (step % 2) == 1

        grads = updates
        if use_adaptive_gradient_clipping:
            grads = jax.tree_util.tree_map(
                lambda g, p: adaptive_gradient_clip(g, p, agc_clipping_value, agc_eps),
                grads, params,
            )
        if using_gc:
            grads = jax.tree_util.tree_map(centralize_gradient, grads)

        # PNM: on odd steps update grad_ma, on even steps update neg_grad_ma,
        # each with beta1^2 against its value from two steps ago.
        b1sq = beta1 * beta1

        def upd_ma(ma, g):
            return b1sq * ma + (1.0 - b1sq) * g

        new_grad_ma = jax.tree_util.tree_map(
            lambda ma, g: jnp.where(is_odd, upd_ma(ma, g), ma), state.grad_ma, grads
        )
        new_neg_ma = jax.tree_util.tree_map(
            lambda ma, g: jnp.where(is_odd, ma, upd_ma(ma, g)), state.neg_grad_ma, grads
        )
        new_var = jax.tree_util.tree_map(
            lambda v, g: beta2 * v + (1.0 - beta2) * g * g, state.variance_ma, grads
        )

        bias_c1 = 1.0 - beta1 ** stepf
        bias_c2 = 1.0 - beta2 ** stepf

        # stable weight decay: RMS of pooled bias-corrected second moment
        var_sum = sum(
            jnp.sum(v) for v in jax.tree_util.tree_leaves(new_var)
        )
        n_elems = sum(v.size for v in jax.tree_util.tree_leaves(new_var))
        variance_normalized = jnp.sqrt(var_sum / bias_c2 / n_elems)
        variance_normalized = jnp.maximum(variance_normalized, 1e-12)

        lr = lr_at(stepf)
        # Pinned-package quirk (lessw2020/Ranger21@1a96777 step(), pnm block):
        # the PNM noise normalizer uses *beta2*, not the pnm momentum factor —
        # sqrt((1+0.999)^2 + 0.999^2) ~ 2.2347 instead of sqrt(5). The factor
        # still parameterizes the numerator. Replicated for step-exactness.
        noise_norm = math.sqrt((1.0 + beta2) ** 2 + beta2**2)

        decay_fraction = weight_decay * lr / variance_normalized
        if stable_decay_max_fraction is not None:
            decay_fraction = jnp.minimum(decay_fraction, stable_decay_max_fraction)

        def param_update(p, g_ma, n_ma, v):
            p32 = p.astype(jnp.promote_types(p.dtype, jnp.float32))
            new_p = p32
            if weight_decay > 0.0:
                new_p = new_p * (1.0 - decay_fraction)
            if normloss_active:
                # correction = 2*factor*(1 - 1/(unit_norm(p)+eps)), applied as
                # p *= (1 - lr*correction) — exact form of the pinned package.
                unorm = _unit_norm(new_p)
                correction = 2.0 * normloss_factor * (1.0 - 1.0 / (unorm + eps))
                new_p = new_p * (1.0 - lr * correction)
            # current/previous EMA depending on parity
            m_cur = jnp.where(is_odd, g_ma, n_ma)
            m_prev = jnp.where(is_odd, n_ma, g_ma)
            pn_momentum = (
                (1.0 + pnm_momentum_factor) * m_cur - pnm_momentum_factor * m_prev
            ) / noise_norm
            denom = jnp.sqrt(v / bias_c2) + eps
            if use_softplus:
                denom = jax.nn.softplus(beta_softplus * denom) / beta_softplus
            step_size = lr / bias_c1
            new_p = new_p - step_size * pn_momentum / denom
            return new_p

        new_params = jax.tree_util.tree_map(
            param_update, params, new_grad_ma, new_neg_ma, new_var
        )

        if lookahead_active:
            sync = (step % lookahead_mergetime) == 0
            merged = jax.tree_util.tree_map(
                lambda s, f: s + lookahead_blending_alpha * (f - s),
                state.slow_params, new_params,
            )
            new_slow = jax.tree_util.tree_map(
                lambda s, m: jnp.where(sync, m, s), state.slow_params, merged
            )
            new_params = jax.tree_util.tree_map(
                lambda f, m: jnp.where(sync, m, f), new_params, merged
            )
        else:
            new_slow = None

        deltas = jax.tree_util.tree_map(
            lambda np_, p: (np_ - p.astype(np_.dtype)).astype(p.dtype),
            new_params, params,
        )
        return deltas, Ranger21State(
            count=step,
            grad_ma=new_grad_ma,
            neg_grad_ma=new_neg_ma,
            variance_ma=new_var,
            slow_params=new_slow,
        )

    return optax.GradientTransformation(init_fn, update_fn)
