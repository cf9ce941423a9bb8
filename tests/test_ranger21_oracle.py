"""Step-exact validation of optim/ranger21.py against the numpy oracle.

The oracle (tests/ranger21_oracle.py) is a hand-port of the pinned torch
package (lessw2020/Ranger21@1a96777, `/root/reference/requirements.txt:65`)
— VERDICT r1 item #3. Any component drift (AGC, GC, PNM parity, stable
decay, norm loss, softplus denom, lookahead, warmup/warmdown schedule)
shows up as a >1e-9 divergence within a few steps.

Runs under jax x64 so the comparison is float64-vs-float64; the optax
implementation promotes to the param dtype internally.
"""
import numpy as np
import pytest

from ranger21_oracle import Ranger21Oracle


def _shapes():
    # vector (whole-tensor unit norm), matrix (axis-1 norm), conv-like 4D
    # (axes 1-3), and a 3-D tensor (axis-1-only quirk).
    return [(7,), (5, 3), (2, 3, 4, 2), (3, 4, 2)]


def _make_params_and_grads(seed, n_steps):
    rng = np.random.default_rng(seed)
    params = [rng.normal(0, 0.5, s) for s in _shapes()]
    # mix of magnitudes so AGC clips some tensors on some steps and not others
    grads = [
        [rng.normal(0, mag, s) for s, mag in zip(_shapes(), (2.0, 1e-3, 0.5, 1e-2))]
        for _ in range(n_steps)
    ]
    return params, grads


@pytest.mark.parametrize("variant,n_epochs", [("ranger21", 3), ("ranger21_xx", 5)])
def test_update_by_update_identity(variant, n_epochs):
    import jax

    with jax.enable_x64(True):
        import jax.numpy as jnp
        import optax

        from intrepppid_tpu.optim import make_optimizer

        steps_per_epoch = 4
        n_steps = steps_per_epoch * n_epochs  # covers warmup, plateau, warmdown
        params_np, grads_np = _make_params_and_grads(42, n_steps)

        oracle = Ranger21Oracle(
            params_np,
            lr=1e-3,
            num_batches_per_epoch=steps_per_epoch,
            num_epochs=n_epochs,
            use_warmup=(variant == "ranger21_xx"),
            warmdown_active=(variant == "ranger21_xx"),
            weight_decay=1e-2,
            warmdown_start_pct=0.72,
        )

        opt = make_optimizer(variant, 1e-3, steps_per_epoch, n_epochs)
        params = [jnp.asarray(p, jnp.float64) for p in params_np]
        state = opt.init(params)

        for t, g_np in enumerate(grads_np):
            grads = [jnp.asarray(g, jnp.float64) for g in g_np]
            updates, state = opt.update(grads, state, params)
            params = optax.apply_updates(params, updates)
            oracle.step(g_np)
            for i, (ours, ref) in enumerate(zip(params, oracle.params)):
                np.testing.assert_allclose(
                    np.asarray(ours), ref, rtol=1e-9, atol=1e-12,
                    err_msg=f"{variant}: param {i} diverged at step {t + 1}",
                )


def test_warmup_and_warmdown_curve_pinned():
    """The lr schedule itself matches the package's warmup_dampening +
    get_warm_down on a grid, including the int() truncations and the
    (total-start+1) denominator."""
    import jax

    with jax.enable_x64(True):
        from intrepppid_tpu.optim.ranger21 import ranger21_lr_schedule

        total = 20
        oracle = Ranger21Oracle(
            [np.zeros(3)], lr=1e-3, num_batches_per_epoch=4, num_epochs=5,
        )
        lr_at = ranger21_lr_schedule(1e-3, total, True, True)
        for step in range(1, total + 1):
            want = oracle._get_warm_down(
                oracle._warmup_dampening(1e-3, step), step
            )
            np.testing.assert_allclose(float(lr_at(step)), want, rtol=1e-12)


def test_agc_actually_clips_in_trace():
    """Sanity: the AGC branch fires for the large-magnitude grads used in the
    identity test (otherwise the test wouldn't cover it)."""
    from intrepppid_tpu.optim.ranger21 import adaptive_gradient_clip

    rng = np.random.default_rng(0)
    p = rng.normal(0, 0.5, (7,))
    g = rng.normal(0, 2.0, (7,))
    clipped = np.asarray(adaptive_gradient_clip(g, p))
    assert np.linalg.norm(clipped) < np.linalg.norm(g)
