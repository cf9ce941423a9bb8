"""Pallas fused recurrence vs the lax.scan reference path (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intrepppid_tpu.ops.lstm import bilstm, init_lstm_params
from intrepppid_tpu.ops.lstm_pallas import fused_lstm_recurrence


def _xg_from_layer(layer, x, compute_dtype=jnp.float32):
    """Replicate ops/lstm.py's hoisted input projection + time reversal."""
    w_ih = jnp.stack([layer["fwd"]["w_ih"], layer["bwd"]["w_ih"]]).astype(compute_dtype)
    bias = jnp.stack(
        [
            layer["fwd"]["b_ih"] + layer["fwd"]["b_hh"],
            layer["bwd"]["b_ih"] + layer["bwd"]["b_hh"],
        ]
    ).astype(jnp.float32)
    xg = jnp.einsum("bte,dge->dbtg", x.astype(compute_dtype), w_ih,
                    preferred_element_type=jnp.float32) + bias[:, None, None, :]
    xg = jnp.stack([xg[0], xg[1, :, ::-1, :]], axis=0)
    return jnp.transpose(xg, (2, 0, 1, 3))  # (T, 2, B, 4H)


def _w_stacked(layer, G=1, compute_dtype=jnp.float32):
    w = jnp.stack([layer["fwd"]["w_hh"], layer["bwd"]["w_hh"]])  # (2,4H,H)
    wt = jnp.swapaxes(w, -1, -2)  # (2,H,4H)
    return jnp.broadcast_to(wt[:, None], (2, G) + wt.shape[1:]).astype(compute_dtype)


def _valid(T, B, max_len):
    steps = jnp.arange(T)
    ml = jnp.broadcast_to(jnp.asarray(max_len, jnp.int32), (B,))
    return jnp.stack(
        [steps[:, None] < ml[None, :], (T - 1 - steps)[:, None] < ml[None, :]], axis=1
    )


@pytest.mark.parametrize("max_len", [None, 11])
def test_fused_matches_scan_single_layer(rng, max_len):
    B, T, H = 4, 16, 8
    layer = init_lstm_params(jax.random.PRNGKey(0), H, H, 1)[0]
    x = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    ml = max_len if max_len is not None else T
    _, hn_ref, cn_ref = bilstm([layer], x, ml)

    xg = _xg_from_layer(layer, x)
    valid = _valid(T, B, ml)
    hs, hn, cn = fused_lstm_recurrence(xg, valid, _w_stacked(layer), 1, jnp.float32)
    np.testing.assert_allclose(np.asarray(hn), np.asarray(hn_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cn), np.asarray(cn_ref), atol=1e-5)


def test_fused_hs_matches_scan_outputs(rng):
    B, T, H = 3, 12, 8
    layer = init_lstm_params(jax.random.PRNGKey(1), H, H, 1)[0]
    x = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    y_ref, _, _ = bilstm([layer], x, T)
    xg = _xg_from_layer(layer, x)
    hs, _, _ = fused_lstm_recurrence(xg, _valid(T, B, T), _w_stacked(layer), 1, jnp.float32)
    # hs: (T,2,B,H); fwd output at t = hs[t,0]; bwd output at pos t = hs[T-1-t,1]
    y_fwd = jnp.transpose(hs[:, 0], (1, 0, 2))
    y_bwd = jnp.transpose(hs[:, 1], (1, 0, 2))[:, ::-1, :]
    y = jnp.concatenate([y_fwd, y_bwd], axis=-1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)


def test_fused_grouped_weights(rng):
    B, T, H, G = 6, 10, 8, 2
    layer = init_lstm_params(jax.random.PRNGKey(2), H, H, 1)[0]
    wa = layer["fwd"]["w_hh"] * 1.2
    wb = layer["fwd"]["w_hh"] * 0.8
    la = [dict(fwd=dict(layer["fwd"], w_hh=wa), bwd=layer["bwd"])]
    lb = [dict(fwd=dict(layer["fwd"], w_hh=wb), bwd=layer["bwd"])]
    xa = jnp.asarray(rng.normal(size=(3, T, H)).astype(np.float32))
    xb = jnp.asarray(rng.normal(size=(3, T, H)).astype(np.float32))
    _, hn_a, _ = bilstm(la, xa, T)
    _, hn_b, _ = bilstm(lb, xb, T)

    x = jnp.concatenate([xa, xb], axis=0)
    xg = _xg_from_layer(layer, x)
    w_g = jnp.stack(
        [
            jnp.stack([jnp.swapaxes(wa, 0, 1), jnp.swapaxes(wb, 0, 1)]),
            jnp.broadcast_to(
                jnp.swapaxes(layer["bwd"]["w_hh"], 0, 1)[None], (2, H, 4 * H)
            ),
        ]
    )  # (2, G, H, 4H)
    _, hn, _ = fused_lstm_recurrence(xg, _valid(T, B, T), w_g, G, jnp.float32)
    np.testing.assert_allclose(np.asarray(hn[:, :3]), np.asarray(hn_a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hn[:, 3:]), np.asarray(hn_b), atol=1e-5)


def test_fused_gradients_match_scan(rng):
    """custom_vjp backward kernel == autodiff through the scan path."""
    B, T, H = 4, 12, 8
    layer = init_lstm_params(jax.random.PRNGKey(3), H, H, 1)[0]
    x = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    ml = 9

    def loss_scan(layer, x):
        y, hn, _ = bilstm([layer], x, ml)
        return jnp.sum(hn**2) + jnp.sum(y**2)

    g_ref = jax.grad(loss_scan, argnums=(0, 1))(layer, x)

    def loss_fused(layer, x):
        xg = _xg_from_layer(layer, x)
        w = _w_stacked(layer)
        hs, hn, _ = fused_lstm_recurrence(xg, _valid(T, B, ml), w, 1, jnp.float32)
        y_fwd = jnp.transpose(hs[:, 0], (1, 0, 2))
        y_bwd = jnp.transpose(hs[:, 1], (1, 0, 2))[:, ::-1, :]
        y = jnp.concatenate([y_fwd, y_bwd], axis=-1)
        return jnp.sum(hn**2) + jnp.sum(y**2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(layer, x)

    for direction in ("fwd", "bwd"):
        for name in ("w_ih", "w_hh", "b_ih", "b_hh"):
            np.testing.assert_allclose(
                np.asarray(g_fused[0][direction][name]),
                np.asarray(g_ref[0][direction][name]),
                atol=2e-4,
                err_msg=f"{direction}.{name}",
            )
    np.testing.assert_allclose(np.asarray(g_fused[1]), np.asarray(g_ref[1]), atol=2e-4)


def test_fused_grouped_gradients(rng):
    B, T, H, G = 4, 8, 8, 2
    layer = init_lstm_params(jax.random.PRNGKey(4), H, H, 1)[0]
    x = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    xg = _xg_from_layer(layer, x)
    w_g = _w_stacked(layer, G)

    def loss(w):
        hs, hn, _ = fused_lstm_recurrence(xg, _valid(T, B, T), w, G, jnp.float32)
        return jnp.sum(hn**2)

    g = jax.grad(loss)(w_g)
    assert np.all(np.isfinite(np.asarray(g)))
    # groups share inputs here per batch half; grads differ across groups
    assert float(jnp.abs(g).sum()) > 0


@pytest.mark.parametrize("B,G", [(6, 1), (10, 5)])
def test_untileable_batch_pads_onto_kernel_path(rng, B, G):
    """VERDICT r1 weak #4: a tail batch whose (grouped) rows aren't a
    multiple of 8 must be padded onto the Pallas path (padded rows masked
    out), not silently dropped to the scan path — and must still match the
    scan path numerically."""
    from intrepppid_tpu.ops.lstm import _bilstm_pallas
    from intrepppid_tpu.ops.lstm_pallas_layer import pick_tiles

    T, H = 8, 8
    layers = init_lstm_params(jax.random.PRNGKey(5), H, H, 2)
    if G > 1:
        layers = [
            {
                d: dict(lp[d], w_hh=jnp.broadcast_to(
                    lp[d]["w_hh"][None], (G,) + lp[d]["w_hh"].shape))
                for d in ("fwd", "bwd")
            }
            for lp in layers
        ]
    x = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    ml = jnp.full((B,), T - 2, jnp.int32)

    assert pick_tiles(B, T, H, G) is None  # precondition: untileable as-is
    out = _bilstm_pallas(layers, x, ml, jnp.float32)
    assert out is not None, "padding should have made the batch tileable"
    y, hn, cn = out

    plain = [
        {d: dict(lp[d], w_hh=lp[d]["w_hh"][0] if G > 1 else lp[d]["w_hh"])
         for d in ("fwd", "bwd")}
        for lp in layers
    ]
    y_ref, hn_ref, cn_ref = bilstm(plain, x, ml, backend="scan")
    assert y.shape == y_ref.shape and hn.shape == hn_ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hn), np.asarray(hn_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cn), np.asarray(cn_ref), atol=1e-5)


def test_untileable_batch_gradients(rng):
    """Grads must flow through the pad/unpad path and match the scan path."""
    from intrepppid_tpu.ops.lstm import _bilstm_pallas

    B, T, H = 6, 8, 8
    layers = init_lstm_params(jax.random.PRNGKey(6), H, H, 1)
    x = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    ml = jnp.full((B,), T - 1, jnp.int32)

    def loss_pallas(x):
        y, hn, _ = _bilstm_pallas(layers, x, ml, jnp.float32)
        return jnp.sum(hn ** 2) + jnp.sum(y ** 2)

    def loss_scan(x):
        y, hn, _ = bilstm(layers, x, ml, backend="scan")
        return jnp.sum(hn ** 2) + jnp.sum(y ** 2)

    g_p = jax.grad(loss_pallas)(x)
    g_s = jax.grad(loss_scan)(x)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_s), atol=2e-4)


def test_chunked_time_c2_matches_scan(rng, monkeypatch):
    """C=2 static-unroll path (two cell steps per grid iteration,
    materialized prev-state shifts in backward) must match the scan path
    in values and gradients."""
    import intrepppid_tpu.ops.lstm_pallas_layer as LPL
    from intrepppid_tpu.ops.lstm import _bilstm_pallas

    monkeypatch.setattr(
        LPL, "pick_tiles", lambda B, T, H, G, cd=jnp.float32, E=0, **kw: (B, 2, T)
    )
    B, T, H = 8, 12, 8
    layers = init_lstm_params(jax.random.PRNGKey(7), H, H, 2)
    x = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    ml = jnp.full((B,), T - 3, jnp.int32)

    def loss_pallas(layers, x):
        y, hn, cn = _bilstm_pallas(layers, x, ml, jnp.float32)
        return jnp.sum(y**2) + jnp.sum(hn**2) + jnp.sum(cn**2)

    def loss_scan(layers, x):
        y, hn, cn = bilstm(layers, x, ml, backend="scan")
        return jnp.sum(y**2) + jnp.sum(hn**2) + jnp.sum(cn**2)

    vp, gp = jax.value_and_grad(loss_pallas, argnums=(0, 1))(layers, x)
    vs, gs = jax.value_and_grad(loss_scan, argnums=(0, 1))(layers, x)
    np.testing.assert_allclose(float(vp), float(vs), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_lite_backward_mode_matches_scan(rng, monkeypatch):
    """Large-H 'lite' plan (fused=False: XLA gate recompute, dgates-stream
    backward, XLA input gradients) must match the scan path in values and
    gradients — this is the path H>=~192 configs take."""
    import intrepppid_tpu.ops.lstm_pallas_layer as LPL
    from intrepppid_tpu.ops.lstm import _bilstm_pallas

    monkeypatch.setattr(
        LPL, "pick_plan",
        lambda B, T, H, G, cd=jnp.float32, E=0, **kw: (B, 1, T, False),
    )
    from intrepppid_tpu.ops import lstm as L

    B, T, H = 8, 12, 8
    layers = init_lstm_params(jax.random.PRNGKey(9), H, H, 2)
    x = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    ml = jnp.full((B,), T - 3, jnp.int32)

    def loss_pallas(layers, x):
        y, hn, cn = _bilstm_pallas(layers, x, ml, jnp.float32)
        return jnp.sum(y**2) + jnp.sum(hn**2) + jnp.sum(cn**2)

    def loss_scan(layers, x):
        y, hn, cn = bilstm(layers, x, ml, backend="scan")
        return jnp.sum(y**2) + jnp.sum(hn**2) + jnp.sum(cn**2)

    vp, gp = jax.value_and_grad(loss_pallas, argnums=(0, 1))(layers, x)
    vs, gs = jax.value_and_grad(loss_scan, argnums=(0, 1))(layers, x)
    np.testing.assert_allclose(float(vp), float(vs), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_pick_plan_modes():
    """Flagship shapes (2H == 128) take the packed plan; other widths the
    v5 fused plan; H>=192 falls back to the lite plan (not the scan path);
    tiny-VMEM impossibilities return None."""
    from intrepppid_tpu.ops.lstm_pallas_layer import pick_plan

    plan = pick_plan(400, 1024, 64, 5, jnp.bfloat16, E=64)
    assert plan is not None and plan[3] == "packed"
    plan = pick_plan(200, 512, 256, 5, jnp.bfloat16, E=64)
    assert plan is not None and plan[3] is False
    plan = pick_plan(400, 1024, 128, 5, jnp.bfloat16, E=64)
    assert plan is not None and plan[3] is True
    # huge-E: the forward (always input-fused) can't fit either, so the
    # answer must be the graceful None/scan fallback, not a lite plan
    # that would die in the Mosaic VMEM allocator at compile time
    assert pick_plan(400, 1024, 192, 5, jnp.bfloat16, E=4096) is None


@pytest.mark.parametrize("fused", [True, False])
def test_bf16_kernel_tracks_f32_scan(rng, monkeypatch, fused):
    """bf16 is the production compute dtype: the Pallas path (fused and
    lite) at bf16 must track the f32 scan reference within bf16-scale
    tolerance, values and input gradient."""
    import intrepppid_tpu.ops.lstm_pallas_layer as LPL
    from intrepppid_tpu.ops.lstm import _bilstm_pallas

    monkeypatch.setattr(
        LPL, "pick_plan",
        lambda B, T, H, G, cd=jnp.float32, E=0, f=fused, **kw: (B, 1, T, f),
    )
    B, T, H = 8, 12, 8
    layers = init_lstm_params(jax.random.PRNGKey(11), H, H, 2)
    x = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    ml = jnp.full((B,), T - 2, jnp.int32)

    def loss_pallas(x):
        y, hn, _ = _bilstm_pallas(layers, x, ml, jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32) ** 2) + jnp.sum(hn**2)

    def loss_scan(x):
        y, hn, _ = bilstm(layers, x, ml, backend="scan")
        return jnp.sum(y**2) + jnp.sum(hn**2)

    vp, gp = jax.value_and_grad(loss_pallas)(x)
    vs, gs = jax.value_and_grad(loss_scan)(x)
    np.testing.assert_allclose(float(vp), float(vs), rtol=0.05)
    # gradient direction must agree; magnitudes within bf16-scale noise
    denom = np.maximum(np.abs(np.asarray(gs)), 1e-2)
    rel = np.abs(np.asarray(gp) - np.asarray(gs)) / denom
    assert float(np.median(rel)) < 0.05
    assert float(np.max(rel)) < 0.6


def test_packed_mode_matches_scan(rng, monkeypatch):
    """v6 direction-packed-lanes plan (fused == "packed"): values and
    gradients must match the scan path — this is the path the flagship
    H=64 config takes on TPU."""
    import intrepppid_tpu.ops.lstm_pallas_layer as LPL
    from intrepppid_tpu.ops.lstm import _bilstm_pallas

    monkeypatch.setattr(
        LPL, "pick_plan",
        lambda B, T, H, G, cd=jnp.float32, E=0, **kw: (B, 1, T, "packed"),
    )
    B, T, H = 8, 12, 8
    layers = init_lstm_params(jax.random.PRNGKey(21), H, H, 2)
    x = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    ml = jnp.full((B,), T - 3, jnp.int32)

    def loss_pallas(layers, x):
        y, hn, cn = _bilstm_pallas(layers, x, ml, jnp.float32)
        return jnp.sum(y**2) + jnp.sum(hn**2) + jnp.sum(cn**2)

    def loss_scan(layers, x):
        y, hn, cn = bilstm(layers, x, ml, backend="scan")
        return jnp.sum(y**2) + jnp.sum(hn**2) + jnp.sum(cn**2)

    vp, gp = jax.value_and_grad(loss_pallas, argnums=(0, 1))(layers, x)
    vs, gs = jax.value_and_grad(loss_scan, argnums=(0, 1))(layers, x)
    np.testing.assert_allclose(float(vp), float(vs), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_packed_grouped_gradients_match_v5(rng, monkeypatch):
    """Packed kernels with G > 1 weight-drop groups: every gradient must
    match the v5 fused kernels bitwise-tolerance (same f32 accumulation
    order inside both; the packed GEMMs only add exact-zero terms)."""
    import intrepppid_tpu.ops.lstm_pallas_layer as LPL
    from intrepppid_tpu.ops.lstm import _bilstm_pallas

    B, T, H, G = 8, 10, 8, 2
    layers = init_lstm_params(jax.random.PRNGKey(22), H, H, 1)
    layers = [
        {
            d: dict(lp[d], w_hh=jnp.stack(
                [lp[d]["w_hh"] * (1.0 + 0.1 * g) for g in range(G)]))
            for d in ("fwd", "bwd")
        }
        for lp in layers
    ]
    x = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    ml = jnp.full((B,), T - 2, jnp.int32)

    def run(mode):
        monkeypatch.setattr(
            LPL, "pick_plan",
            lambda B, T, H, G, cd=jnp.float32, E=0, m=mode, **kw: (B, 1, T, m),
        )

        def loss(layers, x):
            y, hn, cn = _bilstm_pallas(layers, x, ml, jnp.float32)
            return jnp.sum(y**2) + jnp.sum(hn**2) + jnp.sum(cn**2)

        return jax.value_and_grad(loss, argnums=(0, 1))(layers, x)

    vp, gp = run("packed")
    v5, g5 = run(True)
    np.testing.assert_allclose(float(vp), float(v5), rtol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(g5)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_packed_multipart_input(rng, monkeypatch):
    """Layer 1 consumes the (hs_f, hs_b) two-part input: the packed dx
    unpacking must route each part's forward/backward slices correctly."""
    import intrepppid_tpu.ops.lstm_pallas_layer as LPL
    from intrepppid_tpu.ops.lstm import _bilstm_pallas

    monkeypatch.setattr(
        LPL, "pick_plan",
        lambda B, T, H, G, cd=jnp.float32, E=0, **kw: (B, 1, T, "packed"),
    )
    B, T, H = 8, 8, 8
    # 3 layers: layers 1 and 2 both take two H-wide parts
    layers = init_lstm_params(jax.random.PRNGKey(23), H, H, 3)
    x = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    ml = jnp.full((B,), T - 1, jnp.int32)

    def loss_pallas(x):
        y, hn, _ = _bilstm_pallas(layers, x, ml, jnp.float32)
        return jnp.sum(y**2) + jnp.sum(hn**2)

    def loss_scan(x):
        y, hn, _ = bilstm(layers, x, ml, backend="scan")
        return jnp.sum(y**2) + jnp.sum(hn**2)

    vp, gp = jax.value_and_grad(loss_pallas)(x)
    vs, gs = jax.value_and_grad(loss_scan)(x)
    np.testing.assert_allclose(float(vp), float(vs), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gs), atol=2e-5)


def test_packed_bf16_tracks_f32_scan(rng, monkeypatch):
    """Packed kernels at the production bf16 compute dtype track the f32
    scan within bf16-scale tolerance (same bar as the v5 kernels)."""
    import intrepppid_tpu.ops.lstm_pallas_layer as LPL
    from intrepppid_tpu.ops.lstm import _bilstm_pallas

    monkeypatch.setattr(
        LPL, "pick_plan",
        lambda B, T, H, G, cd=jnp.float32, E=0, **kw: (B, 1, T, "packed"),
    )
    B, T, H = 8, 12, 8
    layers = init_lstm_params(jax.random.PRNGKey(24), H, H, 2)
    x = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    ml = jnp.full((B,), T - 2, jnp.int32)

    def loss_pallas(x):
        y, hn, _ = _bilstm_pallas(layers, x, ml, jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32) ** 2) + jnp.sum(hn**2)

    def loss_scan(x):
        y, hn, _ = bilstm(layers, x, ml, backend="scan")
        return jnp.sum(y**2) + jnp.sum(hn**2)

    vp, gp = jax.value_and_grad(loss_pallas)(x)
    vs, gs = jax.value_and_grad(loss_scan)(x)
    np.testing.assert_allclose(float(vp), float(vs), rtol=0.05)
    denom = np.maximum(np.abs(np.asarray(gs)), 1e-2)
    rel = np.abs(np.asarray(gp) - np.asarray(gs)) / denom
    assert float(np.median(rel)) < 0.05
    assert float(np.max(rel)) < 0.6


def test_packed_weight_roundtrip():
    """pack/unpack helpers are exact inverses on the diagonal blocks."""
    from intrepppid_tpu.ops import lstm_pallas_packed as P

    rng = np.random.default_rng(7)
    H, G, E = 8, 3, 12
    w = jnp.asarray(rng.normal(size=(2, G, H, 4 * H)).astype(np.float32))
    wih_t = jnp.asarray(rng.normal(size=(2, E, 4 * H)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(2, 4 * H)).astype(np.float32))

    wp = P.pack_whh(w)  # (G, 2H, 8H)
    assert wp.shape == (G, 2 * H, 8 * H)
    # unpack_blockdiag expects a leading tile axis; treat G as it
    back = P.unpack_blockdiag(wp, H)  # (2, G, H, 4H)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(w))

    wihp = P.pack_wih_t(wih_t)
    np.testing.assert_array_equal(
        np.asarray(P.unpack_blockdiag(wihp, H)), np.asarray(wih_t)
    )
    bp = P.pack_bias(bias)
    np.testing.assert_array_equal(
        np.asarray(P.unpack_dbias(bp, H)), np.asarray(bias)
    )


def test_stack_vjp_threads_unsummed_dy_streams(rng, monkeypatch):
    """2-layer packed stack: the stack VJP feeds layer 1's unsummed
    (dxf, dxb) pairs into layer 0's backward kernel as two dy streams
    (summed in-register). Every gradient — inputs AND both layers'
    weights — must match autodiff through the scan path."""
    import intrepppid_tpu.ops.lstm_pallas_layer as LPL
    from intrepppid_tpu.ops.lstm import _bilstm_pallas

    monkeypatch.setattr(
        LPL, "pick_plan",
        lambda B, T, H, G, cd=jnp.float32, E=0, **kw: (B, 1, T, "packed"),
    )
    B, T, H = 8, 10, 8
    layers = init_lstm_params(jax.random.PRNGKey(31), H, H, 2)
    x = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    ml = jnp.full((B,), T - 3, jnp.int32)

    def loss_pallas(layers, x):
        y, hn, cn = _bilstm_pallas(layers, x, ml, jnp.float32)
        return jnp.sum(y**2) + jnp.sum(hn**2) + jnp.sum(cn**2)

    def loss_scan(layers, x):
        y, hn, cn = bilstm(layers, x, ml, backend="scan")
        return jnp.sum(y**2) + jnp.sum(hn**2) + jnp.sum(cn**2)

    vp, gp = jax.value_and_grad(loss_pallas, argnums=(0, 1))(layers, x)
    vs, gs = jax.value_and_grad(loss_scan, argnums=(0, 1))(layers, x)
    np.testing.assert_allclose(float(vp), float(vs), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gs)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_pack_boundary_stack_matches_scan(rng, monkeypatch):
    """v7 pair-packed inter-layer boundary (``PACK_BOUNDARY`` forced on):
    inner layers emit one pair-packed ys stream; the upper layer consumes
    it packed, its backward emits pair-packed dx streams, and the lower
    backward sums them in-register. Values, every gradient, AND the
    no-grad eval forward must match the scan path — at both the C=1
    shift-in-kernel backward and the C=2 materialized-shift backward
    (which shifts the packed hp/cs once for both directions)."""
    import intrepppid_tpu.ops.lstm_pallas_layer as LPL
    from intrepppid_tpu.ops import lstm_pallas_packed as P
    from intrepppid_tpu.ops.lstm import _bilstm_pallas

    monkeypatch.setattr(P, "PACK_BOUNDARY", True)
    B, T, H = 8, 12, 8
    layers = init_lstm_params(jax.random.PRNGKey(33), H, H, 2)
    x = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    ml = jnp.full((B,), T - 3, jnp.int32)

    def loss_pallas(layers, x):
        y, hn, cn = _bilstm_pallas(layers, x, ml, jnp.float32)
        return jnp.sum(y**2) + jnp.sum(hn**2) + jnp.sum(cn**2)

    def loss_scan(layers, x):
        y, hn, cn = bilstm(layers, x, ml, backend="scan")
        return jnp.sum(y**2) + jnp.sum(hn**2) + jnp.sum(cn**2)

    vs, gs = jax.value_and_grad(loss_scan, argnums=(0, 1))(layers, x)
    y_s, hn_s, cn_s = bilstm(layers, x, ml, backend="scan")
    for C in (1, 2):
        monkeypatch.setattr(
            LPL, "pick_plan",
            lambda B, T, H, G, cd=jnp.float32, E=0, c=C, **kw:
                (B, c, T, "packed"),
        )
        vp, gp = jax.value_and_grad(loss_pallas, argnums=(0, 1))(layers, x)
        np.testing.assert_allclose(float(vp), float(vs), rtol=1e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gs)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-5
            )
        # no-grad eval path (_eval_packed_layer under the custom-vjp
        # primal) — the pack_y/x_packed boundary without residuals
        y_p, hn_p, cn_p = _bilstm_pallas(layers, x, ml, jnp.float32)
        np.testing.assert_allclose(
            np.asarray(y_p), np.asarray(y_s), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(hn_p), np.asarray(hn_s), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(cn_p), np.asarray(cn_s), atol=2e-5
        )


def test_packed_fwd_chunk_parity(rng):
    """The packed forward at C in {1, 2, 4} is exactly identical under
    ragged lengths (the production path chunks the forward harder than
    the backward — pick_fwd_chunk — so C-invariance is load-bearing)."""
    from intrepppid_tpu.ops import lstm_pallas_packed as P

    B, T, H, G, E = 8, 12, 8, 2, 8
    w_hh_t = jnp.asarray(rng.normal(size=(2, G, H, 4 * H)).astype(np.float32)) * 0.3
    wih_t = jnp.asarray(rng.normal(size=(2, E, 4 * H)).astype(np.float32)) * 0.3
    bias = jnp.asarray(rng.normal(size=(2, 4 * H)).astype(np.float32)) * 0.3
    wp, wihp, _, bp = P.pack_operands(w_hh_t, wih_t, bias, jnp.float32)
    x = jnp.asarray(rng.normal(size=(T, B, E)).astype(np.float32))
    lengths = jnp.asarray(
        rng.integers(1, T + 1, size=(B, 1)).astype(np.int32)
    )
    for with_states in (False, True):
        ref = None
        for c in (1, 2, 4):
            out = P._fwd_pallas_packed(
                (x,), lengths, wp, wihp, bp, Bt=B, C=c, G=G, H=H,
                compute_dtype=jnp.float32, with_states=with_states,
            )
            leaves = [np.asarray(v) for v in jax.tree_util.tree_leaves(out)]
            if ref is None:
                ref = leaves
            else:
                # bitwise on real TPU (tools/experiment_fwd_chunk.py);
                # interpret mode's CPU lowering reassociates FMAs across
                # the unrolled chunk, so near-exact here
                for a, b in zip(ref, leaves):
                    np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)


def test_packed_saved_gates_backward_matches_recompute(rng):
    """The saved-gates backward (forward streams its activated gates,
    backward skips the per-step recompute) is exactly the recompute
    backward in f32 — including a chunked forward (Cf=4) feeding the
    C=1 backward, which pins the C-independent (pos_f, Tp-1-pos_f) gate
    pairing. Measured a WASH at the flagship shape on v5e (the gate
    write/read HBM traffic cancels the dropped transcendentals —
    tools/experiment_saved_gates.py), so production keeps the recompute;
    this pins the capability against rot."""
    from intrepppid_tpu.ops import lstm_pallas_packed as P

    B, T, H, G, E = 8, 12, 8, 2, 8
    w_hh_t = jnp.asarray(rng.normal(size=(2, G, H, 4 * H)).astype(np.float32)) * 0.3
    wih_t = jnp.asarray(rng.normal(size=(2, E, 4 * H)).astype(np.float32)) * 0.3
    bias = jnp.asarray(rng.normal(size=(2, 4 * H)).astype(np.float32)) * 0.3
    wp, wihp, wihTp, bp = P.pack_operands(w_hh_t, wih_t, bias, jnp.float32)
    x = jnp.asarray(rng.normal(size=(T, B, E)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(1, T + 1, size=(B, 1)).astype(np.int32))
    dy_f = (jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32)),)
    dy_b = (jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32)),)
    dhn_p = jnp.asarray(rng.normal(size=(B, 2 * H)).astype(np.float32))
    dcn_p = jnp.zeros((B, 2 * H), jnp.float32)

    for Cf in (1, 4):
        hs_f, hs_b, cs_f, cs_b, gs, _, _ = P._fwd_pallas_packed(
            (x,), lengths, wp, wihp, bp, Bt=B, C=Cf, G=G, H=H,
            compute_dtype=jnp.float32, with_states=True, with_gates=True,
        )
        rc = P._bwd_pallas_packed(
            (x,), lengths, wp, wihp, wihTp, bp,
            hs_f, cs_f, hs_b, cs_b, dy_f, dy_b, dhn_p, dcn_p,
            Bt=B, C=1, G=G, H=H, compute_dtype=jnp.float32,
            shift_in_kernel=True,
        )
        sg = P._bwd_pallas_packed(
            (x,), lengths, wp, None, wihTp, None,
            hs_f, cs_f, hs_b, cs_b, dy_f, dy_b, dhn_p, dcn_p,
            Bt=B, C=1, G=G, H=H, compute_dtype=jnp.float32,
            shift_in_kernel=True, gs=gs,
        )
        for a, b in zip(jax.tree_util.tree_leaves(rc),
                        jax.tree_util.tree_leaves(sg)):
            # the saved f32 gates are the forward's exact values, so the
            # only delta vs recompute is FMA reassociation in interpret
            # mode's CPU lowering
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
            )


def test_packed_cs_stream_matches_separate(rng):
    """The packed cell-residual stream (one (Tp, B, 2H) cs whose row at
    fwd-dir time p pairs c_f@p with c_b@Tp-1-p) yields bitwise-identical
    sweeps vs the two half-width cs_f/cs_b streams, in both the C=1
    shift-in-kernel backward and the C>1 materialized-shift path (where
    ONE forward shift of the packed array serves both directions).
    Production default (`PACK_CS = True`): measured 1.18x on the
    standalone train forward, 1.017x on the composed stack fwd+bwd
    (tools/experiment_pack_cs.py, tools/experiment_pack_cs_stack.py)."""
    from intrepppid_tpu.ops import lstm_pallas_packed as P

    B, T, H, G, E = 8, 12, 8, 2, 8
    w_hh_t = jnp.asarray(rng.normal(size=(2, G, H, 4 * H)).astype(np.float32)) * 0.3
    wih_t = jnp.asarray(rng.normal(size=(2, E, 4 * H)).astype(np.float32)) * 0.3
    bias = jnp.asarray(rng.normal(size=(2, 4 * H)).astype(np.float32)) * 0.3
    wp, wihp, wihTp, bp = P.pack_operands(w_hh_t, wih_t, bias, jnp.float32)
    x = jnp.asarray(rng.normal(size=(T, B, E)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(1, T + 1, size=(B, 1)).astype(np.int32))
    dy_f = (jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32)),)
    dy_b = (jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32)),)
    dhn_p = jnp.asarray(rng.normal(size=(B, 2 * H)).astype(np.float32))
    dcn_p = jnp.zeros((B, 2 * H), jnp.float32)

    hs_f, hs_b, cs_f, cs_b, _, _ = P._fwd_pallas_packed(
        (x,), lengths, wp, wihp, bp, Bt=B, C=1, G=G, H=H,
        compute_dtype=jnp.float32, with_states=True,
    )
    hs_f2, hs_b2, cs_p, _, _ = P._fwd_pallas_packed(
        (x,), lengths, wp, wihp, bp, Bt=B, C=1, G=G, H=H,
        compute_dtype=jnp.float32, with_states=True, pack_cs=True,
    )
    np.testing.assert_array_equal(np.asarray(hs_f), np.asarray(hs_f2))
    np.testing.assert_array_equal(np.asarray(hs_b), np.asarray(hs_b2))
    np.testing.assert_array_equal(np.asarray(cs_p[:, :, :H]), np.asarray(cs_f))
    np.testing.assert_array_equal(
        np.asarray(cs_p[:, :, H:]), np.asarray(cs_b[::-1])
    )

    # C=1 shift-in-kernel backward
    a = P._bwd_pallas_packed(
        (x,), lengths, wp, wihp, wihTp, bp,
        hs_f, cs_f, hs_b, cs_b, dy_f, dy_b, dhn_p, dcn_p,
        Bt=B, C=1, G=G, H=H, compute_dtype=jnp.float32,
        shift_in_kernel=True,
    )
    b = P._bwd_pallas_packed(
        (x,), lengths, wp, wihp, wihTp, bp,
        hs_f, cs_p, hs_b, None, dy_f, dy_b, dhn_p, dcn_p,
        Bt=B, C=1, G=G, H=H, compute_dtype=jnp.float32,
        shift_in_kernel=True, pack_cs=True,
    )
    for ta, tb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(ta), np.asarray(tb))

    # C=4 materialized shifts: one forward shift of the packed array
    zero = jnp.zeros_like(hs_f[:1])
    hp_f = jnp.concatenate([zero, hs_f[:-1]], axis=0)
    hp_b = jnp.concatenate([hs_b[1:], zero], axis=0)
    cp_f = jnp.concatenate([zero, cs_f[:-1]], axis=0)
    cp_b = jnp.concatenate([cs_b[1:], zero], axis=0)
    cp_p = jnp.concatenate([jnp.zeros_like(cs_p[:1]), cs_p[:-1]], axis=0)
    a4 = P._bwd_pallas_packed(
        (x,), lengths, wp, wihp, wihTp, bp,
        hp_f, cp_f, hp_b, cp_b, dy_f, dy_b, dhn_p, dcn_p,
        Bt=B, C=4, G=G, H=H, compute_dtype=jnp.float32,
        shift_in_kernel=False,
    )
    b4 = P._bwd_pallas_packed(
        (x,), lengths, wp, wihp, wihTp, bp,
        hp_f, cp_p, hp_b, None, dy_f, dy_b, dhn_p, dcn_p,
        Bt=B, C=4, G=G, H=H, compute_dtype=jnp.float32,
        shift_in_kernel=False, pack_cs=True,
    )
    for ta, tb in zip(jax.tree_util.tree_leaves(a4),
                      jax.tree_util.tree_leaves(b4)):
        np.testing.assert_array_equal(np.asarray(ta), np.asarray(tb))
