"""Model-level golden parity vs torch oracles built from the reference's
documented semantics (SURVEY.md §2 rows 5-7), plus train-mode smoke tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from intrepppid_tpu.models import (
    EncoderConfig,
    TripletE2EConfig,
    apply_encoder,
    apply_mlp_head,
    forward,
    init_encoder,
    init_mlp_head,
    init_triplet_e2e,
    step,
)
from intrepppid_tpu.models.factory import intrepppid_network


def torch_encoder_oracle(params, cfg: EncoderConfig, ids: np.ndarray) -> np.ndarray:
    """Eval-mode reference encoder semantics in torch, fed with our params:
    truncate to longest non-pad -> embedding lookup -> bi-LSTM -> reduce hn
    -> fc (`intrepppid/encoders/awd_lstm.py:51-74,147-155`)."""
    E = cfg.embedding_size
    ids_t = torch.tensor(np.asarray(ids))
    max_len = int(torch.max(torch.sum(ids_t != 0, axis=1)))
    ids_t = ids_t[:, :max_len]

    emb = torch.nn.Embedding(cfg.vocab_size, E, padding_idx=0)
    with torch.no_grad():
        emb.weight.copy_(torch.tensor(np.asarray(params["embedding"])))

    lstm = torch.nn.LSTM(E, E, cfg.rnn_num_layers, bidirectional=True, batch_first=True)
    with torch.no_grad():
        for layer, lp in enumerate(params["lstm"]):
            for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
                for ours, theirs in (
                    ("w_ih", "weight_ih"),
                    ("w_hh", "weight_hh"),
                    ("b_ih", "bias_ih"),
                    ("b_hh", "bias_hh"),
                ):
                    getattr(lstm, f"{theirs}_l{layer}{suffix}").copy_(
                        torch.tensor(np.asarray(lp[direction][ours]))
                    )

    fc = torch.nn.Linear(E, E)
    with torch.no_grad():
        fc.weight.copy_(torch.tensor(np.asarray(params["fc"]["w"])))
        fc.bias.copy_(torch.tensor(np.asarray(params["fc"]["b"])))

    with torch.no_grad():
        x = emb(ids_t)
        _, (hn, _) = lstm(x)
        if cfg.bi_reduce == "max":
            z = torch.max(hn[-2:], dim=0).values
        elif cfg.bi_reduce == "mean":
            z = torch.mean(hn[-2:], dim=0)
        else:
            z = hn[-1]
        return fc(z).numpy()


def _random_ids(rng, B, T, vocab):
    ids = rng.integers(1, vocab, size=(B, T))
    lens = rng.integers(3, T + 1, size=B)
    for i, l in enumerate(lens):
        ids[i, l:] = 0
    return ids.astype(np.int32)


@pytest.mark.parametrize("bi_reduce", ["max", "mean", "last"])
def test_encoder_eval_parity(rng, bi_reduce):
    cfg = EncoderConfig(vocab_size=30, embedding_size=8, bi_reduce=bi_reduce)
    params = init_encoder(jax.random.PRNGKey(0), cfg)
    ids = _random_ids(rng, 5, 19, 30)
    ours = np.asarray(
        apply_encoder(params, cfg, jnp.asarray(ids), jax.random.PRNGKey(1), train=False)
    )
    theirs = torch_encoder_oracle(params, cfg, ids)
    np.testing.assert_allclose(ours, theirs, atol=5e-5)


def test_encoder_grouped_equals_separate_calls(rng):
    """groups=5 stacked batch == five separate eval encoder calls."""
    cfg = EncoderConfig(vocab_size=30, embedding_size=8)
    params = init_encoder(jax.random.PRNGKey(0), cfg)
    groups = [_random_ids(rng, 3, 15, 30) for _ in range(5)]
    stacked = jnp.asarray(np.concatenate(groups, axis=0))
    z_stacked = np.asarray(
        apply_encoder(params, cfg, stacked, jax.random.PRNGKey(1), train=False, groups=5)
    )
    for g, ids in enumerate(groups):
        z_sep = np.asarray(
            apply_encoder(params, cfg, jnp.asarray(ids), jax.random.PRNGKey(1), train=False)
        )
        np.testing.assert_allclose(z_stacked[g * 3 : (g + 1) * 3], z_sep, atol=1e-5)


def test_concat_bi_reduce_rejected():
    with pytest.raises(ValueError, match="concat"):
        EncoderConfig(bi_reduce="concat")
    with pytest.raises(ValueError):
        EncoderConfig(bi_reduce="bogus")


def test_head_eval_parity(rng):
    E = 16
    params = init_mlp_head(jax.random.PRNGKey(0), E)
    z1 = rng.normal(size=(6, E)).astype(np.float32)
    z2 = rng.normal(size=(6, E)).astype(np.float32)
    ours = np.asarray(
        apply_mlp_head(
            params, jnp.asarray(z1), jnp.asarray(z2), jax.random.PRNGKey(1), 0.3, False
        )
    )

    fc1 = torch.nn.Linear(E, E // 2)
    fc2 = torch.nn.Linear(E // 2, 1)
    with torch.no_grad():
        fc1.weight.copy_(torch.tensor(np.asarray(params["fc1"]["w"])))
        fc1.bias.copy_(torch.tensor(np.asarray(params["fc1"]["b"])))
        fc2.weight.copy_(torch.tensor(np.asarray(params["fc2"]["w"])))
        fc2.bias.copy_(torch.tensor(np.asarray(params["fc2"]["b"])))
        mish = torch.nn.Mish()
        x = (torch.tensor(z1) + torch.tensor(z2)) / 2
        theirs = fc2(mish(mish(fc1(mish(x))))).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def _batch(rng, B=4, T=12, vocab=30):
    return {
        "p1": jnp.asarray(_random_ids(rng, B, T, vocab)),
        "p2": jnp.asarray(_random_ids(rng, B, T, vocab)),
        "anchor": jnp.asarray(_random_ids(rng, B, T, vocab)),
        "positive": jnp.asarray(_random_ids(rng, B, T, vocab)),
        "negative": jnp.asarray(_random_ids(rng, B, T, vocab)),
        "label": jnp.asarray((rng.random(B) > 0.5).astype(np.int32)),
    }


@pytest.mark.parametrize("use_projection", [False, True])
def test_quintuplet_step_train(rng, use_projection):
    cfg = TripletE2EConfig(
        encoder=EncoderConfig(vocab_size=30, embedding_size=8),
        use_projection=use_projection,
    )
    params = init_triplet_e2e(jax.random.PRNGKey(0), cfg)
    batch = _batch(rng)

    def loss_fn(p):
        loss, aux = step(p, cfg, batch, jax.random.PRNGKey(2), train=True)
        return loss, aux

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert {"classifier_loss", "triplet_loss", "auroc"} <= set(aux)
    # dead projection params must receive zero grads; live params nonzero
    enc_grads = grads["encoder"]
    proj_norm = sum(
        float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(enc_grads["projection"])
    )
    assert proj_norm == 0.0
    lstm_norm = sum(
        float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(enc_grads["lstm"])
    )
    assert lstm_norm > 0.0
    if use_projection:
        tp_norm = sum(
            float(jnp.abs(l).sum())
            for l in jax.tree_util.tree_leaves(grads["triplet_projection"])
        )
        assert tp_norm > 0.0


def test_beta_weighting_in_step(rng):
    cfg = TripletE2EConfig(
        encoder=EncoderConfig(vocab_size=30, embedding_size=8), beta_classifier=4.0
    )
    params = init_triplet_e2e(jax.random.PRNGKey(0), cfg)
    loss, aux = step(params, cfg, _batch(rng), jax.random.PRNGKey(1), train=False)
    expected = 0.75 * float(aux["classifier_loss"]) + 0.25 * float(aux["triplet_loss"])
    assert abs(float(loss) - expected) < 1e-6


def test_param_count_matches_torch_reference():
    """Param-count parity incl. the dead Projection (Appendix A #2)."""
    E, V = 64, 250
    net = intrepppid_network(steps_per_epoch=10, vocab_size=V, embedding_size=E)
    params = net.init(jax.random.PRNGKey(0))

    emb = torch.nn.Embedding(V, E, padding_idx=0)
    lstm = torch.nn.LSTM(E, E, 2, bidirectional=True, batch_first=True)
    fc = torch.nn.Linear(E, E)
    # dead Projection: 3 layers E -> 2E, diff = E // 3
    d = (2 * E - E) // 3
    proj = torch.nn.Sequential(
        torch.nn.Linear(E, E + d),
        torch.nn.Linear(E + d, E + 2 * d),
        torch.nn.Linear(E + 2 * d, 2 * E),
    )
    head = torch.nn.Sequential(torch.nn.Linear(E, E // 2), torch.nn.Linear(E // 2, 1))
    expected = sum(
        p.numel()
        for m in (emb, lstm, fc, proj, head)
        for p in m.parameters()
    )
    assert net.num_params(params) == expected


def test_forward_matches_step_logits_eval(rng):
    cfg = TripletE2EConfig(encoder=EncoderConfig(vocab_size=30, embedding_size=8))
    params = init_triplet_e2e(jax.random.PRNGKey(0), cfg)
    batch = _batch(rng)
    logits = forward(params, cfg, batch["p1"], batch["p2"], train=False)
    assert logits.shape == (4, 1)
    assert np.all(np.isfinite(np.asarray(logits)))
