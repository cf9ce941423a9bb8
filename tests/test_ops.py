"""Golden-value parity tests for core ops against torch (CPU) and sklearn."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from intrepppid_tpu.ops import (
    all_binary_metrics,
    bce_with_logits,
    binary_auroc,
    binary_average_precision,
    binary_mcc,
    binary_precision,
    binary_recall,
    combined_triplet_loss,
    dropconnect_weight,
    dropout,
    embedding_dropout,
    mish,
    triplet_margin_loss,
    variational_weight,
)


class TestMish:
    def test_matches_torch(self, rng):
        x = rng.normal(size=(64,)).astype(np.float32) * 5
        ours = np.asarray(mish(jnp.asarray(x)))
        theirs = torch.nn.Mish()(torch.tensor(x)).numpy()
        # f32 transcendental roundoff differs between XLA and torch kernels
        np.testing.assert_allclose(ours, theirs, rtol=5e-4, atol=1e-5)

    def test_large_values_stable(self):
        x = jnp.array([-100.0, 0.0, 100.0])
        out = mish(x)
        assert np.all(np.isfinite(out))
        np.testing.assert_allclose(out[2], 100.0, rtol=1e-5)


class TestLosses:
    def test_bce_with_logits(self, rng):
        logits = rng.normal(size=(32,)).astype(np.float32) * 3
        y = (rng.random(32) > 0.5).astype(np.float32)
        ours = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(y)))
        theirs = float(
            torch.nn.BCEWithLogitsLoss()(torch.tensor(logits), torch.tensor(y))
        )
        assert abs(ours - theirs) < 1e-6

    def test_triplet_margin(self, rng):
        a = rng.normal(size=(16, 64)).astype(np.float32)
        p = rng.normal(size=(16, 64)).astype(np.float32)
        n = rng.normal(size=(16, 64)).astype(np.float32)
        ours = float(
            triplet_margin_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n))
        )
        theirs = float(
            torch.nn.TripletMarginLoss(margin=1.0, p=2)(
                torch.tensor(a), torch.tensor(p), torch.tensor(n)
            )
        )
        assert abs(ours - theirs) < 1e-5

    def test_beta_weighting_matches_code_not_docstring(self):
        # code: loss = (1 - 1/beta)*classifier + (1/beta)*triplet
        out = float(combined_triplet_loss(jnp.float32(2.0), jnp.float32(4.0), 2.0))
        assert abs(out - (0.5 * 2.0 + 0.5 * 4.0)) < 1e-7
        out = float(combined_triplet_loss(jnp.float32(2.0), jnp.float32(4.0), 4.0))
        assert abs(out - (0.75 * 2.0 + 0.25 * 4.0)) < 1e-7


class TestMetrics:
    def _data(self, rng, n=80):
        logits = rng.normal(size=(n,)).astype(np.float32)
        y = (rng.random(n) > 0.4).astype(np.int32)
        return logits, y

    def test_auroc_vs_sklearn(self, rng):
        from sklearn.metrics import roc_auc_score

        logits, y = self._data(rng)
        ours = float(binary_auroc(jnp.asarray(logits), jnp.asarray(y)))
        theirs = roc_auc_score(y, logits)
        assert abs(ours - theirs) < 1e-6

    def test_auroc_with_ties(self):
        from sklearn.metrics import roc_auc_score

        logits = np.array([0.1, 0.1, 0.5, 0.5, 0.5, 0.9], np.float32)
        y = np.array([0, 1, 0, 1, 1, 1], np.int32)
        ours = float(binary_auroc(jnp.asarray(logits), jnp.asarray(y)))
        assert abs(ours - roc_auc_score(y, logits)) < 1e-6

    def test_ap_vs_sklearn(self, rng):
        from sklearn.metrics import average_precision_score

        logits, y = self._data(rng)
        ours = float(binary_average_precision(jnp.asarray(logits), jnp.asarray(y)))
        theirs = average_precision_score(y, logits)
        assert abs(ours - theirs) < 1e-6

    def test_ap_with_ties(self):
        from sklearn.metrics import average_precision_score

        logits = np.array([0.3, 0.3, 0.3, 0.8, 0.8, 0.1], np.float32)
        y = np.array([1, 0, 1, 1, 0, 0], np.int32)
        ours = float(binary_average_precision(jnp.asarray(logits), jnp.asarray(y)))
        assert abs(ours - average_precision_score(y, logits)) < 1e-6

    def test_thresholded_vs_sklearn(self, rng):
        from sklearn.metrics import (
            matthews_corrcoef,
            precision_score,
            recall_score,
        )

        logits, y = self._data(rng)
        pred = (logits > 0).astype(np.int32)
        assert abs(
            float(binary_mcc(jnp.asarray(logits), jnp.asarray(y)))
            - matthews_corrcoef(y, pred)
        ) < 1e-6
        assert abs(
            float(binary_precision(jnp.asarray(logits), jnp.asarray(y)))
            - precision_score(y, pred)
        ) < 1e-6
        assert abs(
            float(binary_recall(jnp.asarray(logits), jnp.asarray(y)))
            - recall_score(y, pred)
        ) < 1e-6

    def test_degenerate_batches(self):
        logits = jnp.array([0.5, -0.5])
        all_pos = jnp.array([1, 1])
        all_neg = jnp.array([0, 0])
        for y in (all_pos, all_neg):
            m = all_binary_metrics(logits, y)
            for v in m.values():
                assert np.isfinite(float(v))

    def test_weighted_matches_unweighted_with_ones(self, rng):
        logits, y = self._data(rng)
        w = np.ones_like(logits)
        m0 = all_binary_metrics(jnp.asarray(logits), jnp.asarray(y))
        m1 = all_binary_metrics(jnp.asarray(logits), jnp.asarray(y), jnp.asarray(w))
        for k in m0:
            assert abs(float(m0[k]) - float(m1[k])) < 1e-6, k

    def test_zero_weight_rows_are_masked(self, rng):
        """Padded rows (weight 0) must not affect any metric — multi-device
        padding correctness."""
        logits, y = self._data(rng, n=37)
        pad_logits = np.concatenate([logits, [5.0, -3.0, 0.1]]).astype(np.float32)
        pad_y = np.concatenate([y, [1, 0, 1]]).astype(np.int32)
        w = np.concatenate([np.ones(37), np.zeros(3)]).astype(np.float32)
        m0 = all_binary_metrics(jnp.asarray(logits), jnp.asarray(y))
        m1 = all_binary_metrics(
            jnp.asarray(pad_logits), jnp.asarray(pad_y), jnp.asarray(w)
        )
        for k in m0:
            assert abs(float(m0[k]) - float(m1[k])) < 1e-6, k

    def test_weighted_auroc_ap_vs_sklearn(self, rng):
        from sklearn.metrics import average_precision_score, roc_auc_score

        logits, y = self._data(rng)
        w = rng.random(len(y)).astype(np.float32) + 0.1
        ours = float(binary_auroc(jnp.asarray(logits), jnp.asarray(y), jnp.asarray(w)))
        theirs = roc_auc_score(y, logits, sample_weight=w)
        assert abs(ours - theirs) < 1e-6
        ours = float(
            binary_average_precision(jnp.asarray(logits), jnp.asarray(y), jnp.asarray(w))
        )
        theirs = average_precision_score(y, logits, sample_weight=w)
        assert abs(ours - theirs) < 1e-6

    def test_metrics_jittable(self, rng):
        logits, y = self._data(rng)
        f = jax.jit(all_binary_metrics)
        m = f(jnp.asarray(logits), jnp.asarray(y))
        assert set(m) == {"auroc", "ap", "mcc", "precision", "rec"}


class TestDropout:
    def test_dropout_scaling_and_rate(self):
        key = jax.random.PRNGKey(0)
        x = jnp.ones((1000, 100))
        out = dropout(key, x, 0.3, train=True)
        kept = np.asarray(out) > 0
        assert abs(kept.mean() - 0.7) < 0.02
        np.testing.assert_allclose(np.asarray(out)[kept], 1 / 0.7, rtol=1e-5)

    def test_dropout_eval_identity(self):
        key = jax.random.PRNGKey(0)
        x = jnp.ones((10, 10))
        assert np.all(np.asarray(dropout(key, x, 0.5, train=False)) == 1.0)

    def test_dropconnect_eval_identity(self):
        # Reference DropConnect is train-gated (`weightdrop.py:100-102`).
        key = jax.random.PRNGKey(0)
        w = jnp.ones((8, 8))
        assert np.all(np.asarray(dropconnect_weight(key, w, 0.5, train=False)) == 1.0)

    def test_variational_rowwise_always_active(self):
        # Reference variational drop has hardcoded training=True (Appendix A #4).
        key = jax.random.PRNGKey(1)
        w = jnp.ones((256, 64))
        out = np.asarray(variational_weight(key, w, 0.5))
        # each row entirely kept (scaled) or entirely dropped
        row_nonzero = (out != 0).mean(axis=1)
        assert set(np.unique(row_nonzero)).issubset({0.0, 1.0})
        assert 0.3 < (row_nonzero == 1.0).mean() < 0.7

    def test_embedding_dropout_drops_token_types(self):
        key = jax.random.PRNGKey(2)
        vocab, emb = 50, 8
        table = jnp.asarray(np.random.default_rng(0).normal(size=(vocab, emb)), jnp.float32)
        ids = jnp.tile(jnp.arange(vocab), (4, 1))  # every token in every row
        out = np.asarray(embedding_dropout(key, table, ids, 0.5, train=True))
        # same token dropped identically across batch rows
        dropped = np.all(out == 0, axis=-1)
        assert np.all(dropped == dropped[0:1, :])
        # kept tokens scaled by 1/(1-p)
        kept_tok = int(np.nonzero(~dropped[0])[0][1])
        if kept_tok != 0:
            np.testing.assert_allclose(
                out[0, kept_tok], np.asarray(table)[kept_tok] * 2.0, rtol=1e-5
            )

    def test_embedding_dropout_eval_matches_torch_embedding(self, rng):
        table = rng.normal(size=(20, 8)).astype(np.float32)
        table[0] = 0.0
        ids = rng.integers(0, 20, size=(4, 12))
        ours = np.asarray(
            embedding_dropout(
                jax.random.PRNGKey(0), jnp.asarray(table), jnp.asarray(ids), 0.3, train=False
            )
        )
        theirs = F.embedding(torch.tensor(ids), torch.tensor(table), padding_idx=0).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-7)
