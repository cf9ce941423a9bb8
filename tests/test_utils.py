"""Utils tests: torch checkpoint conversion (against a real torch module
tree mirroring the reference layout), DictLogger, run naming, profiling,
lazy datasets."""
import json
import subprocess
import sys
from collections import OrderedDict
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from torch import nn

from intrepppid_tpu.utils import DictLogger, generate_passphrase, generate_run_name
from intrepppid_tpu.utils.profiling import StepTimer
from intrepppid_tpu.utils.torch_convert import torch_state_dict_to_params

FIXTURES = Path(__file__).parent / "fixtures"


def build_reference_like_module(E=16, V=30, use_projection=True, num_layers=2):
    """A torch module tree reproducing the reference's state_dict key
    layout (incl. WeightDrop's weight->weight_raw renames)."""

    class WD(nn.Module):
        def __init__(self, module, names):
            super().__init__()
            self.module = module
            for name in names:
                w = getattr(self.module, name)
                del self.module._parameters[name]
                self.module.register_parameter(name + "_raw", nn.Parameter(w.data))

    class AWD(nn.Module):
        def __init__(self):
            super().__init__()
            self.rnn = nn.LSTM(
                E, E, num_layers, bidirectional=True, batch_first=True
            )
            self.rnn_dp = WD(self.rnn, ["weight_hh_l0"])
            self.fc = nn.Linear(E, E)

    class Enc(nn.Module):
        def __init__(self):
            super().__init__()
            self.embedder = nn.Embedding(V, E, padding_idx=0)
            self.encoder = AWD()
            d = (2 * E - E) // 3
            self.projection = nn.Module()
            self.projection.model = nn.Sequential(
                nn.Linear(E, E + d), nn.ReLU(),
                nn.Linear(E + d, E + 2 * d), nn.ReLU(),
                nn.Linear(E + 2 * d, 2 * E),
            )

    class Head(nn.Module):
        def __init__(self):
            super().__init__()
            self.classify = nn.Sequential(
                OrderedDict(
                    [
                        ("nl0", nn.Mish()),
                        ("fc1", WD(nn.Linear(E, E // 2), ["weight"])),
                        ("nl1", nn.Mish()),
                        ("do1", nn.Dropout(0.3)),
                        ("nl2", nn.Mish()),
                        ("do2", nn.Dropout(0.3)),
                        ("fc2", WD(nn.Linear(E // 2, 1), ["weight"])),
                    ]
                )
            )

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Enc()
            self.head = Head()
            if use_projection:
                self.triplet_projection = nn.Sequential(nn.Mish(), nn.Linear(E, E))

    net = Net()
    # WeightDrop nests the wrapped module under <name>.module, but the
    # LSTM itself is registered at encoder.encoder.rnn — reproduce that
    # exact key surface via a rename pass like Lightning would persist it.
    sd = net.state_dict()
    fixed = {}
    for k, v in sd.items():
        k = k.replace("encoder.encoder.rnn_dp.module.", "encoder.encoder.rnn.")
        k = k.replace("head.classify.fc1.module.", "head.classify.fc1.module.")
        fixed[k] = v
    return net, fixed


class TestTorchConvert:
    def test_roundtrip_forward_parity(self, rng):
        """Converted reference checkpoint -> identical eval forward."""
        E, V = 16, 30
        torch.manual_seed(0)
        net_t, sd = build_reference_like_module(E, V)
        params = torch_state_dict_to_params(sd, rnn_num_layers=2)

        # shapes line up with our init tree
        from intrepppid_tpu.models import TripletE2EConfig, EncoderConfig, init_triplet_e2e

        cfg = TripletE2EConfig(
            encoder=EncoderConfig(vocab_size=V, embedding_size=E),
            use_projection=True,
        )
        ref = init_triplet_e2e(jax.random.PRNGKey(0), cfg)
        for a, b in zip(
            jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(params)
        ):
            assert np.shape(a) == np.shape(b)

        # eval forward parity against torch on the converted weights
        ids = rng.integers(1, V, size=(3, 12)).astype(np.int32)
        from intrepppid_tpu.models.triplet import forward

        ours = np.asarray(
            forward(params, cfg, jnp.asarray(ids), jnp.asarray(ids), train=False)
        )
        with torch.no_grad():
            emb = net_t.encoder.embedder(torch.tensor(ids.astype(np.int64)))
            rnn = net_t.encoder.encoder.rnn
            # materialise the raw (undropped) weight like eval-mode WeightDrop
            rnn.weight_hh_l0 = nn.Parameter(
                sd["encoder.encoder.rnn.weight_hh_l0_raw"]
            )
            _, (hn, _) = rnn(emb)
            z = net_t.encoder.encoder.fc(hn[-1])
            x = z  # both inputs identical -> mean is z
            mish = nn.Mish()
            fc1w = sd["head.classify.fc1.module.weight_raw"]
            fc1b = sd["head.classify.fc1.module.bias"]
            fc2w = sd["head.classify.fc2.module.weight_raw"]
            fc2b = sd["head.classify.fc2.module.bias"]
            h = mish(mish(torch.nn.functional.linear(mish(x), fc1w, fc1b)))
            logits = torch.nn.functional.linear(h, fc2w, fc2b)
        np.testing.assert_allclose(ours, logits.numpy(), atol=3e-5)

    def test_without_projection_keys(self):
        torch.manual_seed(1)
        _, sd = build_reference_like_module(use_projection=False)
        params = torch_state_dict_to_params(sd)
        assert "triplet_projection" not in params


class TestDictLogger:
    def test_accumulates_and_saves(self, tmp_path):
        log = DictLogger()
        log.log_metrics({"train_loss": 1.0}, step=1)
        log.log_metrics({"train_loss": 0.5, "val_loss": 0.7}, step=2)
        assert len(log.metrics["train_loss"]) == 2
        log.save_json(tmp_path / "m.json")
        data = json.loads((tmp_path / "m.json").read_text())
        assert data["val_loss"][0]["value"] == 0.7


class TestRunName:
    def test_format(self):
        name = generate_run_name()
        parts = name.split("-")
        assert len(parts) == 4  # date, time already joined by dots
        date = parts[0]
        assert "." in date

    def test_passphrase_words(self):
        p = generate_passphrase(3, "_")
        assert len(p.split("_")) == 3


class TestStepTimer:
    def test_counts(self):
        t = StepTimer()
        for _ in range(3):
            t.start()
            t.stop(n_items=10)
        assert t.steps == 3
        assert t.total_items == 30
        assert t.items_per_s > 0


class TestLazyDatasets:
    @pytest.fixture(scope="class")
    def fixtures(self):
        if not (FIXTURES / "tiny.h5").exists():
            subprocess.run(
                [sys.executable, str(FIXTURES / "make_fixtures.py")], check=True
            )
        return FIXTURES

    def test_lazy_matches_eager_val(self, fixtures):
        from intrepppid_tpu.data.ppi_oma import IntrepppidDataset
        from intrepppid_tpu.data.ppi_oma_lazy import IntrepppidDataset2

        eager = IntrepppidDataset(
            fixtures / "tiny.h5", 3, "val", fixtures / "tiny_spm.model",
            trunc_len=48, negative_omid=False, seed=5,
        )
        lazy = IntrepppidDataset2(
            fixtures / "tiny.h5", 3, "val", fixtures / "tiny_spm.model",
            trunc_len=48, negative_omid=False, seed=5,
        )
        assert len(eager) == len(lazy)
        # deterministic (val) p1/p2 tokens identical; anchor may differ only
        # through the member-draw RNG which both seed identically
        e = eager[0]
        l = lazy[0]
        np.testing.assert_array_equal(e[0], l[0])
        np.testing.assert_array_equal(e[1], l[1])
        lazy.close()

    def test_lazy_datamodule_batches(self, fixtures):
        from intrepppid_tpu.data.ppi_oma_lazy import IntrepppidDataModule2

        dm = IntrepppidDataModule2(
            batch_size=8, dataset_path=fixtures / "tiny.h5", c_type=3,
            trunc_len=48, workers=0, vocab_size=38,
            model_file=fixtures / "tiny_spm.model", seed=3, sos=False, eos=False,
            negative_omid=True,
        )
        dm.setup()
        b = next(iter(dm.train_batches()))
        assert set(b) == {"p1", "p2", "anchor", "positive", "negative", "label"}
        assert b["p1"].shape == (8, 48)


class TestCompilationCache:
    def test_enable_sets_config(self, tmp_path, monkeypatch):
        from intrepppid_tpu.utils.jax_cache import enable_compilation_cache

        monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
        monkeypatch.delenv("INTREPPPID_TPU_NO_COMPILE_CACHE", raising=False)
        target = tmp_path / "jaxcache"
        got = enable_compilation_cache(str(target))
        assert got == str(target)
        assert target.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(target)

    def test_env_optout(self, monkeypatch):
        from intrepppid_tpu.utils.jax_cache import enable_compilation_cache

        monkeypatch.setenv("INTREPPPID_TPU_NO_COMPILE_CACHE", "1")
        assert enable_compilation_cache() is None

    def test_env_dir_wins(self, monkeypatch, tmp_path):
        from intrepppid_tpu.utils.jax_cache import enable_compilation_cache

        monkeypatch.delenv("INTREPPPID_TPU_NO_COMPILE_CACHE", raising=False)
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path))
        # jax already read the env at startup; the helper must not override
        assert enable_compilation_cache(str(tmp_path / "other")) == str(tmp_path)
