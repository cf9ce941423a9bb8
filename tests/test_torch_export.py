"""Export path: intrepppid_tpu params -> reference PyTorch .ckpt.

Validates the three contracts a reference user relies on when moving a
TPU-trained model back to the reference's CUDA pipeline
(`/root/reference/intrepppid/cli/infer.py:170-175`):

1. the exported state_dict STRICT-loads into a torch module tree that
   reproduces the reference layout key-for-key (including the reference's
   double registration of the LSTM under ``rnn`` and ``rnn_dp.module``,
   `encoders/awd_lstm.py:35-45`),
2. re-importing the export reproduces the original params exactly
   (lossless round trip), and
3. a torch model loaded from the export computes the SAME eval logits as
   the jax model that produced it.

Plus the ``export torch_ckpt`` CLI end-to-end from an orbax checkpoint.
"""
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from intrepppid_tpu.models import EncoderConfig, TripletE2EConfig, init_triplet_e2e
from intrepppid_tpu.models.triplet import forward
from intrepppid_tpu.utils.torch_convert import (
    load_torch_checkpoint,
    params_to_torch_state_dict,
    save_torch_checkpoint,
    torch_state_dict_to_params,
)

from test_utils import build_reference_like_module
from torch_reference import TorchTripletReplica

E, V = 16, 30


def _cfg(use_projection=True):
    return TripletE2EConfig(
        encoder=EncoderConfig(vocab_size=V, embedding_size=E),
        use_projection=use_projection,
    )


def _params(use_projection=True, seed=1):
    return init_triplet_e2e(jax.random.PRNGKey(seed), _cfg(use_projection))


class TestExportStateDict:
    @pytest.mark.parametrize("use_projection", [True, False])
    def test_strict_load_into_reference_module_tree(self, use_projection):
        """The reference's infer path is a strict load_state_dict — every
        key of the module tree must be present, no extras."""
        params = _params(use_projection)
        sd = params_to_torch_state_dict(params)
        net, _ = build_reference_like_module(E, V, use_projection=use_projection)
        net.load_state_dict(
            {k: torch.from_numpy(np.array(v, dtype=np.float32, copy=True)) for k, v in sd.items()},
            strict=True,
        )

    def test_rnn_registered_under_both_paths(self):
        """`rnn` and `rnn_dp.module` alias one LSTM in the reference; both
        prefixes must carry identical tensors (incl. the _raw rename)."""
        sd = params_to_torch_state_dict(_params())
        rnn_keys = [
            k.split("encoder.encoder.rnn.", 1)[1]
            for k in sd
            if k.startswith("encoder.encoder.rnn.")
        ]
        assert "weight_hh_l0_raw" in rnn_keys
        assert "weight_hh_l0" not in rnn_keys  # renamed, not duplicated
        assert "weight_hh_l1" in rnn_keys  # only layer-0 forward is dropped
        assert "weight_hh_l0_reverse" in rnn_keys
        for name in rnn_keys:
            np.testing.assert_array_equal(
                sd[f"encoder.encoder.rnn.{name}"],
                sd[f"encoder.encoder.rnn_dp.module.{name}"],
            )

    @pytest.mark.parametrize("use_projection", [True, False])
    def test_reimport_roundtrip_exact(self, use_projection):
        params = _params(use_projection)
        back = torch_state_dict_to_params(params_to_torch_state_dict(params))
        assert jax.tree_util.tree_structure(
            jax.tree_util.tree_map(np.asarray, params)
        ) == jax.tree_util.tree_structure(back)
        for a, b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)
        ):
            np.testing.assert_array_equal(np.asarray(a), b)

    def test_three_layer_strict_load_and_roundtrip(self):
        """The scaled config (rnn_num_layers=3) exports and re-imports."""
        cfg = TripletE2EConfig(
            encoder=EncoderConfig(vocab_size=V, embedding_size=E, rnn_num_layers=3)
        )
        params = init_triplet_e2e(jax.random.PRNGKey(2), cfg)
        sd = params_to_torch_state_dict(params)
        net, _ = build_reference_like_module(
            E, V, use_projection=False, num_layers=3
        )
        net.load_state_dict(
            {k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()},
            strict=True,
        )
        back = torch_state_dict_to_params(sd, rnn_num_layers=3)
        for a, b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)
        ):
            np.testing.assert_array_equal(np.asarray(a), b)

    def test_missing_dead_projection_rejected(self):
        cfg = TripletE2EConfig(
            encoder=EncoderConfig(
                vocab_size=V, embedding_size=E, include_dead_projection=False
            )
        )
        params = init_triplet_e2e(jax.random.PRNGKey(0), cfg)
        with pytest.raises(ValueError, match="include_dead_projection"):
            params_to_torch_state_dict(params)


class TestExportFunctionalParity:
    def test_torch_model_from_export_matches_jax_eval_logits(self, rng):
        """Load the export into the torch replica and compare eval logits
        against the jax model that produced the weights."""
        params = _params(use_projection=True)
        sd = params_to_torch_state_dict(params)

        replica = TorchTripletReplica(
            embedding_size=E, vocab_size=V, use_projection=True
        )
        # reference_state_dict() is an order-preserving rename of the
        # replica's own state_dict — zip the two key lists to invert it
        ref_sd = replica.reference_state_dict()
        own_keys = list(replica.state_dict().keys())
        renamed = list(ref_sd.keys())
        assert len(renamed) == len(own_keys)
        own_to_ref = dict(zip(own_keys, renamed))
        replica.load_state_dict(
            {
                own: torch.from_numpy(np.array(sd[ref], dtype=np.float32, copy=True))
                for own, ref in own_to_ref.items()
            },
            strict=True,
        )
        replica.eval()

        ids1 = rng.integers(1, V, size=(4, 14)).astype(np.int32)
        ids2 = rng.integers(1, V, size=(4, 14)).astype(np.int32)
        ids1[0, 9:] = 0  # ragged pads exercise per-call truncation
        ids2[2, 6:] = 0

        ours = np.asarray(
            forward(params, _cfg(), jnp.asarray(ids1), jnp.asarray(ids2), train=False)
        ).squeeze(-1)
        with torch.no_grad():
            logits_t = (
                replica.head(
                    replica.encode(torch.tensor(ids1.astype(np.int64))),
                    replica.encode(torch.tensor(ids2.astype(np.int64))),
                )
                .squeeze(-1)
                .numpy()
            )
        np.testing.assert_allclose(ours, logits_t, atol=3e-5)


class TestExportCLI:
    def test_export_cli_from_orbax_checkpoint(self, tmp_path):
        from intrepppid_tpu.cli.export import Export
        from intrepppid_tpu.train.checkpoint import CheckpointManager

        params = _params(use_projection=True)
        run_dir = tmp_path / "run"
        chkpt_dir = run_dir / "chkpt"
        manager = CheckpointManager(chkpt_dir, "tiny")
        state = {
            "params": params,
            "opt_state": [np.zeros(3, np.float32)],
            "global_step": 7,
            "epoch": 2,
        }
        path = manager.save(state, epoch=2, val_loss=0.5)
        hp = {"vocab_size": V, "embedding_size": E, "use_projection": True}
        with open(run_dir / "hyperparams.json", "w") as f:
            json.dump(hp, f)

        out = tmp_path / "exported.ckpt"
        Export().torch_ckpt(path, out)

        chkpt = torch.load(out, map_location="cpu", weights_only=False)
        assert chkpt["hyper_parameters"] == hp  # auto-discovered
        assert chkpt["epoch"] == 2 and chkpt["global_step"] == 7
        # strict-loads into the reference module tree
        net, _ = build_reference_like_module(E, V, use_projection=True)
        net.load_state_dict(chkpt["state_dict"], strict=True)
        # and round-trips through the import path byte-exactly
        back = load_torch_checkpoint(out)
        for a, b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)
        ):
            np.testing.assert_array_equal(np.asarray(a), b)

    def test_load_params_respects_net_depth(self, tmp_path):
        """Loading a .ckpt through the infer/serve path must convert with
        the NETWORK's layer count — a fixed default would silently run 2
        of a 3-layer model's layers."""
        from intrepppid_tpu.cli.infer import _load_params
        from intrepppid_tpu.models.factory import intrepppid_network

        cfg = TripletE2EConfig(
            encoder=EncoderConfig(vocab_size=V, embedding_size=E, rnn_num_layers=3)
        )
        params = init_triplet_e2e(jax.random.PRNGKey(3), cfg)
        out = tmp_path / "deep.ckpt"
        save_torch_checkpoint(params, out)
        net = intrepppid_network(
            steps_per_epoch=1,
            vocab_size=V,
            embedding_size=E,
            rnn_num_layers=3,
        )
        loaded = _load_params(out, net)
        assert len(loaded["encoder"]["lstm"]) == 3
        for a, b in zip(
            jax.tree_util.tree_leaves(params["encoder"]["lstm"]),
            jax.tree_util.tree_leaves(loaded["encoder"]["lstm"]),
        ):
            np.testing.assert_array_equal(np.asarray(a), b)

    def test_save_torch_checkpoint_minimal(self, tmp_path):
        params = _params(use_projection=False)
        out = tmp_path / "m.ckpt"
        save_torch_checkpoint(params, out)
        chkpt = torch.load(out, map_location="cpu", weights_only=False)
        assert set(chkpt) == {"state_dict"}
        net, _ = build_reference_like_module(E, V, use_projection=False)
        net.load_state_dict(chkpt["state_dict"], strict=True)
