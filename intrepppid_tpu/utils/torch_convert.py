"""Convert reference (PyTorch Lightning) checkpoints to this framework's
param pytree, so published INTREPPPID weights (GitHub releases,
`docs/data.rst:4-7`) load directly.

Reference state_dict key layout (module tree of ``TripletE2ENet`` with
``WeightDrop`` renaming dropped weights to ``*_raw``,
`intrepppid/utils/weightdrop.py:59-63`):

    encoder.embedder.weight
    encoder.encoder.rnn.weight_ih_l{K}[_reverse]
    encoder.encoder.rnn.weight_hh_l0_raw          (weight-dropped)
    encoder.encoder.rnn.weight_hh_l{K}[_reverse]  (all others)
    encoder.encoder.rnn.bias_{ih,hh}_l{K}[_reverse]
    encoder.encoder.fc.{weight,bias}
    encoder.projection.model.{0,2,4}.{weight,bias}   (dead Projection)
    head.classify.fc1.module.{weight_raw,bias}
    head.classify.fc2.module.{weight_raw,bias}
    triplet_projection.1.{weight,bias}               (when use_projection)
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _get(sd: Dict[str, Any], key: str) -> np.ndarray:
    t = sd[key]
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def torch_state_dict_to_params(
    state_dict: Dict[str, Any],
    rnn_num_layers: int = 2,
    include_dead_projection: bool = True,
) -> Dict[str, Any]:
    """Map a reference ``chkpt["state_dict"]`` to an intrepppid_tpu params tree."""
    sd = state_dict
    lstm = []
    for layer in range(rnn_num_layers):
        lp = {}
        for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
            hh_key = f"encoder.encoder.rnn.weight_hh_l{layer}{suffix}"
            if hh_key + "_raw" in sd:  # the weight-dropped matrix
                hh_key = hh_key + "_raw"
            lp[direction] = {
                "w_ih": _get(sd, f"encoder.encoder.rnn.weight_ih_l{layer}{suffix}"),
                "w_hh": _get(sd, hh_key),
                "b_ih": _get(sd, f"encoder.encoder.rnn.bias_ih_l{layer}{suffix}"),
                "b_hh": _get(sd, f"encoder.encoder.rnn.bias_hh_l{layer}{suffix}"),
            }
        lstm.append(lp)

    encoder: Dict[str, Any] = {
        "embedding": _get(sd, "encoder.embedder.weight"),
        "lstm": lstm,
        "fc": {
            "w": _get(sd, "encoder.encoder.fc.weight"),
            "b": _get(sd, "encoder.encoder.fc.bias"),
        },
    }
    if include_dead_projection and "encoder.projection.model.0.weight" in sd:
        encoder["projection"] = [
            {
                "w": _get(sd, f"encoder.projection.model.{i}.weight"),
                "b": _get(sd, f"encoder.projection.model.{i}.bias"),
            }
            for i in (0, 2, 4)
        ]

    params: Dict[str, Any] = {
        "encoder": encoder,
        "head": {
            "fc1": {
                "w": _get(sd, "head.classify.fc1.module.weight_raw"),
                "b": _get(sd, "head.classify.fc1.module.bias"),
            },
            "fc2": {
                "w": _get(sd, "head.classify.fc2.module.weight_raw"),
                "b": _get(sd, "head.classify.fc2.module.bias"),
            },
        },
    }
    if "triplet_projection.1.weight" in sd:
        params["triplet_projection"] = {
            "w": _get(sd, "triplet_projection.1.weight"),
            "b": _get(sd, "triplet_projection.1.bias"),
        }
    return params


def load_torch_checkpoint(path, rnn_num_layers: int = 2) -> Dict[str, Any]:
    """Load a reference ``.ckpt`` file (requires torch on the host)."""
    import torch

    chkpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = chkpt.get("state_dict", chkpt)
    return torch_state_dict_to_params(sd, rnn_num_layers)


def params_to_torch_state_dict(params: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of :func:`torch_state_dict_to_params`: an intrepppid_tpu params
    pytree -> the reference's Lightning ``state_dict`` (numpy float32 leaves).

    The produced dict is *strict-loadable* into the reference's
    ``intrepppid_network(...)`` module — the exact path the reference infer
    CLI takes (`intrepppid/cli/infer.py:170-175`:
    ``net.load_state_dict(chkpt["state_dict"])``, strict by default). Strict
    loading requires every key of the module tree, which includes a quirk the
    *import* direction can ignore: the reference registers the LSTM twice —
    as ``encoder.encoder.rnn`` and again through the WeightDrop wrapper as
    ``encoder.encoder.rnn_dp.module`` (`encoders/awd_lstm.py:35-45`; both
    names alias ONE ``nn.LSTM`` object, and ``nn.Module.state_dict`` emits
    shared submodules under every registration path). We therefore emit the
    identical LSTM tensors under both prefixes, with ``weight_hh_l0`` renamed
    to ``weight_hh_l0_raw`` per WeightDrop's ``_setup``
    (`utils/weightdrop.py:59-63` — layer-0 forward only).

    Head DropConnect Linears live behind their wrappers as
    ``head.classify.fc{1,2}.module.{weight_raw,bias}``
    (`classifier/head/mlp.py:35-63`). The dead ``Projection`` MLP must be
    present for strict loading (`encoders/awd_lstm.py:140-142`); params
    initialised with ``include_dead_projection=False`` are rejected with a
    pointer at the fix rather than silently fabricating weights.
    """
    enc = params["encoder"]
    sd: Dict[str, Any] = {
        "encoder.embedder.weight": np.asarray(enc["embedding"], np.float32)
    }

    rnn_items = []
    for layer, lp in enumerate(enc["lstm"]):
        for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
            dp = lp[direction]
            hh_name = f"weight_hh_l{layer}{suffix}"
            if layer == 0 and direction == "fwd":
                hh_name += "_raw"  # the weight-dropped matrix
            rnn_items += [
                (f"weight_ih_l{layer}{suffix}", dp["w_ih"]),
                (hh_name, dp["w_hh"]),
                (f"bias_ih_l{layer}{suffix}", dp["b_ih"]),
                (f"bias_hh_l{layer}{suffix}", dp["b_hh"]),
            ]
    for name, arr in rnn_items:
        arr = np.asarray(arr, np.float32)
        # one LSTM object, two registration paths (see docstring)
        sd[f"encoder.encoder.rnn.{name}"] = arr
        sd[f"encoder.encoder.rnn_dp.module.{name}"] = arr

    sd["encoder.encoder.fc.weight"] = np.asarray(enc["fc"]["w"], np.float32)
    sd["encoder.encoder.fc.bias"] = np.asarray(enc["fc"]["b"], np.float32)

    if "projection" not in enc:
        raise ValueError(
            "params have no dead-Projection weights (the encoder was built "
            "with include_dead_projection=False), but the reference module "
            "tree requires encoder.projection.* for a strict load_state_dict "
            "(intrepppid/encoders/awd_lstm.py:140-142). Re-initialise with "
            "include_dead_projection=True (the default) before exporting."
        )
    for i, idx in enumerate((0, 2, 4)):  # Linears at 0/2/4; ReLUs between
        sd[f"encoder.projection.model.{idx}.weight"] = np.asarray(
            enc["projection"][i]["w"], np.float32
        )
        sd[f"encoder.projection.model.{idx}.bias"] = np.asarray(
            enc["projection"][i]["b"], np.float32
        )

    for fc in ("fc1", "fc2"):
        sd[f"head.classify.{fc}.module.weight_raw"] = np.asarray(
            params["head"][fc]["w"], np.float32
        )
        sd[f"head.classify.{fc}.module.bias"] = np.asarray(
            params["head"][fc]["b"], np.float32
        )

    if "triplet_projection" in params:
        sd["triplet_projection.1.weight"] = np.asarray(
            params["triplet_projection"]["w"], np.float32
        )
        sd["triplet_projection.1.bias"] = np.asarray(
            params["triplet_projection"]["b"], np.float32
        )
    return sd


def save_torch_checkpoint(
    params: Dict[str, Any],
    path,
    hyper_parameters: Dict[str, Any] = None,
    epoch: int = None,
    global_step: int = None,
) -> None:
    """Write ``params`` as a reference-consumable PyTorch ``.ckpt``.

    Layout mirrors what the reference's infer CLI reads
    (`intrepppid/cli/infer.py:173-175`): a ``torch.save`` pickle with a
    ``"state_dict"`` entry. ``hyper_parameters`` / ``epoch`` /
    ``global_step`` ride along for Lightning-style consumers when provided.
    """
    import torch

    sd = {
        # np.array(copy=True): torch.from_numpy needs an owned, writable
        # buffer (jax-backed arrays are read-only views)
        k: torch.from_numpy(np.array(v, dtype=np.float32, copy=True))
        for k, v in params_to_torch_state_dict(params).items()
    }
    chkpt: Dict[str, Any] = {"state_dict": sd}
    if hyper_parameters is not None:
        chkpt["hyper_parameters"] = dict(hyper_parameters)
    if epoch is not None:
        chkpt["epoch"] = int(epoch)
    if global_step is not None:
        chkpt["global_step"] = int(global_step)
    torch.save(chkpt, path)
