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
