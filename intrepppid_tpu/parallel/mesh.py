"""Device mesh + sharding helpers.

The reference trains on exactly one GPU (`intrepppid/e2e/e2e_triplet.py:392-394`)
with no distributed support (SURVEY.md §2.10). Here parallelism is
first-class: a `jax.sharding.Mesh` with a ``data`` axis (batch-sharded
quintuplet batches, replicated params — the natural parallelism for this
model family, whose hidden sizes are far too small for tensor parallelism)
plus an optional ``model`` axis reserved for embedding/vocab sharding on
scaled configs. Gradients are reduced by XLA-inserted collectives over ICI
when the jitted train step consumes batch-sharded inputs and emits
replicated params — no hand-written NCCL/MPI analogue.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = n_data * n_model
    dev_array = np.array(devices[:use]).reshape(n_data, n_model)
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, PartitionSpec("data"))


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """For (K, B, ...) stacks of batches: shard the second (batch) axis."""
    return NamedSharding(mesh, PartitionSpec(None, "data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def pad_batch_to_multiple(batch: dict, multiple: int):
    """Pad the batch dim up to a multiple (device count) by repeating the
    final row; returns (padded_batch, true_size). Padded rows get a
    ``weight`` of 0 (real rows 1), which the quintuplet step uses to mask
    them out of losses, gradients and metrics — padded multi-device
    results are exactly the unpadded ones."""
    import numpy as np

    n = next(iter(batch.values())).shape[0]
    rem = n % multiple
    if rem == 0:
        return batch, n
    pad = multiple - rem
    out = {}
    for k, v in batch.items():
        out[k] = np.concatenate([v, np.repeat(v[-1:], pad, axis=0)], axis=0)
    weight = out.get("weight")
    if weight is None:
        weight = np.concatenate(
            [np.ones(n, np.float32), np.zeros(pad, np.float32)]
        )
    else:
        weight = np.concatenate([weight[:n], np.zeros(pad, weight.dtype)])
    out["weight"] = weight
    return out, n
