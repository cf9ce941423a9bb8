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


_distributed_initialized = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host bootstrap — the DCN case of SURVEY.md §2.10.

    Call once per process before any jax operation. Arguments default to
    the standard environment (``JAX_COORDINATOR_ADDRESS`` /
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``). When all three are
    absent, nothing is attempted UNLESS ``INTREPPPID_TPU_DISTRIBUTED=auto``
    is set, in which case a bare ``jax.distributed.initialize()`` runs and
    jax auto-detects the cluster from the platform metadata (Cloud-TPU pod
    slices, SLURM, ...) — auto-detection is opt-in because a bare
    initialize on a plain single host can fail or hang depending on the
    environment. Returns True when a distributed runtime was (or already
    is) set up, False when running single-host. After this,
    ``jax.devices()`` spans all hosts, so :func:`make_mesh` builds a
    global mesh; batches must then be fed via :func:`put_global_batch`
    (each process supplies its local rows).
    """
    global _distributed_initialized
    if _distributed_initialized:
        return True
    import os

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        if os.environ.get("INTREPPPID_TPU_DISTRIBUTED", "").lower() not in (
            "auto",
            "1",
        ):
            return False
        jax.distributed.initialize()  # platform auto-detection
        _distributed_initialized = True
        return True
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _distributed_initialized = True
    return True


def broadcast_from_primary_int(value: int) -> int:
    """Agree on process 0's integer across all processes.

    Single-process: identity. Multi-process: a ``broadcast_one_to_all``
    collective (every process must call it, in the same order relative to
    other collectives). Used to sync the run seed — the reference draws a
    random fallback seed when none is given (`e2e_triplet.py:291-293`),
    and on a pod each process would otherwise draw its own, breaking the
    replicated-params invariant."""
    if jax.process_count() == 1:
        return int(value)
    from jax.experimental import multihost_utils

    return int(multihost_utils.broadcast_one_to_all(np.int32(value)))


def broadcast_from_primary_str(value: str, max_len: int = 128) -> str:
    """Agree on process 0's string across all processes (identity when
    single-process). Used to sync the generated run name: each process
    launched with the same CLI command draws its own timestamp+passphrase
    (`cli/train.py` run naming), which would split the shared
    checkpoint/log directory layout across hosts."""
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils

    buf = np.zeros(max_len, np.uint8)
    raw = value.encode("utf-8")[:max_len]
    buf[: len(raw)] = np.frombuffer(raw, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    # errors="ignore": the byte truncation above may split a multibyte
    # character at the max_len boundary; drop the fragment instead of
    # raising mid-collective on every process
    return bytes(out).rstrip(b"\x00").decode("utf-8", errors="ignore")


def put_global_batch(mesh: Mesh, batch, sharding=None):
    """Place a pytree of arrays onto the mesh, multi-host aware.

    Single-process: a plain sharded ``device_put``. Multi-process: each
    process passes its LOCAL rows (global batch = local rows stacked in
    process order along ``data``) and the arrays are assembled with
    ``jax.make_array_from_process_local_data`` — data-parallel loading with
    no cross-host batch broadcast. With a replicated ``sharding`` each
    process passes the full (identical) value, e.g. the params tree.
    """
    sh = sharding if sharding is not None else batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda v: jax.device_put(v, sh), batch)
    return jax.tree_util.tree_map(
        lambda v: jax.make_array_from_process_local_data(sh, np.asarray(v)),
        batch,
    )


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
    n = next(iter(batch.values())).shape[0]
    rem = n % multiple
    if rem == 0:
        return batch, n
    return _pad_batch_rows(batch, n, multiple - rem), n


def pad_batch_to_size(batch: dict, size: int):
    """Pad the batch dim up to exactly ``size`` rows (same weight-0 masking
    as :func:`pad_batch_to_multiple`); returns (padded_batch, true_size).
    Used so split-tail / bucket-tail batches share the full batches'
    compiled shape — a one-off tail shape costs a fresh executable per
    bucket per stage on remote-compile platforms, and a same-shape tail
    also joins the surrounding dispatch group instead of flushing it."""
    n = next(iter(batch.values())).shape[0]
    if n >= size:
        return batch, n
    return _pad_batch_rows(batch, n, size - n), n


def _pad_batch_rows(batch: dict, n: int, pad: int) -> dict:
    import numpy as np

    from intrepppid_tpu.data.utils import repeat_pad_rows

    out = {}
    for k, v in batch.items():
        out[k] = repeat_pad_rows(np.asarray(v), n + pad)
    weight = out.get("weight")
    if weight is None:
        weight = np.concatenate(
            [np.ones(n, np.float32), np.zeros(pad, np.float32)]
        )
    else:
        weight = np.concatenate([weight[:n], np.zeros(pad, weight.dtype)])
    out["weight"] = weight
    return out
