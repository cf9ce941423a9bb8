"""Worker for the 2-process jax.distributed test (VERDICT r2 missing #2).

Executed as ``python multiprocess_worker.py <process_id> <port>`` in a clean
environment (CPU platform, 4 virtual devices per process). Exercises, for
real, the three multi-process code paths that had never run with
``process_count > 1``:

* ``parallel.mesh.initialize_distributed`` + global ``make_mesh``,
* ``parallel.mesh.put_global_batch`` (per-process local rows assembled via
  ``jax.make_array_from_process_local_data``) feeding a jitted DP train
  step,
* ``data.pipeline.prefetch_to_device``'s multihost transfer branch,
* ``train.trainer.Trainer._run_eval``'s ``jax.process_count() > 1`` branch.

Prints one JSON line ``{"losses": [...], "pipeline_loss": ..., "eval": {...}}``
that the parent test compares against the single-process values.
"""
from __future__ import annotations

import json
import sys

import numpy as np

E, V, B_GLOBAL, T = 16, 30, 8, 20
N_STEPS = 3


def make_global_batches(n_steps: int = N_STEPS, seed: int = 101):
    """Deterministic global quintuplet batches (shared by workers/parent)."""
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(n_steps):
        b = {}
        for k in ("p1", "p2", "anchor", "positive", "negative"):
            ids = rng.integers(1, V, size=(B_GLOBAL, T))
            lens = rng.integers(3, T + 1, size=B_GLOBAL)
            for i, l in enumerate(lens):
                ids[i, l:] = 0
            b[k] = ids.astype(np.int32)
        b["label"] = (rng.random(B_GLOBAL) > 0.5).astype(np.int32)
        batches.append(b)
    return batches


def build_net():
    from intrepppid_tpu.models.factory import intrepppid_network

    return intrepppid_network(
        steps_per_epoch=N_STEPS,
        num_epochs=1,
        vocab_size=V,
        embedding_size=E,
        optimizer_type="adamw",
    )


def run(local_rows):
    """The multi-process computation on this process's local rows.

    ``local_rows`` maps each global batch to this process's slice (or the
    full batch when single-process). Returns the result dict."""
    import jax
    import jax.numpy as jnp
    import optax

    from intrepppid_tpu.data.pipeline import prefetch_to_device
    from intrepppid_tpu.models.triplet import step as triplet_step
    from intrepppid_tpu.optim import make_optimizer
    from intrepppid_tpu.parallel import (
        batch_sharding,
        make_mesh,
        put_global_batch,
        replicated_sharding,
    )

    mesh = make_mesh()  # all global devices on the data axis
    rep = replicated_sharding(mesh)
    data_sh = batch_sharding(mesh)

    net = build_net()
    params_host = net.init(jax.random.PRNGKey(0))
    # replicated placement: every process holds identical host values
    params = put_global_batch(
        mesh, {"p": params_host}, sharding=rep
    )["p"]
    optimizer = make_optimizer("adamw", 1e-3, N_STEPS, 1)
    opt_state = optimizer.init(params)

    def train_step(params, opt_state, batch):
        def loss_fn(p):
            loss, _ = triplet_step(
                p, net.cfg, batch, jax.random.PRNGKey(1), train=True
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    train_step = jax.jit(
        train_step,
        in_shardings=(rep, rep, data_sh),
        out_shardings=(rep, rep, rep),
    )

    losses = []
    for local in local_rows:
        batch = put_global_batch(mesh, local, sharding=data_sh)
        params, opt_state, loss = train_step(params, opt_state, batch)
        losses.append(float(loss))

    # data/pipeline.py multihost transfer branch: same batch through the
    # prefetcher thread, then one eval loss
    eval_step = jax.jit(
        lambda p, b: triplet_step(
            p, net.cfg, b, jax.random.PRNGKey(2), train=False
        )[0],
        in_shardings=(rep, data_sh),
        out_shardings=rep,
    )
    pipeline_loss = None
    for batch in prefetch_to_device(iter(local_rows[:1]), 2, sharding=data_sh):
        pipeline_loss = float(eval_step(params, batch))
    return {"mesh": mesh, "net": net, "params": params,
            "losses": losses, "pipeline_loss": pipeline_loss}


def run_trainer_eval(mesh, net, params, local_rows):
    """Trainer._run_eval through its process_count>1 branch."""
    import tempfile

    import jax

    from intrepppid_tpu.train.trainer import Trainer

    trainer = Trainer(
        net,
        tempfile.mkdtemp(prefix=f"mp_eval_{jax.process_index()}_"),
        "mp",
        seed=7,
        mesh=mesh,
        swa=None,
    )
    metrics = trainer._run_eval(
        params, iter(local_rows), "val", step=0
    )
    return metrics


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    import jax

    jax.config.update("jax_platforms", "cpu")

    from intrepppid_tpu.parallel import initialize_distributed

    assert initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    half = B_GLOBAL // 2
    sl = slice(pid * half, (pid + 1) * half)
    local_rows = [
        {k: v[sl] for k, v in b.items()} for b in make_global_batches()
    ]
    out = run(local_rows)
    eval_metrics = run_trainer_eval(
        out["mesh"], out["net"], out["params"], local_rows
    )
    print(json.dumps({
        "losses": out["losses"],
        "pipeline_loss": out["pipeline_loss"],
        "eval": eval_metrics,
    }), flush=True)


if __name__ == "__main__":
    main()
