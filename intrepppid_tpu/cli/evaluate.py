"""Evaluation CLI — score a trained checkpoint on any INTREPPPID dataset.

The reference has no standalone eval entry point (testing happens only
inside ``trainer.test`` at the end of a training run). This command covers
the paper's headline benchmark protocol — train on one species, zero-shot
evaluate on another species' test split — without retraining:

    python -m intrepppid_tpu eval e2e_rnn_triplet \
        --checkpoint_path logs/<run>/chkpt/<best> \
        --ppi_dataset_path mouse.h5 --sentencepiece_path spm.model \
        --c_type 3 --out_path mouse_metrics.json
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Optional


class Eval:
    @staticmethod
    def e2e_rnn_triplet(
        checkpoint_path: Path,
        ppi_dataset_path: Path,
        sentencepiece_path: Path,
        c_type: int,
        out_path: Optional[Path] = None,
        split: str = "test",
        batch_size: int = 80,
        workers: int = 0,
        vocab_size: Optional[int] = None,
        trunc_len: Optional[int] = None,
        embedding_size: Optional[int] = None,
        rnn_num_layers: Optional[int] = None,
        bi_reduce: Optional[str] = None,
        use_projection: Optional[bool] = None,
        beta_classifier: Optional[float] = None,
        seed: int = 8675309,
        precision: str = "bf16",
        n_data_parallel: Optional[int] = None,
        steps_per_dispatch: Optional[int] = None,
    ):
        """Evaluate a checkpoint on a dataset split; prints and optionally
        writes the metric dict (AUROC/AP/MCC/precision/recall + losses).

        Architecture hyperparameters default to the values recorded in the
        run's ``hyperparams.json`` (found two directories above the
        checkpoint, the training layout) when available, else to the
        manuscript defaults; explicit flags always win.
        """
        import json as _json

        import jax
        import jax.numpy as jnp
        import numpy as np

        hp = {}
        hp_path = Path(checkpoint_path).parent.parent / "hyperparams.json"
        if hp_path.exists():
            with open(hp_path) as f:
                hp = _json.load(f)

        def pick(explicit, key, default):
            if explicit is not None:
                return explicit
            return hp.get(key, default)

        vocab_size = pick(vocab_size, "vocab_size", 250)
        trunc_len = pick(trunc_len, "trunc_len", 1500)
        embedding_size = pick(embedding_size, "embedding_size", 64)
        rnn_num_layers = pick(rnn_num_layers, "rnn_num_layers", 2)
        bi_reduce = pick(bi_reduce, "bi_reduce", "last")
        use_projection = pick(use_projection, "use_projection", False)
        beta_classifier = pick(beta_classifier, "beta_classifier", 2.0)

        from intrepppid_tpu.data.ppi_oma import IntrepppidDataModule
        from intrepppid_tpu.models.factory import intrepppid_network
        from intrepppid_tpu.models.triplet import step as triplet_step
        from intrepppid_tpu.parallel import (
            batch_sharding,
            initialize_distributed,
            make_mesh,
            put_global_batch,
            replicated_sharding,
        )

        # multi-host bootstrap (no-op without the JAX_COORDINATOR_* env):
        # the same eval command launched on every host shares the dispatches
        initialize_distributed()
        from intrepppid_tpu.train.checkpoint import load_params_from_checkpoint
        from intrepppid_tpu.train.trainer import EpochAccumulator

        dm = IntrepppidDataModule(
            batch_size=batch_size,
            dataset_path=ppi_dataset_path,
            c_type=c_type,
            trunc_len=trunc_len,
            workers=workers,
            vocab_size=vocab_size,
            model_file=sentencepiece_path,
            seed=seed,
            sos=False,
            eos=False,
            negative_omid=True,
        )
        dm.setup()

        net = intrepppid_network(
            steps_per_epoch=0,
            vocab_size=vocab_size,
            embedding_size=embedding_size,
            rnn_num_layers=rnn_num_layers,
            bi_reduce=bi_reduce,
            use_projection=use_projection,
            beta_classifier=beta_classifier,
            compute_dtype=jnp.bfloat16 if precision == "bf16" else jnp.float32,
        )
        params = load_params_from_checkpoint(checkpoint_path)
        if "triplet_projection" in params and not use_projection:
            print(
                "WARNING: checkpoint contains triplet_projection weights but "
                "use_projection=False — triplet metrics will differ from the "
                "training run. Pass --use_projection true to match."
            )

        # data-parallel eval over a mesh (same scheme as Trainer): params
        # replicated, batch sharded on the batch dim, rows padded to the
        # device count with weight-0 rows the step masks out.
        mesh = make_mesh(n_data=n_data_parallel)
        # padding granularity = devices fed by THIS process (cf. Trainer)
        n_devices = max(
            1, int(np.prod(mesh.devices.shape)) // jax.process_count()
        )
        rep = replicated_sharding(mesh)
        data_sh = batch_sharding(mesh)
        # multi-host safe replicated placement (device_put cannot target
        # cross-process shardings; every process holds identical values)
        params = put_global_batch(mesh, {"p": params}, sharding=rep)["p"]

        from intrepppid_tpu.parallel import stacked_batch_sharding
        from intrepppid_tpu.train.trainer import (
            group_dispatch_batches,
            padded_wire_batches,
            resolve_steps_per_dispatch,
            widen_batch,
        )

        eval_step = jax.jit(
            lambda p, b: triplet_step(
                p, net.cfg, widen_batch(b), jax.random.PRNGKey(0), False
            )[1],
            in_shardings=(rep, data_sh),
            out_shardings=rep,
        )

        def one(p, b):
            return p, triplet_step(
                p, net.cfg, widen_batch(b), jax.random.PRNGKey(0), False
            )[1]

        multi_eval_step = jax.jit(
            lambda p, bs: jax.lax.scan(one, p, bs)[1],
            in_shardings=(rep, stacked_batch_sharding(mesh)),
            out_shardings=rep,
        )
        batches = {
            # eval semantics even on the train split: deterministic
            # tokenisation, no shuffle (metrics reproducible across runs)
            "train": dm.train_eval_batches,
            "val": dm.val_batches,
            "test": dm.test_batches,
        }[split]()
        acc = EpochAccumulator()

        # K batches per dispatch, like Trainer: each dispatch is a runtime
        # round trip (~45 ms tunnelled); tails pad to the bucket's full
        # compiled shape and compress to the bit-plane wire format
        K = resolve_steps_per_dispatch(steps_per_dispatch)
        it = padded_wire_batches(batches, n_devices, vocab_size)
        if K > 1:
            it = group_dispatch_batches(it, K)
        sdata = stacked_batch_sharding(mesh)
        for batch, meta in it:
            sh = sdata if isinstance(meta, tuple) else data_sh
            # multi-host aware: each process's rows are a SLICE of the
            # global batch (the data module shards per process), so the
            # global array must be assembled — put_global_batch picks
            # make_array_from_process_local_data when process_count > 1
            # and plain device_put otherwise
            batch = put_global_batch(mesh, batch, sharding=sh)
            if isinstance(meta, tuple):
                auxs = multi_eval_step(params, batch)
                acc.add(auxs, np.asarray(meta, np.float64))
            else:
                aux = eval_step(params, batch)
                acc.add(aux, meta)
        metrics = {f"{split}_{k}": float(v) for k, v in acc.means().items()}
        print(json.dumps(metrics, indent=2))
        # metric values are computed on the global batch and replicated, so
        # every process holds identical numbers; only rank 0 writes the file
        if out_path is not None and jax.process_index() == 0:
            Path(out_path).parent.mkdir(parents=True, exist_ok=True)
            with open(out_path, "w") as f:
                json.dump(metrics, f, indent=2)
        return metrics
