"""Train CLI (`intrepppid/cli/train.py:25-121`): same 25 hyperparameters,
same defaults, same run-name scheme ``YY.DDD-HH.MM-<passphrase>`` and
artifact layout (``log_path/<run>/{hyperparams.json,metrics.json,chkpt/}``).

TPU additions: ``--precision bf16|fp32`` (reference: fp16 AMP on GPU) and
``--n_data_parallel`` (shard the batch over that many devices of the mesh).
"""
from __future__ import annotations

from datetime import datetime
from pathlib import Path
from typing import Optional, Union

from intrepppid_tpu.utils.run_name import generate_passphrase


class Train:
    @staticmethod
    def e2e_rnn_triplet(
        ppi_dataset_path: Path,
        sentencepiece_path: Path,
        c_type: int,
        num_epochs: int,
        batch_size: int,
        seed: Optional[int] = None,
        vocab_size: int = 250,
        trunc_len: int = 1500,
        embedding_size: int = 64,
        rnn_num_layers: int = 2,
        rnn_dropout_rate: float = 0.3,
        variational_dropout: bool = False,
        bi_reduce: str = "last",
        workers: int = 4,
        embedding_droprate: float = 0.3,
        do_rate: float = 0.3,
        log_path: Path = Path("./logs/e2e_rnn_triplet"),
        encoder_only_steps: int = -1,
        classifier_warm_up: int = -1,
        beta_classifier: float = 4.0,
        lr: Union[float, str] = 1e-2,
        use_projection: bool = False,
        checkpoint_path: Optional[Path] = None,
        optimizer_type: str = "ranger21",
        precision: str = "bf16",
        n_data_parallel: Optional[int] = None,
        steps_per_dispatch: Optional[int] = None,
        cache_eval_tokens: bool = False,
        profile_dir: Optional[Path] = None,
    ):
        """Train INTREPPPID end-to-end: AWD-LSTM encoder + MLP classifier
        with the orthologue triplet task, on TPU via JAX."""
        from intrepppid_tpu.parallel import (
            broadcast_from_primary_str,
            initialize_distributed,
        )
        from intrepppid_tpu.train.e2e_triplet import train_e2e_rnn_triplet

        # Multi-host bootstrap: a no-op without JAX_COORDINATOR_ADDRESS /
        # JAX_NUM_PROCESSES / JAX_PROCESS_ID (or a Cloud-TPU pod slice).
        # With them, launching this same CLI command on every host forms
        # one pod-wide data-parallel run — so the processes must agree on
        # ONE run name (each draws its own timestamp+passphrase below,
        # which would split the shared checkpoint/log layout).
        initialize_distributed()

        dt = datetime.now().strftime("%y.%j-%H.%M")
        model_name = f"{dt}-{generate_passphrase(2, '-')}"
        model_name = broadcast_from_primary_str(model_name)

        log_path = Path(log_path)
        chkpt_dir = log_path / model_name / "chkpt"
        hyperparams_path = log_path / model_name / "hyperparams.json"

        return train_e2e_rnn_triplet(
            vocab_size=vocab_size,
            trunc_len=trunc_len,
            embedding_size=embedding_size,
            rnn_num_layers=rnn_num_layers,
            rnn_dropout_rate=rnn_dropout_rate,
            variational_dropout=variational_dropout,
            bi_reduce=bi_reduce,
            ppi_dataset_path=ppi_dataset_path,
            sentencepiece_path=sentencepiece_path,
            log_path=log_path,
            hyperparams_path=hyperparams_path,
            chkpt_dir=chkpt_dir,
            c_type=c_type,
            model_name=model_name,
            workers=workers,
            embedding_droprate=embedding_droprate,
            do_rate=do_rate,
            num_epochs=num_epochs,
            batch_size=batch_size,
            encoder_only_steps=encoder_only_steps,
            classifier_warm_up=classifier_warm_up,
            beta_classifier=beta_classifier,
            lr=lr,
            checkpoint_path=checkpoint_path,
            use_projection=use_projection,
            optimizer_type=optimizer_type,
            seed=seed,
            precision=precision,
            n_data_parallel=n_data_parallel,
            steps_per_dispatch=steps_per_dispatch,
            cache_eval_tokens=cache_eval_tokens,
            profile_dir=profile_dir,
        )
