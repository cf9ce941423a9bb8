"""``export`` CLI group: take trained intrepppid_tpu weights back to the
reference's PyTorch ecosystem.

The reference distributes and consumes weights as PyTorch Lightning
``.ckpt`` pickles loaded with a strict ``load_state_dict``
(`intrepppid/cli/infer.py:170-175`). The infer CLI here already accepts
those (`cli/infer.py` auto-converts); this group closes the loop in the
other direction, so a model trained on TPU with this framework can be
dropped into the reference's CUDA infer pipeline (or any downstream tool
expecting its checkpoint format) unchanged:

    intrepppid_tpu export torch_ckpt \
        --checkpoint_path logs/<run>/chkpt/<name>-epoch=..-val_loss=.. \
        --out_path intrepppid_tpu_export.ckpt
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Optional


class Export:
    def torch_ckpt(
        self,
        checkpoint_path: Path,
        out_path: Path,
        hyperparams_path: Optional[Path] = None,
    ):
        """Export an orbax training checkpoint as a reference PyTorch .ckpt.

        ``checkpoint_path`` is a checkpoint directory written by training
        here (``<log_path>/<run>/chkpt/<model>-epoch=..-val_loss=..``). The
        output is strict-loadable by the reference's
        ``intrepppid_network(...)`` module and usable with its infer CLI.

        ``hyperparams_path`` defaults to the run directory's
        ``hyperparams.json`` (two levels above the checkpoint) when present;
        the dict is embedded as the ckpt's ``hyper_parameters`` entry for
        Lightning-style consumers. Epoch and global step are carried over
        from the training state.
        """
        from intrepppid_tpu.train.checkpoint import CheckpointManager
        from intrepppid_tpu.utils.torch_convert import save_torch_checkpoint

        checkpoint_path = Path(checkpoint_path)
        out_path = Path(out_path)
        state = CheckpointManager.restore(checkpoint_path)

        if hyperparams_path is None:
            candidate = checkpoint_path.parent.parent / "hyperparams.json"
            if candidate.exists():
                hyperparams_path = candidate
        hyper_parameters = None
        if hyperparams_path is not None:
            with open(hyperparams_path) as f:
                hyper_parameters = json.load(f)

        out_path.parent.mkdir(parents=True, exist_ok=True)
        save_torch_checkpoint(
            state["params"],
            out_path,
            hyper_parameters=hyper_parameters,
            epoch=state.get("epoch"),
            global_step=state.get("global_step"),
        )
        n_keys = None
        try:  # report without re-reading the pickle
            from intrepppid_tpu.utils.torch_convert import (
                params_to_torch_state_dict,
            )

            n_keys = len(params_to_torch_state_dict(state["params"]))
        except Exception:
            pass
        print(
            f"exported {checkpoint_path} -> {out_path}"
            + (f" ({n_keys} state_dict entries)" if n_keys else "")
        )
        return out_path
