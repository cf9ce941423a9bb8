"""Orbax-based checkpointing.

TPU-native equivalent of the reference's Lightning ``ModelCheckpoint``
(monitor="val_loss", filename "{model_name}-{epoch}-{val_loss}") plus
``trainer.fit(ckpt_path=...)`` resume and ``trainer.test(ckpt_path="best")``
(`intrepppid/e2e/e2e_triplet.py:381-385,424-426`). Stores params, optimizer
state, epoch/step counters and the RNG key as one pytree.
"""
from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _np_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    """Per-epoch orbax checkpoints monitoring ``val_loss``.

    Like Lightning's ``ModelCheckpoint(save_top_k=1)`` (the reference's
    configuration) only the best checkpoint is kept, plus the most recent
    one for resume; older non-best checkpoints are pruned. Pass
    ``keep_all=True`` to retain every epoch. Best-checkpoint tracking
    persists in ``best.json`` and survives process restarts (resume does
    not reset it).
    """

    def __init__(self, chkpt_dir, model_name: str, keep_all: bool = False):
        self.chkpt_dir = Path(chkpt_dir)
        self.chkpt_dir.mkdir(parents=True, exist_ok=True)
        self.model_name = model_name
        self.keep_all = keep_all
        self.best_val_loss = float("inf")
        self.best_path: Optional[Path] = None
        self.last_path: Optional[Path] = None
        marker = self.chkpt_dir / "best.json"
        if marker.exists():
            with open(marker) as f:
                data = json.load(f)
            self.best_val_loss = data.get("val_loss", float("inf"))
            self.best_path = Path(data["best"])
        self._checkpointer = ocp.PyTreeCheckpointer()

    def save(self, state: Dict[str, Any], epoch: int, val_loss: float) -> Path:
        name = f"{self.model_name}-epoch={epoch:02d}-val_loss={val_loss:.2f}"
        path = (self.chkpt_dir / name).absolute()
        if path.exists():
            shutil.rmtree(path)
        self._checkpointer.save(path, _np_tree(state))
        meta = {"epoch": epoch, "val_loss": val_loss, "model_name": self.model_name}
        with open(path / "intrepppid_meta.json", "w") as f:
            json.dump(meta, f)
        prev_best = self.best_path
        prev_last = self.last_path
        self.last_path = path
        if val_loss < self.best_val_loss:
            self.best_val_loss = val_loss
            self.best_path = path
            with open(self.chkpt_dir / "best.json", "w") as f:
                json.dump({"best": str(path), "val_loss": val_loss}, f)
            if not self.keep_all and prev_best is not None and prev_best.exists():
                if prev_best != prev_last:
                    shutil.rmtree(prev_best, ignore_errors=True)
        if (
            not self.keep_all
            and prev_last is not None
            and prev_last not in (self.best_path, path)
            and prev_last.exists()
        ):
            shutil.rmtree(prev_last, ignore_errors=True)
        return path

    @staticmethod
    def restore(path) -> Dict[str, Any]:
        """Restore a checkpoint as saved (numpy leaves)."""
        path = Path(path).absolute()
        return ocp.PyTreeCheckpointer().restore(path)

    def best_checkpoint(self) -> Optional[Path]:
        if self.best_path is not None:
            return self.best_path
        marker = self.chkpt_dir / "best.json"
        if marker.exists():
            with open(marker) as f:
                return Path(json.load(f)["best"])
        return None


def load_params_from_checkpoint(path):
    """Load just the model params from a full training checkpoint — the
    inference path (`intrepppid/cli/infer.py:173-175` analogue)."""
    state = CheckpointManager.restore(path)
    return state["params"]
