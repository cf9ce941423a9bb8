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
    """Writes one orbax checkpoint dir per epoch, tracks the best val_loss."""

    def __init__(self, chkpt_dir, model_name: str):
        self.chkpt_dir = Path(chkpt_dir)
        self.chkpt_dir.mkdir(parents=True, exist_ok=True)
        self.model_name = model_name
        self.best_val_loss = float("inf")
        self.best_path: Optional[Path] = None
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
        if val_loss < self.best_val_loss:
            self.best_val_loss = val_loss
            self.best_path = path
            with open(self.chkpt_dir / "best.json", "w") as f:
                json.dump({"best": str(path), "val_loss": val_loss}, f)
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
