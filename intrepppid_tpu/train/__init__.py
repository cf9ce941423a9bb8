from intrepppid_tpu.train.checkpoint import (
    CheckpointManager,
    load_params_from_checkpoint,
)
from intrepppid_tpu.train.e2e_triplet import train_e2e_rnn_triplet
from intrepppid_tpu.train.trainer import Trainer

__all__ = [
    "CheckpointManager",
    "load_params_from_checkpoint",
    "Trainer",
    "train_e2e_rnn_triplet",
]
