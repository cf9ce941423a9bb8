"""Core TPU compute ops: activations, dropout variants, LSTM scan, losses, metrics."""
from intrepppid_tpu.ops.activations import mish, relu
from intrepppid_tpu.ops.dropout import (
    dropout,
    dropconnect_weight,
    variational_weight,
    embedding_dropout,
)
from intrepppid_tpu.ops.losses import (
    bce_with_logits,
    triplet_margin_loss,
    combined_triplet_loss,
    pairwise_distance,
)
from intrepppid_tpu.ops.lstm import bilstm, init_lstm_params
from intrepppid_tpu.ops.metrics import (
    binary_auroc,
    binary_average_precision,
    binary_mcc,
    binary_precision,
    binary_recall,
    all_binary_metrics,
)

__all__ = [
    "mish",
    "relu",
    "dropout",
    "dropconnect_weight",
    "variational_weight",
    "embedding_dropout",
    "bce_with_logits",
    "triplet_margin_loss",
    "combined_triplet_loss",
    "pairwise_distance",
    "bilstm",
    "init_lstm_params",
    "binary_auroc",
    "binary_average_precision",
    "binary_mcc",
    "binary_precision",
    "binary_recall",
    "all_binary_metrics",
]
