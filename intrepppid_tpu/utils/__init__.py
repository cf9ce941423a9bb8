"""Utilities: loggers, run naming. (Export parity with
`intrepppid/utils/__init__.py:17-19` — the WeightDrop / embedding-dropout
ops live in intrepppid_tpu.ops.dropout as pure functions.)"""
from intrepppid_tpu.ops.dropout import (
    dropconnect_weight,
    embedding_dropout,
    variational_weight,
)
from intrepppid_tpu.utils.dictlogger import DictLogger
from intrepppid_tpu.utils.jax_cache import enable_compilation_cache
from intrepppid_tpu.utils.run_name import generate_passphrase, generate_run_name

__all__ = [
    "DictLogger",
    "enable_compilation_cache",
    "generate_passphrase",
    "generate_run_name",
    "embedding_dropout",
    "dropconnect_weight",
    "variational_weight",
]
