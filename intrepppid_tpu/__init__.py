"""INTREPPPID-TPU: a TPU-native (JAX/XLA/Pallas) framework for cross-species
protein-protein interaction prediction with orthologue-aware quintuplet training.

A ground-up rebuild of the capabilities of Emad-COMBINE-lab/intrepppid
(PyTorch/Lightning) as an idiomatic JAX framework: pure init/apply models,
one jitted quintuplet train step, optax optimizers (including a from-scratch
Ranger21), orbax checkpoints, `jax.sharding.Mesh` data parallelism, and a
host-side data engine with a native C++ SentencePiece-compatible tokenizer.

Public API mirrors the reference's `intrepppid_network()` factory
(`/root/reference/intrepppid/__init__.py:23-88`).
"""
__version__ = "0.1.0"

from intrepppid_tpu.models.factory import intrepppid_network

__all__ = ["intrepppid_network", "__version__"]
