"""Data layer: tokenizer, HDF5 quintuplet datasets, legacy variants, pipeline.

Export parity with `intrepppid/data/__init__.py:17-18`
(OmaTripletDataModule, RapppidDataModule2) plus the primary
IntrepppidDataset/DataModule.
"""
from intrepppid_tpu.data.oma import OmaTripletDataModule, OmaTripletDataset
from intrepppid_tpu.data.pipeline import prefetch_to_device
from intrepppid_tpu.data.ppi import RapppidDataModule2, RapppidDataset2
from intrepppid_tpu.data.ppi_oma import IntrepppidDataModule, IntrepppidDataset
from intrepppid_tpu.data.tokenizer import (
    SentencePieceTokenizer,
    set_random_generator_seed,
)

__all__ = [
    "IntrepppidDataModule",
    "IntrepppidDataset",
    "OmaTripletDataModule",
    "OmaTripletDataset",
    "RapppidDataModule2",
    "RapppidDataset2",
    "SentencePieceTokenizer",
    "set_random_generator_seed",
    "prefetch_to_device",
]
