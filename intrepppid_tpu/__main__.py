"""CLI entry point (`intrepppid/__main__.py:22-37` equivalent):

    python -m intrepppid_tpu train e2e_rnn_triplet --ppi_dataset_path ...
    python -m intrepppid_tpu infer from_csv --interactions_path ...
"""
from __future__ import annotations


def main(argv=None):
    from intrepppid_tpu.cli.parser import dispatch
    from intrepppid_tpu.cli.train import Train
    from intrepppid_tpu.cli.infer import Infer
    from intrepppid_tpu.cli.evaluate import Eval
    from intrepppid_tpu.cli.serve import Serve
    from intrepppid_tpu.cli.data import Data
    from intrepppid_tpu.cli.export import Export
    from intrepppid_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    return dispatch(
        {
            "train": Train(),
            "infer": Infer(),
            "eval": Eval(),
            "serve": Serve(),
            "data": Data(),
            "export": Export(),
        },
        argv,
    )


if __name__ == "__main__":
    main()
