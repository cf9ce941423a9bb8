"""On-chip learnability probe: the strongest single correctness signal
real hardware can give — the full framework (tokenise -> Pallas encoder ->
quintuplet losses -> optimizer -> metrics) must LEARN the synthetic motif
signal on the device, not just run (mirrors
tests/test_learnability.py, which pins this on the CPU scan path; PARITY.md
records ~0.97 CPU / ~1.0 TPU-Pallas).

Prints one JSON line with train/test AUROC and pass/fail thresholds.
Usage: python tools/learnability_probe.py   (device chosen by the env)
"""
from __future__ import annotations

import json
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

FIXTURES = Path(__file__).parent.parent / "tests" / "fixtures"


def main():
    if not (FIXTURES / "learnable.h5").exists():
        subprocess.run(
            [sys.executable, str(FIXTURES / "make_fixtures.py")], check=True
        )

    from intrepppid_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    from intrepppid_tpu.data.ppi_oma import IntrepppidDataModule
    from intrepppid_tpu.models.factory import intrepppid_network
    from intrepppid_tpu.train.trainer import Trainer
    from intrepppid_tpu.utils.dictlogger import DictLogger

    dm = IntrepppidDataModule(
        batch_size=16, dataset_path=FIXTURES / "learnable.h5", c_type=3,
        trunc_len=64, workers=0, vocab_size=38,
        model_file=FIXTURES / "tiny_spm.model",
        seed=1, sos=False, eos=False, negative_omid=True,
    )
    dm.setup()
    net = intrepppid_network(
        steps_per_epoch=dm.steps_per_epoch, vocab_size=38, embedding_size=16,
        num_epochs=30, optimizer_type="adamw", lr=3e-3, beta_classifier=2,
    )
    log = DictLogger()
    trainer = Trainer(
        net, tempfile.mkdtemp(), "learnability", seed=0, loggers=[log], swa=None
    )
    trainer.fit(dm)
    res = trainer.test(dm)

    import jax

    out = {
        "platform": jax.devices()[0].platform,
        "train_auroc_first": log.metrics["train_auroc"][0]["value"],
        "train_auroc_last": log.metrics["train_auroc"][-1]["value"],
        "test_auroc": res["test_auroc"],
        "test_triplet_loss": res["test_triplet_loss"],
    }
    out["ok"] = bool(
        out["train_auroc_last"] > 0.8
        and out["test_auroc"] > 0.85
        and out["test_triplet_loss"] < 0.5
    )
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
