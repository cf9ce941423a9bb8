"""End-to-end learnability: the full framework (data -> tokenise -> encoder
-> quintuplet losses -> optimizer -> metrics) must actually learn a
synthetic signal, not just run.

Dataset: proteins carry (or don't) the motif 'WWWWW'; a pair interacts iff
BOTH carry it; orthogroups are point mutations of a shared base, so the
orthologous-locality triplet task is learnable too. A 30-epoch tiny run on
CPU reaches test AUROC > 0.9 (measured 0.97) with triplet loss collapsing.

(The optimizer here is adamw — one of the reference's supported variants —
because Ranger21's AGC/stable-decay interaction is intentionally
conservative at toy gradient scales; see optim/ranger21.py docstring.)
"""
import subprocess
import sys
import tempfile
from pathlib import Path

import pytest

FIXTURES = Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def fixtures():
    if not (FIXTURES / "learnable.h5").exists():
        subprocess.run([sys.executable, str(FIXTURES / "make_fixtures.py")], check=True)
    return FIXTURES


def test_framework_learns_synthetic_signal(fixtures):
    from intrepppid_tpu.data.ppi_oma import IntrepppidDataModule
    from intrepppid_tpu.models.factory import intrepppid_network
    from intrepppid_tpu.train.trainer import Trainer
    from intrepppid_tpu.utils.dictlogger import DictLogger

    dm = IntrepppidDataModule(
        batch_size=16, dataset_path=fixtures / "learnable.h5", c_type=3,
        trunc_len=64, workers=0, vocab_size=38,
        model_file=fixtures / "tiny_spm.model",
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

    first_auroc = log.metrics["train_auroc"][0]["value"]
    last_auroc = log.metrics["train_auroc"][-1]["value"]
    assert last_auroc > 0.8, f"train AUROC failed to rise: {first_auroc} -> {last_auroc}"
    assert res["test_auroc"] > 0.85, f"test AUROC too low: {res['test_auroc']}"
    # the orthologue triplet task must also have been learned
    assert res["test_triplet_loss"] < 0.5, res["test_triplet_loss"]
