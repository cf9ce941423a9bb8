"""tools/parity.py: the accuracy-parity harness (VERDICT r1 missing #4)."""
import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent
FIXTURES = Path(__file__).parent / "fixtures"

sys.path.insert(0, str(REPO / "tools"))


def _metrics(val_auroc, test_auroc, val_loss, as_reference=False):
    m = {
        "val_auroc": [{"value": v, "step": i} for i, v in enumerate(val_auroc)],
        "val_ap": [{"value": v - 0.01, "step": i} for i, v in enumerate(val_auroc)],
        "val_mcc": [{"value": 0.5, "step": 0}],
        "val_precision": [{"value": 0.7, "step": 0}],
        "val_rec": [{"value": 0.7, "step": 0}],
        "val_loss": [{"value": v, "step": i} for i, v in enumerate(val_loss)],
        "train_loss": [{"value": v + 0.1, "step": i} for i, v in enumerate(val_loss)],
    }
    if as_reference:
        # torch reference logs test metrics as ordinary series
        m["test_auroc"] = [{"value": test_auroc, "step": 99}]
        m["test_ap"] = [{"value": test_auroc - 0.01, "step": 99}]
    else:
        # ours stores them under test_results
        m["test_results"] = [
            {"test_auroc": test_auroc, "test_ap": test_auroc - 0.01}
        ]
    return m


def test_compare_within_budget(tmp_path):
    import parity

    ours = tmp_path / "ours.json"
    ref = tmp_path / "ref.json"
    ours.write_text(json.dumps(_metrics([0.80, 0.88], 0.892, [0.6, 0.5])))
    ref.write_text(
        json.dumps(_metrics([0.81, 0.877], 0.890, [0.61, 0.51], as_reference=True))
    )
    rc = parity.main(
        ["compare", "--ours", str(ours), "--reference", str(ref),
         "--auroc_budget", "0.005"]
    )
    assert rc == 0


def test_compare_flags_auroc_violation(tmp_path, capsys):
    import parity

    ours = tmp_path / "ours.json"
    ref = tmp_path / "ref.json"
    ours.write_text(json.dumps(_metrics([0.80], 0.85, [0.6])))
    ref.write_text(json.dumps(_metrics([0.88], 0.89, [0.6], as_reference=True)))
    rc = parity.main(
        ["compare", "--ours", str(ours), "--reference", str(ref)]
    )
    assert rc == 1
    out = capsys.readouterr().out
    assert "PARITY FAIL" in out and "val_auroc" in out


def test_run_emits_metrics(tmp_path):
    """End-to-end `parity.py run` on the tiny fixtures (downscaled config)."""
    if not (FIXTURES / "tiny.h5").exists():
        subprocess.run(
            [sys.executable, str(FIXTURES / "make_fixtures.py")], check=True
        )
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "tools" / "parity.py"), "run",
            "--ppi_dataset_path", str(FIXTURES / "tiny.h5"),
            "--sentencepiece_path", str(FIXTURES / "tiny_spm.model"),
            "--out", str(tmp_path / "m.json"),
            "--num_epochs", "1", "--batch_size", "8", "--vocab_size", "38",
            "--trunc_len", "32", "--workers", "0",
            "--log_path", str(tmp_path / "logs"),
        ],
        capture_output=True,
        text=True,
        timeout=900,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    m = json.loads((tmp_path / "m.json").read_text())
    assert "val_auroc" in m and "test_results" in m
