"""``data build`` / ``data inspect`` CLI: CSV+FASTA -> INTREPPPID HDF5
(added capability; the reference documents the schema at
`docs/data.rst:22-119` but ships no builder)."""
import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

FIXTURES = Path(__file__).parent / "fixtures"
AAS = "ARNDCQEGHILKMFPSTWYV"


@pytest.fixture(scope="module")
def fixtures():
    if not (FIXTURES / "learnable.h5").exists():
        subprocess.run(
            [sys.executable, str(FIXTURES / "make_fixtures.py")], check=True
        )
    return FIXTURES


def _write_inputs(tmp_path, n_prot=20, n_itx=30, with_split=False, seed=3):
    rng = np.random.default_rng(seed)
    prot_ids = [f"Q{i:04d}" for i in range(n_prot)]
    fasta = tmp_path / "seqs.fasta"
    with open(fasta, "w") as f:
        for p in prot_ids:
            seq = "".join(rng.choice(list(AAS), size=int(rng.integers(12, 40))))
            f.write(f">{p} some description\n{seq[:20]}\n{seq[20:]}\n")
    groups = [500 + g for g in range(5)]
    ortho = tmp_path / "orthologs.csv"
    with open(ortho, "w") as f:
        f.write("ortholog_group_id,protein_id\n")
        for g in groups:
            for m in rng.choice(prot_ids, size=3, replace=False):
                f.write(f"{g},{m}\n")
    itx = tmp_path / "interactions.csv"
    with open(itx, "w") as f:
        header = "protein_id1,protein_id2,omid_protein_id,omid_id,label"
        if with_split:
            header += ",split"
        f.write(header + "\n")
        for i in range(n_itx):
            p1, p2 = rng.choice(prot_ids, size=2, replace=False)
            anchor = prot_ids[int(rng.integers(n_prot))]
            g = int(rng.choice(groups))
            row = f"{p1},{p2},{anchor},{g},{int(rng.random() > 0.5)}"
            if with_split:
                row += "," + ("train" if i < 20 else "val" if i < 25 else "test")
            f.write(row + "\n")
    return fasta, itx, ortho


def test_build_inspect_and_trainable(fixtures, tmp_path):
    """Built file round-trips through the real DataModule and a short
    CLI train run — the dataset is train-ready, not just schema-shaped."""
    from intrepppid_tpu.cli.data import Data
    from intrepppid_tpu.cli.train import Train

    fasta, itx, ortho = _write_inputs(tmp_path, with_split=False)
    out = tmp_path / "built.h5"
    summary = Data.build(
        sequences_path=fasta,
        interactions_path=itx,
        out_path=out,
        orthologs_path=ortho,
        c_type=3,
        seed=11,
    )
    assert summary["n_sequences"] == 20
    assert summary["n_ortholog_groups"] == 5
    assert summary["splits"] == {"train": 24, "val": 3, "test": 3}

    info = Data.inspect(out)
    assert info["n_sequences"] == 20
    assert info["interactions"]["c3"]["c3_train"]["rows"] == 24
    assert 0.0 <= info["interactions"]["c3"]["c3_train"]["positive_frac"] <= 1.0

    trainer, metrics = Train.e2e_rnn_triplet(
        ppi_dataset_path=out,
        sentencepiece_path=fixtures / "tiny_spm.model",
        c_type=3, num_epochs=1, batch_size=4, seed=5, vocab_size=38,
        trunc_len=48, embedding_size=16, workers=0,
        log_path=tmp_path / "logs", optimizer_type="adamw", precision="fp32",
    )
    assert np.isfinite(metrics["test_loss"])


def test_build_split_column_and_determinism(tmp_path):
    from intrepppid_tpu.cli.data import Data

    fasta, itx, ortho = _write_inputs(tmp_path, with_split=True)
    out = tmp_path / "split.h5"
    summary = Data.build(
        sequences_path=fasta, interactions_path=itx, out_path=out,
        orthologs_path=ortho,
    )
    assert summary["splits"] == {"train": 20, "val": 5, "test": 5}

    # frac-split is seeded: same seed -> same assignment
    (tmp_path / "b").mkdir(exist_ok=True)
    fasta2, itx2, ortho2 = _write_inputs(tmp_path / "b", with_split=False)
    s1 = Data.build(
        sequences_path=fasta2, interactions_path=itx2,
        out_path=tmp_path / "a1.h5", orthologs_path=ortho2, seed=7,
    )
    s2 = Data.build(
        sequences_path=fasta2, interactions_path=itx2,
        out_path=tmp_path / "a2.h5", orthologs_path=ortho2, seed=7,
    )
    import h5py

    with h5py.File(tmp_path / "a1.h5") as f1, h5py.File(tmp_path / "a2.h5") as f2:
        for split in ("train", "val", "test"):
            np.testing.assert_array_equal(
                f1["interactions"]["c3"][f"c3_{split}"][:],
                f2["interactions"]["c3"][f"c3_{split}"][:],
            )
    assert s1["splits"] == s2["splits"]


def test_build_validation_errors(tmp_path):
    from intrepppid_tpu.cli.data import Data

    fasta, itx, ortho = _write_inputs(tmp_path)
    # unknown protein id in interactions
    bad = tmp_path / "bad.csv"
    bad.write_text(
        "protein_id1,protein_id2,omid_protein_id,omid_id,label\n"
        "NOPE,Q0001,Q0002,500,1\n"
    )
    with pytest.raises(ValueError, match="not in the FASTA"):
        Data.build(
            sequences_path=fasta, interactions_path=bad,
            out_path=tmp_path / "x.h5", orthologs_path=ortho,
        )
    # missing header column
    noheader = tmp_path / "nohdr.csv"
    noheader.write_text("a,b\n1,2\n")
    with pytest.raises(ValueError, match="header columns"):
        Data.build(
            sequences_path=fasta, interactions_path=noheader,
            out_path=tmp_path / "x.h5", orthologs_path=ortho,
        )
    # orthologs required unless explicitly waived
    with pytest.raises(ValueError, match="orthologue groups"):
        Data.build(
            sequences_path=fasta, interactions_path=itx,
            out_path=tmp_path / "x.h5",
        )
    s = Data.build(
        sequences_path=fasta, interactions_path=itx,
        out_path=tmp_path / "pairs_only.h5", allow_empty_orthologs=True,
    )
    assert s["n_ortholog_rows"] == 0


def test_data_cli_dispatch(tmp_path):
    from intrepppid_tpu.__main__ import main

    fasta, itx, ortho = _write_inputs(tmp_path)
    out = tmp_path / "cli.h5"
    main([
        "data", "build",
        "--sequences_path", str(fasta),
        "--interactions_path", str(itx),
        "--orthologs_path", str(ortho),
        "--out_path", str(out),
    ])
    assert out.exists()
    info = main(["data", "inspect", "--dataset_path", str(out)])
    assert info["n_sequences"] == 20