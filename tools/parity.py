"""Accuracy-parity harness: run the manuscript config and diff against a
reference torch run (VERDICT r1 missing #4; BASELINE.json protocol).

Two subcommands:

``run`` — train this framework with the manuscript configuration
(`reference README.md:41`, `docs/cli.rst:13-118`: c_type 3, batch 80,
vocab 250, trunc_len 1500, embedding 64, 2-layer bi-LSTM, dropouts 0.3,
bi_reduce last, beta_classifier 2, lr 1e-2, ranger21_xx) on a given
INTREPPPID HDF5 + spm model, and write the run's ``metrics.json``:

    python tools/parity.py run --ppi_dataset_path intrepppid.h5 \
        --sentencepiece_path spm.model --num_epochs 100 --seed 8675309 \
        --out ours_metrics.json

``compare`` — diff two ``metrics.json`` files (ours vs the torch
reference's — both use the same DictLogger schema:
``{key: [{"value": v, "step"|"epoch": s}, ...]}``) and pass/fail against
the AUROC budget:

    python tools/parity.py compare --ours ours_metrics.json \
        --reference ref_metrics.json --auroc_budget 0.005

Exit code 0 = within budget on every compared metric, 1 = any violation.

Producing the reference file (on a CUDA box with the torch reference
installed — `reference docs/install.rst`):

    intrepppid train e2e_rnn_triplet INTREPPPID.h5 spm.model 3 100 80 \
        --seed 8675309 --log_path ./logs ...
    # then: logs/<run_name>/metrics.json  (written at
    # intrepppid/e2e/e2e_triplet.py:428-431)
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

# metrics compared, with per-metric tolerance factories (AUROC budget b ->
# AP gets the same b, losses get a looser relative band: the paper's parity
# claim is AUROC-denominated)
FINAL_METRICS = ("auroc", "ap", "mcc", "precision", "rec")


def _series(metrics: dict, key: str):
    """[(step, value)] for a DictLogger-style entry list; tolerant of both
    'step' and 'epoch' index fields and of bare float lists."""
    entries = metrics.get(key)
    if not entries:
        return []
    out = []
    for i, e in enumerate(entries):
        if isinstance(e, dict):
            out.append((e.get("step", e.get("epoch", i)), float(e["value"])))
        else:
            out.append((i, float(e)))
    return out


def _final(metrics: dict, key: str):
    s = _series(metrics, key)
    return s[-1][1] if s else None


def _test_value(metrics: dict, key: str):
    """Test metrics: ours live under metrics['test_results'][0][f'test_{k}'];
    the reference logs them as ordinary 'test_{k}' series."""
    v = _final(metrics, key)
    if v is not None:
        return v
    tr = metrics.get("test_results")
    if isinstance(tr, list) and tr and isinstance(tr[0], dict):
        val = tr[0].get(key)
        return float(val) if val is not None else None
    return None


def compare(ours_path: Path, ref_path: Path, auroc_budget: float,
            loss_rel_budget: float) -> int:
    ours = json.loads(Path(ours_path).read_text())
    ref = json.loads(Path(ref_path).read_text())
    failures = []
    rows = []

    for stage in ("val", "test"):
        for m in FINAL_METRICS:
            key = f"{stage}_{m}"
            a = _test_value(ours, key) if stage == "test" else _final(ours, key)
            b = _test_value(ref, key) if stage == "test" else _final(ref, key)
            if a is None or b is None:
                rows.append((key, a, b, None, "skipped (missing)"))
                continue
            diff = abs(a - b)
            budget = auroc_budget if m in ("auroc", "ap") else None
            status = "ok"
            if budget is not None and diff > budget:
                status = f"FAIL (> {budget})"
                failures.append(key)
            rows.append((key, a, b, diff, status))

        key = f"{stage}_loss"
        a, b = _final(ours, key), _final(ref, key)
        if a is not None and b is not None:
            rel = abs(a - b) / max(abs(b), 1e-9)
            status = "ok" if rel <= loss_rel_budget else f"FAIL (> {loss_rel_budget:.0%} rel)"
            if rel > loss_rel_budget:
                failures.append(key)
            rows.append((key, a, b, rel, status))

    # curve deviation (informational): max |Δ| over aligned epochs
    for key in ("val_auroc", "val_loss", "train_loss"):
        sa, sb = _series(ours, key), _series(ref, key)
        n = min(len(sa), len(sb))
        if n:
            dev = max(abs(sa[i][1] - sb[i][1]) for i in range(n))
            rows.append((f"{key} curve (n={n})", None, None, dev, "info"))

    w = max(len(r[0]) for r in rows) + 2
    print(f"{'metric':<{w}}{'ours':>12}{'reference':>12}{'diff':>12}  status")
    for key, a, b, d, status in rows:
        fa = f"{a:.6f}" if a is not None else "-"
        fb = f"{b:.6f}" if b is not None else "-"
        fd = f"{d:.6f}" if d is not None else "-"
        print(f"{key:<{w}}{fa:>12}{fb:>12}{fd:>12}  {status}")

    if failures:
        print(f"\nPARITY FAIL: {', '.join(failures)}")
        return 1
    print(f"\nPARITY OK (AUROC/AP budget {auroc_budget})")
    return 0


def run(args) -> int:
    sys.path.insert(0, str(Path(__file__).parent.parent))
    from intrepppid_tpu.cli.train import Train

    trainer, test_results = Train.e2e_rnn_triplet(
        ppi_dataset_path=args.ppi_dataset_path,
        sentencepiece_path=args.sentencepiece_path,
        c_type=args.c_type,
        num_epochs=args.num_epochs,
        batch_size=args.batch_size,
        seed=args.seed,
        vocab_size=args.vocab_size,
        trunc_len=args.trunc_len,
        embedding_size=args.embedding_size,
        beta_classifier=args.beta_classifier,
        lr=args.lr,
        workers=args.workers,
        log_path=args.log_path,
        optimizer_type=args.optimizer_type,
        precision=args.precision,
    )
    runs = sorted(
        (d for d in Path(args.log_path).iterdir()
         if d.is_dir() and d.name != "tensorboard"),
        key=lambda d: d.stat().st_mtime,
    )
    src = runs[-1] / "metrics.json"
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(src.read_text())
    print(f"metrics written to {out} (from {src})")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run", help="train the manuscript config, emit metrics.json")
    pr.add_argument("--ppi_dataset_path", required=True, type=Path)
    pr.add_argument("--sentencepiece_path", required=True, type=Path)
    pr.add_argument("--out", required=True, type=Path)
    pr.add_argument("--c_type", type=int, default=3)
    pr.add_argument("--num_epochs", type=int, default=100)
    pr.add_argument("--batch_size", type=int, default=80)
    pr.add_argument("--seed", type=int, default=8675309)
    pr.add_argument("--vocab_size", type=int, default=250)
    pr.add_argument("--trunc_len", type=int, default=1500)
    pr.add_argument("--workers", type=int, default=4)
    pr.add_argument("--log_path", type=Path, default=Path("./parity_logs"))
    # shape/optimizer overrides so the harness can also drive the
    # synthetic CPU-scale execution (tools/run_parity_synth.py); the
    # defaults remain the manuscript configuration
    pr.add_argument("--embedding_size", type=int, default=64)
    pr.add_argument("--beta_classifier", type=float, default=4.0)
    pr.add_argument(
        "--lr", default=1e-2,
        type=lambda v: v if v == "auto" else float(v),
    )
    pr.add_argument("--optimizer_type", default="ranger21_xx")
    pr.add_argument("--precision", default="bf16")

    pc = sub.add_parser("compare", help="diff two metrics.json, pass/fail vs budget")
    pc.add_argument("--ours", required=True, type=Path)
    pc.add_argument("--reference", required=True, type=Path)
    pc.add_argument("--auroc_budget", type=float, default=0.005)
    pc.add_argument("--loss_rel_budget", type=float, default=0.05)

    args = p.parse_args(argv)
    if args.cmd == "run":
        return run(args)
    return compare(args.ours, args.reference, args.auroc_budget,
                   args.loss_rel_budget)


if __name__ == "__main__":
    raise SystemExit(main())
