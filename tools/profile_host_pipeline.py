"""Profile the host side of the training input pipeline, stage by stage.

Epoch-level throughput is host-bound on this 1-core container (bench
epoch ~3050 vs ~4130 step-level seq-pairs/s), so this driver times every
host stage of a real train epoch over the bench dataset — no device work:

  gather   Python loop collecting the 5 sequences per row (orthologue
           draws, fallback logic)
  encode   the C++ batch tokenize (subword-regularised FFBS sampling)
  batch    slicing/bucketing/copies after tokenize
  wire     compress_batch_for_wire (what the dispatch
           thread pays before the runtime write)

Usage: python tools/profile_host_pipeline.py [n_batches]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

BATCH = 80
TRUNC = 1500


def main(n_batches: int = 40):
    repo = Path(__file__).parent.parent
    h5 = repo / ".bench_cache" / "bench.h5"
    spm = repo / "tests" / "fixtures" / "golden_spm.model"
    assert h5.exists() and spm.exists(), "run bench.py once first"

    import os

    from intrepppid_tpu.data.ppi_oma import IntrepppidDataModule
    from intrepppid_tpu.train.trainer import compress_batch_for_wire

    dm = IntrepppidDataModule(
        batch_size=BATCH, dataset_path=h5, c_type=3, trunc_len=TRUNC,
        workers=os.cpu_count() or 1, vocab_size=258, model_file=spm,
        seed=8675309, sos=False, eos=False, negative_omid=True,
    )
    dm.setup()
    ds = dm.dataset_train
    n = len(ds)
    order = np.arange(n)
    np.random.default_rng(0).shuffle(order)

    t_gather = t_encode = t_batch = t_wire = 0.0
    tok_chars = 0
    nb = 0
    for start in range(0, min(n, n_batches * BATCH), BATCH):
        idx = order[start : start + BATCH]
        t0 = time.perf_counter()
        groups = {k: [] for k in ("p1", "p2", "anchor", "positive", "negative")}
        fallback = []
        labels = np.zeros(len(idx), np.int32)
        for j, i in enumerate(idx):
            p1, p2, a, p, ng, lab = ds.get_sequences_for_item(int(i))
            labels[j] = int(lab)
            groups["p1"].append(p1)
            groups["p2"].append(p2)
            if a is None:
                fallback.append(j)
                groups["anchor"].append("")
                groups["positive"].append("")
            else:
                groups["anchor"].append(a)
                groups["positive"].append(p)
            groups["negative"].append(ng if ng is not None else "M")
        all_seqs = (
            groups["p1"] + groups["p2"] + groups["anchor"]
            + groups["positive"] + groups["negative"]
        )
        tok_chars += sum(min(len(s), TRUNC) for s in all_seqs)
        t1 = time.perf_counter()
        toks = dm.tokenizer.encode_batch_padded(
            all_seqs, trunc_len=TRUNC, enable_sampling=True,
            sos=False, eos=False, workers=dm.workers,
        )
        t2 = time.perf_counter()
        B = len(idx)
        longest = int(np.max(np.sum(toks != 0, axis=1))) if toks.size else 1
        tb = dm._bucket_len(max(longest, 1))
        toks = toks[:, :tb]
        batch = {
            "p1": toks[0:B], "p2": toks[B:2*B],
            "anchor": toks[2*B:3*B].copy(), "positive": toks[3*B:4*B].copy(),
            "label": labels, "negative": toks[4*B:5*B],
        }
        for j in fallback:
            batch["anchor"][j] = batch["p1"][j]
            batch["positive"][j] = batch["p1"][j]
        t3 = time.perf_counter()
        compress_batch_for_wire(batch, 258)
        t4 = time.perf_counter()
        t_gather += t1 - t0
        t_encode += t2 - t1
        t_batch += t3 - t2
        t_wire += t4 - t3
        nb += 1

    tot = t_gather + t_encode + t_batch + t_wire
    print(f"batches: {nb}  (B={BATCH}, {5*BATCH} encodes/batch)")
    for name, t in (
        ("gather", t_gather), ("encode", t_encode),
        ("batch", t_batch), ("wire", t_wire), ("TOTAL", tot),
    ):
        print(f"  {name:7s} {t/nb*1e3:7.2f} ms/batch  ({t/tot*100:5.1f}%)")
    print(f"  encode ns/char: {t_encode/max(tok_chars,1)*1e9:.1f}")
    print(f"  host-only ceiling: {BATCH*nb/tot:.0f} seq-pairs/s")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 40)
