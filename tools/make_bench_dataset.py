"""Generate the benchmark HDF5: realistic protein lengths at manuscript scale.

~2000 proteins with a lognormal length distribution (median ~375 aa, the
UniProt-like shape, clipped to [50, 2500]), 200 orthogroups of point-mutated
members, 10k train / 400 val / 400 test c3 interactions — the schema of
`reference docs/data.rst:22-119` at a size that gives a meaningful epoch
(125 batch-80 steps). Tokenized with tests/fixtures/golden_spm.model (the
HF-trained 258-piece unigram vocab).

Usage: python tools/make_bench_dataset.py [out.h5]
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

AAS = "ACDEFGHIKLMNPQRSTVWY"
AA_P = np.array(
    [8.3, 1.4, 5.5, 6.7, 3.9, 7.1, 2.3, 5.9, 5.8, 9.7,
     2.4, 4.1, 4.7, 3.9, 5.5, 6.6, 5.4, 6.9, 1.1, 2.9]
)
AA_P = AA_P / AA_P.sum()


def sample_length(rng) -> int:
    # lognormal: median exp(mu)=375, sigma 0.55 -> 16/84 pct ~ [216, 650]
    return int(np.clip(rng.lognormal(np.log(375.0), 0.55), 50, 2500))


def make_bench_h5(path: Path, n_train=10_000, n_val=400, n_test=400,
                  n_groups=200, members_per_group=4, seed=20260816) -> None:
    import h5py

    rng = np.random.default_rng(seed)
    group_ids = [3000 + g for g in range(n_groups)]
    prot_ids, seqs, orthologs = [], {}, []
    for gi, g in enumerate(group_ids):
        L = sample_length(rng)
        base = rng.choice(list(AAS), size=L, p=AA_P)
        for m in range(members_per_group):
            pid = f"B{gi:04d}M{m}"
            seq = base.copy()
            for _ in range(max(1, L // 20)):  # ~5% point mutations
                seq[int(rng.integers(0, L))] = rng.choice(list(AAS), p=AA_P)
            prot_ids.append(pid)
            seqs[pid] = "".join(seq)
            orthologs.append((g, pid))

    def interactions(n):
        rows = []
        p_arr = np.array(prot_ids)
        for _ in range(n):
            p1, p2 = rng.choice(p_arr, size=2, replace=False)
            gidx = int(rng.integers(0, n_groups))
            anchor = f"B{gidx:04d}M{int(rng.integers(0, members_per_group))}"
            rows.append((str(p1), str(p2), anchor, group_ids[gidx],
                         bool(rng.random() > 0.5)))
        return rows

    itx_dtype = np.dtype(
        [
            ("protein_id1", "S16"),
            ("protein_id2", "S16"),
            ("omid_protein_id", "S16"),
            ("omid_id", np.int64),
            ("label", np.bool_),
        ]
    )
    seq_dtype = np.dtype([("name", "S16"), ("sequence", "S2600")])
    ortho_dtype = np.dtype([("ortholog_group_id", np.int64), ("protein_id", "S16")])

    path.parent.mkdir(parents=True, exist_ok=True)
    with h5py.File(path, "w") as f:
        f.create_dataset(
            "sequences",
            data=np.array(
                [(p.encode(), seqs[p].encode()) for p in prot_ids], dtype=seq_dtype
            ),
        )
        f.create_dataset(
            "orthologs",
            data=np.array([(g, m.encode()) for g, m in orthologs], dtype=ortho_dtype),
        )
        grp = f.create_group("interactions").create_group("c3")
        for split, n in (("train", n_train), ("val", n_val), ("test", n_test)):
            rows = interactions(n)
            grp.create_dataset(
                f"c3_{split}",
                data=np.array(
                    [
                        (p1.encode(), p2.encode(), a.encode(), g, l)
                        for p1, p2, a, g, l in rows
                    ],
                    dtype=itx_dtype,
                ),
            )
    lens = np.array([len(s) for s in seqs.values()])
    print(
        f"wrote {path}: {len(prot_ids)} proteins "
        f"(len median {np.median(lens):.0f}, p90 {np.percentile(lens, 90):.0f}), "
        f"{n_train}/{n_val}/{n_test} interactions"
    )


if __name__ == "__main__":
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / ".bench_cache" / "bench.h5"
    make_bench_h5(out)
