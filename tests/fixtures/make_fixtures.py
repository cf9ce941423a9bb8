"""Generate tiny test fixtures: a SentencePiece-format unigram model and an
INTREPPPID-format HDF5 dataset (schema: reference `docs/data.rst:22-119`).

Run: python tests/fixtures/make_fixtures.py
Idempotent; writes into this directory.
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

HERE = Path(__file__).parent
sys.path.insert(0, str(HERE.parent.parent))

from intrepppid_tpu.data.spm.proto import (
    CONTROL,
    NORMAL,
    UNKNOWN,
    NormalizerSpec,
    SentencePieceEntry,
    SpmModel,
    save_model,
)

AAS = "ARNDCQEGHILKMFPSTWYV"


def toy_protein_model() -> SpmModel:
    """A small unigram LM over amino acids: 20 singles + common k-mers."""
    rng = np.random.default_rng(42)
    pieces = [
        SentencePieceEntry("<unk>", 0.0, UNKNOWN),
        SentencePieceEntry("<s>", 0.0, CONTROL),
        SentencePieceEntry("</s>", 0.0, CONTROL),
    ]
    for aa in AAS:
        pieces.append(SentencePieceEntry(aa, float(-3.0 - rng.random()), NORMAL))
    kmers = [
        "MK", "KL", "LL", "AA", "AL", "LA", "GG", "VL", "SS", "EE",
        "AAA", "LLL", "MKL", "GGS", "KKE",
    ]
    for km in kmers:
        pieces.append(SentencePieceEntry(km, float(-4.0 - 2 * rng.random()), NORMAL))
    return SpmModel(
        pieces=pieces,
        unk_id=0,
        bos_id=1,
        eos_id=2,
        pad_id=-1,
        normalizer=NormalizerSpec(name="identity", add_dummy_prefix=False),
    )


def random_protein(rng, lo=10, hi=60) -> str:
    n = int(rng.integers(lo, hi))
    return "".join(rng.choice(list(AAS), size=n))


def make_h5(path: Path, n_train=24, n_val=8, n_test=8, seed=7) -> None:
    import h5py

    rng = np.random.default_rng(seed)
    n_prot = 30
    prot_ids = [f"P{i:05d}" for i in range(n_prot)]
    seqs = {p: random_protein(rng) for p in prot_ids}

    # orthogroups: group ids 1000..1009, ~3 members each
    n_groups = 10
    group_ids = [1000 + g for g in range(n_groups)]
    orthologs = []
    for g in group_ids:
        members = rng.choice(prot_ids, size=3, replace=False)
        for m in members:
            orthologs.append((g, m))
    # one group member missing from sequences to exercise fallbacks
    orthologs.append((group_ids[0], "MISSING1"))

    def interactions(n):
        rows = []
        for _ in range(n):
            p1, p2 = rng.choice(prot_ids, size=2, replace=False)
            g = int(rng.choice(group_ids))
            anchor = orthologs[
                int(rng.integers(0, len(orthologs) - 1))
            ][1]
            rows.append((p1, p2, anchor, g, bool(rng.random() > 0.5)))
        return rows

    str_dt = h5py.string_dtype("utf-8")
    itx_dtype = np.dtype(
        [
            ("protein_id1", "S16"),
            ("protein_id2", "S16"),
            ("omid_protein_id", "S16"),
            ("omid_id", np.int64),
            ("label", np.bool_),
        ]
    )
    seq_dtype = np.dtype([("name", "S16"), ("sequence", "S2000")])
    ortho_dtype = np.dtype([("ortholog_group_id", np.int64), ("protein_id", "S16")])

    with h5py.File(path, "w") as f:
        seq_arr = np.array(
            [(p.encode(), seqs[p].encode()) for p in prot_ids], dtype=seq_dtype
        )
        f.create_dataset("sequences", data=seq_arr)
        ortho_arr = np.array(
            [(g, m.encode()) for g, m in orthologs], dtype=ortho_dtype
        )
        f.create_dataset("orthologs", data=ortho_arr)
        grp = f.create_group("interactions").create_group("c3")
        for split, n in (("train", n_train), ("val", n_val), ("test", n_test)):
            rows = interactions(n)
            arr = np.array(
                [
                    (p1.encode(), p2.encode(), a.encode(), g, l)
                    for p1, p2, a, g, l in rows
                ],
                dtype=itx_dtype,
            )
            grp.create_dataset(f"c3_{split}", data=arr)
        # splits group mirroring the documented layout
        sgrp = f.create_group("splits")
        n3 = n_prot // 3
        sgrp.create_dataset("train", data=np.array([p.encode() for p in prot_ids[:n3]]))
        sgrp.create_dataset("val", data=np.array([p.encode() for p in prot_ids[n3 : 2 * n3]]))
        sgrp.create_dataset("test", data=np.array([p.encode() for p in prot_ids[2 * n3 :]]))


def make_learnable_h5(path: Path, n_train=160, n_val=48, n_test=48, seed=11) -> None:
    """A dataset with real signal: proteins either carry the motif 'WWWWW'
    or not, and a pair interacts iff BOTH carry it. Orthogroups are point
    mutations of a shared base sequence, so the orthologue triplet task is
    learnable too."""
    import h5py

    rng = np.random.default_rng(seed)
    n_groups = 12
    group_ids = [2000 + g for g in range(n_groups)]
    prot_ids, seqs, has_motif = [], {}, {}
    orthologs = []
    for gi, g in enumerate(group_ids):
        base = random_protein(rng, 25, 40)
        motif_group = gi % 2 == 0
        for m in range(4):
            pid = f"G{gi:02d}M{m}"
            seq = list(base)
            for _ in range(3):  # point mutations
                pos = int(rng.integers(0, len(seq)))
                seq[pos] = str(rng.choice(list(AAS)))
            seq = "".join(seq)
            if motif_group:
                ins = int(rng.integers(0, len(seq)))
                seq = seq[:ins] + "WWWWW" + seq[ins:]
            prot_ids.append(pid)
            seqs[pid] = seq
            has_motif[pid] = motif_group
            orthologs.append((g, pid))

    def interactions(n):
        rows = []
        for _ in range(n):
            p1, p2 = rng.choice(prot_ids, size=2, replace=False)
            label = has_motif[p1] and has_motif[p2]
            gidx = int(rng.integers(0, n_groups))
            anchor = f"G{gidx:02d}M{int(rng.integers(0, 4))}"
            rows.append((p1, p2, anchor, group_ids[gidx], bool(label)))
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
    seq_dtype = np.dtype([("name", "S16"), ("sequence", "S2000")])
    ortho_dtype = np.dtype([("ortholog_group_id", np.int64), ("protein_id", "S16")])

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


def main():
    save_model(toy_protein_model(), HERE / "tiny_spm.model")
    make_h5(HERE / "tiny.h5")
    make_learnable_h5(HERE / "learnable.h5")
    print("fixtures written to", HERE)


if __name__ == "__main__":
    main()
