"""Inference CLI (`intrepppid/cli/infer.py:89-232`).

``infer from_csv``: score a CSV of interaction-id pairs against a FASTA of
sequences. Feature parity with the reference:

* in-memory or low-memory sequence library; low-memory mode uses LMDB when
  the ``lmdb`` package is present, else a built-in sqlite3 key-value store
  (same on-disk workflow, zero extra dependencies),
* optional live UniProt REST fallback with a 1 s rate limit and a
  deleted-accession memo (`cli/infer.py:36,58-86`),
* gzip support for both CSV and FASTA, identical output CSV
  (``itx_id,probability``).

Improvements over the reference:

* **batched inference** (the reference runs batch-of-1 with an acknowledged
  TODO, `cli/infer.py:216-217`): rows are grouped into ``--batch_size``
  batches, length-bucketed, and run through one jitted forward —
  K consecutive same-shape batches stack into ONE dispatch (a scanned
  executable, like the Trainer/eval ``steps_per_dispatch`` path; each
  runtime dispatch costs ~45 ms on tunnelled TPU platforms), sigmoid runs
  in-graph, the tail batch pads to the fixed batch shape (a fresh tail
  shape would compile a whole new executable — minutes on a remote-compile
  platform), and result materialization trails one dispatch behind so CSV
  writing overlaps device compute,
* deterministic tokenisation by default (the reference leaves subword
  *sampling* on at inference, Appendix A #11 — opt back in with
  ``--sampling true``),
* weights can be an orbax checkpoint dir (this framework) or a reference
  PyTorch ``.ckpt`` (auto-converted).
"""
from __future__ import annotations

import csv
import gzip
import json
import shutil
import sqlite3
import tempfile
import time
from pathlib import Path
from typing import Iterator, Optional, Tuple

import numpy as np


def stream_fasta(fasta_path) -> Iterator[Tuple[str, str]]:
    opener = gzip.open if str(fasta_path).endswith(".gz") else open
    with opener(str(fasta_path), "rt") as f:
        name, sequence = None, None
        for line in f:
            line = line.strip()
            if line.startswith(">"):
                if sequence:
                    yield name, sequence
                name = line[1:]
                sequence = ""
            elif sequence is not None:
                sequence += line
        if sequence:
            yield name, sequence


class _UniprotFetcher:
    def __init__(self):
        self.deleted = set()

    def get(self, uniprot_ac: str) -> Optional[str]:
        if uniprot_ac in self.deleted:
            print(
                f'Failed to get sequence for "{uniprot_ac}" from UniProt '
                "(it was likely deleted)"
            )
            return None
        import requests

        time.sleep(1)
        r = requests.get(f"https://rest.uniprot.org/uniprotkb/{uniprot_ac}.fasta")
        if r.status_code == 200:
            seq = "".join(
                line.strip() for line in r.text.split("\n")[1:]
            )
            if not seq:
                self.deleted.add(uniprot_ac)
                return None
            print(f'Found sequence for "{uniprot_ac}" via UniProt')
            return seq
        print(f'Failed to get sequence for "{uniprot_ac}" from UniProt')
        return None


class _KVStore:
    """Key-value token cache: LMDB when available, sqlite3 otherwise."""

    def __init__(self, db_path):
        try:
            import lmdb

            self._env = lmdb.open(str(db_path))
            self._env.set_mapsize(1024**4)
            self._sqlite = None
        except ImportError:
            Path(db_path).mkdir(parents=True, exist_ok=True)
            self._env = None
            self._sqlite = sqlite3.connect(str(Path(db_path) / "seqs.sqlite3"))
            self._sqlite.execute(
                "CREATE TABLE IF NOT EXISTS kv (k TEXT PRIMARY KEY, v TEXT)"
            )

    def put(self, key: str, value: str) -> None:
        if self._env is not None:
            with self._env.begin(write=True) as txn:
                txn.put(key.encode(), value.encode())
        else:
            self._sqlite.execute(
                "INSERT OR REPLACE INTO kv VALUES (?, ?)", (key, value)
            )
            self._sqlite.commit()

    def get(self, key: str) -> Optional[str]:
        if self._env is not None:
            with self._env.begin() as txn:
                v = txn.get(key.encode())
            return v.decode() if v is not None else None
        row = self._sqlite.execute(
            "SELECT v FROM kv WHERE k = ?", (key,)
        ).fetchone()
        return row[0] if row else None

    def close(self) -> None:
        if self._env is not None:
            self._env.close()
        if self._sqlite is not None:
            self._sqlite.close()


def _load_params(weights_path, net):
    """Orbax checkpoint dir, or reference torch .ckpt (auto-converted).

    The torch conversion walks ``rnn_num_layers`` LSTM key groups, so it
    must use the network's configured depth — defaulting it would silently
    truncate a 3-layer checkpoint to 2 layers (the params list IS the
    layer loop in ``ops/lstm.bilstm``)."""
    weights_path = Path(weights_path)
    if weights_path.is_dir():
        from intrepppid_tpu.train.checkpoint import load_params_from_checkpoint

        return load_params_from_checkpoint(weights_path)
    from intrepppid_tpu.utils.torch_convert import load_torch_checkpoint

    return load_torch_checkpoint(
        weights_path, rnn_num_layers=net.cfg.encoder.rnn_num_layers
    )


class Infer:
    @staticmethod
    def from_csv(
        interactions_path: Path,
        sequences_path: Path,
        weights_path: Path,
        spm_path: Path,
        out_path: Path,
        trunc_len: int = 1500,
        low_memory: bool = False,
        db_path: Optional[Path] = None,
        dont_populate_db: bool = False,
        get_from_uniprot: bool = False,
        batch_size: int = 64,
        sampling: bool = False,
        vocab_size: int = 250,
        embedding_size: int = 64,
        rnn_num_layers: int = 2,
        bi_reduce: str = "last",
        steps_per_dispatch: Optional[int] = None,
        n_data_parallel: int = 1,
    ):
        """Score protein pairs from a CSV (columns itx_id,id_a,id_b) using a
        FASTA sequence library; writes itx_id,probability CSV.

        ``--n_data_parallel N`` shards every dispatch's batch rows over an
        N-device ``(data,)`` mesh (the pair forward has no cross-row terms,
        so the partitioned program needs no collectives); ``batch_size``
        rounds up to a device multiple."""
        import jax
        import jax.numpy as jnp

        from intrepppid_tpu.data.ppi_oma import IntrepppidDataset
        from intrepppid_tpu.data.tokenizer import SentencePieceTokenizer
        from intrepppid_tpu.models.factory import intrepppid_network

        spp = SentencePieceTokenizer(spm_path)
        spp.validate_vocab_size(vocab_size)

        # data-parallel scoring: dispatch rows shard over a (data,) mesh.
        # batch_size rounds UP to a device multiple so every fixed-shape
        # (repeat-padded) batch splits evenly across the shards.
        n_dp = int(n_data_parallel)
        _wire_sharding = _stacked_sharding = None
        if n_dp > 1:
            from intrepppid_tpu.parallel import (
                batch_sharding,
                make_mesh,
                stacked_batch_sharding,
            )

            if n_dp > len(jax.devices()):
                raise ValueError(
                    f"n_data_parallel={n_dp} exceeds the "
                    f"{len(jax.devices())} addressable devices"
                )
            mesh = make_mesh(n_data=n_dp, n_model=1)
            _wire_sharding = batch_sharding(mesh)
            _stacked_sharding = stacked_batch_sharding(mesh)
            batch_size = -(-int(batch_size) // n_dp) * n_dp

        def encode(seq: str) -> list:
            return IntrepppidDataset.static_encode(
                trunc_len, spp, seq, sampling=sampling
            ).tolist()

        def encode_stream(named_iter):
            """Tokenise a (name, seq) stream in CHUNK-sized batches through
            the native engine (GIL-released C++ threads; exactly
            ``static_encode``'s deterministic semantics) — the sequence-
            library build is the host-bound phase at proteome scale. Falls
            back to per-sequence ``encode`` when subword sampling is opted
            in (``--sampling true``): the batch path draws per-sequence RNG
            streams, not the per-call stream."""
            if sampling or not spp.uses_native:
                for name, seq in named_iter:
                    yield name, encode(seq)
                return
            import os as _os

            w = _os.cpu_count() or 1
            names, seqs = [], []

            def flush():
                rows = spp.encode_batch_padded(seqs, trunc_len, workers=w)
                yield from zip(names, (r.tolist() for r in rows))

            CHUNK = 1024
            for name, seq in named_iter:
                names.append(name)
                seqs.append(seq)
                if len(names) >= CHUNK:
                    yield from flush()
                    names, seqs = [], []
            if names:
                yield from flush()

        uniprot = _UniprotFetcher() if get_from_uniprot else None

        # ------------------------------------------------ sequence library
        auto_db = False
        store = None
        if low_memory:
            if db_path is None:
                db_path = tempfile.mkdtemp(prefix="intrepppid_")
                auto_db = True
            store = _KVStore(db_path)
            if not dont_populate_db:
                print("Building sequence db...")
                for name, toks in encode_stream(stream_fasta(sequences_path)):
                    store.put(name, json.dumps(toks))

            def get_embed(name: str) -> Optional[np.ndarray]:
                v = store.get(name)
                if v is not None:
                    return np.array(json.loads(v), np.int32)
                if uniprot is not None:
                    seq = uniprot.get(name)
                    if seq is not None:
                        toks = encode(seq)
                        store.put(name, json.dumps(toks))
                        return np.array(toks, np.int32)
                return None

        else:
            embeddings = {}
            for name, toks in encode_stream(stream_fasta(sequences_path)):
                embeddings[name] = np.array(toks, np.int32)

            def get_embed(name: str) -> Optional[np.ndarray]:
                if name in embeddings:
                    return embeddings[name]
                if uniprot is not None:
                    seq = uniprot.get(name)
                    if seq is not None:
                        embeddings[name] = np.array(encode(seq), np.int32)
                        return embeddings[name]
                return None

        # ---------------------------------------------------------- model
        # The reference always builds the net with use_projection=True at
        # inference (`cli/infer.py:170`, Appendix A #10).
        net = intrepppid_network(
            0,
            vocab_size=vocab_size,
            embedding_size=embedding_size,
            rnn_num_layers=rnn_num_layers,
            bi_reduce=bi_reduce,
            use_projection=True,
        )
        params = _load_params(weights_path, net)

        # tokens cross the host->device wire in the bit-plane format (the
        # tunnel moves ~30 MB/s, so wire bytes are wall time at proteome
        # scale); widened in-graph, bit-exact. Sigmoid also runs in-graph
        # so scoring a batch is ONE device dispatch end-to-end.
        from intrepppid_tpu.train.trainer import (
            compress_batch_for_wire,
            group_dispatch_batches,
            resolve_steps_per_dispatch,
            widen_batch,
        )

        def _probs_wire(wire):
            b = widen_batch(wire)
            return jax.nn.sigmoid(
                net.forward(params, b["p1"], b["p2"], train=False)
            )

        probs_one = jax.jit(_probs_wire)
        # K same-shape batches scanned inside one executable, exactly the
        # Trainer/eval steps_per_dispatch scheme: per-dispatch runtime
        # overhead (~45 ms tunnelled) would otherwise dominate the ~few-ms
        # eval forward at proteome scale
        probs_multi = jax.jit(
            lambda wires: jax.lax.scan(
                lambda c, w: (c, _probs_wire(w)), 0, wires
            )[1]
        )
        K = resolve_steps_per_dispatch(steps_per_dispatch)

        # ------------------------------------------------------ batched IO
        opener = gzip.open if str(interactions_path).endswith(".gz") else open
        mode = "rt" if str(interactions_path).endswith(".gz") else "r"

        from intrepppid_tpu.data.ppi_oma import default_buckets

        buckets = default_buckets(trunc_len)

        def make_wire(rows_buf):
            """One fixed-shape dispatch batch: rows bucket-padded on T and
            repeat-padded on B to exactly ``batch_size`` (a variable tail
            shape would compile a fresh executable — minutes on a
            remote-compile platform; the pad rows' outputs are discarded
            at write time, cf. ``parallel.mesh.pad_batch_to_multiple``)."""
            maxlen = 1
            for _, ea, eb in rows_buf:
                maxlen = max(maxlen, int(np.sum(ea != 0)), int(np.sum(eb != 0)))
            T = next((b for b in buckets if maxlen <= b), trunc_len)
            xa = np.stack([ea[:T] for _, ea, _ in rows_buf])
            xb = np.stack([eb[:T] for _, _, eb in rows_buf])
            if len(rows_buf) < batch_size:
                from intrepppid_tpu.data.utils import repeat_pad_rows

                xa = repeat_pad_rows(xa, batch_size)
                xb = repeat_pad_rows(xb, batch_size)
            wire = compress_batch_for_wire({"p1": xa, "p2": xb}, vocab_size)
            # meta is a LIST of ids: group_dispatch_batches tuples the metas
            # of a stacked group, so tuple-ness tells the consumer apart
            return wire, [itx_id for itx_id, _, _ in rows_buf]

        n_done = 0
        try:
            from collections import deque

            with open(out_path, "w", newline="") as f_out:
                writer = csv.DictWriter(
                    f_out, fieldnames=["itx_id", "probability"]
                )
                pending = deque()  # (ids_meta, in-flight device probs)

                def drain(leave: int = 0) -> None:
                    """Materialize finished dispatches and write their CSV
                    rows, leaving ``leave`` in flight: host CSV/tokenise
                    work overlaps the device computing the trailing
                    dispatch (np.asarray is the sync point). FIFO order ==
                    input order, like the reference's output."""
                    nonlocal n_done
                    while len(pending) > leave:
                        ids, dev = pending.popleft()
                        if isinstance(ids, tuple):  # K'-stacked group
                            arr = np.asarray(dev).reshape(len(ids), -1)
                            parts = zip(ids, arr)
                        else:
                            parts = [(ids, np.asarray(dev).reshape(-1))]
                        for id_list, probs in parts:
                            # zip truncates the repeat-padded tail rows
                            for itx_id, p in zip(id_list, probs):
                                writer.writerow(
                                    {"itx_id": itx_id, "probability": float(p)}
                                )
                            n_done += len(id_list)

                wires = (
                    make_wire(rb)
                    for rb in _iter_row_batches(
                        interactions_path, get_embed, batch_size, opener, mode
                    )
                )
                grouped = group_dispatch_batches(wires, K) if K > 1 else wires
                for wire, ids in grouped:
                    stacked = isinstance(ids, tuple)
                    if _wire_sharding is not None:
                        sh = _stacked_sharding if stacked else _wire_sharding
                        wire = {
                            k: jax.device_put(v, sh) for k, v in wire.items()
                        }
                    dev = probs_multi(wire) if stacked else probs_one(wire)
                    pending.append((ids, dev))
                    drain(leave=1)
                drain()
        finally:
            # auto-created low-memory DBs are scratch space: remove like the
            # reference does (`intrepppid/cli/infer.py:229-231`)
            if store is not None:
                store.close()
            if auto_db:
                shutil.rmtree(db_path, ignore_errors=True)
        print(f"Scored {n_done} pairs -> {out_path}")
        return n_done


def _iter_row_batches(interactions_path, get_embed, batch_size, opener, mode):
    """Stream scoreable (itx_id, embed_a, embed_b) rows in input order,
    grouped into ``batch_size`` lists (the final list may be shorter).
    Pairs with unresolvable sequences are reported and skipped, exactly
    like the reference (`intrepppid/cli/infer.py:199-205`)."""
    with opener(str(interactions_path), mode) as f_in:
        reader = csv.DictReader(f_in, fieldnames=["itx_id", "id_a", "id_b"])
        buf = []
        for row in reader:
            embed_a = get_embed(row["id_a"])
            embed_b = get_embed(row["id_b"])
            if embed_a is None or embed_b is None:
                missing = [
                    rid
                    for rid, e in (
                        (row["id_a"], embed_a),
                        (row["id_b"], embed_b),
                    )
                    if e is None
                ]
                # str(): a short CSV row leaves id_b as None, which must
                # land in the skip report, not crash the formatting of it
                print(
                    f"Can't compute pair id: {row['itx_id']} "
                    f"(missing sequences: {', '.join(map(str, missing))})"
                )
                continue
            buf.append((row["itx_id"], embed_a, embed_b))
            if len(buf) >= batch_size:
                yield buf
                buf = []
        if buf:
            yield buf
