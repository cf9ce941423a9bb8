"""Online scoring engine: pairs of protein sequences -> probabilities.

The reference has no serving path at all — its closest surface is the
batch `infer from_csv` CLI (`intrepppid/cli/infer.py:92-232`), which scores
one CSV offline. This engine is the added production-serving capability:
it holds one loaded network + tokenizer resident and scores arbitrary
request-time pairs with the same device-efficiency machinery the batch
paths use —

* deterministic tokenization through the native engine (exactly
  ``static_encode`` semantics, `intrepppid/data/ppi_oma.py:347-392`, with
  subword sampling off — the reference's always-on inference sampling is
  Appendix-A quirk #11, opt back in with ``sampling=True``),
* an LRU token cache keyed on the raw sequence (proteome workloads re-score
  the same proteins against many partners; tokenization is the host hot
  loop),
* length bucketing + fixed-shape batch padding so every dispatch reuses a
  compiled executable (a fresh shape costs a full compile — minutes on
  remote-compile platforms),
* a two-shape batch ladder: requests up to ``batch_size`` dispatch at the
  small latency shape; anything larger chunks at ``bulk_batch_size``
  (measured on-chip: dispatch cost is round-trip/wire-dominated — ~29 ms
  at B=16 vs ~50 ms at B=400 — so the bulk shape is ~5× the pairs/s and
  padding a part-full bulk chunk is cheaper than two small dispatches),
* the bit-plane wire format and in-graph sigmoid (one device dispatch per
  batch end-to-end; tunnelled transfers move ~30 MB/s, so wire bytes are
  wall time),
* all chunk dispatches of a request are enqueued before any result is
  materialized, so host tokenization of chunk i+1 overlaps device compute
  of chunk i,
* optional data-parallel scoring over a device mesh
  (``n_data_parallel > 1``): each dispatch's batch rows shard over the
  ``data`` axis of a ``jax.sharding.Mesh`` and the replicated params run
  the same forward per shard — no collectives, so throughput scales with
  the slice size. Dispatch shapes round up to a device multiple
  (repeat-padded rows are sliced off the result as usual). Single
  controller: all mesh devices must be addressable from this process.

Thread-safe: requests serialize on an internal lock (one device stream;
concurrent HTTP handlers queue here).
"""
from __future__ import annotations

import os
import threading
from collections import OrderedDict
from typing import List, Sequence, Tuple

import numpy as np

from intrepppid_tpu.data.utils import repeat_pad_rows


class ScoringEngine:
    def __init__(
        self,
        net,
        params,
        tokenizer,
        *,
        trunc_len: int = 1500,
        batch_size: int = 16,
        bulk_batch_size: int = 400,
        sampling: bool = False,
        token_cache_size: int = 65536,
        n_data_parallel: int = 1,
    ):
        import jax

        from intrepppid_tpu.data.ppi_oma import default_buckets
        from intrepppid_tpu.train.trainer import (
            compress_batch_for_wire,
            widen_batch,
        )

        self.net = net
        self.params = params
        self.spp = tokenizer
        # fail loudly if the tokenizer can emit ids past the embedding
        # table (jnp.take fills out-of-range with NaN — silent NaN scores)
        validate = getattr(tokenizer, "validate_vocab_size", None)
        if validate is not None:
            validate(net.cfg.encoder.vocab_size)
        self.trunc_len = int(trunc_len)
        self.batch_size = int(batch_size)
        # bulk shape for >batch_size requests; 0 disables the ladder.
        # Never smaller than batch_size (a "bulk" below the small shape
        # would invert the ladder's cost model).
        self.bulk_batch_size = max(int(bulk_batch_size), self.batch_size)
        if int(bulk_batch_size) <= 0:
            self.bulk_batch_size = 0
        # data-parallel scoring: shard each dispatch's batch rows over a
        # (data,) mesh with replicated params. Dispatch shapes round UP to
        # a device multiple so rows split evenly (pad rows are repeat-pads
        # whose outputs are sliced off, same as tail padding).
        n_dp = int(n_data_parallel)
        self.mesh = None
        if n_dp > 1:
            from intrepppid_tpu.parallel import (
                batch_sharding,
                make_mesh,
                replicated_sharding,
            )

            if n_dp > len(jax.devices()):
                raise ValueError(
                    f"n_data_parallel={n_dp} exceeds the "
                    f"{len(jax.devices())} addressable devices"
                )
            self.mesh = make_mesh(n_data=n_dp, n_model=1)
            self._wire_sharding = batch_sharding(self.mesh)
            self._params_sharding = replicated_sharding(self.mesh)
            self.batch_size = -(-self.batch_size // n_dp) * n_dp
            if self.bulk_batch_size:
                self.bulk_batch_size = max(
                    -(-self.bulk_batch_size // n_dp) * n_dp, self.batch_size
                )
            self.params = jax.device_put(self.params, self._params_sharding)
        self.n_data_parallel = n_dp if self.mesh is not None else 1
        self.sampling = bool(sampling)
        self.buckets = default_buckets(self.trunc_len)
        self._compress = compress_batch_for_wire
        self._vocab = net.cfg.encoder.vocab_size

        # params enter as a call ARGUMENT, not a closure: closed-over
        # arrays bake into the executable as constants (recompile on every
        # swap_params, and big constants inflate remote-compile bodies);
        # as an argument the same executable serves every loaded model
        def _probs_wire(p, wire):
            b = widen_batch(wire)
            return jax.nn.sigmoid(
                net.forward(p, b["p1"], b["p2"], train=False)
            )

        self._probs_fn = jax.jit(_probs_wire)
        if self.mesh is None:
            self._probs = lambda wire: self._probs_fn(self.params, wire)
        else:
            # placing the wire arrays with a (data,)-sharded layout makes
            # jit partition the forward SPMD across the mesh — the per-row
            # forward has no cross-row terms, so no collectives are needed
            def _probs_sharded(wire):
                wire = {
                    k: jax.device_put(v, self._wire_sharding)
                    for k, v in wire.items()
                }
                return self._probs_fn(self.params, wire)

            self._probs = _probs_sharded
        self._lock = threading.Lock()
        # raw sequence -> (trunc_len,) int32 token row; only valid for the
        # deterministic path (sampling re-draws per call by contract)
        self._cache: "OrderedDict[str, np.ndarray]" = OrderedDict()
        self._cache_cap = int(token_cache_size)

    # ------------------------------------------------------------ tokenize
    def _encode_many(self, seqs: Sequence[str]) -> List[np.ndarray]:
        """Token rows for ``seqs`` (each ``(trunc_len,)`` int32), via the
        LRU cache; misses batch through the native engine when available."""
        workers = os.cpu_count() or 1
        if self.sampling:
            # sampling draws fresh subwords per call — never cache
            rows = self.spp.encode_batch_padded(
                list(seqs), self.trunc_len, enable_sampling=True,
                workers=workers,
            )
            return [rows[i] for i in range(len(seqs))]
        out: List[np.ndarray] = [None] * len(seqs)  # type: ignore[list-item]
        miss_idx: List[int] = []
        miss_seq: List[str] = []
        pending: dict = {}
        for i, s in enumerate(seqs):
            hit = self._cache.get(s)
            if hit is not None:
                self._cache.move_to_end(s)
                out[i] = hit
            elif s in pending:
                pending[s].append(i)
            else:
                pending[s] = [i]
                miss_idx.append(i)
                miss_seq.append(s)
        if miss_seq:
            rows = self.spp.encode_batch_padded(
                miss_seq, self.trunc_len, workers=workers
            )
            for s, row in zip(miss_seq, rows):
                row = np.asarray(row, np.int32)
                for i in pending[s]:
                    out[i] = row
                self._cache[s] = row
            while len(self._cache) > self._cache_cap:
                self._cache.popitem(last=False)
        return out

    # -------------------------------------------------------------- reload
    def swap_params(self, params) -> None:
        """Swap in a new parameter tree (same architecture) — zero-downtime
        model update: serializes with in-flight ``score_pairs`` on the
        engine lock, reuses the compiled executable (params are a call
        argument, so no recompile), and keeps the token cache (tokenization
        is model-independent)."""
        if self.mesh is not None:
            import jax

            params = jax.device_put(params, self._params_sharding)
        with self._lock:
            self.params = params

    # ------------------------------------------------------------- preload
    def preload(self, named_seqs) -> int:
        """Warm the token cache from a ``(name, sequence)`` iterable (e.g.
        a proteome FASTA via ``stream_fasta``) so request-time tokenization
        is a pure cache hit; returns the number of sequences cached. A
        no-op under ``sampling`` (sampled draws are never cached). Entries
        beyond the cache capacity evict oldest-first like any other
        insert."""
        if self.sampling:
            return 0
        n = 0
        CHUNK = 1024
        buf: List[str] = []

        def flush():
            nonlocal n
            if not buf:
                return
            # the cache is shared with in-flight score_pairs calls — take
            # the same lock (per chunk, so live requests interleave)
            with self._lock:
                self._encode_many(buf)
            n += len(buf)
            buf.clear()

        for _, seq in named_seqs:
            buf.append(seq)
            if len(buf) >= CHUNK:
                flush()
        flush()
        return n

    # -------------------------------------------------------------- warmup
    def warmup(self) -> None:
        """Compile the worst-case dispatch shapes (full small batch and,
        when the ladder is on, full bulk batch, both at the top length
        bucket — the shapes every request can fall back to) before serving,
        so no request pays the first compile. Synthetic full-length token
        rows force the top bucket regardless of how the tokenizer merges a
        real sequence."""
        row = np.ones((self.trunc_len,), np.int32)
        sizes = [self.batch_size]
        if self.bulk_batch_size > self.batch_size:
            sizes.append(self.bulk_batch_size)
        for b in sizes:
            xa = np.tile(row, (b, 1))
            wire = self._compress({"p1": xa, "p2": xa.copy()}, self._vocab)
            with self._lock:  # serialize with any in-flight score_pairs
                np.asarray(self._probs(wire))

    # --------------------------------------------------------------- score
    def score_pairs(self, pairs: Sequence[Tuple[str, str]]) -> np.ndarray:
        """Probabilities for ``[(seq_a, seq_b), ...]`` — float32, one per
        pair, in input order. Empty input returns an empty array."""
        if not pairs:
            return np.zeros((0,), np.float32)
        with self._lock:
            flat: List[str] = []
            for a, b in pairs:
                flat.append(a)
                flat.append(b)
            rows = self._encode_many(flat)
            in_flight = []  # (device_probs, true_rows)
            # batch ladder: dispatch cost is round-trip/wire-dominated, so
            # while more than a small batch remains, chunk at the bulk
            # shape (one padded bulk dispatch beats two small ones); a
            # tail that fits the small shape uses it — padding a few pairs
            # to the bulk shape would pay the bulk wire transfer for
            # nothing
            bulk = self.bulk_batch_size
            lo = 0
            while lo < len(pairs):
                left = len(pairs) - lo
                B = (
                    bulk
                    if bulk > self.batch_size and left > self.batch_size
                    else self.batch_size
                )
                chunk = rows[2 * lo : 2 * (lo + B)]
                lo += B
                xa = np.stack(chunk[0::2])
                xb = np.stack(chunk[1::2])
                maxlen = max(
                    1,
                    int(np.max(np.sum(xa != 0, axis=1))),
                    int(np.max(np.sum(xb != 0, axis=1))),
                )
                T = next(
                    (t for t in self.buckets if maxlen <= t), self.trunc_len
                )
                xa, xb = xa[:, :T], xb[:, :T]
                true = xa.shape[0]
                if true < B:
                    # repeat-pad to the one compiled batch shape; pad rows'
                    # outputs are sliced off below
                    xa = repeat_pad_rows(xa, B)
                    xb = repeat_pad_rows(xb, B)
                wire = self._compress({"p1": xa, "p2": xb}, self._vocab)
                in_flight.append((self._probs(wire), true))
            parts = [
                np.asarray(dev, np.float32).reshape(-1)[:true]
                for dev, true in in_flight
            ]
        return np.concatenate(parts)
