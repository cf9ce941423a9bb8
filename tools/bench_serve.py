"""Serving-path throughput: pairs/s through the engine and the HTTP stack.

Measures the online scoring surface (`intrepppid_tpu/serve/`) at the
manuscript model shape with synthetic sequences:

1. **engine-direct**: `ScoringEngine.score_pairs` on pre-tokenized-cache
   misses and hits (the resident-server steady state), with the bulk
   batch ladder on (production default) and off (the r4-comparable
   small-shape number — dispatch cost is round-trip/wire-dominated, so
   the bulk shape multiplies bulk-request throughput),
2. **HTTP concurrency sweep, coalescing ON vs OFF**: N client threads
   POSTing small (4-pair) requests against a live `PPIServer`. With
   coalescing, concurrent requests merge into one device dispatch — the
   continuous-batching steady state, where the effective batch self-tunes
   to the arrival rate. The OFF arm dispatches each request alone, which
   is the reference's batch-of-1 `infer` shape
   (/root/reference/intrepppid/cli/infer.py:216-227 scores pairs one
   batch at a time with no cross-request batching at all).

Serving dispatches are eval forwards (no grad, no optimizer); on
tunnelled platforms the ~45 ms per-dispatch runtime overhead dominates a
small-batch forward, which is exactly what coalescing amortises.

The last line is a machine-readable summary:
``SERVE_BENCH {...json...}`` (pairs/s per arm), consumed by the r5 queue
and docs/performance.md's Serving section.

Usage: python tools/bench_serve.py  (on the TPU; INTREPPPID_SERVE_SMOKE=1
shrinks shapes for a CPU pre-flight)
"""
from __future__ import annotations

import json
import os
import sys
import threading
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

_SMOKE = os.environ.get("INTREPPPID_SERVE_SMOKE") == "1"
TRUNC = 64 if _SMOKE else 1500
VOCAB = 258  # golden_spm.model defines 258 pieces; anything smaller
# would send out-of-range ids into the embedding lookup (NaN fill)
EMBED = 16 if _SMOKE else 64
BATCH = 4 if _SMOKE else 64
BULK = 8 if _SMOKE else 400
N_PAIRS = 32 if _SMOKE else 800  # = 2 full bulk chunks at BULK=400
REQ_SIZE = 4  # small requests: the coalescer must do the batching
CLIENT_SWEEP = (1, 4) if _SMOKE else (1, 2, 4, 8)
AAS = "ACDEFGHIKLMNPQRSTVWY"


def _mk_seqs(rng, n, lo, hi):
    return [
        "".join(rng.choice(list(AAS)) for _ in range(rng.integers(lo, hi)))
        for _ in range(n)
    ]


def _http_round(port, pairs, n_clients):
    """All clients drain their share of ``pairs`` in REQ_SIZE chunks;
    returns wall seconds."""
    per_client = len(pairs) // n_clients

    def client(idx, out):
        my = pairs[idx * per_client : (idx + 1) * per_client]
        n = 0
        for i in range(0, len(my), REQ_SIZE):
            body = json.dumps(
                {"pairs": [list(p) for p in my[i : i + REQ_SIZE]]}
            ).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/score", data=body,
                headers={"Content-Type": "application/json"}, method="POST",
            )
            with urllib.request.urlopen(req) as r:
                n += len(json.loads(r.read())["probabilities"])
        out[idx] = n

    out = {}
    threads = [
        threading.Thread(target=client, args=(i, out))
        for i in range(n_clients)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    assert sum(out.values()) == per_client * n_clients
    return dt, per_client * n_clients


def main():
    import jax

    if _SMOKE:
        # sitecustomize already imported jax with the axon platform; env
        # alone is too late — force the CPU pre-flight the conftest way
        jax.config.update("jax_platforms", "cpu")

    from intrepppid_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    from intrepppid_tpu.data.tokenizer import SentencePieceTokenizer
    from intrepppid_tpu.models.factory import intrepppid_network
    from intrepppid_tpu.serve import PPIServer, ScoringEngine

    spm = Path(__file__).parent.parent / "tests" / "fixtures" / "golden_spm.model"
    spp = SentencePieceTokenizer(spm)
    net = intrepppid_network(
        0, vocab_size=VOCAB, embedding_size=EMBED, use_projection=True
    )
    params = net.init(jax.random.PRNGKey(0))
    engine = ScoringEngine(
        net, params, spp, trunc_len=TRUNC, batch_size=BATCH,
        bulk_batch_size=BULK,
    )
    rng = np.random.default_rng(0)
    lo, hi = (20, 60) if _SMOKE else (200, 2 * TRUNC)
    seqs = _mk_seqs(rng, 256, lo, hi)
    pairs = [
        (seqs[rng.integers(len(seqs))], seqs[rng.integers(len(seqs))])
        for _ in range(N_PAIRS)
    ]
    results = {
        "trunc_len": TRUNC, "batch": BATCH, "bulk_batch": BULK,
        "n_pairs": N_PAIRS, "req_size": REQ_SIZE,
    }

    print(f"warmup (compile, batch {BATCH}+{BULK}, T={TRUNC})...", flush=True)
    t0 = time.perf_counter()
    engine.warmup()
    results["warmup_s"] = round(time.perf_counter() - t0, 1)
    print(f"  {results['warmup_s']} s", flush=True)

    # --- engine-direct (first pass fills the token cache, second is hits)
    for tag in ("cache-miss", "cache-hit"):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            engine.score_pairs(pairs)
            best = min(best, time.perf_counter() - t0)
            if tag == "cache-miss":
                break  # misses only exist once
        results[f"engine_direct_{tag.replace('-', '_')}"] = round(
            N_PAIRS / best
        )
        print(f"engine-direct [{tag}]: {N_PAIRS / best:.0f} pairs/s "
              f"({best * 1e3:.0f} ms / {N_PAIRS} pairs)", flush=True)

    # --- ladder-off comparison arm: same engine, bulk disabled, warm token
    # cache — the r4-comparable small-shape-only number
    engine.bulk_batch_size = 0
    try:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            engine.score_pairs(pairs)
            best = min(best, time.perf_counter() - t0)
        results["engine_direct_smallonly_hit"] = round(N_PAIRS / best)
        print(
            f"engine-direct [ladder off, cache-hit]: {N_PAIRS / best:.0f} "
            f"pairs/s ({best * 1e3:.0f} ms / {N_PAIRS} pairs)", flush=True,
        )
    finally:
        engine.bulk_batch_size = BULK

    # --- HTTP concurrency sweep, coalescing ON vs OFF. The OFF arm pays
    # one device dispatch per 4-pair request; bound its wall time with a
    # smaller pair budget and a single round.
    for coalesce in (True, False):
        arm = "coal" if coalesce else "nocoal"
        arm_pairs = pairs if coalesce else pairs[: max(
            REQ_SIZE * 8, N_PAIRS // 4
        )]
        rounds = 3 if coalesce else 1
        server = PPIServer(
            engine, host="127.0.0.1", port=0, quiet=True, coalesce=coalesce
        )
        port = server.server_address[1]
        st = threading.Thread(target=server.serve_forever, daemon=True)
        st.start()
        try:
            for n_clients in CLIENT_SWEEP:
                usable = arm_pairs[
                    : len(arm_pairs) // n_clients * n_clients
                ]
                best, total = float("inf"), 0
                for _ in range(rounds):
                    dt, total = _http_round(port, usable, n_clients)
                    best = min(best, dt)
                rate = total / best
                results[f"http_{arm}_c{n_clients}"] = round(rate)
                label = "coalescing" if coalesce else "no coalescing"
                print(
                    f"HTTP x{n_clients} clients, {REQ_SIZE}-pair requests, "
                    f"{label}: {rate:.0f} pairs/s "
                    f"({best * 1e3:.0f} ms / {total} pairs)",
                    flush=True,
                )
        finally:
            server.shutdown()
            server.server_close()
            st.join(timeout=10)

    # --- bulk HTTP arm: one client POSTing BULK-pair requests. Each
    # request is a single bulk-shape dispatch through the ladder — the
    # batch-upload shape (score a whole candidate list in one call),
    # where HTTP round-trip cost amortizes over BULK pairs instead of 4.
    server = PPIServer(engine, host="127.0.0.1", port=0, quiet=True)
    port = server.server_address[1]
    st = threading.Thread(target=server.serve_forever, daemon=True)
    st.start()
    try:
        bulk_pairs = pairs[: len(pairs) // BULK * BULK] or pairs
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            n = 0
            for i in range(0, len(bulk_pairs), BULK):
                body = json.dumps(
                    {"pairs": [list(p) for p in bulk_pairs[i : i + BULK]]}
                ).encode()
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/score", data=body,
                    headers={"Content-Type": "application/json"},
                    method="POST",
                )
                with urllib.request.urlopen(req) as r:
                    n += len(json.loads(r.read())["probabilities"])
            best = min(best, time.perf_counter() - t0)
        assert n == len(bulk_pairs)
        results["http_bulk_1client"] = round(len(bulk_pairs) / best)
        print(
            f"HTTP x1 client, {BULK}-pair requests: "
            f"{len(bulk_pairs) / best:.0f} pairs/s "
            f"({best * 1e3:.0f} ms / {len(bulk_pairs)} pairs)",
            flush=True,
        )
    finally:
        server.shutdown()
        server.server_close()
        st.join(timeout=10)

    print("SERVE_BENCH " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
