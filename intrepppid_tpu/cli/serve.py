"""Serving CLI: ``intrepppid_tpu serve start`` — an online PPI scoring
server (added capability; the reference ships only the offline
``infer from_csv`` batch path, `intrepppid/cli/infer.py:92-232`).

Loads one checkpoint + SentencePiece model resident and answers
``POST /score`` requests with pair probabilities — see
:mod:`intrepppid_tpu.serve` for the engine/endpoint contract. Model-shape
flags and checkpoint handling mirror the infer CLI: the network is always
built with ``use_projection=True`` (reference quirk, Appendix A #10,
`cli/infer.py:170`) and ``weights_path`` may be an orbax checkpoint dir or
a reference PyTorch ``.ckpt`` (auto-converted)."""
from __future__ import annotations

from pathlib import Path
from typing import Optional


class Serve:
    @staticmethod
    def start(
        weights_path: Path,
        spm_path: Path,
        host: str = "127.0.0.1",
        port: int = 8000,
        trunc_len: int = 1500,
        batch_size: int = 16,
        bulk_batch_size: int = 400,
        sampling: bool = False,
        vocab_size: int = 250,
        embedding_size: int = 64,
        rnn_num_layers: int = 2,
        bi_reduce: str = "last",
        max_pairs: int = 4096,
        warmup: bool = True,
        coalesce: bool = True,
        allow_reload: bool = False,
        sequences_path: Optional[Path] = None,
        token_cache_size: int = 65536,
        n_data_parallel: int = 1,
        _block: bool = True,
    ):
        """Start the scoring server (blocks; Ctrl-C to stop).

        ``--warmup`` (default on) scores one dummy full-batch at the
        largest length bucket before listening, so the first real request
        doesn't pay the compile (minutes on remote-compile platforms —
        the persistent compilation cache makes later restarts cheap).
        ``--coalesce`` (default on) merges concurrent requests into shared
        device dispatches. ``--sequences_path`` pre-tokenizes a FASTA
        (e.g. the serving proteome) into the token cache so request-time
        encoding is a pure cache hit. ``--allow_reload`` enables
        ``POST /reload``: re-read ``weights_path`` (e.g. after training
        wrote a fresh checkpoint there) and swap the model in with zero
        downtime — the path is fixed at startup, requests cannot change it.
        ``--n_data_parallel N`` shards every dispatch's batch rows over an
        N-device ``(data,)`` mesh (replicated params, no collectives) —
        dispatch shapes round up to a device multiple.
        """
        from intrepppid_tpu.utils.jax_cache import enable_compilation_cache

        enable_compilation_cache()

        from intrepppid_tpu.cli.infer import _load_params
        from intrepppid_tpu.data.tokenizer import SentencePieceTokenizer
        from intrepppid_tpu.models.factory import intrepppid_network
        from intrepppid_tpu.serve import PPIServer, ScoringEngine

        spp = SentencePieceTokenizer(spm_path)
        spp.validate_vocab_size(vocab_size)
        net = intrepppid_network(
            0,
            vocab_size=vocab_size,
            embedding_size=embedding_size,
            rnn_num_layers=rnn_num_layers,
            bi_reduce=bi_reduce,
            use_projection=True,
        )
        params = _load_params(weights_path, net)
        engine = ScoringEngine(
            net,
            params,
            spp,
            trunc_len=trunc_len,
            batch_size=batch_size,
            bulk_batch_size=bulk_batch_size,
            sampling=sampling,
            token_cache_size=token_cache_size,
            n_data_parallel=n_data_parallel,
        )
        if sequences_path is not None:
            from intrepppid_tpu.cli.infer import stream_fasta

            n = engine.preload(stream_fasta(sequences_path))
            print(f"preloaded {n} sequences into the token cache", flush=True)
        if warmup:
            engine.warmup()
        reload_cb = (
            (lambda: _load_params(weights_path, net)) if allow_reload else None
        )
        server = PPIServer(
            engine, host=host, port=port, max_pairs=max_pairs,
            coalesce=coalesce, reload_cb=reload_cb,
        )
        print(
            f"intrepppid_tpu serving on http://{host}:{server.server_address[1]} "
            f"(POST /score, GET /healthz, GET /statsz)",
            flush=True,
        )
        if _block:
            try:
                server.serve_forever()
            except KeyboardInterrupt:
                server.shutdown()
        return server
