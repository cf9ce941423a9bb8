"""Serving layer (added capability — the reference ships only the offline
``infer from_csv`` batch path, `intrepppid/cli/infer.py:92-232`): engine
parity with direct forwards, token-cache determinism, HTTP endpoints, CLI.
"""
import json
import subprocess
import sys
import threading
import urllib.error
import urllib.request
from pathlib import Path

import numpy as np
import pytest

FIXTURES = Path(__file__).parent / "fixtures"

TRUNC = 200  # default_buckets(200) == [128, 200]: a real bucket ladder
VOCAB = 38
EMBED = 16
AAS = "ACDEFGHIKLMNPQRSTVWY"


@pytest.fixture(scope="module")
def fixtures():
    if not (FIXTURES / "learnable.h5").exists():
        subprocess.run(
            [sys.executable, str(FIXTURES / "make_fixtures.py")], check=True
        )
    return FIXTURES


def _mk_seq(rng, n):
    return "".join(rng.choice(list(AAS)) for _ in range(n))


@pytest.fixture(scope="module")
def served(fixtures):
    import jax

    from intrepppid_tpu.data.tokenizer import SentencePieceTokenizer
    from intrepppid_tpu.models.factory import intrepppid_network
    from intrepppid_tpu.serve import ScoringEngine

    net = intrepppid_network(
        0, vocab_size=VOCAB, embedding_size=EMBED, rnn_num_layers=2,
        use_projection=True,
    )
    params = net.init(jax.random.PRNGKey(3))
    spp = SentencePieceTokenizer(fixtures / "tiny_spm.model")
    # bulk ladder off: these tests exercise the small-shape chunking and
    # tail-padding paths on purpose (the ladder has its own test below)
    engine = ScoringEngine(
        net, params, spp, trunc_len=TRUNC, batch_size=4, bulk_batch_size=0
    )
    return net, params, spp, engine


def test_engine_matches_direct_forward(served):
    """Bucketed/chunked/tail-padded engine output == one direct forward at
    the full window (the model is pad-invariant by masked-scan design)."""
    import jax
    import jax.numpy as jnp

    from intrepppid_tpu.data.ppi_oma import IntrepppidDataset

    net, params, spp, engine = served
    rng = np.random.default_rng(0)
    # 5 pairs across a batch_size of 4: two chunks, a repeat-padded tail,
    # and both buckets (short pairs -> 128, the long pair -> 200)
    pairs = [
        (_mk_seq(rng, 10), _mk_seq(rng, 30)),
        (_mk_seq(rng, 45), _mk_seq(rng, 7)),
        (_mk_seq(rng, 20), _mk_seq(rng, 20)),
        (_mk_seq(rng, 60), _mk_seq(rng, 5)),
        (_mk_seq(rng, 190), _mk_seq(rng, 150)),
    ]
    probs = engine.score_pairs(pairs)
    assert probs.shape == (5,) and probs.dtype == np.float32
    assert np.all((probs > 0) & (probs < 1))

    xa = np.stack(
        [
            IntrepppidDataset.static_encode(TRUNC, spp, a, sampling=False)
            for a, _ in pairs
        ]
    )
    xb = np.stack(
        [
            IntrepppidDataset.static_encode(TRUNC, spp, b, sampling=False)
            for _, b in pairs
        ]
    )
    logits = net.forward(
        params, jnp.asarray(xa, jnp.int32), jnp.asarray(xb, jnp.int32),
        train=False,
    )
    expected = np.asarray(jax.nn.sigmoid(logits), np.float32).reshape(-1)
    np.testing.assert_allclose(probs, expected, rtol=2e-5, atol=2e-6)


def test_engine_bulk_batch_ladder(served):
    """Requests larger than the small batch chunk at the bulk shape, the
    tail that fits the small shape uses it, and the ladder's outputs match
    the bulk-disabled engine exactly (pad-invariant masked scan)."""
    from intrepppid_tpu.serve import ScoringEngine

    net, params, spp, engine = served
    bulk_eng = ScoringEngine(
        net, params, spp, trunc_len=TRUNC, batch_size=2, bulk_batch_size=5
    )
    dispatched = []
    inner = bulk_eng._probs

    def spy(wire):
        out = inner(wire)
        dispatched.append(int(out.shape[0]))
        return out

    bulk_eng._probs = spy
    rng = np.random.default_rng(11)
    pairs = [(_mk_seq(rng, 15 + i), _mk_seq(rng, 25 + i)) for i in range(7)]
    probs = bulk_eng.score_pairs(pairs)
    # 7 pairs: one bulk chunk of 5, then a 2-pair tail at the small shape
    assert dispatched == [5, 2]
    np.testing.assert_allclose(
        probs, engine.score_pairs(pairs), rtol=2e-6, atol=1e-7
    )
    # a request that fits the small shape never pays the bulk wire bytes
    dispatched.clear()
    small = bulk_eng.score_pairs(pairs[:2])
    assert dispatched == [2]
    np.testing.assert_allclose(small, probs[:2], rtol=2e-6, atol=1e-7)
    # bulk_batch_size below batch_size cannot invert the ladder
    clamped = ScoringEngine(
        net, params, spp, trunc_len=TRUNC, batch_size=4, bulk_batch_size=2
    )
    assert clamped.bulk_batch_size == clamped.batch_size


def test_engine_cache_determinism(served):
    """Second scoring of the same pairs rides the token cache and is
    bitwise-identical; swapped pair order gives the symmetric head's
    identical probability."""
    _, _, _, engine = served
    rng = np.random.default_rng(7)
    pairs = [(_mk_seq(rng, 25), _mk_seq(rng, 40)) for _ in range(3)]
    p1 = engine.score_pairs(pairs)
    p2 = engine.score_pairs(pairs)
    np.testing.assert_array_equal(p1, p2)
    swapped = engine.score_pairs([(b, a) for a, b in pairs])
    np.testing.assert_allclose(p1, swapped, rtol=1e-6)
    assert engine.score_pairs([]).shape == (0,)


def test_engine_warmup(served):
    _, _, _, engine = served
    engine.warmup()


class _GatedEngine:
    """Engine proxy whose FIRST score_pairs call blocks on a gate —
    requests submitted meanwhile must coalesce into the next call."""

    def __init__(self, inner):
        self.inner = inner
        self.calls = []
        self.gate = threading.Event()
        self.first_entered = threading.Event()

    def score_pairs(self, pairs):
        self.calls.append(list(pairs))
        if len(self.calls) == 1:
            self.first_entered.set()
            assert self.gate.wait(timeout=30)
        return self.inner.score_pairs(pairs)


def test_coalescing_scorer_merges_concurrent_requests(served):
    import time

    from intrepppid_tpu.serve import CoalescingScorer

    _, _, _, engine = served
    gated = _GatedEngine(engine)
    scorer = CoalescingScorer(gated)
    rng = np.random.default_rng(21)
    first = [(_mk_seq(rng, 12), _mk_seq(rng, 18))]
    waiting = [
        [(_mk_seq(rng, 10 + i), _mk_seq(rng, 22 - i))] for i in range(3)
    ]
    try:
        results = {}

        def run(key, pairs):
            results[key] = scorer.submit(pairs)

        t0 = threading.Thread(target=run, args=("first", first))
        t0.start()
        assert gated.first_entered.wait(timeout=30)
        ts = [
            threading.Thread(target=run, args=(i, p))
            for i, p in enumerate(waiting)
        ]
        for t in ts:
            t.start()
        # wait until all three are queued behind the in-flight dispatch
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            with scorer._cv:
                if len(scorer._queue) == 3:
                    break
            time.sleep(0.01)
        gated.gate.set()
        t0.join(timeout=30)
        for t in ts:
            t.join(timeout=30)
        # one dispatch for the first request, ONE shared dispatch for the
        # three that queued behind it
        assert [len(c) for c in gated.calls] == [1, 3]
        np.testing.assert_array_equal(
            results["first"], engine.score_pairs(first)
        )
        # coalesced pairs ride a different batch composition than scoring
        # each alone — equal up to float reassociation, not bitwise
        for i, p in enumerate(waiting):
            np.testing.assert_allclose(
                results[i], engine.score_pairs(p), rtol=1e-5, atol=1e-6
            )
    finally:
        gated.gate.set()
        scorer.close()


def test_coalescing_scorer_error_propagates(served):
    from intrepppid_tpu.serve import CoalescingScorer

    _, _, _, engine = served

    class Flaky:
        def __init__(self):
            self.fail_next = True

        def score_pairs(self, pairs):
            if self.fail_next:
                self.fail_next = False
                raise RuntimeError("boom")
            return engine.score_pairs(pairs)

    scorer = CoalescingScorer(Flaky())
    rng = np.random.default_rng(23)
    pairs = [(_mk_seq(rng, 14), _mk_seq(rng, 9))]
    try:
        with pytest.raises(RuntimeError, match="boom"):
            scorer.submit(pairs)
        # the worker survives an engine error and serves the next request
        np.testing.assert_array_equal(
            scorer.submit(pairs), engine.score_pairs(pairs)
        )
        assert scorer.submit([]).shape == (0,)
    finally:
        scorer.close()


def test_engine_preload(served, fixtures):
    """Preloaded sequences make request-time tokenization a pure cache
    hit (the tokenizer is never called again for them)."""
    import jax

    from intrepppid_tpu.data.tokenizer import SentencePieceTokenizer
    from intrepppid_tpu.models.factory import intrepppid_network
    from intrepppid_tpu.serve import ScoringEngine

    net, params, _, engine = served

    class CountingTok:
        def __init__(self, spp):
            self._spp = spp
            self.n_calls = 0

        def encode_batch_padded(self, *a, **k):
            self.n_calls += 1
            return self._spp.encode_batch_padded(*a, **k)

    tok = CountingTok(SentencePieceTokenizer(fixtures / "tiny_spm.model"))
    eng = ScoringEngine(net, params, tok, trunc_len=TRUNC, batch_size=4)
    rng = np.random.default_rng(31)
    seqs = [_mk_seq(rng, 20 + i) for i in range(6)]
    n = eng.preload((f"s{i}", s) for i, s in enumerate(seqs))
    assert n == 6
    calls_after_preload = tok.n_calls
    probs = eng.score_pairs([(seqs[0], seqs[1]), (seqs[2], seqs[3])])
    assert tok.n_calls == calls_after_preload  # pure cache hits
    np.testing.assert_array_equal(
        probs, engine.score_pairs([(seqs[0], seqs[1]), (seqs[2], seqs[3])])
    )


def _post(url, payload):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


def test_http_server(served):
    from intrepppid_tpu.serve import PPIServer

    _, _, _, engine = served
    server = PPIServer(engine, host="127.0.0.1", port=0, quiet=True)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"
        assert health["model"]["vocab_size"] == VOCAB
        assert health["model"]["trunc_len"] == TRUNC

        rng = np.random.default_rng(11)
        a1, b1 = _mk_seq(rng, 15), _mk_seq(rng, 35)
        a2, b2 = _mk_seq(rng, 50), _mk_seq(rng, 8)
        # list form
        st, out = _post(f"{base}/score", {"pairs": [[a1, b1], [a2, b2]]})
        assert st == 200
        expected = engine.score_pairs([(a1, b1), (a2, b2)])
        np.testing.assert_allclose(out["probabilities"], expected, rtol=1e-6)
        assert "ids" not in out
        # dict form with ids
        st, out = _post(
            f"{base}/score",
            {"pairs": [
                {"seq_a": a1, "seq_b": b1, "id": "x1"},
                {"seq_a": a2, "seq_b": b2, "id": "x2"},
            ]},
        )
        assert st == 200 and out["ids"] == ["x1", "x2"]
        np.testing.assert_allclose(out["probabilities"], expected, rtol=1e-6)

        # malformed -> 400 with an error body
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"{base}/score", {"pairs": [["only_one"]]})
        assert ei.value.code == 400
        assert "error" in json.loads(ei.value.read())
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"{base}/score", {"nope": 1})
        assert ei.value.code == 400
        # unknown path -> 404
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{base}/nothing")
        assert ei.value.code == 404

        # /statsz reflects the scored traffic above
        with urllib.request.urlopen(f"{base}/statsz") as r:
            stats = json.loads(r.read())
        assert stats["requests"] == 2
        assert stats["pairs_scored"] == 4
        assert stats["errors"] == 0
        assert stats["uptime_s"] > 0
        assert stats["latency_ms"]["p50"] > 0
        assert stats["latency_ms"]["p99"] >= stats["latency_ms"]["p50"]
    finally:
        server.shutdown()
        server.server_close()
        t.join(timeout=10)


def test_serve_cli_end_to_end(served, fixtures, tmp_path):
    """``serve start`` on a saved orbax checkpoint answers requests with
    the same probabilities as the engine built from the live params."""
    from intrepppid_tpu.cli.serve import Serve
    from intrepppid_tpu.train.checkpoint import CheckpointManager

    net, params, _, engine = served
    mgr = CheckpointManager(tmp_path / "chkpt", "servetest")
    ckpt = mgr.save({"params": params}, epoch=0, val_loss=1.0)

    server = Serve.start(
        weights_path=ckpt,
        spm_path=fixtures / "tiny_spm.model",
        host="127.0.0.1",
        port=0,
        trunc_len=TRUNC,
        batch_size=4,
        vocab_size=VOCAB,
        embedding_size=EMBED,
        warmup=False,
        _block=False,
    )
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.default_rng(5)
        pairs = [(_mk_seq(rng, 30), _mk_seq(rng, 12))]
        st, out = _post(
            f"http://127.0.0.1:{port}/score", {"pairs": [list(pairs[0])]}
        )
        assert st == 200
        np.testing.assert_allclose(
            out["probabilities"], engine.score_pairs(pairs), rtol=1e-6
        )
    finally:
        server.shutdown()
        server.server_close()
        t.join(timeout=10)


def test_serve_cli_help_surface():
    """The dispatcher exposes serve start flags but not internal params."""
    import io
    from contextlib import redirect_stdout

    from intrepppid_tpu.__main__ import main

    buf = io.StringIO()
    with pytest.raises(SystemExit), redirect_stdout(buf):
        main(["serve", "start", "--help"])
    text = buf.getvalue()
    assert "--weights_path" in text and "--warmup" in text
    assert "_block" not in text


def test_engine_rejects_undersized_vocab(served, fixtures):
    """ScoringEngine must fail loudly when the tokenizer can emit ids past
    the network's embedding table (silent NaN scores otherwise)."""
    from intrepppid_tpu.models.factory import intrepppid_network
    from intrepppid_tpu.serve import ScoringEngine

    _, _, _, engine = served
    small_net = intrepppid_network(0, vocab_size=20, embedding_size=8)
    with pytest.raises(ValueError, match="vocab_size"):
        ScoringEngine(small_net, None, engine.spp, trunc_len=32, batch_size=2)


def test_engine_swap_params(served):
    """Zero-downtime reload: new params change the scores (same compiled
    executable), swapping the originals back restores them bitwise."""
    import jax

    from intrepppid_tpu.models.factory import intrepppid_network

    net, params, _, engine = served
    rng = np.random.default_rng(31)
    pairs = [(_mk_seq(rng, 18), _mk_seq(rng, 27))]
    before = engine.score_pairs(pairs)
    other = net.init(jax.random.PRNGKey(99))
    engine.swap_params(other)
    swapped = engine.score_pairs(pairs)
    assert not np.array_equal(before, swapped)
    engine.swap_params(params)
    np.testing.assert_array_equal(engine.score_pairs(pairs), before)


def test_http_reload_endpoint(served):
    import jax

    from intrepppid_tpu.serve import PPIServer

    net, params, _, engine = served
    fresh = net.init(jax.random.PRNGKey(123))
    server = PPIServer(
        engine, host="127.0.0.1", port=0, quiet=True, coalesce=False,
        reload_cb=lambda: fresh,
    )
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    rng = np.random.default_rng(37)
    pairs = [(_mk_seq(rng, 22), _mk_seq(rng, 16))]
    try:
        st, before = _post(f"{base}/score", {"pairs": [list(pairs[0])]})
        assert st == 200
        st, out = _post(f"{base}/reload", {})
        assert st == 200 and out == {"reloaded": True}
        st, after = _post(f"{base}/score", {"pairs": [list(pairs[0])]})
        assert st == 200
        assert before["probabilities"] != after["probabilities"]
    finally:
        server.shutdown()
        server.server_close()
        t.join(timeout=10)
        engine.swap_params(params)  # restore for other tests


def test_http_reload_disabled_by_default(served):
    from intrepppid_tpu.serve import PPIServer

    _, _, _, engine = served
    server = PPIServer(engine, host="127.0.0.1", port=0, quiet=True,
                       coalesce=False)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"http://127.0.0.1:{port}/reload", {})
        assert ei.value.code == 403
    finally:
        server.shutdown()
        server.server_close()
        t.join(timeout=10)


def test_engine_data_parallel_matches_single_device(served):
    """n_data_parallel shards dispatch rows over a (data,) mesh: dispatch
    shapes round up to a device multiple, scores match the single-device
    engine, and zero-downtime swaps keep working on the sharded params."""
    import jax

    from intrepppid_tpu.serve import ScoringEngine

    net, params, spp, engine = served
    assert len(jax.devices()) >= 4  # conftest forces 8 virtual CPU devices
    dp = ScoringEngine(
        net, params, spp, trunc_len=TRUNC, batch_size=3, bulk_batch_size=6,
        n_data_parallel=4,
    )
    # shapes rounded up to the device multiple; mesh spans the data axis
    assert dp.batch_size == 4 and dp.bulk_batch_size == 8
    assert dp.mesh is not None and dp.mesh.devices.size == 4
    assert dp.n_data_parallel == 4
    dp.warmup()  # compiles both ladder rungs SPMD
    rng = np.random.default_rng(41)
    # 11 pairs: one bulk chunk of 8, then a 3-pair tail repeat-padded to 4
    pairs = [(_mk_seq(rng, 10 + i), _mk_seq(rng, 20 + i)) for i in range(11)]
    probs = dp.score_pairs(pairs)
    np.testing.assert_allclose(
        probs, engine.score_pairs(pairs), rtol=2e-6, atol=1e-7
    )
    # swap on the mesh: params re-place replicated, scores still track
    other = net.init(jax.random.PRNGKey(7))
    dp.swap_params(other)
    single = ScoringEngine(
        net, other, spp, trunc_len=TRUNC, batch_size=4, bulk_batch_size=0
    )
    np.testing.assert_allclose(
        dp.score_pairs(pairs[:3]), single.score_pairs(pairs[:3]),
        rtol=2e-6, atol=1e-7,
    )
    # more shards than devices fails loudly
    with pytest.raises(ValueError, match="n_data_parallel"):
        ScoringEngine(net, params, spp, trunc_len=TRUNC, batch_size=4,
                      n_data_parallel=64)
