"""Decision parsing for the unattended TPU experiment queue.

tools/apply_queue_decisions.py converts the queue's experiment logs into
applied defaults (PACK_BOUNDARY, trainer dispatch-K) while nobody is
watching; these tests pin the parsing and decision rules against the exact
print formats of the experiment scripts so a format drift is caught on CPU
before an unattended TPU run silently decides nothing.
"""
import textwrap

from tools.apply_queue_decisions import (
    PACK_FLIP_THRESHOLD,
    decide_dispatch_k,
    decide_pack_boundary,
    summarize_bwd_chunk,
    summarize_scaled_config,
)

PACK_LOG = textwrap.dedent(
    """\
    plan: Bt=400 C=1 mode=packed
    bitwise gradient parity: OK
    round 0: v6 12.40 ms  v7 11.20 ms
    best: v6 12.31 ms  v7 11.15 ms  speedup 1.104x
    """
)


class TestPackBoundary:
    def test_win_with_parity_flips(self):
        d = decide_pack_boundary(PACK_LOG)
        assert d["status"] == "decided"
        assert d["set_pack_boundary"] is True
        assert d["v6_ms"] == 12.31 and d["v7_ms"] == 11.15

    def test_wash_keeps_default_off(self):
        log = PACK_LOG.replace("speedup 1.104x", "speedup 1.005x")
        assert decide_pack_boundary(log)["set_pack_boundary"] is False
        assert PACK_FLIP_THRESHOLD > 1.005

    def test_no_parity_line_never_flips(self):
        log = PACK_LOG.replace("bitwise gradient parity: OK", "")
        d = decide_pack_boundary(log)
        assert d["parity_ok"] is False and d["set_pack_boundary"] is False

    def test_truncated_log_unparseable(self):
        assert decide_pack_boundary("round 0: v6 12.4")["status"] == "unparseable"


class TestDispatchK:
    LOG = textwrap.dedent(
        """\
        K=5: compiled
        K=5: best 16.10 ms/step  (4969 seq-pairs/s)
        K=10: best 15.88 ms/step  (5038 seq-pairs/s)
        K=20: best 15.80 ms/step  (5063 seq-pairs/s)
        K=40: best 15.90 ms/step  (5031 seq-pairs/s)
        """
    )

    def test_tie_band_prefers_smaller_k(self):
        d = decide_dispatch_k(self.LOG)
        # 16.10 is within 2% of 15.80 -> smallest tied K wins
        assert d["best_k"] == 5

    def test_clear_winner_outside_band(self):
        log = self.LOG.replace("K=5: best 16.10", "K=5: best 21.00").replace(
            "K=10: best 15.88", "K=10: best 20.10"
        )
        assert decide_dispatch_k(log)["best_k"] == 20

    def test_empty_log(self):
        assert decide_dispatch_k("")["status"] == "unparseable"


class TestInformational:
    def test_bwd_chunk(self):
        log = textwrap.dedent(
            """\
            A (C=1 in-kernel): 6.10 ms
            B (C=2 + shifts):  5.95 ms (1.025x vs A)
            C (C=1 + shifts):  6.60 ms  -> raw C=2 sweep win = -0.65 ms
            """
        )
        d = summarize_bwd_chunk(log)
        assert d["status"] == "recorded" and d["b_vs_a"] == 1.025

    def test_scaled_config(self):
        log = (
            "pick_plan B=400 T=1500 H=256 G=5 E=256 (lite): Bt=80 C=1 mode=lite\n"
            "best: 40.23 ms/step  (1989 seq-pairs/s) at embedding 256, 3 layers\n"
        )
        d = summarize_scaled_config(log)
        assert d["seq_pairs_per_s"] == 1989.0
        assert d["plans"]


class TestRefreshPerfClaims:
    BENCH = {
        "metric": "train seq-pairs/sec/chip (batch 80, trunc_len 1500, bf16, ranger21_xx)",
        "value": 4452.1,
        "unit": "seq-pairs/s",
        "vs_baseline": 89.04,
        "epoch_level": 4615.3,
        "epoch_level_min": 4102.8,
        "epoch_level_max": 4817.5,
    }

    def test_load_bench_from_queue_log(self, tmp_path):
        import json

        from tools.refresh_perf_claims import load_bench

        log = tmp_path / "bench.log"
        log.write_text("noise\n" + json.dumps(self.BENCH) + "\n")
        assert load_bench(log)["value"] == 4452.1

    def test_load_bench_from_driver_artifact(self, tmp_path):
        import json

        from tools.refresh_perf_claims import load_bench

        art = tmp_path / "BENCH_r04.json"
        art.write_text(json.dumps({"rc": 0, "stdout": json.dumps(self.BENCH)}))
        assert load_bench(art)["epoch_level"] == 4615.3
        art.write_text(json.dumps(self.BENCH))  # fields inline
        assert load_bench(art)["value"] == 4452.1

    def test_anchors_still_present(self):
        """Every planned edit must anchor on text that actually exists, or
        the unattended refresh silently no-ops. Skipped once the claims
        have been refreshed for real (the anchors are then gone by
        design)."""
        import pytest

        from tools.refresh_perf_claims import README, plan_edits

        if "provisional until a driver-captured" not in README.read_text():
            pytest.skip("claims already refreshed; anchors consumed")
        for path, old, _ in plan_edits(self.BENCH):
            assert old in path.read_text(), (path.name, old.splitlines()[0])
