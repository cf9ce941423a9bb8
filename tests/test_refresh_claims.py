"""Perf-claim refresher: artifact parsing + doc anchors stay alive.

The round-4 refresher was a one-shot (exact-sentence anchors died after a
single application) AND couldn't read the driver's ``BENCH_r*.json``
wrapper (``tail``/``parsed`` fields), so the captured bench never landed
in the docs. These tests pin both repaired behaviors on CPU: any doc
edit that would orphan a refresh anchor, or a driver format drift, fails
here instead of silently no-oping during the unattended TPU queue.
"""
import json
import re
from pathlib import Path

from tools.refresh_perf_claims import _artifact_name, load_bench, plan_edits

REPO = Path(__file__).resolve().parent.parent

BENCH = {
    "metric": "train seq-pairs/sec/chip (batch 80, trunc_len 1500, bf16,"
              " ranger21_xx)",
    "value": 5123.45,
    "unit": "seq-pairs/s",
    "vs_baseline": 102.47,
    "epoch_level": 5050.5,
    "epoch_vs_baseline": 101.01,
    "epoch_level_min": 1700.0,
    "epoch_level_max": 5050.5,
    "epoch_rates": [400.0, 1700.0, 4800.0, 5050.5],
}


class TestLoadBench:
    def test_inline_fields(self, tmp_path):
        p = tmp_path / "b.json"
        p.write_text(json.dumps(BENCH))
        assert load_bench(p)["value"] == BENCH["value"]

    def test_driver_parsed_field(self, tmp_path):
        p = tmp_path / "BENCH_r05.json"
        p.write_text(json.dumps({"n": 5, "rc": 0, "parsed": BENCH}))
        assert load_bench(p)["value"] == BENCH["value"]

    def test_driver_tail_field(self, tmp_path):
        p = tmp_path / "BENCH_r05.json"
        tail = "WARNING: noise\n" + json.dumps(BENCH) + "\n"
        p.write_text(json.dumps({"n": 5, "rc": 0, "tail": tail}))
        assert load_bench(p)["value"] == BENCH["value"]

    def test_queue_log(self, tmp_path):
        p = tmp_path / "bench.log"
        p.write_text("warmup...\n" + json.dumps(BENCH) + "\n")
        assert load_bench(p)["value"] == BENCH["value"]

    def test_garbage_is_none(self, tmp_path):
        p = tmp_path / "bench.log"
        p.write_text("tunnel outage, no JSON here\n")
        assert load_bench(p) is None

    def test_artifact_name(self, tmp_path):
        assert _artifact_name(tmp_path / "BENCH_r07.json", BENCH) \
            == ("driver", "BENCH_r07.json")
        # in-repo logs are citable by repo-relative path (the r5 queue
        # refreshed numbers from a log the old refresher couldn't cite,
        # leaving a stale BENCH_r04 attribution on the new figures)
        assert _artifact_name(
            REPO / "measurements" / "r5_queue" / "bench_wide_warm.log", BENCH
        ) == ("queue", "measurements/r5_queue/bench_wide_warm.log")
        # outside the repo there is nothing citable
        assert _artifact_name(tmp_path / "bench.log", BENCH) is None


class TestAnchorsAlive:
    """Every regex the refresher relies on matches the committed docs
    exactly once — so a future doc edit can't orphan the refresh path,
    and a refreshed doc stays refreshable (idempotence)."""

    def test_each_pattern_matches_once(self):
        for path, pattern, new in plan_edits(BENCH, ("driver", "BENCH_r05.json")):
            text = path.read_text()
            hits = re.findall(pattern, text)
            assert len(hits) == 1, (
                f"{path.name}: pattern {pattern!r} matched {len(hits)} "
                "times (must be exactly 1)"
            )

    def test_replacements_self_match(self):
        """Applying an edit leaves text the SAME pattern still matches —
        the property that makes repeated refreshes safe."""
        for path, pattern, new in plan_edits(BENCH, ("driver", "BENCH_r05.json")):
            assert re.search(pattern, new) or re.fullmatch(pattern, new), (
                f"replacement for {pattern!r} would not re-match: {new!r}"
            )
