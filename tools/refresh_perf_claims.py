"""Rewrite the README / docs performance claims from a captured bench run.

The round-3 verdict's top finding was perf claims outrunning artifacts.
The claims were refreshed by hand in round 5 against the driver-captured
``BENCH_r04.json`` into a *canonical* form this script can keep current:
instead of one-shot prose anchors, it regex-updates the numbers and the
cited artifact name inside uniquely-matchable sentences, so running it
after every future queue bench is idempotent (the round-4 verdict flagged
the one-shot version as a staleness hazard: after a single refresh the
anchors were gone and subsequent benches could no longer land in docs).

Usage:
    python tools/refresh_perf_claims.py <bench.log|BENCH_rNN.json> [--apply]

The input may be a queue ``bench.log`` (last line holding bench.py's JSON
result) or a driver ``BENCH_r*.json`` artifact — the driver wraps bench.py's
stdout in an object with ``tail``/``parsed`` fields (``stdout``/``output``
accepted too, and the fields inline). Dry-run prints the planned
substitutions; ``--apply`` writes and commits.
"""
from __future__ import annotations

import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
README = REPO / "README.md"
PERF = REPO / "docs" / "performance.md"


def load_bench(path: Path):
    """Extract bench.py's result dict from a log or driver artifact."""
    text = path.read_text()
    # driver artifact: JSON object; the result dict may be inline, under
    # "parsed", or as the JSON line inside "tail"/"stdout"/"output"
    try:
        obj = json.loads(text)
        if isinstance(obj, dict):
            if "value" in obj and "metric" in obj:
                return obj
            parsed = obj.get("parsed")
            if isinstance(parsed, dict) and "value" in parsed:
                return parsed
            for key in ("tail", "stdout", "output"):
                if key in obj and isinstance(obj[key], str):
                    text = obj[key]
                    break
    except json.JSONDecodeError:
        pass
    # log: last line that parses as the bench dict
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(obj, dict) and "value" in obj and "metric" in obj:
            return obj
    return None


def _artifact_name(src: Path, bench) -> tuple[str, str] | None:
    """(kind, citable-name) for the measurement source, if recognisable.

    kind is "driver" for the driver's ``BENCH_r*.json`` artifacts and
    "queue" for in-repo logs (cited by repo-relative path) — the round-5
    mislabel happened because queue logs weren't citable, so the numbers
    refreshed while the citation kept naming the older driver artifact."""
    if re.match(r"BENCH_r\d+\.json$", src.name):
        return ("driver", src.name)
    try:
        rel = src.resolve().relative_to(REPO)
    except ValueError:
        return None
    return ("queue", str(rel))


def plan_edits(bench, artifact: tuple[str, str] | None):
    """(path, pattern, replacement) regex edits; each must match exactly once
    to be applied (0 matches -> skip with a message, >1 -> refuse)."""
    step = bench["value"]
    vsb = bench.get("vs_baseline")
    epoch = bench.get("epoch_level")
    epoch_vsb = bench.get("epoch_vs_baseline")
    ladder = bench.get("epoch_rates")
    edits = []

    edits.append(
        (
            README,
            r"\*\*\d[\d,]*(?:\.\d+)? seq-pairs/s\*\* device train step",
            f"**{step:.0f} seq-pairs/s** device train step",
        )
    )
    if vsb is not None:
        edits.append(
            (
                README,
                r"step \(\d+× a conservative",
                f"step ({vsb:.0f}× a conservative",
            )
        )
    if epoch is not None:
        edits.append(
            (
                README,
                r"\*\*\d[\d,]*(?:\.\d+)? seq-pairs/s\*\* end-to-end"
                r" `Trainer\.fit` warm epoch",
                f"**{epoch:.0f} seq-pairs/s** end-to-end `Trainer.fit`"
                " warm epoch",
            )
        )
    if epoch_vsb is not None:
        edits.append(
            (
                README,
                r"\(\d+× the baseline estimate at the\s+epoch level\)",
                f"({epoch_vsb:.0f}× the baseline estimate at the\n"
                "  epoch level)",
            )
        )
    if ladder:
        ladder_txt = " → ".join(f"{r:.0f}" for r in ladder)
        edits.append(
            (
                README,
                r"the captured epoch ladder was [\d →]+\s+seq-pairs/s",
                f"the captured epoch ladder was {ladder_txt}\n  seq-pairs/s",
            )
        )
    if artifact:
        kind, name = artifact
        edits.append(
            (
                README,
                r"window \((?:driver|queue)-captured\s+`[^`]+`",
                f"window ({kind}-captured\n`{name}`",
            )
        )

    # docs/performance.md: the canonical captured-artifact sentence + the
    # example output in the ``python bench.py`` snippet
    perf_sentence = (
        f"The captured artifact records step {step:.0f}"
        + (f", epoch {epoch:.0f}" if epoch is not None else "")
        + (
            " (epoch ladder " + "/".join(f"{r:.0f}" for r in ladder) + ")"
            if ladder
            else ""
        )
        + " seq-pairs/s"
        + (
            f" — {epoch_vsb:.0f}× the estimated reference baseline\n"
            "at the epoch level"
            if epoch_vsb is not None
            else ""
        )
    )
    edits.append(
        (
            PERF,
            r"The captured artifact records step \d+(?:, epoch \d+)?"
            r"(?:\s*\(epoch ladder\s*[\d/\s]*?\))?\s*seq-pairs/s"
            r"(?:\s*—\s*\d+× the estimated\s+reference baseline"
            r"(?:\s*at the epoch level)?)?",
            perf_sentence,
        )
    )
    if artifact:
        kind, name = artifact
        edits.append(
            (
                PERF,
                r"\((?:driver|queue)-captured\s+`[^`]+`",
                f"({kind}-captured\n`{name}`",
            )
        )
    edits.append(
        (
            PERF,
            r'"value": ~\d+, "unit": "seq-pairs/s", "vs_baseline": ~\d+,',
            f'"value": ~{round(step / 10) * 10}, "unit": "seq-pairs/s",'
            f' "vs_baseline": ~{vsb:.0f},' if vsb is not None else
            f'"value": ~{round(step / 10) * 10}, "unit": "seq-pairs/s",',
        )
    )
    if epoch is not None:
        edits.append(
            (
                PERF,
                r'"epoch_level": ~\d+, "bottleneck"',
                f'"epoch_level": ~{epoch:.0f}, "bottleneck"',
            )
        )
    return edits


def main(argv):
    args = [a for a in argv[1:] if not a.startswith("--")]
    if not args:
        print("usage: refresh_perf_claims.py <bench.log|BENCH.json> [--apply]")
        return 2
    do_apply = "--apply" in argv
    src = Path(args[0])
    bench = load_bench(src)
    if bench is None:
        print(f"no bench JSON found in {args[0]}; nothing to do")
        return 1
    print("bench:", json.dumps(bench))
    artifact = _artifact_name(src, bench)

    changed = []
    for path, pattern, new in plan_edits(bench, artifact):
        text = path.read_text()
        hits = re.findall(pattern, text)
        if not hits:
            print(f"[skip] no match in {path.name}: {pattern!r}")
            continue
        if len(hits) > 1:
            print(f"[refuse] {len(hits)} matches in {path.name}: {pattern!r}")
            continue
        if hits[0] == new:
            print(f"[ok] {path.name} already current: {new.splitlines()[0]!r}")
            continue
        print(f"[edit] {path.name}: {hits[0]!r} -> {new!r}")
        if do_apply:
            path.write_text(re.sub(pattern, new.replace("\\", r"\\"), text, count=1))
            rel = str(path.relative_to(REPO))
            if rel not in changed:
                changed.append(rel)

    if do_apply and changed:
        step = bench["value"]
        epoch = bench.get("epoch_level")
        msg = (
            "Refresh performance claims from the captured TPU bench\n\n"
            f"Measured: step {step} seq-pairs/s"
            + (f", epoch {epoch}" if epoch is not None else "")
            + ". Applied by tools/refresh_perf_claims.py from "
            + src.name
            + "."
        )
        subprocess.run(
            ["git", "commit", "-m", msg, "--"] + changed, cwd=REPO, check=False
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
