"""Turn the r4 TPU queue's measurements into applied defaults.

The queue (`tools/run_r4_tpu_queue.sh`) fires unattended when the TPU
tunnel recovers; the two decision-pending defaults it measures —
``PACK_BOUNDARY`` (`ops/lstm_pallas_packed.py`) and the trainer's
steps-per-dispatch K (`train/trainer.py:resolve_steps_per_dispatch`) —
would otherwise sit undecided until someone reads the logs (VERDICT r3
missing #2). This script parses the experiment logs, writes a
``DECISIONS.json`` record next to them, and with ``--apply`` edits the two
defaults in place and commits, so the queue's final bench step (and the
driver's round-end bench) measure the *decided* configuration.

Decision rules (conservative, stated here so the unattended run is
auditable):

* pack_boundary: flip to True only if the composed fwd+bwd speedup is
  >= 1.02x AND the log's bitwise-parity check printed OK. Below that the
  measured wash is recorded and the default stays False.
* dispatch_k: re-pin the trainer default to the K with the best measured
  ms/step; ties within 2% prefer the SMALLER K (finer logging/bucket
  granularity for the same speed).
* bwd_chunk / scaled_config: informational — summarised into
  DECISIONS.json only (no single-line default exists to flip).

Any parse failure or missing log degrades to "no decision" for that item;
the script never guesses.

Usage: python tools/apply_queue_decisions.py [queue_dir] [--apply]
"""
from __future__ import annotations

import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PACKED = REPO / "intrepppid_tpu" / "ops" / "lstm_pallas_packed.py"
TRAINER = REPO / "intrepppid_tpu" / "train" / "trainer.py"
PERF_DOC = REPO / "docs" / "performance.md"
PARITY_DOC = REPO / "PARITY.md"

PACK_FLIP_THRESHOLD = 1.02
K_TIE_BAND = 1.02


def _read(path: Path):
    try:
        return path.read_text()
    except OSError:
        return None


def decide_pack_boundary(log: str):
    m = re.search(
        r"best: v6 ([\d.]+) ms {2}v7 ([\d.]+) ms {2}speedup ([\d.]+)x", log
    )
    if not m:
        return {"status": "unparseable"}
    v6, v7, speedup = float(m.group(1)), float(m.group(2)), float(m.group(3))
    parity_ok = "bitwise gradient parity: OK" in log
    flip = parity_ok and speedup >= PACK_FLIP_THRESHOLD
    return {
        "status": "decided",
        "v6_ms": v6,
        "v7_ms": v7,
        "speedup": speedup,
        "parity_ok": parity_ok,
        "set_pack_boundary": flip,
    }


def decide_dispatch_k(log: str):
    rows = re.findall(r"K=(\d+): best ([\d.]+) ms/step", log)
    if not rows:
        return {"status": "unparseable"}
    table = {int(k): float(ms) for k, ms in rows}
    fastest = min(table.values())
    # smallest K whose time is within the tie band of the fastest
    best_k = min(k for k, ms in table.items() if ms <= fastest * K_TIE_BAND)
    return {"status": "decided", "ms_per_step": table, "best_k": best_k}


def summarize_bwd_chunk(log: str):
    m = re.search(
        r"A \(C=1 in-kernel\): ([\d.]+) ms\n"
        r"B \(C=2 \+ shifts\): +([\d.]+) ms \(([\d.]+)x vs A\)",
        log,
    )
    if not m:
        return {"status": "unparseable"}
    return {
        "status": "recorded",
        "a_c1_ms": float(m.group(1)),
        "b_c2_shifts_ms": float(m.group(2)),
        "b_vs_a": float(m.group(3)),
    }


def summarize_scaled_config(log: str):
    m = re.search(r"best: ([\d.]+) ms/step +\(([\d.]+) seq-pairs/s\)", log)
    out = {"status": "recorded" if m else "unparseable"}
    if m:
        out["ms_per_step"] = float(m.group(1))
        out["seq_pairs_per_s"] = float(m.group(2))
    plans = re.findall(r"pick_plan .*", log)
    if plans:
        out["plans"] = plans
    return out


def apply_pack_boundary(flip: bool) -> bool:
    """Rewrite the PACK_BOUNDARY default; True means an edit was made."""
    src = PACKED.read_text()
    if not flip:
        return False  # default already False; nothing to edit
    if "PACK_BOUNDARY = True" in src:
        return False  # already applied
    if "PACK_BOUNDARY = False" not in src:
        raise RuntimeError("PACK_BOUNDARY assignment not found")
    src = src.replace("PACK_BOUNDARY = False", "PACK_BOUNDARY = True", 1)
    src = src.replace(
        "# Requires PACK_CS. Default OFF:",
        "# Requires PACK_CS. Default ON (measured TPU win, see"
        " tools/apply_queue_decisions.py / DECISIONS.json). Was OFF:",
        1,
    )
    PACKED.write_text(src)
    return True


def apply_dispatch_k(best_k: int, table) -> bool:
    src = TRAINER.read_text()
    anchor = 'return 1 if jax.devices()[0].platform.lower() == "cpu" else '
    m = re.search(re.escape(anchor) + r"(\d+)", src)
    if not m:
        raise RuntimeError("steps-per-dispatch default not found")
    if int(m.group(1)) == best_k:
        return False
    src = src[: m.start()] + anchor + str(best_k) + src[m.end():]
    # refresh the docstring's measured numbers if the v5-era sentence is
    # still there (best-effort; the constant is the behavioural change)
    doc = re.search(
        r"measured 27\.0/25\.9/26\.0\s+ms/step at K=5/10/20 on the bench "
        r"config — K=10 is the knee\.",
        src,
    )
    if doc:
        ks = "/".join(str(k) for k in sorted(table))
        ms = "/".join(f"{table[k]:.1f}" for k in sorted(table))
        src = (
            src[: doc.start()]
            + f"measured {ms}\n    ms/step at K={ks} on the bench config "
            f"(v6.3-kernel re-sweep) — K={best_k} is the knee."
            + src[doc.end():]
        )
    TRAINER.write_text(src)
    # keep PARITY.md's mention of the default in step (best-effort anchor)
    psrc = PARITY_DOC.read_text()
    panchor = "default K=10 on TPU-class backends"
    if panchor in psrc:
        PARITY_DOC.write_text(
            psrc.replace(
                panchor, f"default K={best_k} on TPU-class backends", 1
            )
        )
    return True


def record_in_perf_doc(decisions) -> bool:
    """Append the measured verdicts as a section in docs/performance.md
    (idempotent: skipped if the section is already there)."""
    marker = "## Serialized-queue verdicts (measured on-chip)"
    src = PERF_DOC.read_text()
    if marker in src:
        return False
    lines = [marker, ""]
    pb = decisions.get("pack_boundary", {})
    if pb.get("status") == "decided":
        verdict = "flipped ON" if pb["set_pack_boundary"] else "kept OFF"
        lines.append(
            f"- **v7 pair-packed boundary**: v6 {pb['v6_ms']:.2f} ms vs v7 "
            f"{pb['v7_ms']:.2f} ms composed fwd+bwd ({pb['speedup']:.3f}x) — "
            f"`PACK_BOUNDARY` {verdict}."
        )
    dk = decisions.get("dispatch_k", {})
    if dk.get("status") == "decided":
        tbl = "  ".join(
            f"K={k}:{v:.2f}ms"
            for k, v in sorted((int(a), b) for a, b in dk["ms_per_step"].items())
        )
        lines.append(
            f"- **Steps-per-dispatch re-sweep (v6.3 kernels)**: {tbl} — "
            f"trainer default pinned at K={dk['best_k']} (ties within 2% "
            "prefer the smaller K for logging granularity)."
        )
    bc = decisions.get("bwd_chunk", {})
    if bc.get("status") == "recorded":
        lines.append(
            f"- **Backward C=2 chunking bound**: C=1 in-kernel "
            f"{bc['a_c1_ms']:.2f} ms vs C=2+shifts {bc['b_c2_shifts_ms']:.2f} "
            f"ms ({bc['b_vs_a']:.3f}x) — upper bound on the chunked-backward "
            "win before reclaiming the shift-copy cost."
        )
    sc = decisions.get("scaled_config", {})
    if sc.get("status") == "recorded" and "seq_pairs_per_s" in sc:
        lines.append(
            f"- **Scaled config (embedding 256, 3-layer, batch 80, T=1500)**: "
            f"{sc['ms_per_step']:.2f} ms/step = {sc['seq_pairs_per_s']:.0f} "
            "seq-pairs/s on-chip — validates the lite-backward H>=192 plan "
            "choice (plan lines in DECISIONS.json)."
        )
    if len(lines) <= 2:
        return False
    lines.append("")
    lines.append(
        "Recorded automatically by `tools/apply_queue_decisions.py` from the "
        "serialized TPU queue's experiment logs (`DECISIONS.json`)."
    )
    PERF_DOC.write_text(src.rstrip() + "\n\n" + "\n".join(lines) + "\n")
    return True


def main(argv):
    args = [a for a in argv[1:] if not a.startswith("--")]
    queue_dir = Path(args[0]) if args else Path("/tmp/r4_tpu_queue")
    do_apply = "--apply" in argv

    decisions = {}
    log = _read(queue_dir / "pack_boundary.log")
    decisions["pack_boundary"] = (
        decide_pack_boundary(log) if log else {"status": "missing"}
    )
    log = _read(queue_dir / "dispatch_k.log")
    decisions["dispatch_k"] = (
        decide_dispatch_k(log) if log else {"status": "missing"}
    )
    log = _read(queue_dir / "bwd_chunk.log")
    decisions["bwd_chunk"] = (
        summarize_bwd_chunk(log) if log else {"status": "missing"}
    )
    log = _read(queue_dir / "scaled_config.log")
    decisions["scaled_config"] = (
        summarize_scaled_config(log) if log else {"status": "missing"}
    )

    changed = []
    if do_apply:
        pb = decisions["pack_boundary"]
        if pb.get("status") == "decided":
            try:
                if apply_pack_boundary(pb["set_pack_boundary"]):
                    changed.append(str(PACKED.relative_to(REPO)))
            except RuntimeError as e:
                pb["apply_error"] = str(e)
        dk = decisions["dispatch_k"]
        if dk.get("status") == "decided":
            try:
                if apply_dispatch_k(
                    dk["best_k"],
                    {int(k): v for k, v in dk["ms_per_step"].items()},
                ):
                    changed.append(str(TRAINER.relative_to(REPO)))
                    # PARITY.md may have been touched alongside (harmless
                    # in the commit pathspec if it wasn't)
                    changed.append(str(PARITY_DOC.relative_to(REPO)))
            except RuntimeError as e:
                dk["apply_error"] = str(e)
        if record_in_perf_doc(decisions):
            changed.append(str(PERF_DOC.relative_to(REPO)))

    decisions["applied_files"] = changed
    out = queue_dir / "DECISIONS.json"
    try:
        out.write_text(json.dumps(decisions, indent=2))
    except OSError:
        pass
    print(json.dumps(decisions, indent=2))

    if do_apply and changed:
        pb, dk = decisions["pack_boundary"], decisions["dispatch_k"]
        msg_lines = ["Apply measured TPU-queue kernel/dispatch defaults", ""]
        if pb.get("status") == "decided":
            msg_lines.append(
                f"pack_boundary: v6 {pb['v6_ms']:.2f} ms vs v7 "
                f"{pb['v7_ms']:.2f} ms ({pb['speedup']:.3f}x) -> "
                f"PACK_BOUNDARY={pb['set_pack_boundary']}"
            )
        if dk.get("status") == "decided":
            tbl = ", ".join(
                f"K={k}:{v:.2f}ms" for k, v in sorted(
                    (int(a), b) for a, b in dk["ms_per_step"].items()
                )
            )
            msg_lines.append(f"dispatch_k: {tbl} -> default K={dk['best_k']}")
        msg_lines.append("")
        msg_lines.append(
            "Decided by tools/apply_queue_decisions.py from the serialized "
            "TPU experiment logs (DECISIONS.json alongside them)."
        )
        subprocess.run(
            ["git", "commit", "-m", "\n".join(msg_lines), "--"] + changed,
            cwd=REPO,
            check=False,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
