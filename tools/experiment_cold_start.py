"""Cold-start attribution: where do the slow first epochs go?

`BENCH_r04.json` recorded an epoch ladder of 339 / 1556 / 4136 / 4354
seq-pairs/s — the first epochs run up to 13x below the warm rate even
though every entry point enables the persistent XLA compilation cache
(`utils/jax_cache.py`). Candidate causes, which this experiment separates:

* **XLA compilation** (bucket-ladder shapes x K-stacked executables) —
  skipped on a persistent-cache hit, so comparing a run against an empty
  cache dir with a rerun against the now-seeded dir isolates it.
* **Tracing/lowering** — jax re-traces in every process regardless of the
  persistent cache; shows up as epoch-1 cost that survives a warm cache.
* **Platform/tunnel warm-up and host caches** (lattice cache, h5 page
  cache) — whatever remains, including the epoch-2/3 climb that compile
  alone can't explain (lazily-compiled shapes all first appear in
  epoch 1).

Arms (each a fresh subprocess running ``bench.epoch_bench`` — the real
4-epoch `Trainer.fit` over the 10k synthetic HDF5):

A. cold-fresh : empty private ``JAX_COMPILATION_CACHE_DIR``
B. warm-same  : the same dir again -> persistent-cache hits
C. warm-again : the same dir a third time (repeatability of B)

Per-arm output: the epoch-rate ladder, total wall, and the cache dir's
entry count/bytes afterwards. The final ``COLD_START_SUMMARY {json}``
line is what the r5 queue's skip logic and docs/performance.md consume.

Usage: python tools/experiment_cold_start.py  (on the TPU)
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import json, sys
sys.path.insert(0, {repo!r})
import bench
warm, mn, mx, bot, rates = bench.epoch_bench(step_pairs_per_s=4360.0)
print("EPOCHS " + json.dumps({{"rates": rates, "warm": warm}}), flush=True)
"""


def cache_stats(d: Path):
    files = [p for p in d.rglob("*") if p.is_file()]
    return len(files), sum(p.stat().st_size for p in files)


def run_arm(name: str, cache_dir: Path):
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = str(cache_dir)
    env.pop("INTREPPPID_TPU_NO_COMPILE_CACHE", None)
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=str(REPO))],
        env=env,
        cwd=str(REPO),
        capture_output=True,
        text=True,
        timeout=2100,
    )
    wall = time.perf_counter() - t0
    rates = None
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("EPOCHS "):
            rates = json.loads(line[len("EPOCHS "):])
            break
    n, b = cache_stats(cache_dir)
    print(f"[{name}] rc={proc.returncode} wall={wall:.1f}s "
          f"cache: {n} entries, {b/1e6:.1f} MB", flush=True)
    if rates is None:
        print(proc.stdout[-2000:])
        print(proc.stderr[-3000:])
        return {"name": name, "rc": proc.returncode, "wall_s": round(wall, 1)}
    print(f"[{name}] epoch ladder: "
          + " / ".join(f"{r:.0f}" for r in rates["rates"]), flush=True)
    return {
        "name": name,
        "rc": proc.returncode,
        "wall_s": round(wall, 1),
        "rates": [round(r, 1) for r in rates["rates"]],
        "cache_entries": n,
        "cache_mb": round(b / 1e6, 1),
    }


def main():
    # make sure the bench corpus exists before timing anything (its
    # one-time build would otherwise land inside arm A's wall time)
    h5 = REPO / ".bench_cache" / "bench.h5"
    if not h5.exists():
        subprocess.run(
            [sys.executable, str(REPO / "tools" / "make_bench_dataset.py"),
             str(h5)],
            check=True,
        )

    cache = Path(tempfile.mkdtemp(prefix="coldstart_jaxcache_"))
    arms = []
    try:
        arms.append(run_arm("A.cold-fresh", cache))
        arms.append(run_arm("B.warm-same", cache))
        arms.append(run_arm("C.warm-again", cache))
    finally:
        shutil.rmtree(cache, ignore_errors=True)

    out = {"arms": arms}
    ok = [a for a in arms if a.get("rates")]
    if len(ok) >= 2 and len(ok[0]["rates"]) >= 2:
        a, b = ok[0], ok[1]
        out["epoch1_cold_vs_warmcache"] = (
            round(a["rates"][0], 1), round(b["rates"][0], 1))
        # if epoch 1 stays slow under a fully warm persistent cache, the
        # band is tracing/platform warm-up, not XLA compilation
        out["compile_attributed"] = bool(
            b["rates"][0] > 2.0 * a["rates"][0])
    print("COLD_START_SUMMARY " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
