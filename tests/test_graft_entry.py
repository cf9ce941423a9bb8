"""Driver-entry contract tests.

The driver runs ``__graft_entry__.dryrun_multichip(8)`` in an environment
with ONE device and a possibly pre-initialized jax backend (sitecustomize
imports jax on the axon platform). Round 1 failed exactly here
(MULTICHIP_r01.json: ok=false, "need 8 devices, have 1"), so this pins the
self-bootstrap behavior.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_self_bootstraps_from_one_device():
    # Simulate the driver: backend already initialized with a single device
    # before dryrun_multichip is called. The entry must still succeed by
    # re-execing itself onto a virtual 8-device CPU platform.
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    # CPU-only subprocess: drop the axon sitecustomize trigger so a down
    # TPU tunnel can't hang the interpreter at import (register() dials
    # the pool with no timeout — observed as a 600 s spurious timeout).
    env.pop("PALLAS_AXON_POOL_IPS", None)
    code = (
        "import jax; assert len(jax.devices()) == 1, jax.devices(); "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8): OK" in proc.stdout
    # both passes must have run: the toy hybrid layout AND the
    # scaled-config shape (vocab 8192, emb 256, 3-layer) with its
    # single-device loss-parity assertion (VERDICT r4 item 7)
    assert "[toy" in proc.stdout, proc.stdout
    assert "[scaled" in proc.stdout, proc.stdout
    assert "single-device loss parity OK" in proc.stdout, proc.stdout


def test_entry_is_jittable():
    import jax

    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    fn, args = g.entry()
    loss, auroc = jax.jit(fn)(*args)
    assert loss.shape == ()
