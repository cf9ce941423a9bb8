"""Persistent XLA compilation cache.

Pallas kernel compiles on the tunnelled TPU platform cost minutes per
executable (the compile runs in a remote AOT helper). The jax persistent
compilation cache works on that backend — measured: a v5 backward sweep
that took ~6 min to compile loads in under a second on the next process —
so every entry point enables it by default.

Opt out with ``INTREPPPID_TPU_NO_COMPILE_CACHE=1``; override the location
with ``JAX_COMPILATION_CACHE_DIR`` (which jax itself also honors — if it
is set, jax has already picked it up and this helper leaves it alone).
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "intrepppid_tpu", "jaxcache"
)


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point jax's persistent compilation cache at a writable directory.

    Returns the directory in use, or ``None`` when disabled. Safe to call
    multiple times and before/after jax initializes a backend.
    """
    if os.environ.get("INTREPPPID_TPU_NO_COMPILE_CACHE"):
        return None
    env_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env_dir:
        return env_dir  # jax already configured itself from the env
    import jax

    path = cache_dir or _DEFAULT_DIR
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
    except (OSError, AttributeError):  # read-only FS / very old jax
        return None
    return path
