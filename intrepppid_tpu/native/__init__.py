"""Native (C++) components, loaded via ctypes.

Auto-builds with the in-tree Makefile on first use (g++ is part of the
supported toolchain); falls back silently when no compiler is available —
callers must handle ``load_spm_library() is None`` by using the pure-Python
engines.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / "build" / "libspm_unigram.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_attempted = False


def build_native(force: bool = False) -> bool:
    """Compile the native library. Returns True on success."""
    if _LIB_PATH.exists() and not force:
        src_mtime = (_HERE / "spm_unigram.cc").stat().st_mtime
        if _LIB_PATH.stat().st_mtime >= src_mtime:
            return True
    try:
        subprocess.run(
            ["make", "-C", str(_HERE)],
            check=True,
            capture_output=True,
            timeout=300,
        )
        return _LIB_PATH.exists()
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def load_spm_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the tokenizer library; None if unavailable.

    Set ``INTREPPPID_TPU_NO_NATIVE=1`` to force the pure-Python fallback.
    """
    global _lib, _build_attempted
    if os.environ.get("INTREPPPID_TPU_NO_NATIVE"):
        return None
    with _lock:
        if _lib is not None:
            return _lib
        if _build_attempted and not _LIB_PATH.exists():
            return None
        _build_attempted = True
        if not build_native():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            # stale or foreign-architecture binary: rebuild once, else fall
            # back to the pure-Python engine
            if not build_native(force=True):
                return None
            try:
                lib = ctypes.CDLL(str(_LIB_PATH))
            except OSError:
                return None
        lib.spm_load.restype = ctypes.c_void_p
        lib.spm_load.argtypes = [ctypes.c_char_p]
        lib.spm_free.argtypes = [ctypes.c_void_p]
        lib.spm_seed.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        for fn in ("spm_vocab_size", "spm_unk_id", "spm_bos_id", "spm_eos_id", "spm_pad_id"):
            getattr(lib, fn).restype = ctypes.c_int
            getattr(lib, fn).argtypes = [ctypes.c_void_p]
        lib.spm_lattice_cache_stats.restype = None
        lib.spm_lattice_cache_stats.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.spm_encode.restype = ctypes.c_int
        lib.spm_encode.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        lib.spm_encode_batch.restype = ctypes.c_int
        lib.spm_encode_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
            ctypes.c_int,
        ]
        _lib = lib
        return _lib
