"""ctypes bindings for the native (C++) runtime pieces.

`parse_midi_bytes(data)` returns the flat-array parse of one SMF buffer
(see smf_scan.cc for layout) or None when the native library is absent
or reports an error — callers fall back to the pure-Python path, which
is also the semantics oracle in tests.

The library is built with `make -C musicgeneration_tpu/native`; on first
use this module attempts a quiet best-effort build (disable with
MG_NATIVE_BUILD=0).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libmgsmf.so")
_lock = threading.Lock()
_lib = None
_tried = False


class _MgParse(ctypes.Structure):
    _fields_ = [
        ("notes", ctypes.POINTER(ctypes.c_int64)),
        ("n_notes", ctypes.c_int64),
        ("controls", ctypes.POINTER(ctypes.c_int64)),
        ("n_controls", ctypes.c_int64),
        ("tempos", ctypes.POINTER(ctypes.c_int64)),
        ("n_tempos", ctypes.c_int64),
        ("metas", ctypes.POINTER(ctypes.c_int64)),
        ("n_metas", ctypes.c_int64),
        ("n_tracks", ctypes.c_int32),
        ("ticks_per_beat", ctypes.c_int32),
        ("max_tick", ctypes.c_int64),
        ("error", ctypes.c_int32),
    ]


def _build() -> bool:
    if os.environ.get("MG_NATIVE_BUILD", "1") == "0":
        return False
    try:
        subprocess.run(["make", "-C", _HERE, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:  # noqa: BLE001 — optional accelerator
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.mg_parse.restype = ctypes.POINTER(_MgParse)
            lib.mg_parse.argtypes = [ctypes.c_char_p, ctypes.c_int64]
            lib.mg_free.argtypes = [ctypes.POINTER(_MgParse)]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def parse_midi_bytes(data: bytes) -> Optional[Dict[str, np.ndarray]]:
    """Parse one SMF buffer natively. None = unavailable or parse error
    (caller falls back to Python)."""
    lib = _load()
    if lib is None:
        return None
    ptr = lib.mg_parse(data, len(data))
    try:
        p = ptr.contents
        if p.error:
            return None

        def arr(cptr, n, width):
            if n == 0:
                return np.zeros((0, width), np.int64)
            flat = np.ctypeslib.as_array(cptr, shape=(n * width,))
            return flat.reshape(n, width).copy()

        return {
            "notes": arr(p.notes, p.n_notes, 7),
            "controls": arr(p.controls, p.n_controls, 6),
            "tempos": arr(p.tempos, p.n_tempos, 2),
            "metas": arr(p.metas, p.n_metas, 5),
            "n_tracks": int(p.n_tracks),
            "ticks_per_beat": int(p.ticks_per_beat),
            "max_tick": int(p.max_tick),
        }
    finally:
        lib.mg_free(ptr)
