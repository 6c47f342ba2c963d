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
            _f64 = np.ctypeslib.ndpointer(np.float64, flags="C")
            _i64 = np.ctypeslib.ndpointer(np.int64, flags="C")
            _u16 = np.ctypeslib.ndpointer(np.uint16, flags="C")
            lib.mg_encode_midilike.restype = ctypes.c_int64
            lib.mg_encode_midilike.argtypes = [
                _f64, _f64, _i64, _i64, ctypes.c_int64,      # notes
                _f64, ctypes.c_int64, _f64, ctypes.c_int64,  # bins
                ctypes.c_int64, ctypes.c_int64,              # pitch range
                ctypes.c_int64, ctypes.c_int64,              # vel range
                ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64,              # id offsets
                _u16, ctypes.c_int64,                        # out
            ]
            lib.mg_encode_remi.restype = ctypes.c_int64
            lib.mg_encode_remi.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,             # file bytes
                _i64, ctypes.c_int64, _i64, ctypes.c_int64,  # dur/vel bins
                ctypes.c_int64, ctypes.c_int64,              # resolution, frac
                ctypes.c_int64, ctypes.c_int64,              # vel_steps, pmax
                ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64,              # tempo intervals
                _i64,                                        # chord id table
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64,              # token offsets
                _u16, ctypes.c_int64,                        # out
            ]
            lib.mg_encode_pedal.restype = ctypes.c_int64
            lib.mg_encode_pedal.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,             # file bytes
                ctypes.c_int32,                              # faithful
                _u16, ctypes.c_int64,                        # out
            ]
            lib.mg_encode_cp.restype = ctypes.c_int64
            lib.mg_encode_cp.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,             # file bytes
                _i64, ctypes.c_int64, _i64, ctypes.c_int64,  # dur/vel bins
                ctypes.c_int64, ctypes.c_int64,              # resolution, frac
                ctypes.c_int64, ctypes.c_int64,              # vel_steps, pmax
                ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64,              # tempo intervals
                _i64, _i64,                                  # chords, ignores
                _u16, ctypes.c_int64,                        # out (rows)
            ]
            lib.mg_encode_mumidi.restype = ctypes.c_int64
            lib.mg_encode_mumidi.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,             # file bytes
                ctypes.c_char_p, ctypes.c_int64,             # role names
                ctypes.c_int64, ctypes.c_int64,              # mask, drum role
                _i64, ctypes.c_int64, _i64, ctypes.c_int64,  # dur/vel bins
                ctypes.c_int64, ctypes.c_int64,              # resolution, frac
                ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64,                              # pitch/drum/n
                ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64,              # tempo intervals
                _i64,                                        # chord id table
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                _u16, ctypes.c_int64,                        # out
            ]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def encode_midilike(starts: np.ndarray, ends: np.ndarray,
                    pitches: np.ndarray, vels: np.ndarray,
                    vel_bins: np.ndarray, ts_bins: np.ndarray,
                    pitch_range, vel_range,
                    offsets) -> Optional[np.ndarray]:
    """MIDI-like event emission in C++ (smf_scan.cc mg_encode_midilike;
    reference algorithm sequence.py:145-183). Notes must already be in
    the reference NoteSeq order. `offsets` = (note_on, note_off,
    velocity, time_shift) token-id starts from the vocab spec. None =
    library unavailable (caller falls back to Python)."""
    lib = _load()
    if lib is None or getattr(lib, "mg_encode_midilike", None) is None:
        return None
    n = len(starts)
    starts = np.ascontiguousarray(starts, np.float64)
    ends = np.ascontiguousarray(ends, np.float64)
    pitches = np.ascontiguousarray(pitches, np.int64)
    vels = np.ascontiguousarray(vels, np.int64)
    vel_bins = np.ascontiguousarray(vel_bins, np.float64)
    ts_bins = np.ascontiguousarray(ts_bins, np.float64)
    # 3 tokens per note + greedy shifts: <= span/bins[-1] full bins total
    # plus at most 2 sub-max tokens per gap (3n-1 gaps)
    span = float(ends.max() - starts.min()) if n else 0.0
    cap = int(3 * n + span / float(ts_bins[-1]) + 6 * n + 64)
    out = np.empty(cap, np.uint16)
    m = lib.mg_encode_midilike(
        starts, ends, pitches, vels, n,
        vel_bins, len(vel_bins), ts_bins, len(ts_bins),
        pitch_range.start, pitch_range.stop,
        vel_range.start, vel_range.stop,
        offsets[0], offsets[1], offsets[2], offsets[3],
        out, cap)
    if m < 0:
        return None
    return out[:m].copy()


def encode_remi(data: bytes, dur_bins: np.ndarray, vel_bins: np.ndarray,
                resolution: int, fraction: int, vel_steps: int,
                pitch_max: int, tempo_bounds, chord_ids: np.ndarray,
                offsets) -> Optional[np.ndarray]:
    """Full-file REMI tokenization in C++ (smf_scan.cc mg_encode_remi):
    SMF parse -> instrument-0 notes -> 120-tick quantize -> chord
    inference -> bar grouping -> tokens, replicating the reference
    pipeline REMI.py:64-257 with the quirks tokenizers/remi.py documents.
    `offsets` = (note_on, note_duration, note_velocity, bar, position,
    tempo_class, tempo_value, chord) token-id starts; `tempo_bounds` =
    (30, 90, 150, 210)-style interval edges; `chord_ids[q*12+r]` + [60]
    for N:N from vocab.CHORD_MAP. None = unavailable or a parse/tempo
    error (caller falls back to the Python oracle path)."""
    lib = _load()
    if lib is None or getattr(lib, "mg_encode_remi", None) is None:
        return None
    dur_bins = np.ascontiguousarray(dur_bins, np.int64)
    vel_bins = np.ascontiguousarray(vel_bins, np.int64)
    chord_ids = np.ascontiguousarray(chord_ids, np.int64)
    cap = 4096
    for _ in range(3):
        out = np.empty(cap, np.uint16)
        m = lib.mg_encode_remi(
            data, len(data), dur_bins, len(dur_bins),
            vel_bins, len(vel_bins),
            resolution, fraction, vel_steps, pitch_max,
            tempo_bounds[0], tempo_bounds[1], tempo_bounds[2],
            tempo_bounds[3], chord_ids,
            offsets[0], offsets[1], offsets[2], offsets[3],
            offsets[4], offsets[5], offsets[6], offsets[7],
            out, cap)
        if m == -1:
            return None
        if m < -1:
            cap = -m  # exact size needed; retry once
            continue
        return out[:m].copy()
    return None


def encode_pedal(data: bytes, faithful: bool = False
                 ) -> Optional[np.ndarray]:
    """Full-file sustain-pedal codec (vocab 388) in C++ (smf_scan.cc
    mg_encode_pedal; reference MusicTransformer/processor.py:202-230).
    Token ids as uint16, or None when the library is unavailable or
    parsing failed (caller falls back to the Python oracle path)."""
    lib = _load()
    if lib is None or getattr(lib, "mg_encode_pedal", None) is None:
        return None
    cap = 8192
    for _ in range(3):
        out = np.empty(cap, np.uint16)
        m = lib.mg_encode_pedal(data, len(data), int(faithful), out, cap)
        if m == -1:
            return None
        if m < -1:
            cap = -m
            continue
        return out[:m].copy()
    return None


def encode_cp(data: bytes, dur_bins: np.ndarray, vel_bins: np.ndarray,
              resolution: int, fraction: int, vel_steps: int,
              pitch_max: int, tempo_bounds, chord_ids: np.ndarray,
              ignore_ids: np.ndarray) -> Optional[np.ndarray]:
    """Full-file CP (Compound Word) tokenization in C++ (smf_scan.cc
    mg_encode_cp). Returns [T, 8] uint16 rows, or None when the library
    is unavailable or parsing failed (caller falls back to the Python
    path in tokenizers/cp.py, the semantics oracle)."""
    lib = _load()
    if lib is None or getattr(lib, "mg_encode_cp", None) is None:
        return None
    dur_bins = np.ascontiguousarray(dur_bins, np.int64)
    vel_bins = np.ascontiguousarray(vel_bins, np.int64)
    chord_ids = np.ascontiguousarray(chord_ids, np.int64)
    ignore_ids = np.ascontiguousarray(ignore_ids, np.int64)
    cap = 2048
    for _ in range(3):
        out = np.empty(cap * 8, np.uint16)
        m = lib.mg_encode_cp(
            data, len(data), dur_bins, len(dur_bins),
            vel_bins, len(vel_bins),
            resolution, fraction, vel_steps, pitch_max,
            tempo_bounds[0], tempo_bounds[1], tempo_bounds[2],
            tempo_bounds[3], chord_ids, ignore_ids,
            out, cap)
        if m == -1:
            return None
        if m < -1:
            cap = -m
            continue
        return out[:m * 8].reshape(m, 8).copy()
    return None


def encode_mumidi(data: bytes, role_names, role_mask: int, drum_role: int,
                  dur_bins: np.ndarray, vel_bins: np.ndarray,
                  resolution: int, fraction: int,
                  pitch_lo: int, drum_lo: int, n_pitch: int,
                  tempo_bounds, chord_ids: np.ndarray,
                  offsets) -> Optional[np.ndarray]:
    """One MuMIDI con_instr subset in C++ (smf_scan.cc mg_encode_mumidi;
    reference MuMIDI.py:86-207). `role_names` = the 6 track roles in
    vocab order; `role_mask` selects which to include (melody-only vs
    the 5 arrangement roles); `offsets` = (note_on, note_duration,
    note_velocity, bar, position, track, tempo_class, tempo_value,
    chord) token-id starts. Returns an EMPTY array when the file has no
    selected notes (the caller's None case) and None when the library
    is unavailable or parsing failed (fall back to Python)."""
    lib = _load()
    if lib is None or getattr(lib, "mg_encode_mumidi", None) is None:
        return None
    blob = b"".join(name.encode("ascii") + b"\0" for name in role_names)
    dur_bins = np.ascontiguousarray(dur_bins, np.int64)
    vel_bins = np.ascontiguousarray(vel_bins, np.int64)
    chord_ids = np.ascontiguousarray(chord_ids, np.int64)
    cap = 4096
    for _ in range(3):
        out = np.empty(cap, np.uint16)
        m = lib.mg_encode_mumidi(
            data, len(data), blob, len(role_names), role_mask, drum_role,
            dur_bins, len(dur_bins), vel_bins, len(vel_bins),
            resolution, fraction, pitch_lo, drum_lo, n_pitch,
            tempo_bounds[0], tempo_bounds[1], tempo_bounds[2],
            tempo_bounds[3], chord_ids,
            offsets[0], offsets[1], offsets[2], offsets[3], offsets[4],
            offsets[5], offsets[6], offsets[7], offsets[8],
            out, cap)
        if m == -1:
            return None
        if m < -1:
            cap = -m
            continue
        return out[:m].copy()
    return None


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
