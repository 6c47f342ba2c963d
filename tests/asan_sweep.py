"""Feed truncated + mutated MIDI bytes through every native entry point
under ASAN. Any OOB read/write aborts the process with an ASAN report."""
import ctypes
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np

lib = ctypes.CDLL(os.environ["MG_ASAN_LIB"])

class _MgParse(ctypes.Structure):
    _fields_ = [("notes", ctypes.POINTER(ctypes.c_int64)),
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
                ("error", ctypes.c_int32)]

lib.mg_parse.restype = ctypes.POINTER(_MgParse)
lib.mg_parse.argtypes = [ctypes.c_char_p, ctypes.c_int64]
lib.mg_free.argtypes = [ctypes.POINTER(_MgParse)]
u16 = np.ctypeslib.ndpointer(np.uint16, flags="C")
i64 = np.ctypeslib.ndpointer(np.int64, flags="C")
lib.mg_encode_remi.restype = ctypes.c_int64
lib.mg_encode_remi.argtypes = [ctypes.c_char_p, ctypes.c_int64,
    i64, ctypes.c_int64, i64, ctypes.c_int64,
    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    i64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    u16, ctypes.c_int64]
lib.mg_encode_pedal.restype = ctypes.c_int64
lib.mg_encode_pedal.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                ctypes.c_int32, u16, ctypes.c_int64]
lib.mg_encode_cp.restype = ctypes.c_int64
lib.mg_encode_cp.argtypes = [ctypes.c_char_p, ctypes.c_int64,
    i64, ctypes.c_int64, i64, ctypes.c_int64,
    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    i64, i64, u16, ctypes.c_int64]
lib.mg_encode_mumidi.restype = ctypes.c_int64
lib.mg_encode_mumidi.argtypes = [ctypes.c_char_p, ctypes.c_int64,
    ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    i64, ctypes.c_int64, i64, ctypes.c_int64,
    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    ctypes.c_int64,
    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    i64,
    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    ctypes.c_int64,
    u16, ctypes.c_int64]

from musicgeneration_tpu import vocab
dur = np.ascontiguousarray(vocab.REMI_DURATION_BINS, np.int64)
vel = np.ascontiguousarray(vocab.REMI_VELOCITY_BINS, np.int64)
mdur = np.ascontiguousarray(vocab.MUMIDI_DURATION_BINS, np.int64)
mvel = np.ascontiguousarray(vocab.MUMIDI_VELOCITY_BINS, np.int64)
chords = np.arange(61, dtype=np.int64)
ign = np.array([3, 17, 3, 60, 61, 127, 64, 4], np.int64)
roles = b"melody\0piano\0bass\0guitar\0string\0drum\0"
out = np.empty(1 << 20, np.uint16)
CAP = 1 << 20

def run_all(data):
    p = lib.mg_parse(data, len(data))
    lib.mg_free(p)
    lib.mg_encode_remi(data, len(data), dur, len(dur), vel, len(vel),
                       480, 16, 4, 126, 30, 90, 150, 210, chords,
                       0, 100, 200, 250, 260, 280, 285, 290, out, CAP)
    lib.mg_encode_pedal(data, len(data), 0, out, CAP)
    lib.mg_encode_pedal(data, len(data), 1, out, CAP)
    lib.mg_encode_cp(data, len(data), dur, len(dur), vel, len(vel),
                     480, 16, 4, 126, 30, 90, 150, 210, chords, ign,
                     out, CAP)
    lib.mg_encode_mumidi(data, len(data), roles, 6, 1, 5,
                         mdur, len(mdur), mvel, len(mvel),
                         480, 32, 1, 1, 128, 30, 90, 150, 210, chords,
                         1, 260, 290, 330, 335, 370, 380, 385, 420,
                         out, CAP)

from tests.fixtures import simple_piano_midi, multitrack_midi, tempo_change_midi
base = []
for i, fn in enumerate((simple_piano_midi, multitrack_midi,
                        tempo_change_midi)):
    p = f"/tmp/mg_asan_{i}.mid"
    fn(p)
    base.append(open(p, 'rb').read())

rng = np.random.RandomState(0)
n = 0
# truncations at every length for the small file, strided for bigger
for data in base:
    step = max(1, len(data) // 400)
    for ln in range(0, len(data) + 1, step):
        run_all(data[:ln]); n += 1
# random byte mutations
for it in range(3000):
    data = bytearray(base[it % len(base)])
    for _ in range(rng.randint(1, 8)):
        data[rng.randint(0, len(data))] = rng.randint(0, 256)
    run_all(bytes(data)); n += 1
# pure random blobs (some with MThd prefix)
for it in range(1500):
    blob = rng.bytes(rng.randint(1, 400))
    if it % 2:
        blob = b"MThd" + blob
    run_all(blob); n += 1
print(f"ASAN fuzz clean: {n} inputs x 6 entry points")
