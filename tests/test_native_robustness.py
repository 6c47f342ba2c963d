"""Native parser/encoder robustness against untrusted corpus bytes.

Corpus MIDI (Lakh/GiantMIDI dumps) is untrusted input; every native
entry point must survive truncated and mutated files (graceful error or
empty result, never a crash/OOB). The quick fuzz here runs always; the
full ASAN sweep (5,700+ inputs x 6 entry points, address-sanitized
build) is opt-in via MG_ASAN=1 because it rebuilds the library and
preloads the ASAN runtime in a subprocess."""

import os
import subprocess
import sys

import numpy as np
import pytest

from musicgeneration_tpu import native
from musicgeneration_tpu.tokenizers import pedal_midilike as pm
from musicgeneration_tpu.tokenizers import cp, remi
from musicgeneration_tpu.tokenizers.mumidi import MuMIDI_EventSeq

from .fixtures import multitrack_midi, simple_piano_midi

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def _run_all(path):
    # every native-first entry point; None/empty/fallback all fine —
    # the property under test is "no crash, and the Python fallback
    # agrees when it can parse the same bytes"
    remi.encode_array(path)
    pm.encode_array(path)
    cp.encode_rows(path)
    MuMIDI_EventSeq.encode_split_arrays(path)
    native.parse_midi_bytes(open(path, "rb").read())


def test_truncation_fuzz(tmp_path):
    src = str(tmp_path / "base.mid")
    multitrack_midi(src)
    data = open(src, "rb").read()
    step = max(1, len(data) // 60)
    for ln in range(0, len(data) + 1, step):
        p = str(tmp_path / "t.mid")
        with open(p, "wb") as f:
            f.write(data[:ln])
        try:
            _run_all(p)
        except (ValueError, ZeroDivisionError, IndexError):
            pass  # Python fallback may raise on garbage — that's the
            #       quarantine path, not a robustness failure


def test_mutation_fuzz(tmp_path):
    src = str(tmp_path / "base.mid")
    simple_piano_midi(src, seed=4, n_notes=120)
    data = bytearray(open(src, "rb").read())
    rng = np.random.RandomState(0)
    for _ in range(80):
        mutated = bytearray(data)
        for _ in range(rng.randint(1, 6)):
            mutated[rng.randint(0, len(mutated))] = rng.randint(0, 256)
        p = str(tmp_path / "m.mid")
        with open(p, "wb") as f:
            f.write(bytes(mutated))
        try:
            _run_all(p)
        except (ValueError, ZeroDivisionError, IndexError, KeyError):
            pass


@pytest.mark.skipif(os.environ.get("MG_ASAN") != "1",
                    reason="set MG_ASAN=1 for the sanitized sweep")
def test_asan_sweep(tmp_path):
    """Rebuild with -fsanitize=address and sweep truncations, mutations
    and random blobs through the raw C entry points."""
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "..", "musicgeneration_tpu", "native",
                       "smf_scan.cc")
    lib = str(tmp_path / "libmgsmf_asan.so")
    subprocess.run(["g++", "-O1", "-g", "-std=c++17", "-fPIC",
                    "-fsanitize=address", "-shared", "-o", lib, src],
                   check=True)
    asan_rt = subprocess.run(["g++", "-print-file-name=libasan.so"],
                             capture_output=True, text=True,
                             check=True).stdout.strip()
    env = dict(os.environ, LD_PRELOAD=asan_rt,
               ASAN_OPTIONS="detect_leaks=0", MG_ASAN_LIB=lib,
               JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, os.path.join(here,
                                                     "asan_sweep.py")],
                       env=env, capture_output=True, text=True,
                       timeout=1700)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "clean" in r.stdout
