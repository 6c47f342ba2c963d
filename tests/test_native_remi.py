"""Native (C++) full-pipeline REMI encoder vs the Python oracle.

`mg_encode_remi` (native/smf_scan.cc) runs parse -> instrument-0 notes ->
120-tick quantize -> chord inference -> bar grouping -> token emission in
one C call; `tokenizers/remi.encode_array_py` is the semantics reference
(itself parity-locked to mg/model/utils/REMI.py + chord_inference.py by
tests/test_reference_derived.py). Every fixture and fuzz file must match
token-for-token."""

import numpy as np
import pytest

from musicgeneration_tpu import native
from musicgeneration_tpu.midi import Instrument, MidiFile, Note, TempoChange
from musicgeneration_tpu.tokenizers import remi

from .fixtures import (
    multitrack_midi,
    polyphonic_midi,
    simple_piano_midi,
    tempo_change_midi,
)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


@pytest.mark.parametrize("builder", [simple_piano_midi, polyphonic_midi,
                                     multitrack_midi, tempo_change_midi])
def test_native_remi_matches_python(builder, tmp_path):
    path = str(tmp_path / "f.mid")
    builder(path)
    nat = remi.encode_array(path)
    py = remi.encode_array_py(path)
    assert nat.dtype == py.dtype
    np.testing.assert_array_equal(nat, py)


def test_native_remi_empty_file(tmp_path):
    path = str(tmp_path / "empty.mid")
    midi = MidiFile(ticks_per_beat=480)
    midi.tempo_changes = [TempoChange(tempo=120.0, time=0)]
    midi._tempo_raw = [(0, 500000)]
    midi.instruments.append(Instrument(program=0, is_drum=False))
    midi.dump(path)
    assert len(remi.encode_array(path)) == 0
    assert len(remi.encode_array_py(path)) == 0


def _rand_midi(path, rng):
    """Adversarial generator: downbeat-landing starts (the group_items
    double-count quirk), on/off-grid tempo changes across every interval
    branch (incl. the ==210 fall-through), clamp pitches 127, velocities
    past the 4-slot vocab quirk, rests that force N:N chords."""
    midi = MidiFile(ticks_per_beat=480)
    ticks = sorted(rng.randint(0, 20000, rng.randint(1, 5)).tolist())
    if rng.rand() < 0.5:
        ticks[0] = 0
    if rng.rand() < 0.3:
        ticks = [t - t % 480 for t in ticks]
    midi.tempo_changes = [
        TempoChange(tempo=float(rng.choice(
            [20, 30, 60, 89, 90, 120, 149, 150, 209, 210, 250])), time=t)
        for t in ticks]
    midi._tempo_raw = [(t, int(round(60e6 / tc.tempo)))
                       for t, tc in zip(ticks, midi.tempo_changes)]
    inst = Instrument(program=0, is_drum=False)
    for _ in range(int(rng.randint(1, 120))):
        r = rng.rand()
        if r < 0.25:
            start = int(rng.randint(0, 10)) * 1920
        elif r < 0.4:
            start = int(rng.randint(0, 40)) * 480
        else:
            start = int(rng.randint(0, 19000))
        dur = int(rng.choice([1, 30, 60, 61, 90, 120, 480, 960, 3840,
                              5000, 9000]))
        pitch = int(rng.choice([0, 1, 21, 60, 64, 67, 108, 126, 127]))
        vel = int(rng.choice([1, 3, 4, 5, 63, 64, 100, 126, 127]))
        inst.notes.append(Note(velocity=vel, pitch=pitch, start=start,
                               end=start + dur))
    if rng.rand() < 0.3:  # trailing note after a rest -> empty windows
        inst.notes.append(Note(velocity=80, pitch=60, start=30000,
                               end=31000))
    midi.instruments.append(inst)
    midi.dump(path)


def test_native_remi_fuzz(tmp_path):
    rng = np.random.RandomState(0)
    for i in range(60):
        path = str(tmp_path / f"fz{i % 2}.mid")
        _rand_midi(path, rng)
        nat = remi.encode_array(path)
        py = remi.encode_array_py(path)
        np.testing.assert_array_equal(nat, py, err_msg=f"fuzz iter {i}")


def test_native_remi_cap_retry(tmp_path, monkeypatch):
    """Files whose token stream exceeds the first-call buffer retry with
    the exact size instead of falling back to Python."""
    path = str(tmp_path / "big.mid")
    simple_piano_midi(path, seed=5, n_notes=2000)
    py = remi.encode_array_py(path)
    assert len(py) > 4096  # must actually exercise the retry branch
    nat = remi.encode_array(path)
    np.testing.assert_array_equal(nat, py)
