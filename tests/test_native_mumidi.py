"""Native (C++) full-pipeline MuMIDI encoder vs the Python oracle.

`mg_encode_mumidi` (native/smf_scan.cc) runs parse -> role-filtered
multi-track note collection -> quantize -> chord inference -> bar
grouping -> token emission per con_instr subset;
`MuMIDI_EventSeq.extract_split_events` + `to_array` is the semantics
reference (parity-locked to mg/model/utils/MuMIDI.py). Every fixture and
fuzz file must match token-for-token, including the None cases."""

import numpy as np
import pytest

from musicgeneration_tpu import native
from musicgeneration_tpu.midi import Instrument, MidiFile, Note, TempoChange
from musicgeneration_tpu.tokenizers.mumidi import MuMIDI_EventSeq

from .fixtures import multitrack_midi, simple_piano_midi

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")

ROLES = ["melody", "piano", "bass", "guitar", "string", "drum"]


def _py_split(path):
    mel, arr = MuMIDI_EventSeq.extract_split_events(path)
    if mel is None:
        return None, None
    return MuMIDI_EventSeq.to_array(mel), MuMIDI_EventSeq.to_array(arr)


def test_native_mumidi_matches_python(tmp_path):
    path = str(tmp_path / "m.mid")
    multitrack_midi(path)
    nat = MuMIDI_EventSeq.encode_split_arrays(path)
    py = _py_split(path)
    assert nat[0] is not None
    for n, p in zip(nat, py):
        assert n.dtype == p.dtype
        np.testing.assert_array_equal(n, p)


def test_native_mumidi_no_melody_is_none(tmp_path):
    # a file with no track NAMED one of the roles splits to (None, None)
    path = str(tmp_path / "p.mid")
    simple_piano_midi(path)
    assert MuMIDI_EventSeq.encode_split_arrays(path) == (None, None)
    assert _py_split(path) == (None, None)


def _rand_midi(path, rng):
    """Multi-track adversarial generator: role/non-role/unnamed tracks,
    repeated role names, drums (second note_on half), downbeat-landing
    starts, off-grid tempo changes across every interval branch."""
    midi = MidiFile(ticks_per_beat=480)
    ticks = sorted(rng.randint(0, 15000, rng.randint(1, 4)).tolist())
    if rng.rand() < 0.5:
        ticks[0] = 0
    midi.tempo_changes = [
        TempoChange(tempo=float(rng.choice(
            [25, 30, 89, 90, 120, 150, 209, 210, 240])), time=t)
        for t in ticks]
    midi._tempo_raw = [(t, int(round(60e6 / tc.tempo)))
                       for t, tc in zip(ticks, midi.tempo_changes)]
    for _ in range(int(rng.randint(1, 7))):
        role = str(rng.choice(ROLES + ["other", ""]))
        inst = Instrument(program=int(rng.randint(0, 120)),
                          is_drum=(role == "drum"), name=role)
        for _ in range(int(rng.randint(1, 40))):
            r = rng.rand()
            if r < 0.25:
                start = int(rng.randint(0, 8)) * 1920
            elif r < 0.4:
                start = int(rng.randint(0, 30)) * 480
            else:
                start = int(rng.randint(0, 14000))
            dur = int(rng.choice([1, 30, 59, 60, 61, 90, 120, 480, 960,
                                  1920, 2500, 4000]))
            pitch = int(rng.choice([0, 1, 35, 60, 64, 67, 100, 127]))
            vel = int(rng.choice([1, 3, 4, 5, 63, 64, 100, 127]))
            inst.notes.append(Note(velocity=vel, pitch=pitch,
                                   start=start, end=start + dur))
        midi.instruments.append(inst)
    midi.dump(path)


def test_native_mumidi_fuzz(tmp_path):
    rng = np.random.RandomState(1)
    for i in range(60):
        path = str(tmp_path / f"fz{i % 2}.mid")
        _rand_midi(path, rng)
        nat = MuMIDI_EventSeq.encode_split_arrays(path)
        py = _py_split(path)
        assert (nat[0] is None) == (py[0] is None), f"iter {i}"
        if nat[0] is None:
            continue
        for n, p in zip(nat, py):
            np.testing.assert_array_equal(n, p, err_msg=f"fuzz iter {i}")
