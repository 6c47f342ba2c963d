"""Native (C++) sustain-pedal codec vs the Python oracle.

`mg_encode_pedal` (native/smf_scan.cc) runs parse -> tempo-map seconds
-> CC64 sustain pairing/extension -> token emission in one C call, in
both the default and the `faithful` (reference note-dropping,
processor.py:181-199) modes; `pedal_midilike.encode_midi` is the
semantics reference. Token-exact on fixtures and CC64 fuzz."""

import numpy as np
import pytest

from musicgeneration_tpu import native
from musicgeneration_tpu.midi import (
    ControlChange,
    Instrument,
    MidiFile,
    Note,
    TempoChange,
)
from musicgeneration_tpu.tokenizers import pedal_midilike as pm

from .fixtures import simple_piano_midi, tempo_change_midi

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


@pytest.mark.parametrize("builder", [simple_piano_midi, tempo_change_midi])
@pytest.mark.parametrize("faithful", [False, True])
def test_native_pedal_matches_python(builder, faithful, tmp_path):
    path = str(tmp_path / "f.mid")
    builder(path)
    nat = pm.encode_array(path, faithful=faithful)
    py = np.asarray(pm.encode_midi(path, faithful=faithful), np.uint16)
    np.testing.assert_array_equal(nat, py)


def _rand_midi(path, rng):
    """Adversarial generator: multi-instrument files with CC64 sustain
    windows (orphan downs/ups included), non-pedal CCs, tempo changes
    across interval branches, full pitch/velocity ranges."""
    midi = MidiFile(ticks_per_beat=480)
    ticks = sorted(rng.randint(0, 12000, rng.randint(1, 4)).tolist())
    if rng.rand() < 0.5:
        ticks[0] = 0
    midi.tempo_changes = [TempoChange(tempo=float(rng.choice(
        [40, 90, 120, 150, 200])), time=t) for t in ticks]
    midi._tempo_raw = [(t, int(round(60e6 / tc.tempo)))
                       for t, tc in zip(ticks, midi.tempo_changes)]
    for _ in range(int(rng.randint(1, 4))):
        inst = Instrument(program=int(rng.randint(0, 100)), is_drum=False)
        for _ in range(int(rng.randint(1, 60))):
            start = int(rng.randint(0, 11000))
            dur = int(rng.choice([1, 60, 240, 480, 960, 3000]))
            inst.notes.append(Note(velocity=int(rng.randint(1, 128)),
                                   pitch=int(rng.randint(0, 128)),
                                   start=start, end=start + dur))
        if rng.rand() < 0.8:
            t = 0
            for _ in range(int(rng.randint(1, 10))):
                t += int(rng.randint(1, 3000))
                inst.control_changes.append(ControlChange(
                    number=64,
                    value=int(rng.choice([0, 20, 63, 64, 100, 127])),
                    time=t))
        if rng.rand() < 0.3:
            inst.control_changes.append(
                ControlChange(number=7, value=100, time=100))
        inst.control_changes.sort(key=lambda c: c.time)
        midi.instruments.append(inst)
    midi.dump(path)


def test_native_pedal_fuzz(tmp_path):
    rng = np.random.RandomState(2)
    for i in range(60):
        path = str(tmp_path / f"fz{i % 2}.mid")
        _rand_midi(path, rng)
        for faithful in (False, True):
            nat = pm.encode_array(path, faithful=faithful)
            py = np.asarray(pm.encode_midi(path, faithful=faithful),
                            np.uint16)
            np.testing.assert_array_equal(
                nat, py, err_msg=f"fuzz iter {i} faithful={faithful}")
