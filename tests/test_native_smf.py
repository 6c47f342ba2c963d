"""Native (C++) SMF scanner vs the pure-Python oracle (midi/smf.py).

The Python path is the semantics reference; the native path must
reproduce it object-for-object on every fixture. Skipped when no
toolchain is available to build the library."""

import os

import numpy as np
import pytest

from musicgeneration_tpu import native
from musicgeneration_tpu.midi import Instrument, MidiFile, Note, TempoChange

from .fixtures import (
    multitrack_midi,
    polyphonic_midi,
    simple_piano_midi,
    tempo_change_midi,
)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def _snapshot(m: MidiFile):
    return {
        "tpb": m.ticks_per_beat,
        "max_tick": m.max_tick,
        "tempo": [(t.tempo, t.time) for t in m.tempo_changes],
        "tempo_raw": list(getattr(m, "_tempo_raw", [])),
        "insts": [
            (i.program, i.is_drum, i.name,
             [(n.pitch, n.velocity, n.start, n.end) for n in i.notes],
             [(c.number, c.value, c.time) for c in i.control_changes])
            for i in m.instruments
        ],
        "markers": [(mk.text, mk.time) for mk in m.markers],
        "timesigs": [(t.numerator, t.denominator, t.time)
                     for t in m.time_signature_changes],
    }


def _both(path):
    os.environ["MG_NATIVE"] = "1"
    nat = _snapshot(MidiFile(path))
    os.environ["MG_NATIVE"] = "0"
    py = _snapshot(MidiFile(path))
    os.environ["MG_NATIVE"] = "1"
    return nat, py


@pytest.mark.parametrize("builder", [simple_piano_midi, polyphonic_midi,
                                     multitrack_midi, tempo_change_midi])
def test_native_matches_python(builder, tmp_path):
    path = str(tmp_path / "f.mid")
    builder(path)
    nat, py = _both(path)
    assert nat == py


def test_native_overlapping_same_pitch(tmp_path):
    # pretty_midi pairing: one off closes ALL open notes of the pitch
    m = MidiFile(ticks_per_beat=480)
    m.tempo_changes = [TempoChange(120, 0)]
    m._tempo_raw = [(0, 500000)]
    inst = Instrument(0, False, "x")
    inst.notes = [Note(90, 60, 0, 400), Note(80, 60, 100, 400),
                  Note(70, 62, 50, 50)]  # zero-length: dropped
    m.instruments.append(inst)
    path = str(tmp_path / "o.mid")
    m.dump(path)
    nat, py = _both(path)
    assert nat == py


def test_native_garbage_falls_back(tmp_path):
    path = str(tmp_path / "bad.mid")
    open(path, "wb").write(b"definitely not midi data")
    with pytest.raises(ValueError):
        MidiFile(path)


def test_native_truncated_tempo_meta(tmp_path):
    """A file ending mid-tempo-payload (… FF 51 03 <EOF>) must not read
    past the buffer; both paths should parse what precedes gracefully."""
    m = MidiFile(ticks_per_beat=480)
    m.tempo_changes = [TempoChange(120, 0)]
    m._tempo_raw = [(0, 500000)]
    inst = Instrument(0, False, "x")
    inst.notes = [Note(90, 60, 0, 400)]
    m.instruments.append(inst)
    path = str(tmp_path / "trunc.mid")
    m.dump(path)
    data = open(path, "rb").read()
    # append a track whose declared length covers a tempo meta but the
    # file ends right after the length byte (payload missing)
    tail = b"\x00\xff\x51\x03"
    track = b"MTrk" + (len(tail) + 3).to_bytes(4, "big") + tail
    # bump the header track count
    data = bytearray(data)
    ntracks = int.from_bytes(data[10:12], "big")
    data[10:12] = (ntracks + 1).to_bytes(2, "big")
    path2 = str(tmp_path / "trunc2.mid")
    open(path2, "wb").write(bytes(data) + track)
    nat, py = _both(path2)
    assert nat == py


def test_native_tokenizer_equivalence(tmp_path):
    """End-to-end: tokens from native-parsed MIDI == python-parsed."""
    from musicgeneration_tpu.tokenizers import midilike

    path = str(tmp_path / "t.mid")
    simple_piano_midi(path, n_notes=50)
    os.environ["MG_NATIVE"] = "1"
    a1 = midilike.extract_events(path).to_array()
    os.environ["MG_NATIVE"] = "0"
    a2 = midilike.extract_events(path).to_array()
    os.environ["MG_NATIVE"] = "1"
    np.testing.assert_array_equal(a1, a2)


@pytest.mark.parametrize("builder", [simple_piano_midi, polyphonic_midi,
                                     multitrack_midi, tempo_change_midi])
def test_native_encode_array_matches_python(builder, tmp_path):
    """The all-native fast path (C++ parse + C++ event emission,
    midilike.encode_array) == the Python object path on every fixture
    type — note ordering, velocity clipping/binning, greedy time-shift
    emission (smf_scan.cc mg_encode_midilike vs sequence.py:145-183)."""
    from musicgeneration_tpu.tokenizers import midilike

    path = str(tmp_path / "e.mid")
    builder(path)
    fast = midilike.encode_array(path)
    os.environ["MG_NATIVE"] = "0"
    slow = midilike.extract_events(path).to_array()
    os.environ["MG_NATIVE"] = "1"
    np.testing.assert_array_equal(fast, slow)


def test_native_encode_array_fuzz(tmp_path):
    """Randomized corpora: edge velocities (0/127), out-of-range pitches,
    simultaneous onsets across instruments, long gaps (multi-bin
    time-shift emission incl. the float-drop quirk)."""
    from musicgeneration_tpu.midi import (Instrument, MidiFile, Note,
                                          TempoChange)
    from musicgeneration_tpu.tokenizers import midilike

    rng = np.random.RandomState(0)
    for trial in range(8):
        m = MidiFile(ticks_per_beat=480)
        m.tempo_changes = [TempoChange(120, 0)]
        m._tempo_raw = [(0, 500000)]
        for inst_i in range(rng.randint(1, 4)):
            inst = Instrument(rng.randint(0, 128), False, f"i{inst_i}")
            n = rng.randint(5, 60)
            starts = np.sort(rng.randint(0, 20000, n))
            durs = rng.randint(1, 4000, n)
            for s, du in zip(starts, durs):
                inst.notes.append(Note(
                    velocity=int(rng.choice([0, 1, 20, 21, 64, 108, 127])),
                    pitch=int(rng.choice([10, 20, 21, 22, 60, 107, 108,
                                          120])),
                    start=int(s), end=int(s + du)))
            m.instruments.append(inst)
        path = str(tmp_path / f"fz{trial}.mid")
        m.dump(path)
        fast = midilike.encode_array(path)
        os.environ["MG_NATIVE"] = "0"
        slow = midilike.extract_events(path).to_array()
        os.environ["MG_NATIVE"] = "1"
        np.testing.assert_array_equal(fast, slow, err_msg=f"trial {trial}")
