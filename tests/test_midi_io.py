"""SMF reader/writer round-trip tests (first-party MIDI layer)."""

import numpy as np
import pytest

from musicgeneration_tpu.midi import MidiFile, TempoMap
from tests import fixtures


def test_write_parse_roundtrip(tmp_path):
    path = str(tmp_path / "a.mid")
    fixtures.simple_piano_midi(path, seed=3, n_notes=40)
    src = MidiFile(path)
    assert src.ticks_per_beat == fixtures.TPB
    assert len(src.instruments) == 1
    notes = src.instruments[0].notes
    assert len(notes) == 40
    # re-dump and re-parse: tick-exact
    path2 = str(tmp_path / "b.mid")
    src.dump(path2)
    dst = MidiFile(path2)
    a = [(n.start, n.end, n.pitch, n.velocity)
         for n in src.instruments[0].notes]
    b = [(n.start, n.end, n.pitch, n.velocity)
         for n in dst.instruments[0].notes]
    assert a == b


def test_multitrack_parse(tmp_path):
    path = str(tmp_path / "m.mid")
    fixtures.multitrack_midi(path)
    midi = MidiFile(path)
    assert len(midi.instruments) == 6
    assert sum(inst.is_drum for inst in midi.instruments) == 1
    names = {inst.name for inst in midi.instruments}
    assert names == {"melody", "piano", "bass", "guitar", "string", "drum"}


def test_tempo_map_tick_to_time(tmp_path):
    path = str(tmp_path / "t.mid")
    fixtures.tempo_change_midi(path, tempo_a=120.0, tempo_b=60.0)
    midi = MidiFile(path)
    tm = midi.tempo_map()
    tpb = midi.ticks_per_beat
    # 120 bpm -> 0.5 s/beat for first 8 beats, then 60 bpm -> 1 s/beat
    t = tm.tick_to_time([0, tpb, 8 * tpb, 9 * tpb, 12 * tpb])
    np.testing.assert_allclose(t, [0.0, 0.5, 4.0, 5.0, 8.0], atol=1e-9)


def test_seconds_view_matches_tempo(tmp_path):
    path = str(tmp_path / "s.mid")
    fixtures.simple_piano_midi(path, seed=5, tempo=240.0)
    sec = MidiFile(path).to_seconds()
    n = sec.instruments[0].notes[0]
    # 240 bpm -> 0.25 s/beat; fixture quantizes starts to ticks
    assert n.start == pytest.approx(0.0)
    assert all(m.end > m.start for m in sec.instruments[0].notes)


def test_running_status_and_zero_velocity_noteoff(tmp_path):
    """Hand-craft a track using running status + vel-0 note-offs."""
    import struct
    body = bytearray()
    body += b"\x00" + bytes([0x90, 60, 100])   # note on
    body += b"\x60" + bytes([60, 0])           # running status: vel-0 = off
    body += b"\x00" + bytes([64, 90])          # running status: on
    body += b"\x60" + bytes([64, 0])
    body += b"\x00" + bytes([0xFF, 0x2F, 0x00])
    track = b"MTrk" + struct.pack(">I", len(body)) + bytes(body)
    data = b"MThd" + struct.pack(">IHHH", 6, 0, 1, 96) + track
    path = tmp_path / "rs.mid"
    path.write_bytes(data)
    midi = MidiFile(str(path))
    notes = midi.instruments[0].notes
    assert [(n.pitch, n.start, n.end) for n in notes] == [
        (60, 0, 96), (64, 96, 192)]
