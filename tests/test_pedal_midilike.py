"""Sustain-pedal MIDI-like codec tests (reference processor.py parity)."""

import numpy as np
import pytest

from musicgeneration_tpu.midi import (
    ControlChange,
    Instrument,
    MidiFile,
    Note,
    TempoChange,
)
from musicgeneration_tpu.tokenizers import pedal_midilike as pm

from .fixtures import simple_piano_midi


def _seconds_midi(notes, ccs=()):
    """Build an in-memory seconds-domain MidiFile directly."""
    midi = MidiFile(ticks_per_beat=480)
    midi.tempo_changes = [TempoChange(tempo=120, time=0)]
    midi._tempo_raw = [(0, 500000)]
    inst = Instrument(0, False, "t")
    inst.notes = [Note(v, p, s, e) for (v, p, s, e) in notes]
    inst.control_changes = [ControlChange(64, v, t) for (v, t) in ccs]
    midi.instruments.append(inst)
    return midi


def test_vocab_layout():
    assert pm.VOCAB_SIZE == 388
    assert pm.token_type(0) == "note_on"
    assert pm.token_type(127) == "note_on"
    assert pm.token_type(128) == "note_off"
    assert pm.token_type(256) == "time_shift"
    assert pm.token_type(356) == "velocity"
    assert pm.token_type(387) == "velocity"
    assert pm.PAD_ID == 388 and pm.EOS_ID == 389


def test_time_shift_chunking():
    # 2.5 s = two full 1 s shifts + one 0.5 s shift
    toks = pm._time_shift_tokens(0.0, 2.5)
    assert toks == [pm.START_TIME_SHIFT + 99, pm.START_TIME_SHIFT + 99,
                    pm.START_TIME_SHIFT + 49]
    assert pm._time_shift_tokens(1.0, 1.0) == []
    # 10 ms granularity: value v decodes to (v+1)*10ms
    assert pm._time_shift_tokens(0.0, 0.01) == [pm.START_TIME_SHIFT]


def test_encode_basic_sequence():
    midi = _seconds_midi([(80, 60, 0.0, 0.5)])
    toks = pm.encode_midi(midi)
    # velocity(80//4=20), note_on 60, shift 0.5s, note_off 60
    assert toks == [pm.START_VELOCITY + 20, 60,
                    pm.START_TIME_SHIFT + 49, pm.START_NOTE_OFF + 60]


def test_roundtrip_no_pedal(tmp_path):
    path = str(tmp_path / "a.mid")
    simple_piano_midi(path, n_notes=32)
    src = MidiFile(path).to_seconds()
    toks = pm.encode_midi(src)
    out = pm.decode_midi(toks).to_seconds()
    src_notes = sorted(src.instruments[0].notes,
                       key=lambda n: (n.start, n.pitch))
    out_notes = sorted(out.instruments[0].notes,
                       key=lambda n: (n.start, n.pitch))
    assert len(out_notes) == len(src_notes)
    # 10 ms binning error accumulates linearly along the timeline (each
    # inter-event gap rounds independently — faithful reference behavior,
    # processor.py:151-160), so bound drift per event index
    n_events = 2 * len(src_notes)
    for a, b in zip(src_notes, out_notes):
        assert a.pitch == b.pitch
        assert abs(a.start - b.start) < 0.005 * n_events + 0.011
        assert abs(a.end - b.end) < 0.005 * n_events + 0.011
        assert abs(a.velocity - b.velocity) < 4  # //4 quantization
    # the drift-free invariant: tokens are a fixed point of decode∘encode
    assert pm.encode_midi(out) == toks


def test_sustain_extends_note_ends():
    # pedal down from 0.2 to 2.0; note released at 0.6 must ring to 2.0
    midi = _seconds_midi(
        notes=[(90, 60, 0.3, 0.6), (90, 64, 0.4, 0.7)],
        ccs=[(100, 0.2), (0, 2.0)],
    )
    toks = pm.encode_midi(midi)
    out = pm.decode_midi(toks).to_seconds()
    notes = sorted(out.instruments[0].notes, key=lambda n: n.pitch)
    assert [n.pitch for n in notes] == [60, 64]
    for n in notes:
        assert abs(n.end - 2.0) < 0.02  # extended to pedal release


def test_sustain_cut_by_repeated_pitch():
    # same pitch re-struck during pedal: first note ends at the re-strike
    midi = _seconds_midi(
        notes=[(90, 60, 0.3, 0.5), (90, 60, 1.0, 1.2)],
        ccs=[(100, 0.2), (0, 2.0)],
    )
    out = pm.decode_midi(pm.encode_midi(midi)).to_seconds()
    notes = sorted(out.instruments[0].notes, key=lambda n: n.start)
    assert len(notes) == 2
    assert abs(notes[0].end - 1.0) < 0.02   # cut at re-strike
    assert abs(notes[1].end - 2.0) < 0.02   # rings to release


def test_faithful_mode_drops_notes_without_pedal():
    midi = _seconds_midi([(80, 60, 0.0, 0.5)])
    assert pm.encode_midi(midi, faithful=True) == []  # reference bug
    assert pm.encode_midi(midi, faithful=False) != []


def test_velocity_state_raw_comparison():
    # reference quirk: state is the RAW previous velocity, compared to the
    # quantized current one -> consecutive equal velocities still re-emit
    # a velocity token after any note_off (state becomes None)
    midi = _seconds_midi([(80, 60, 0.0, 0.1), (80, 62, 0.5, 0.6)])
    toks = pm.encode_midi(midi)
    vel_tokens = [t for t in toks if pm.token_type(t) == "velocity"]
    assert len(vel_tokens) == 2  # re-emitted for the second note


def test_decode_skips_zero_length_and_orphan_offs():
    toks = [pm.START_VELOCITY + 20, 60, pm.START_NOTE_OFF + 60,  # zero-len
            pm.START_NOTE_OFF + 72]  # orphan off
    out = pm.decode_midi(toks)
    assert out.instruments == [] or all(
        n.end > n.start for n in out.instruments[0].notes)


def test_decode_out_of_vocab_handling():
    """Default: pad/eos ids are dropped (documented deviation). faithful:
    reference Event.from_int funnels any id >= 356 into the velocity
    branch (processor.py:72-89) — pad=388 acts as velocity (388-356)*4=128."""
    shift_1s = pm.START_TIME_SHIFT + 99
    toks = [pm.PAD_ID, 60, shift_1s, pm.START_NOTE_OFF + 60]
    # default path: PAD dropped, note keeps velocity 0 (no vel token seen)
    out = pm.decode_midi(toks)
    assert [n.velocity for n in out.instruments[0].notes] == [0]
    # faithful path: PAD acts as a velocity token -> note velocity 128
    out_f = pm.decode_midi(toks, faithful=True)
    assert [n.velocity for n in out_f.instruments[0].notes] == [128]


def test_array_roundtrip():
    ids = [1, 200, 300, 387]
    arr = pm.to_array(ids)
    assert arr.dtype == np.uint16
    assert pm.from_array(arr) == ids
