"""Melody family tests: note-array codec, skyline/TOP extraction,
MelodyRNN model (reference mg/utils/midi2note.py, music_extraction.py,
MelodyRNN/train_basic_rnn.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicgeneration_tpu.midi import Instrument, MidiFile, Note, TempoChange
from musicgeneration_tpu.models import MelodyRNN
from musicgeneration_tpu.tokenizers import melody as mel

from .fixtures import multitrack_midi


def _midi(notes, tpb=480, tempo=120.0):
    m = MidiFile(ticks_per_beat=tpb)
    m.tempo_changes = [TempoChange(tempo=tempo, time=0)]
    m._tempo_raw = [(0, int(round(60e6 / tempo)))]
    inst = Instrument(0, False, "t")
    inst.notes = [Note(v, p, s, e) for (v, p, s, e) in notes]
    m.instruments.append(inst)
    return m


# ----------------------------------------------------------------- codec

def test_note_array_basic():
    # quarter note at tick 0 (4 semiquavers), then one at beat 2
    m = _midi([(100, 60, 0, 480), (100, 64, 960, 1440)])
    arr = mel.midi_to_note_array(m)
    assert arr[0] == 60
    assert arr[4] == mel.MELODY_NOTE_OFF
    assert arr[8] == 64
    assert arr[12] == mel.MELODY_NOTE_OFF
    assert arr[1] == mel.MELODY_NO_EVENT


def test_note_array_highest_pitch_wins():
    m = _midi([(100, 60, 0, 480), (100, 72, 0, 480)])
    arr = mel.midi_to_note_array(m)
    assert arr[0] == 72


def test_note_array_onset_overwrites_off():
    # second note starts exactly where the first ends: onset wins
    m = _midi([(100, 60, 0, 480), (100, 62, 480, 960)])
    arr = mel.midi_to_note_array(m)
    assert arr[4] == 62


def test_note_array_roundtrip():
    m = _midi([(100, 60, 0, 480), (100, 64, 960, 1440),
               (100, 67, 1920, 2880)])
    arr = mel.midi_to_note_array(m)
    back = mel.note_array_to_midi(arr)
    notes = back.instruments[0].notes
    assert [n.pitch for n in notes] == [60, 64, 67]
    assert notes[0].start == 0 and notes[0].end == 480
    assert notes[1].start == 960
    # idempotency: re-encoding reproduces the array prefix
    arr2 = mel.midi_to_note_array(back)
    np.testing.assert_array_equal(arr2[:len(arr) - 2], arr[:-2])


def test_note_array_empty():
    arr = mel.midi_to_note_array(_midi([]))
    assert (arr == mel.MELODY_NO_EVENT).all()


# ------------------------------------------------------------- extraction

def test_skyline_picks_top_and_truncates():
    m = _midi([
        (100, 60, 0, 2000),   # long low note
        (100, 72, 0, 500),    # high note same onset -> wins
        (100, 65, 1000, 1500),
    ])
    out = mel.skyline(m)
    notes = out.instruments[0].notes
    assert [n.pitch for n in notes] == [72, 65]
    assert notes[0].end == 500  # already shorter than next onset


def test_skyline_truncates_at_next_onset():
    m = _midi([(100, 70, 0, 2000), (100, 65, 600, 900)])
    notes = mel.skyline(m).instruments[0].notes
    assert notes[0].pitch == 70 and notes[0].end == 600


def test_top_overlap_filter():
    m = _midi([
        (100, 72, 0, 1000),    # highest: always accepted
        (100, 70, 0, 1000),    # fully overlapped -> rejected
        (100, 65, 2000, 3000),  # disjoint -> accepted
    ])
    notes = mel.top(m).instruments[0].notes
    assert [n.pitch for n in notes] == [72, 65]


# ------------------------------------------------------------------ model

@pytest.mark.parametrize("attn", [0, 8])
def test_melody_rnn_shapes_and_decode(attn):
    model = MelodyRNN(hidden_dim=32, embed_size=16, num_layers=2,
                      attn_length=attn)
    t, b = 12, 3
    tokens = jnp.ones((t, b), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens)["params"]
    logits = model.apply({"params": params}, tokens)
    assert logits.shape == (t, b, 130)

    # incremental decode agrees with the parallel forward
    cache = model.apply({"params": params}, b,
                        method=MelodyRNN.init_cache)
    outs = []
    for i in range(t):
        step_logits, cache = model.apply(
            {"params": params}, tokens[i], cache,
            method=MelodyRNN.decode_step)
        outs.append(step_logits)
    np.testing.assert_allclose(np.stack(outs), np.asarray(logits),
                               rtol=2e-4, atol=2e-5)


def test_melody_rnn_packed_lengths():
    model = MelodyRNN(hidden_dim=16, embed_size=8, num_layers=1)
    tokens = jnp.ones((6, 2), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens)["params"]
    lengths = jnp.asarray([6, 3])
    logits = model.apply({"params": params}, tokens, lengths)
    # padded positions produce the zero-state projection (bias only)
    pad_out = logits[4, 1]
    np.testing.assert_allclose(pad_out, logits[5, 1], rtol=1e-6)


def test_note_array_native_fast_path_matches(tmp_path, monkeypatch):
    """The no-Note-objects fast path (native parse rows) must equal the
    object path on fixtures and on random multi-instrument files,
    including drum filtering and flatten-order-dependent duration ties."""
    from musicgeneration_tpu import native
    if not native.available():
        pytest.skip("native library not built")
    from musicgeneration_tpu.midi import (Instrument, MidiFile, Note,
                                          TempoChange)

    def both(path):
        monkeypatch.setenv("MG_NATIVE", "1")
        a = mel.midi_to_note_array(path)
        monkeypatch.setenv("MG_NATIVE", "0")
        b = mel.midi_to_note_array(path)
        monkeypatch.setenv("MG_NATIVE", "1")
        return a, b

    path = str(tmp_path / "m.mid")
    multitrack_midi(path)
    a, b = both(path)
    np.testing.assert_array_equal(a, b)

    rng = np.random.RandomState(3)
    for it in range(25):
        midi = MidiFile(ticks_per_beat=480)
        midi.tempo_changes = [TempoChange(tempo=120.0, time=0)]
        midi._tempo_raw = [(0, 500000)]
        for _ in range(rng.randint(1, 4)):
            inst = Instrument(program=int(rng.randint(0, 100)),
                              is_drum=bool(rng.rand() < 0.2))
            for _ in range(int(rng.randint(1, 50))):
                s = int(rng.randint(0, 8000))
                d = int(rng.choice([0, 1, 60, 120, 481, 960]))
                inst.notes.append(Note(velocity=80,
                                       pitch=int(rng.randint(0, 128)),
                                       start=s, end=s + d))
            midi.instruments.append(inst)
        p = str(tmp_path / "fz.mid")
        midi.dump(p)
        a, b = both(p)
        np.testing.assert_array_equal(a, b, err_msg=f"fuzz iter {it}")
