"""Tokenizer round-trip tests — the de-facto tests the reference implies
(SURVEY.md §4: extract -> to_array -> from_array -> write_midi)."""

import numpy as np
import pytest

from musicgeneration_tpu import vocab
from musicgeneration_tpu.midi import MidiFile
from musicgeneration_tpu.tokenizers import (
    ControlSeq,
    EventSeq,
    MuMIDI_EventSeq,
    NoteSeq,
    REMI_EventSeq,
    midilike,
    remi,
)
from tests import fixtures


# ---------------------------------------------------------------------------
# MIDI-like
# ---------------------------------------------------------------------------

class TestMidiLike:
    def test_array_event_mapping_exact(self, tmp_path):
        """from_array(to_array(x)) is the identity on (type, value) pairs —
        the id mapping itself is lossless (only time binning is lossy,
        exactly like the reference: sequence.py:185-198)."""
        path = str(tmp_path / "x.mid")
        fixtures.simple_piano_midi(path, seed=7)
        es = midilike.extract_events(path)
        arr = es.to_array()
        assert arr.dtype == np.uint16
        es2 = EventSeq.from_array(arr)
        assert [(e.type, e.value) for e in es.events] == [
            (e.type, e.value) for e in es2.events]
        np.testing.assert_array_equal(es2.to_array(), arr)

    def test_full_cycle_preserves_note_content(self, tmp_path):
        """extract -> array -> write_midi -> re-extract keeps every note's
        pitch and velocity-bin; starts drift at most one 10ms bin per hop
        (tick rounding at 220 tpb, same as the reference via pretty_midi)."""
        path = str(tmp_path / "x.mid")
        fixtures.simple_piano_midi(path, seed=7)
        arr = midilike.extract_events(path).to_array()
        mid2 = str(tmp_path / "y.mid")
        midilike.write_midi(EventSeq.from_array(arr), mid2)
        arr2 = midilike.extract_events(mid2).to_array()
        spec = midilike.SPEC

        def note_ons(a):
            m = spec.is_feat("note_on", a)
            return np.asarray(a)[m]

        np.testing.assert_array_equal(note_ons(arr), note_ons(arr2))
        vel = spec.is_feat("velocity", arr)
        vel2 = spec.is_feat("velocity", arr2)
        assert vel.sum() == vel2.sum()

    def test_notes_preserved(self, tmp_path):
        path = str(tmp_path / "x.mid")
        fixtures.simple_piano_midi(path, seed=11, n_notes=32)
        src_notes = MidiFile(path).to_seconds().instruments[0].notes
        es = midilike.extract_events(path)
        ns = EventSeq.from_array(es.to_array()).to_note_seq()
        assert len(ns.notes) == len(src_notes)
        assert sorted(n.pitch for n in ns.notes) == sorted(
            n.pitch for n in src_notes)
        # time shift quantization error bounded by one 10ms bin per gap
        src_sorted = sorted(src_notes, key=lambda n: (n.start, n.pitch))
        dec_sorted = sorted(ns.notes, key=lambda n: (n.start, n.pitch))
        for i, (a, b) in enumerate(zip(src_sorted, dec_sorted)):
            # fixture starts are first-note-relative; greedy time-shift
            # binning loses <10ms per inter-event gap (sequence.py:174-181),
            # so the error bound grows with position in the chain
            rel = a.start - src_sorted[0].start
            assert b.start == pytest.approx(rel, abs=0.01 * (i + 1) + 1e-9)

    def test_event_ids_in_range(self, tmp_path):
        path = str(tmp_path / "x.mid")
        fixtures.polyphonic_midi(path)
        arr = midilike.extract_events(path).to_array()
        assert arr.min() >= 0 and arr.max() < EventSeq.dim()

    def test_controlseq_compression_roundtrip(self, tmp_path):
        path = str(tmp_path / "x.mid")
        fixtures.polyphonic_midi(path)
        es = midilike.extract_events(path)
        cs = ControlSeq.from_event_seq(es)
        assert len(cs.controls) == len(es.events)
        comp = cs.to_compressed_array()
        assert comp.dtype == np.uint8 and comp.shape[1] == 13
        rec = ControlSeq.recover_compressed_array(comp)
        assert rec.shape == (len(es.events), ControlSeq.dim())
        # density one-hot recovered exactly
        dens = np.argmax(rec[:, :12], axis=1)
        np.testing.assert_array_equal(
            dens, np.array([c.note_density for c in cs.controls]))
        # histogram recovered within quantization (1/255)
        hist = np.array([c.pitch_histogram for c in cs.controls])
        np.testing.assert_allclose(rec[:, 12:], hist, atol=1 / 255 + 1e-9)


# ---------------------------------------------------------------------------
# REMI
# ---------------------------------------------------------------------------

class TestREMI:
    def test_array_roundtrip_exact(self, tmp_path):
        path = str(tmp_path / "p.mid")
        fixtures.polyphonic_midi(path)
        events = REMI_EventSeq.extract_events(path)
        arr = REMI_EventSeq.to_array(events)
        back = REMI_EventSeq.from_array(arr)
        arr2 = REMI_EventSeq.to_array(back)
        np.testing.assert_array_equal(arr, arr2)
        assert [e.name for e in events] == [e.name for e in back]

    def test_structure(self, tmp_path):
        path = str(tmp_path / "p.mid")
        fixtures.polyphonic_midi(path)
        events = REMI_EventSeq.extract_events(path)
        names = [e.name for e in events]
        assert names[0] == "bar"
        assert "position" in names and "note_on" in names
        assert "tempo_class" in names and "chord" in names
        # every note_on is followed by velocity? REMI order:
        # position, (chord), (tempo), note_velocity, note_on, note_duration
        for i, e in enumerate(events):
            if e.name == "note_on":
                assert events[i - 1].name == "note_velocity"
                assert events[i + 1].name == "note_duration"

    def test_write_midi_preserves_notes(self, tmp_path):
        """write_midi -> re-extract keeps the note content (pitch multiset
        and note count). Full token-stream idempotence is NOT a property of
        the scheme (tempo items re-expand per beat on every extract —
        REMI.py:90-110), so we assert what the reference guarantees."""
        path = str(tmp_path / "p.mid")
        fixtures.polyphonic_midi(path)
        events = REMI_EventSeq.extract_events(path)
        arr = REMI_EventSeq.to_array(events)
        out = str(tmp_path / "q.mid")
        REMI_EventSeq.write_midi(REMI_EventSeq.from_array(arr), out)
        arr2 = REMI_EventSeq.to_array(REMI_EventSeq.extract_events(out))
        spec = vocab.REMI

        def pitches(a):
            a = np.asarray(a)
            return np.sort(a[spec.is_feat("note_on", a)])

        # reference write_midi drops the trailing <=3 tokens (REMI.py:544);
        # our fixture ends with a full note group minus the tail, so allow
        # the last note to be lost
        p1, p2 = pitches(arr), pitches(arr2)
        assert abs(len(p1) - len(p2)) <= 1
        n = min(len(p1), len(p2))
        assert set(p1.tolist()) >= set(p2.tolist())
        assert n >= len(p1) - 1


# ---------------------------------------------------------------------------
# MuMIDI
# ---------------------------------------------------------------------------

class TestMuMIDI:
    def test_extract_and_split(self, tmp_path):
        path = str(tmp_path / "m.mid")
        fixtures.multitrack_midi(path)
        melody, arrangement = MuMIDI_EventSeq.extract_split_events(path)
        assert melody and arrangement
        mel_arr = MuMIDI_EventSeq.to_array(melody)
        arr_arr = MuMIDI_EventSeq.to_array(arrangement)
        assert MuMIDI_EventSeq.filter_melody(mel_arr)
        spec = vocab.MUMIDI
        for arr in (mel_arr, arr_arr):
            assert arr.min() >= 0 and arr.max() < spec.dim()

    def test_array_roundtrip_exact(self, tmp_path):
        path = str(tmp_path / "m.mid")
        fixtures.multitrack_midi(path)
        events = MuMIDI_EventSeq.extract_events(path)
        arr = MuMIDI_EventSeq.to_array(events)
        back = MuMIDI_EventSeq.from_array(arr)
        arr2 = MuMIDI_EventSeq.to_array(back)
        np.testing.assert_array_equal(arr, arr2)

    def test_segmentation_by_bars(self, tmp_path):
        path = str(tmp_path / "m.mid")
        fixtures.multitrack_midi(path, n_bars=8)
        melody_ev, _ = MuMIDI_EventSeq.extract_split_events(path)
        melody = MuMIDI_EventSeq.to_array(melody_ev)
        n_bars = MuMIDI_EventSeq.count_bar(melody)
        segs = MuMIDI_EventSeq.segmentation(melody)
        assert len(segs) == n_bars
        bar_id = vocab.MUMIDI.start("bar")
        for seg in segs:
            assert seg[0] == bar_id

    def test_write_midi(self, tmp_path):
        path = str(tmp_path / "m.mid")
        fixtures.multitrack_midi(path)
        events = MuMIDI_EventSeq.extract_events(path)
        out = str(tmp_path / "o.mid")
        MuMIDI_EventSeq.write_midi(events, out)
        midi = MidiFile(out)
        assert len(midi.instruments) >= 3


def test_remi_encode_array_matches_event_path(tmp_path):
    """The vectorized pipeline path (remi.encode_array, no Event
    objects) is byte-identical to to_array(extract_events(...)) across
    fixture types AND a boundary-heavy fuzz (downbeat-aligned starts,
    edge tempi 29/209, edge velocities/pitches)."""
    from .fixtures import (multitrack_midi, polyphonic_midi,
                           simple_piano_midi, tempo_change_midi)

    for j, builder in enumerate([simple_piano_midi, polyphonic_midi,
                                 multitrack_midi, tempo_change_midi]):
        p = str(tmp_path / f"x{j}.mid")
        builder(p)
        ref = remi.REMI_EventSeq.to_array(
            remi.REMI_EventSeq.extract_events(p))
        np.testing.assert_array_equal(remi.encode_array(p), ref)

    from musicgeneration_tpu.midi import (Instrument, MidiFile, Note,
                                          TempoChange)
    rng = np.random.RandomState(0)
    for trial in range(6):
        m = MidiFile(ticks_per_beat=480)
        bpm = int(rng.choice([60, 120, 185, 29, 209]))
        m.tempo_changes = [TempoChange(bpm, 0)]
        m._tempo_raw = [(0, int(round(60e6 / bpm)))]
        inst = Instrument(0, False, "t")
        n = rng.randint(10, 120)
        starts = np.sort(rng.choice(
            [0, 480, 1920, 3840, 1919, 1921]
            + list(rng.randint(0, 20000, n)), n))
        for s in starts:
            inst.notes.append(Note(int(rng.randint(1, 128)),
                                   int(rng.randint(0, 128)), int(s),
                                   int(s + rng.randint(30, 4000))))
        m.instruments.append(inst)
        p = str(tmp_path / f"fz{trial}.mid")
        m.dump(p)
        ref = remi.REMI_EventSeq.to_array(
            remi.REMI_EventSeq.extract_events(p))
        np.testing.assert_array_equal(remi.encode_array(p), ref,
                                      err_msg=f"trial {trial}")


def test_vectorized_chord_scorer_matches_oracle():
    """_score_all_windows (vectorized) vs _find_chord (per-window oracle)
    on random presence windows."""
    import numpy as np

    from musicgeneration_tpu.tokenizers.chords import (
        PITCH_CLASSES,
        _QUALITIES,
        _find_chord,
        _score_all_windows,
    )

    rng = np.random.RandomState(0)
    wins = rng.rand(300, 128) < 0.03
    wins[:5] = False  # empty windows
    roots, quals, basses, scores = _score_all_windows(wins)
    for w in range(wins.shape[0]):
        want = _find_chord(wins[w:w + 1])
        if roots[w] < 0:
            got = ("N", "N", "N", 0)
        else:
            q = "None" if quals[w] < 0 else _QUALITIES[quals[w]]
            got = (PITCH_CLASSES[roots[w]], q, PITCH_CLASSES[basses[w]],
                   int(scores[w]))
        assert got == want, (w, got, want)


def test_quantize_items_matches_argmin_oracle():
    import numpy as np

    from musicgeneration_tpu.tokenizers.remi import Item, quantize_items

    rng = np.random.RandomState(0)
    starts = np.sort(rng.randint(0, 5000, 200))
    items = [Item("note", int(s), int(s) + 30, pitch=60, velocity=80)
             for s in starts]
    got = quantize_items([Item("note", it.start, it.end, pitch=60,
                               velocity=80) for it in items])
    # oracle: the reference's explicit-grid argmin (REMI.py:113-122)
    grid_stop = max(int(starts[-1]), 1)
    grids = np.arange(0, grid_stop, 120, dtype=int)
    idx = np.argmin(np.abs(grids[None, :] - starts[:, None]), axis=1)
    for item, want in zip(got, grids[idx]):
        assert item.start == want


def test_compressed_controls_from_ids_matches_object_path(tmp_path):
    """ControlSeq.compressed_from_ids is byte-equal to
    from_event_seq(...).to_compressed_array() — event times are the
    time_shift chain (sequence.py:236-241), so controls are a pure
    function of the ids; the vectorized path must reproduce the sliding
    4-beat window exactly, boundary ulps included."""
    from musicgeneration_tpu.tokenizers import midilike

    path = str(tmp_path / "c.mid")
    fixtures.simple_piano_midi(path, seed=9, n_notes=200)
    ev = midilike.extract_events(path)
    oracle = midilike.ControlSeq.from_event_seq(ev).to_compressed_array()
    fast = midilike.ControlSeq.compressed_from_ids(ev.to_array())
    np.testing.assert_array_equal(oracle, fast)

    rng = np.random.RandomState(3)
    dim = midilike.EventSeq.dim()
    for it in range(10):
        ids = rng.randint(0, dim, rng.randint(1, 1200))
        ev = midilike.EventSeq.from_array(ids)
        oracle = midilike.ControlSeq.from_event_seq(ev)
        np.testing.assert_array_equal(
            oracle.to_compressed_array(),
            midilike.ControlSeq.compressed_from_ids(ids),
            err_msg=f"fuzz iter {it}")
    assert len(midilike.ControlSeq.compressed_from_ids(
        np.zeros(0, np.int64))) == 0
