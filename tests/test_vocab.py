"""Vocab layout invariants: the reference's token-id layouts, locked.

Dims per reference: MIDI-like 308 (sequence.py:204-212), REMI 336
(REMI.py:449-458), MuMIDI 485 (MuMIDI.py:353-384), ControlSeq 24
(sequence.py:364-374), performance codec 388 (processor.py:4-14)."""

import numpy as np

from musicgeneration_tpu import vocab


def test_dims():
    assert vocab.MIDILIKE.dim() == 308
    assert vocab.REMI.dim() == 336
    assert vocab.MUMIDI.dim() == 485
    assert vocab.CONTROL.dim() == 24
    assert vocab.PERFORMANCE.dim() == 388


def test_feat_ranges_partition():
    """feat_ranges must be contiguous, disjoint, and total dim()."""
    for name, spec in vocab.SPECS.items():
        offset = 0
        for feat, rng in spec.feat_ranges().items():
            assert rng.start == offset, (name, feat)
            assert rng.stop > rng.start
            offset = rng.stop
        assert offset == spec.dim()


def test_midilike_layout_order():
    r = vocab.MIDILIKE.feat_ranges()
    assert list(r) == ["note_on", "note_off", "velocity", "time_shift"]
    assert r["note_on"] == range(0, 88)
    assert r["note_off"] == range(88, 176)
    assert r["velocity"] == range(176, 208)
    assert r["time_shift"] == range(208, 308)


def test_remi_layout():
    r = vocab.REMI.feat_ranges()
    assert list(r) == ["note_on", "note_duration", "note_velocity", "bar",
                       "position", "tempo_class", "tempo_value", "chord"]
    assert r["note_on"] == range(0, 127)
    assert r["chord"].stop == 336
    assert len(vocab.CHORD_MAP) == 61
    assert vocab.CHORD_MAP["C:maj"] == 0
    assert vocab.CHORD_MAP["N:N"] == 60


def test_mumidi_layout():
    r = vocab.MUMIDI.feat_ranges()
    assert list(r) == ["empty", "note_on", "note_duration", "note_velocity",
                       "bar", "position", "track", "tempo_class",
                       "tempo_value", "chord"]
    assert r["empty"] == range(0, 1)
    assert r["note_on"] == range(1, 257)
    assert r["position"] == range(322, 355)  # 33 positions
    assert r["track"] == range(355, 361)


def test_decode_ids_roundtrip():
    for spec in vocab.SPECS.values():
        ids = np.arange(spec.dim())
        feats, vals = spec.decode_ids(ids)
        names = spec.names
        rebuilt = np.array(
            [spec.encode(names[f], v) for f, v in zip(feats, vals)])
        np.testing.assert_array_equal(rebuilt, ids)


def test_velocity_bins_match_reference_formula():
    bins = vocab.midilike_velocity_bins()
    # sequence.py:223-228: arange(21, 109, (109-21)/(32-1)) — NB the
    # exclusive stop yields only 31 bin edges even though velocity_steps=32;
    # searchsorted indices still span 0..31 so the vocab slot count is 32.
    expected = np.arange(21, 109, (109 - 21) / 31)
    np.testing.assert_allclose(bins, expected)
    assert bins.size == 31
    assert vocab.MIDILIKE.feat_dims()["velocity"] == 32


def test_array_dtype_packing():
    # sequence.py:286: uint8 iff dim <= 256 else uint16
    assert vocab.MIDILIKE.array_dtype() == np.uint16  # 308
    assert vocab.REMI.array_dtype() == np.uint16      # 336
    assert vocab.MUMIDI.array_dtype() == np.uint16    # 485
    assert vocab.CONTROL.array_dtype() == np.uint8    # 24
