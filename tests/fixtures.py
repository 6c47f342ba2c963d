"""Deterministic synthetic MIDI fixtures (no external corpus in the image).

Builds small but structurally rich MIDI files — multiple tracks, tempo
changes, chords, drums — through our own SMF writer. These stand in for the
reference's maestro/LMD corpora in round-trip tests."""

import numpy as np

from musicgeneration_tpu.midi import (
    Instrument,
    MidiFile,
    Note,
    TempoChange,
    TimeSignature,
)

TPB = 480


def simple_piano_midi(path, seed=0, n_notes=64, tempo=120.0):
    """Monophonic-ish piano piece, one tempo, quantized starts."""
    rng = np.random.RandomState(seed)
    midi = MidiFile(ticks_per_beat=TPB)
    midi.tempo_changes = [TempoChange(tempo=tempo, time=0)]
    midi._tempo_raw = [(0, int(round(60e6 / tempo)))]
    midi.time_signature_changes = [TimeSignature(4, 4, 0)]
    inst = Instrument(program=0, is_drum=False, name="piano")
    tick = 0
    for _ in range(n_notes):
        pitch = int(rng.randint(40, 90))
        vel = int(rng.randint(30, 120))
        dur = int(rng.choice([120, 240, 480, 960]))
        inst.notes.append(Note(velocity=vel, pitch=pitch, start=tick,
                               end=tick + dur))
        tick += int(rng.choice([120, 240, 480]))
    midi.instruments.append(inst)
    midi.dump(path)
    return path


def motif_piano_midi(path, seed=0, n_bars=48, tempo=120.0):
    """Highly repetitive piece: one per-seed 8-note motif loops bar
    after bar with a 4-bar I-I-IV-V-ish transposition cycle and sparse
    ornament substitutions. Sequentially PREDICTABLE (unlike
    simple_piano_midi's random walk) — the training corpus for
    speculative-decoding acceptance measurements, standing in for real
    music's bar/phrase-level repetition."""
    rng = np.random.RandomState(seed)
    midi = MidiFile(ticks_per_beat=TPB)
    midi.tempo_changes = [TempoChange(tempo=tempo, time=0)]
    midi._tempo_raw = [(0, int(round(60e6 / tempo)))]
    midi.time_signature_changes = [TimeSignature(4, 4, 0)]
    inst = Instrument(program=0, is_drum=False, name="piano")
    motif = rng.randint(55, 76, size=8)
    durs = rng.choice([120, 240, 240, 480], size=8)
    vels = rng.randint(60, 100, size=8)
    steps = (TPB * 4) // 8
    cycle = [0, 0, 5, 7]
    tick = 0
    for bar in range(n_bars):
        shift = cycle[bar % 4]
        for i in range(8):
            pitch = int(motif[i]) + shift
            if rng.rand() < 0.05:  # sparse ornament
                pitch += int(rng.choice([-2, 2]))
            inst.notes.append(Note(
                velocity=int(vels[i]), pitch=pitch, start=tick,
                end=tick + int(durs[i])))
            tick += steps
    midi.instruments.append(inst)
    midi.dump(path)
    return path


def polyphonic_midi(path, seed=1, n_chords=24, tempo=96.0):
    """Chordal piece: stacked triads so chord inference has signal."""
    rng = np.random.RandomState(seed)
    midi = MidiFile(ticks_per_beat=TPB)
    midi.tempo_changes = [TempoChange(tempo=tempo, time=0)]
    midi._tempo_raw = [(0, int(round(60e6 / tempo)))]
    inst = Instrument(program=0, is_drum=False, name="piano")
    triads = [[60, 64, 67], [57, 60, 64], [65, 69, 72], [62, 65, 69]]
    # NB: offset starts off the downbeat grid — the reference's group_items
    # (REMI.py:139-165) double-counts items landing exactly on a downbeat,
    # and we reproduce that quirk; fixtures avoid it so note-count tests
    # measure real preservation.
    tick = TPB // 2
    for i in range(n_chords):
        triad = triads[i % len(triads)]
        shift = int(rng.randint(-3, 4))
        for p in triad:
            inst.notes.append(Note(velocity=80, pitch=p + shift,
                                   start=tick, end=tick + TPB * 2))
        # melody on top
        inst.notes.append(Note(velocity=100,
                               pitch=triad[0] + 12 + int(rng.randint(0, 5)),
                               start=tick, end=tick + TPB))
        tick += TPB * 2
    inst.notes.sort(key=lambda n: (n.start, n.pitch))
    midi.instruments.append(inst)
    midi.dump(path)
    return path


def multitrack_midi(path, seed=2, n_bars=8, tempo=120.0):
    """Six-role multi-track piece for the MuMIDI pipeline: melody, piano,
    bass, guitar, string, drum (GM programs per vocab.MUMIDI_INSTRUMENT_NUMBERS,
    0-indexed in the file)."""
    rng = np.random.RandomState(seed)
    midi = MidiFile(ticks_per_beat=TPB)
    midi.tempo_changes = [TempoChange(tempo=tempo, time=0)]
    midi._tempo_raw = [(0, int(round(60e6 / tempo)))]
    bar = TPB * 4

    def mk(name, program, is_drum, pitch_lo, pitch_hi, step, dur):
        inst = Instrument(program=program, is_drum=is_drum, name=name)
        for b in range(n_bars):
            t = b * bar
            while t < (b + 1) * bar:
                inst.notes.append(
                    Note(velocity=int(rng.randint(40, 110)),
                         pitch=int(rng.randint(pitch_lo, pitch_hi)),
                         start=t, end=min(t + dur, (b + 1) * bar)))
                t += step
        return inst

    midi.instruments.append(mk("melody", 72, False, 60, 84, TPB, TPB))
    midi.instruments.append(mk("piano", 0, False, 48, 72, TPB * 2, TPB * 2))
    midi.instruments.append(mk("bass", 32, False, 28, 52, TPB, TPB))
    midi.instruments.append(mk("guitar", 24, False, 52, 76, TPB * 2, TPB))
    midi.instruments.append(mk("string", 65, False, 55, 79, bar, bar))
    midi.instruments.append(mk("drum", 0, True, 35, 50, TPB // 2, TPB // 4))
    midi.dump(path)
    return path


def tempo_change_midi(path, tempo_a=90.0, tempo_b=150.0):
    """Two-tempo piece to exercise the TempoMap tick<->seconds conversion."""
    midi = MidiFile(ticks_per_beat=TPB)
    midi.tempo_changes = [TempoChange(tempo=tempo_a, time=0),
                          TempoChange(tempo=tempo_b, time=TPB * 8)]
    midi._tempo_raw = [(0, int(round(60e6 / tempo_a))),
                       (TPB * 8, int(round(60e6 / tempo_b)))]
    inst = Instrument(program=0, is_drum=False, name="piano")
    for i in range(16):
        inst.notes.append(Note(velocity=64 + i, pitch=60 + (i % 12),
                               start=i * TPB, end=i * TPB + TPB // 2))
    midi.instruments.append(inst)
    midi.dump(path)
    return path
