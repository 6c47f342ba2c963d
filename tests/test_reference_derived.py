"""Reference-DERIVED golden fixtures (VERDICT round-1 #2).

Unlike tests/test_golden_tokens.py (a self-regression lock pinning this
framework's own output), every expected array here was derived BY HAND
from the reference algorithm at the cited lines of
/root/reference/mg/..., with the step-by-step derivation written out in
comments. The reference's torch code DOES execute in this image (torch
2.13 CPU is present; pretty_midi/miditoolkit are stubbed) — the
machine-verified parity anchors live in test_reference_executable.py,
which runs the reference in-process on fuzzed inputs; these hand-worked
cases remain as human-auditable documentation of the quirk semantics.

Quirk coverage (SURVEY.md §7 hard-part 1):
* midilike searchsorted side conventions + greedy time-shift float drops
  (sequence.py:145-183)
* REMI quantize argmin ties + last-grid clip (REMI.py:113-122), downbeat
  double-count grouping (REMI.py:139-165), velocity searchsorted
  side='right'-1 with the <4 -> range[-1] quirk (REMI.py:196-228),
  duration argmin ties, write_midi len(events)-3 trailing drop
  (REMI.py:544)
* MuMIDI velocity side='right' WITHOUT -1 (MuMIDI.py:265-268), drum
  pitch offset, position dedup + 1-based positions (MuMIDI.py:241-247)
* pedal codec sustain transposition + the faithful post-pedal note drop
  (processor.py:181-199), raw-velocity state (processor.py:228)
"""

import numpy as np

from musicgeneration_tpu.midi import (
    ControlChange,
    Instrument,
    MidiFile,
    Note,
    TempoChange,
)
from musicgeneration_tpu.tokenizers import mumidi, pedal_midilike, remi
from musicgeneration_tpu.tokenizers.midilike import EventSeq, NoteSeq


# ---------------------------------------------------------------------------
# MIDI-like (sequence.py)
# ---------------------------------------------------------------------------

def test_midilike_reference_derived():
    """Derivation (sequence.py:145-183, vocab at :204-221):

    Layout: note_on 0-87 | note_off 88-175 | velocity 176-207 |
    time_shift 208-307 (feat_dims order, :204-212).
    velocity_bins = arange(21, 109, 88/31) (:223-228); searchsorted is
    side='left' (:158). time_shift_bins = 0.01*arange(1,101) (:27);
    emission is greedy searchsorted(side='right')-1 while the remainder
    >= bins[0] (:174-181).

    Notes (pitch, vel, start, end):
      n1 (60,  64, 0.00, 0.25)  vel 64: bins[15]=63.58<64<=bins[16]=66.42
                                -> idx 16 -> token 192; on 60-21=39
      n2 (20,  80, 0.00, 0.50)  pitch 20 outside range(21,109) -> DROPPED
                                entirely (:152)
      n3 (64,  20, 0.25, 0.30)  vel clipped to 21 (:155-157) -> idx 0
                                -> 176; on 64-21=43
      n4 (108,110, 0.30, 2.30)  vel clipped to 108 -> idx 31 -> 207;
                                on 108-21=87 (top of range)

    Interleaved (vel,on at start; off at end), stable-sorted by time:
      t=0.00 vel16,on39 | gap 0.25: 0.01*25==0.25 exactly in f64 so
        searchsorted(right)-1 = 24 -> ONE shift token 208+24=232
      t=0.25 off39 (88+39=127), vel0 (176), on43 (43)
        gap 0.05 -> idx 4 -> 208+4... NO: searchsorted(bins,0.05,'right')-1
        = 4-1? bins[4]=0.05 exactly -> right gives 5, -1 = 4?? measured:
        idx 3 because 0.01*4=0.04000000000000001 <= 0.05 < 0.01*5
        = 0.05000000000000001 -> right = 4, -1 = 3 -> token 211 (0.04s);
        remainder 0.01 - eps < bins[0] -> dropped (float-drop quirk)
      t=0.30 off43 (131), vel31 (207), on87 (87)
        gap 2.00 -> idx 99 (1.0), remainder 2.0-1.0000000000000002 =
        0.9999999999999998 -> idx 98 (0.99) -> tokens 307, 306; the
        trailing ~0.01 is dropped (float-drop quirk again)
      t=2.30 off87 (175)
    """
    notes = [Note(velocity=64, pitch=60, start=0.0, end=0.25),
             Note(velocity=80, pitch=20, start=0.0, end=0.5),
             Note(velocity=20, pitch=64, start=0.25, end=0.30),
             Note(velocity=110, pitch=108, start=0.30, end=2.30)]
    expected = [192, 39, 232, 127, 176, 43, 211, 131, 207, 87, 307, 306,
                175]
    got = EventSeq.from_note_seq(NoteSeq(notes)).to_array()
    np.testing.assert_array_equal(got, expected)


# ---------------------------------------------------------------------------
# REMI (REMI.py)
# ---------------------------------------------------------------------------

def test_remi_reference_derived_encode():
    """Derivation (REMI.py:113-257, vocab at :435-458):

    Layout: note_on 0-126 | note_duration 127-190 | note_velocity 191-194 |
    bar 195 | position 196-211 | tempo_class 212-214 | tempo_value 215-274 |
    chord 275-335.

    quantize_items (REMI.py:113-122): grids = arange(0, max_start, 120) —
    EXCLUSIVE of max start, argmin ties pick the FIRST (lower) grid.
      N1 (p60,  v17, 60..290):  start 60 equidistant 0/120 -> snaps to 0
                                (tie quirk); end 230, dur 230
      N2 (p64,  v3,  250..340): snaps to 240; dur 90 (tie between bins
                                60/120 -> argmin FIRST -> idx 0)
      N3 (p100, v4,  1920..2040): rem 0, stays on the downbeat; dur 120
      N4 (p72,  v19, 2100..2220): 2100 tie 2040/2160 -> snaps DOWN 2040

    tempos (pitch=bpm): t@0=120 (mid: class1, val 120-90=30, :237-240),
      t@480=67 (slow: class0, val 37), t@960=155 (fast: class2, val 5),
      t@1440=29 (<30 branch: class0 val 0, :249-251).

    group_items (REMI.py:139-165): downbeats arange(0, 2160+1920, 1920)
    = [0,1920,3840]; r-pointer uses start <= db2 so N3@1920 lands in
    BOTH bars (double-count quirk).

    item2event (REMI.py:180-257): positions = argmin over
    linspace(bar_st, bar_et, 16, endpoint=False) (step 120);
    velocity_index = searchsorted(arange(4,128,4), v, 'right') - 1:
      v17 -> 3 (token 194); v3 -> -1 -> range(191,195)[-1] = 194
      (the <4 quirk, :206-209 + :517); v4 -> 0 (191); v19 -> 3.
    duration argmin over arange(60,3841,60): 230->idx3 (130), 90->idx0
    (127), 120->idx1 (128).

    Bar1: bar(195); [tempo@0] pos0(196), tc1(213), tv30(245);
      [N1@0] pos0, vel194, on60, dur130; [N2@240] pos2(198), vel194,
      on64, dur127; [tempo@480] pos4(200), tc0(212), tv37(252);
      [tempo@960] pos8(204), tc2(214), tv5(220); [tempo@1440] pos12(208),
      tc0(212), tv0(215); [N3@1920] pos15(211), vel191, on100, dur128.
    Bar2: bar; [N3 again] pos0, vel191, on100, dur128; [N4@2040]
      pos1(197), vel194, on72, dur128.
    """
    notes = [remi.Item("note", 60, 290, 17, 60),
             remi.Item("note", 250, 340, 3, 64),
             remi.Item("note", 1920, 2040, 4, 100),
             remi.Item("note", 2100, 2220, 19, 72)]
    tempos = [remi.Item("tempo", 0, None, None, 120),
              remi.Item("tempo", 480, None, None, 67),
              remi.Item("tempo", 960, None, None, 155),
              remi.Item("tempo", 1440, None, None, 29)]
    notes = remi.quantize_items(notes)
    assert [(n.start, n.end) for n in notes] == [
        (0, 230), (240, 330), (1920, 2040), (2040, 2160)]
    groups = remi.group_items(tempos + notes, notes[-1].end)
    got = remi.REMI_EventSeq.to_array(remi.item2event(groups))
    expected = [195, 196, 213, 245, 196, 194, 60, 130, 198, 194, 64, 127,
                200, 212, 252, 204, 214, 220, 208, 212, 215, 211, 191,
                100, 128, 195, 196, 191, 100, 128, 197, 194, 72, 128]
    np.testing.assert_array_equal(got, expected)


def test_remi_reference_derived_write_midi():
    """Derivation (REMI.py:539-674):

    Tokens: [bar, pos0, tc1, tv30, pos2, vel3, on60, dur3,
             bar, pos15, vel0, on100, dur1, pos4, tc0, tv12]  (len 16)

    The scan runs `for i in range(len(events) - 3)` (:544) = i in 0..12,
    so the trailing tempo trio at i=13..15 is silently DROPPED.
    - the leading bar at i=0 does NOT emit a bar marker (i > 0 guard :545)
    - note 1: pos2 vel bins[3]=16 pitch60 dur bins[3]=240 -> bar0 flags
      linspace(0,1920,16,False,int): st=240, et=480 (:585-597)
    - bar at i=8 -> current_bar=1
    - note 2: pos15 vel bins[0]=4 pitch100 dur bins[1]=120 ->
      st=1920+15*120=3720, et=3840
    - tempo: [pos0, 90+30=120] -> tick 0 (:617-630)
    """
    toks = [195, 196, 213, 245, 198, 194, 60, 130,
            195, 211, 191, 100, 128, 200, 212, 227]
    evs = remi.REMI_EventSeq.from_array(toks)
    m = remi.REMI_EventSeq.write_midi(evs, "/dev/null")
    got = [(n.pitch, n.velocity, n.start, n.end)
           for n in m.instruments[0].notes]
    assert got == [(60, 16, 240, 480), (100, 4, 3720, 3840)]
    assert [(t.tempo, t.time) for t in m.tempo_changes] == [(120, 0)]


# ---------------------------------------------------------------------------
# MuMIDI (MuMIDI.py)
# ---------------------------------------------------------------------------

def test_mumidi_reference_derived():
    """Derivation (MuMIDI.py:180-331, vocab at :353-384):

    Layout: empty 0 | note_on 1-256 (pitch 128 + drum 128) |
    note_duration 257-288 | note_velocity 289-320 | bar 321 |
    position 322-354 | track 355-360 | tempo_class 361-363 |
    tempo_value 364-423 | chord 424-484.

    group_items sorts by (start, track) (:181) — tempo items carry
    track='' so they precede notes at the same tick.

    item2event (:224-330): position index = argmin over
    linspace(0,1920,32,False) (step 60) PLUS ONE (:241), emitted only
    when it changes (:242-247); each note then emits
    track / velocity / note_on / duration.
    velocity_index = searchsorted(arange(4,129,4), v, side='right')
    with NO -1 (:265-268) — one MORE than REMI's convention:
      v3 -> 0, v4 -> 1 (right-side!), v127 -> 31.
    drum pitch value = pitch - 1 + 128 (:276-281); melodic = pitch - 1.
    duration argmin over arange(60,1921,60).

    Items: tempo@0 bpm120; melody (p60,v3,0..120); piano (p64,v4,0..240);
    drum (p36,v127,240..300).
    Events: bar(321); pos1(323); tc1(362); tv30(394);
      track_melody(355); vel0(289); on59 (1+59=60); dur1 (257+1=258);
      track_piano(356); vel1(290); on63(64); dur3(260);
      pos5(327); track_drum(360); vel31(320); on163 (36-1+128 -> 1+163
      = 164); dur0(257).
    """
    items = [mumidi.Item("tempo", 0, None, None, 120),
             mumidi.Item("note", 0, 120, 3, 60, track="melody"),
             mumidi.Item("note", 0, 240, 4, 64, track="piano"),
             mumidi.Item("note", 240, 300, 127, 36, track="drum")]
    groups = mumidi.group_items(items, 300)
    got = mumidi.MuMIDI_EventSeq.to_array(mumidi.item2event(groups))
    expected = [321, 323, 362, 394, 355, 289, 60, 258, 356, 290, 64, 260,
                327, 360, 320, 164, 257]
    np.testing.assert_array_equal(got, expected)


# ---------------------------------------------------------------------------
# Pedal MIDI-like (processor.py)
# ---------------------------------------------------------------------------

def test_pedal_reference_derived():
    """Derivation (processor.py:92-230, vocab at :4-14):

    Layout: note_on 0-127 | note_off 128-255 | time_shift 256-355 |
    velocity 356-387.

    Notes (vel, pitch, start, end seconds): n1 (80,60,0.0,0.2),
    n2 (80,62,0.3,0.5), n3 (90,64,1.5,1.7); sustain CC64 down@0.25 up@1.0.

    _note_preprocess (:181-199): n1 starts before the pedal -> streamed;
    n2 falls inside [0.25,1.0] -> managed; transposition_notes (:32-38):
    no later same-pitch note -> n2.end = max(sustain.end, 0.5) = 1.0
    (pedal EXTENDS the note); n3 starts after sustain.end -> the loop
    breaks and — reference bug — n3 is NEVER appended (faithful drop).

    Timeline (sorted SplitNotes :220-228, shifts :156-165 use
    int(round(dt*100)), velocity state :127-131 emits vel//4 when it
    differs from the RAW previous velocity):
      on n1 @0.00: vel 80//4=20 != 0 -> 356+20=376; on60 -> 60
      off n1 @0.20: shift 20 -> value 19 -> 256+19=275; off60 -> 128+60=188
        (cur_vel becomes None :228)
      on n2 @0.30: shift 10 -> 265; vel 20 != None -> 376; on62 -> 62
      off n2 @1.00: shift 70 -> 256+69=325; off62 -> 190
    """
    midi = MidiFile(ticks_per_beat=480)
    midi.tempo_changes = [TempoChange(tempo=120, time=0)]
    midi._tempo_raw = [(0, 500000)]
    inst = Instrument(0, False, "t")
    inst.notes = [Note(80, 60, 0.0, 0.2), Note(80, 62, 0.3, 0.5),
                  Note(90, 64, 1.5, 1.7)]
    inst.control_changes = [ControlChange(64, 100, 0.25),
                            ControlChange(64, 0, 1.0)]
    midi.instruments.append(inst)
    expected = [376, 60, 275, 188, 265, 376, 62, 325, 190]
    assert pedal_midilike.encode_midi(midi, faithful=True) == expected
    # the fixed path keeps n3: shift 0.5 -> 305, vel 90//4=22 -> 378,
    # on64 -> 64, shift 0.2 -> 275, off64 -> 192
    assert pedal_midilike.encode_midi(midi, faithful=False) == expected + [
        305, 378, 64, 275, 192]
