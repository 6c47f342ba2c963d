"""Tokenizers: MIDI <-> integer token arrays in three schemes.

Reference parity (README.md:5-30 of the reference): each scheme exposes
`extract_events / to_array / from_array / write_midi` plus the
`feat_dims / feat_ranges / dims_feat / dim` vocab helpers.

    midilike — Performance-RNN style events, dim 308 (+ControlSeq dim 24)
    remi     — REMI bar/position/chord/tempo events, dim 336
    mumidi   — multi-track PopMAG representation, dim 485
    pedal_midilike — sustain-pedal MIDI-like codec, dim 388
                     (MusicTransformer lineage, reference processor.py)
    chords   — rule-based chord inference shared by remi/mumidi
    melody   — monophonic note-array codec (Magenta Melody-RNN format,
               dim 130) + skyline/TOP melody extraction
"""

from . import chords, melody, midilike, mumidi, pedal_midilike, remi
from .midilike import ControlSeq, EventSeq, NoteSeq
from .mumidi import MuMIDI_EventSeq
from .remi import REMI_EventSeq

__all__ = [
    "chords",
    "midilike",
    "remi",
    "mumidi",
    "pedal_midilike",
    "melody",
    "EventSeq",
    "NoteSeq",
    "ControlSeq",
    "REMI_EventSeq",
    "MuMIDI_EventSeq",
]
