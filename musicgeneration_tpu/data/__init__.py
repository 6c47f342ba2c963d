"""Data pipeline: packed token storage, window batching, MuMIDI compound
packing, host->device prefetch."""

from .batching import (
    SeqBatch,
    pad_and_batch_sequences,
    slide_seq2seq_batch,
    window_indices,
)
from .mumidi_packing import (
    MuMIDIBatch,
    pack_batch,
    pack_compound,
    pack_labels,
)
from .prefetch import prefetch_to_device, sliding_prefetch
from .pipeline import (
    TokenCorpus,
    find_midi_files,
    split_maestro,
    split_ratio,
    tokenize_corpus,
)
from .track_extraction import extract_merge, extract_tracks_under

__all__ = [
    "prefetch_to_device",
    "sliding_prefetch",
    "tokenize_corpus",
    "TokenCorpus",
    "find_midi_files",
    "split_ratio",
    "split_maestro",
    "extract_merge",
    "extract_tracks_under",
    "window_indices",
    "slide_seq2seq_batch",
    "pad_and_batch_sequences",
    "SeqBatch",
    "pack_compound",
    "pack_labels",
    "pack_batch",
    "MuMIDIBatch",
]
