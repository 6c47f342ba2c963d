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

__all__ = [
    "window_indices",
    "slide_seq2seq_batch",
    "pad_and_batch_sequences",
    "SeqBatch",
    "pack_compound",
    "pack_labels",
    "pack_batch",
    "MuMIDIBatch",
]
