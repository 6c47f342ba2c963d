"""Model zoo (reference parity, SURVEY.md §2.4):

    MusicTransformer — decoder-only transformer with relative global
        attention (mg/model/MusicTransformer/{network,layers}.py)
    EventMelodyRNN   — GRU LM over MIDI-like events
        (mg/model/Event_MelodyRNN/network.py)
    PerformanceRNN   — control-conditioned GRU LM
        (mg/model/PerformanceRNN/network.py)
    PoPMAGRNN        — melody->arrangement seq2seq over MuMIDI
        (mg/model/PoPMAG_RNN/network.py)
    MelodyRNN        — LSTM LM over monophonic note arrays
        (mg/model/MelodyRNN/train_basic_rnn.py)

All are Flax modules with a full-sequence training `__call__` plus
TPU-shaped incremental decoding (`init_cache` / `decode_step`) driven by
`musicgeneration_tpu.decode`.
"""

from .cp_transformer import CPTransformer
from .event_rnn import EventMelodyRNN
from .melody_rnn import MelodyRNN
from .music_transformer import MusicTransformer
from .performance_rnn import PerformanceRNN
from .popmag import PoPMAGRNN
from .registry import get_model, register_model

__all__ = [
    "MusicTransformer",
    "CPTransformer",
    "EventMelodyRNN",
    "PerformanceRNN",
    "PoPMAGRNN",
    "MelodyRNN",
    "get_model",
    "register_model",
]
