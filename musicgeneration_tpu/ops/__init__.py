"""TPU compute primitives: relative attention (XLA + Pallas), fused
GRU/LSTM steps, on-device sampling."""

from .gru import GRUStack, gru_cell_step
from .lstm import LSTMStack, lstm_cell_step
from .relative_attention import (
    relative_decode_bias,
    relative_global_attention,
    relative_logits,
    sinusoid_position_encoding,
)

__all__ = [
    "relative_global_attention",
    "relative_logits",
    "relative_decode_bias",
    "sinusoid_position_encoding",
    "GRUStack",
    "gru_cell_step",
    "LSTMStack",
    "lstm_cell_step",
]
