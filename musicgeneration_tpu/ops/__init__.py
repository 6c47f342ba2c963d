"""TPU compute primitives: relative attention (XLA + Pallas), fused GRU
steps, on-device sampling."""

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
]
