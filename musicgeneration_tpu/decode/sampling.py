"""On-device sampling transforms: temperature / top-k / top-p / greedy.

Reference semantics: MusicTransformer samples from the full categorical
(OneHotCategorical over softmax probs, network.py:73-77); the RNNs expose
greedy vs temperature sampling (Event_MelodyRNN/network.py:140-156,
PerformanceRNN/network.py:136-154). Top-k/top-p are additions. All run
inside jit on device — no host round-trips per token.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    temperature: float = 1.0
    top_k: int = 0        # 0 = off
    top_p: float = 1.0    # 1.0 = off
    greedy: bool = False


def sample_logits(rng: jax.Array, logits: jnp.ndarray,
                  params: SamplingParams) -> jnp.ndarray:
    """logits: [B, V] f32 -> [B] int32 token ids."""
    if params.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / jnp.maximum(params.temperature, 1e-6)
    if params.top_k and params.top_k > 0:
        k = min(params.top_k, logits.shape[-1])
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if params.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix with cumulative prob >= top_p
        cutoff_idx = jnp.sum(cum < params.top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)
