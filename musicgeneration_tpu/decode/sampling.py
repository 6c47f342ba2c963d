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
import numpy as np


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    temperature: float = 1.0
    top_k: int = 0        # 0 = off
    top_p: float = 1.0    # 1.0 = off
    greedy: bool = False


def pack_sampling(params: SamplingParams) -> tuple:
    """(temp_bits, top_k, top_p_bits, greedy) as int32 scalars — floats
    bitcast so per-row params can ride an int32 transfer (the serving
    engine's one-packed-array admission)."""
    return (int(np.float32(params.temperature).view(np.int32)),
            int(params.top_k),
            int(np.float32(params.top_p).view(np.int32)),
            int(params.greedy))


def unpack_sampling(temp_bits: jnp.ndarray, top_k: jnp.ndarray,
                    top_p_bits: jnp.ndarray, greedy: jnp.ndarray):
    """Inverse of pack_sampling on device: int32 [B] columns -> the
    per-row param pytree consumed by sample_logits_batched."""
    return {
        "temperature": jax.lax.bitcast_convert_type(temp_bits, jnp.float32),
        "top_k": top_k,
        "top_p": jax.lax.bitcast_convert_type(top_p_bits, jnp.float32),
        "greedy": greedy.astype(bool),
    }


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


def sample_logits_batched(rng: jax.Array, logits: jnp.ndarray,
                          samp: dict) -> jnp.ndarray:
    """Per-ROW sampling: each batch row carries its own params.

    samp: {"temperature": [B] f32, "top_k": [B] i32 (0=off),
    "top_p": [B] f32 (1.0=off), "greedy": [B] bool}. Row-for-row
    equal to `sample_logits` at the same rng when every row shares the
    scalar path's params (locked in tests/test_sampling.py): the kth
    threshold comes off the same descending sort `lax.top_k` reads, and
    off rows mask nothing, so the categorical sees identical logits.
    One [B, V] sort per call covers both top-k and top-p; at decode
    vocab sizes (309-485) that is noise next to the decode step.
    """
    raw = logits
    logits = logits / jnp.maximum(samp["temperature"][:, None], 1e-6)
    v = logits.shape[-1]
    srt = jnp.sort(logits, axis=-1)[..., ::-1]          # descending
    # top-k: threshold at the per-row kth value; k<=0 -> keep all
    k = jnp.clip(samp["top_k"], 0, v)
    kth = jnp.take_along_axis(
        srt, jnp.maximum(k - 1, 0)[:, None], axis=-1)
    logits = jnp.where((k > 0)[:, None] & (logits < kth),
                       -jnp.inf, logits)
    # top-p runs AFTER top-k in the scalar path, i.e. its softmax
    # renormalizes over only the top-k survivors: apply the same
    # value threshold to the sorted copy (equivalent to re-sorting the
    # masked logits — the mask is by value, so order is preserved)
    srt = jnp.where((k > 0)[:, None] & (srt < kth), -jnp.inf, srt)
    # top-p: smallest prefix of the sorted probs with cum >= p
    probs = jax.nn.softmax(srt, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_idx = jnp.sum(cum < samp["top_p"][:, None], axis=-1,
                         keepdims=True)
    cutoff = jnp.take_along_axis(srt, jnp.minimum(cutoff_idx, v - 1),
                                 axis=-1)
    logits = jnp.where((samp["top_p"] < 1.0)[:, None] & (logits < cutoff),
                       -jnp.inf, logits)
    sampled = jax.random.categorical(rng, logits, axis=-1)
    return jnp.where(samp["greedy"], jnp.argmax(raw, axis=-1),
                     sampled).astype(jnp.int32)
