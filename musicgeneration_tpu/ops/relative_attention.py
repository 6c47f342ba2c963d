"""Relative global attention (Music Transformer, Huang et al. 2018).

Semantics match the reference implementation
(mg/model/MusicTransformer/layers.py:42-133) exactly:

* a learned relative embedding table ``E`` of shape ``[max_seq, d_head]``
  whose *last* rows correspond to the *nearest* left-context positions
  (layers.py:111-114: ``e = E[max(0, max_seq-len_q):]``),
* ``QE = einsum('bhld,md->bhlm', q, e)`` then a triangular "qe mask" that
  zeroes relative positions further left than the query index
  (layers.py:127-133),
* the pad-reshape-slice "skew" that aligns relative scores with absolute
  key positions (layers.py:116-125),
* ``logits = (QK^T + Srel) / sqrt(dh) + mask * -1e9`` (layers.py:94-100).

This module gives two TPU-shaped paths:

1. ``relative_global_attention`` — full-sequence training/eval path. Pure
   XLA: einsum + pad/reshape/slice are all static-shape and fuse well.
2. ``relative_decode_bias`` — O(L) bias for a single query at absolute
   position ``t`` against a KV cache, mathematically identical to row ``t``
   of the full-forward Srel (the reference has no KV cache at all and
   re-forwards the whole prefix per generated token — network.py:52-78).

Derivation of the decode-path identity (checked by tests against the skew):
with ``len_q == len_k == L``, ``Srel[t, j] = q_t . E[max_seq - 1 - (t - j)]``
for ``j <= t`` and masked otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def sinusoid_position_encoding(max_seq: int, d_model: int) -> np.ndarray:
    """The reference's idiosyncratic sinusoid (layers.py:22-39):
    even i: sin(pos * 10000^(-i/d)); odd i: cos(pos * 10000^(-(i-1)/d))
    (the odd case comes out of the `+ pi/2 * (i%2)` phase shift and the
    `exp(log(10000)/d * (i%2))` factor)."""
    pos = np.arange(max_seq, dtype=np.float64)[:, None]
    i = np.arange(d_model, dtype=np.float64)[None, :]
    rate = np.exp(-np.log(10000.0) * i / d_model) * np.exp(
        np.log(10000.0) / d_model * (i % 2)
    )
    table = np.sin(pos * rate + 0.5 * np.pi * (i % 2))
    return table.astype(np.float32)


def _qe_mask(len_q: int, len_k: int, dtype) -> jnp.ndarray:
    """Zero out relative columns m < len_k - 1 - l (layers.py:127-133)."""
    l = jnp.arange(len_q)[:, None]
    m = jnp.arange(len_k)[None, :]
    return (m >= (len_k - 1 - l)).astype(dtype)


def _skew(qe: jnp.ndarray) -> jnp.ndarray:
    """Pad-reshape-slice skew (layers.py:116-125). qe: [B, H, L, M] with
    M == len_k; returns [B, H, L, len_k]."""
    b, h, l, m = qe.shape
    padded = jnp.pad(qe, ((0, 0), (0, 0), (0, 0), (1, 0)))
    reshaped = padded.reshape(b, h, m + 1, l)
    return reshaped[:, :, 1:, :]


def relative_logits(q: jnp.ndarray, e: jnp.ndarray) -> jnp.ndarray:
    """Srel for the full-forward path.

    q: [B, H, L, dh] queries; e: [max_seq, dh] relative table.
    Uses the last len_q rows of e (layers.py:111-114), masks, skews.
    """
    len_q = q.shape[2]
    start = max(0, e.shape[0] - len_q)
    e_used = jax.lax.slice_in_dim(e, start, e.shape[0], axis=0)
    qe = jnp.einsum(
        "bhld,md->bhlm", q, e_used, preferred_element_type=jnp.float32
    )
    qe = qe * _qe_mask(q.shape[2], e_used.shape[0], qe.dtype)
    return _skew(qe)


def relative_global_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    e: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Full-sequence relative attention.

    q/k/v: [B, H, L, dh]; e: [max_seq, dh]; mask: broadcastable to
    [B, H, Lq, Lk], 1.0 = masked (reference convention, layers.py:98-100).
    Returns [B, H, L, dh] in q.dtype; logits/softmax computed in f32.
    """
    dh = q.shape[-1]
    srel = relative_logits(q, e)
    qkt = jnp.einsum("bhld,bhmd->bhlm", q, k,
                     preferred_element_type=jnp.float32)
    logits = (qkt + srel) / jnp.sqrt(jnp.float32(dh))
    if mask is not None:
        logits = logits + mask.astype(jnp.float32) * -1e9
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhlm,bhmd->bhld", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def relative_decode_bias(
    q: jnp.ndarray, e: jnp.ndarray, t: jnp.ndarray, kv_len: int
) -> jnp.ndarray:
    """Relative bias row for one query at absolute position t (KV-cached
    decode). q: [B, H, dh]; returns [B, H, kv_len] f32.

    Identity with the full path: Srel[t, j] = q . E[max_seq - 1 - (t - j)],
    for j <= t. Cache slots j > t are garbage here; the caller's causal
    mask (j > t -> -1e9) hides them.
    """
    max_seq = e.shape[0]
    j = jnp.arange(kv_len)
    idx = jnp.clip(max_seq - 1 - t + j, 0, max_seq - 1)
    e_rows = jnp.take(e, idx, axis=0)  # [kv_len, dh]
    return jnp.einsum("bhd,jd->bhj", q, e_rows,
                      preferred_element_type=jnp.float32)


def relative_chunk_bias(
    q: jnp.ndarray, e: jnp.ndarray, t: jnp.ndarray, kv_len: int
) -> jnp.ndarray:
    """Relative bias for a CHUNK of C queries at absolute positions
    t..t+C-1 against a KV cache (speculative-decoding verify forward).
    q: [B, H, C, dh]; returns [B, H, C, kv_len] f32.

    Row c is exactly ``relative_decode_bias`` at position t+c:
    Srel[t+c, j] = q_c . E[max_seq - 1 - (t + c - j)] for j <= t+c;
    other slots are hidden by the caller's causal mask.
    """
    max_seq = e.shape[0]
    ci = jnp.arange(q.shape[2])[:, None]
    j = jnp.arange(kv_len)[None, :]
    idx = jnp.clip(max_seq - 1 - t - ci + j, 0, max_seq - 1)  # [C, S]
    e_rows = jnp.take(e, idx, axis=0)  # [C, S, dh]
    return jnp.einsum("bhcd,csd->bhcs", q, e_rows,
                      preferred_element_type=jnp.float32)


def causal_pad_mask(x: jnp.ndarray, pad_id: int) -> jnp.ndarray:
    """Look-ahead | pad mask, 1.0 = masked (reference
    MusicTransformer/utils.py:58-83). x: [B, L] int tokens ->
    [B, 1, L, L] float mask."""
    l = x.shape[1]
    look_ahead = jnp.triu(jnp.ones((l, l), dtype=jnp.bool_), k=1)
    pad = (x == pad_id)[:, None, None, :]  # [B,1,1,L]
    mask = jnp.logical_or(look_ahead[None, None, :, :], pad)
    return mask.astype(jnp.float32)


@functools.partial(jax.jit, static_argnums=(4,))
def naive_relative_attention_reference(q, k, v, e, causal: bool = True):
    """O(L^2) gather implementation used ONLY as a numerical oracle in tests
    (SURVEY.md §4 test #3): no skew trick, direct E lookups."""
    b, h, l, dh = q.shape
    max_seq = e.shape[0]
    t = jnp.arange(l)[:, None]
    j = jnp.arange(l)[None, :]
    idx = jnp.clip(max_seq - 1 - (t - j), 0, max_seq - 1)
    e_g = e[idx]  # [L, L, dh]
    srel = jnp.einsum("bhld,ljd->bhlj", q, e_g)
    srel = jnp.where((j <= t)[None, None], srel, 0.0)
    logits = (jnp.einsum("bhld,bhjd->bhlj", q, k) + srel) / jnp.sqrt(
        jnp.float32(dh))
    if causal:
        logits = jnp.where((j <= t)[None, None], logits, -1e9)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhlj,bhjd->bhld", w, v)
