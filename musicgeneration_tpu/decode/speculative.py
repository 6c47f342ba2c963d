"""Speculative decoding: draft-and-verify autoregressive generation.

The reference generates strictly one token per full forward (and per
host round-trip — MusicTransformer/network.py:52-78); the KV-cached
engine (decode/engine.py) already removes the O(L^2) re-forward. This
module removes the last serialization: at small batch a decode step is
weight-bandwidth/latency-bound, so verifying C drafted tokens in ONE
chunked forward (models/music_transformer.py decode_chunk) costs about
one step — every accepted token is pure speedup.

Two proposal sources:

* **prompt-lookup** (draft-free): the most recent occurrence of the
  n-gram ending at the last emitted token proposes its historical
  continuation. Music is highly repetitive (bars, ostinati, A-A'
  phrase structure), so lookup acceptance is far higher than in prose.
* **draft model**: any smaller MusicTransformer-family checkpoint
  (needs `prefill`/`decode_step` and a position-indexed KV cache whose
  stale rows are masked by `t` — rollback after a rejection is then
  free; recurrent-state models would need state snapshots, so RNN
  drafts are not supported).

Verification is EXACT-MATCH: the target samples a token at every chunk
slot from its own (temperature/top-k/top-p-processed) conditionals in
parallel, accepts the longest prefix where the proposals equal its own
samples, and always emits the first non-matching sample as a bonus
token. The output distribution is exactly the target model's — greedy
runs are token-identical to decode.engine.generate; sampled runs draw
from the same per-position conditionals through a different rng
consumption pattern. Batch rows are min-synchronized (the cache keeps
one scalar position): speculation is a small-batch LATENCY feature;
large-batch throughput serving should use the plain engine.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .engine import DecodeParams, align_cache_len
from .sampling import SamplingParams, sample_logits


@dataclasses.dataclass(frozen=True)
class SpecParams:
    """chunk: tokens per verify forward — the pending token plus
    chunk-1 proposals; ngram: lookup match length (ignored with a
    draft model)."""

    chunk: int = 8
    ngram: int = 3


def _lookup_propose(ctx: jnp.ndarray, n_tot: jnp.ndarray, g: int,
                    n_prop: int) -> jnp.ndarray:
    """Prompt-lookup proposals. ctx: [B, T] token buffer whose first
    n_tot entries are live (prompt + emitted); the last live token is
    the pending one. Finds, per row, the latest i <= n_tot-2 where the
    g-gram ending at i equals the g-gram ending at n_tot-1, and
    proposes ctx[i+1 : i+1+n_prop]. No match -> proposes a repeat of
    the pending token (verification discards bad proposals anyway)."""
    b, t_max = ctx.shape
    pos = jnp.arange(t_max)
    gram = jax.vmap(
        lambda row: jax.lax.dynamic_slice(row, (n_tot - g,), (g,)))(ctx)
    ok = ((pos >= g - 1) & (pos <= n_tot - 2))[None, :]
    for o in range(g):
        idx = jnp.clip(pos - (g - 1) + o, 0, t_max - 1)
        ok = ok & (ctx[:, idx] == gram[:, o:o + 1])
    score = jnp.where(ok, pos[None, :], -1)
    i_star = jnp.max(score, axis=1)
    i_star = jnp.where(i_star < 0, n_tot - 2, i_star)
    gather = jnp.clip(i_star[:, None] + 1 + jnp.arange(n_prop)[None, :],
                      0, t_max - 1)
    return jnp.take_along_axis(ctx, gather, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("model", "decode_params", "spec", "draft_model",
                     "cache_len", "draft_cache_len"))
def _generate_spec(model, params, draft_params, prompt, rng,
                   decode_params: DecodeParams, spec: SpecParams,
                   draft_model, cache_len: int, draft_cache_len: int):
    b, p = prompt.shape
    dp = decode_params
    sp = dp.sampling
    c = spec.chunk
    steps = dp.steps

    last_logits, cache = model.apply(
        {"params": params}, prompt, cache_len, method=model.prefill)
    if draft_model is not None:
        _, d_cache = draft_model.apply(
            {"params": draft_params}, prompt, draft_cache_len,
            method=draft_model.prefill)
    else:
        d_cache = jnp.zeros((), jnp.int32)  # placeholder carry leaf

    rng0, rng_loop = jax.random.split(rng)
    first = sample_logits(rng0, last_logits, sp)
    ctx = jnp.zeros((b, p + steps + c), jnp.int32)
    ctx = jax.lax.dynamic_update_slice(ctx, prompt.astype(jnp.int32),
                                       (0, 0))
    ctx = ctx.at[:, p].set(first)

    def cond(carry):
        return carry[3] < steps

    def body(carry):
        cache, d_cache, ctx, n, t, iters = carry
        it_rng = jax.random.fold_in(rng_loop, iters)
        n_tot = p + n
        pending = jax.lax.dynamic_index_in_dim(
            ctx, n_tot - 1, axis=1, keepdims=False)

        if draft_model is None:
            proposals = _lookup_propose(ctx, n_tot, spec.ngram, c - 1)
        else:
            def d_body(dc, _):
                d_cache, tok, tt = dc
                logits, d_cache = draft_model.apply(
                    {"params": draft_params}, tok, d_cache, tt,
                    method=draft_model.decode_step)
                nxt = jnp.argmax(logits, -1).astype(jnp.int32)
                return (d_cache, nxt, tt + 1), nxt

            # c steps: the last one only advances the draft cache past
            # proposal c-1 (its own output is discarded)
            (d_cache, _, _), outs = jax.lax.scan(
                d_body, (d_cache, pending, t), None, length=c)
            proposals = outs[:c - 1].T  # [B, c-1]

        inputs = jnp.concatenate([pending[:, None], proposals], axis=1)
        logits, cache = model.apply(
            {"params": params}, inputs, cache, t,
            method=model.decode_chunk)  # [B, c, V]
        u = sample_logits(
            it_rng, logits.reshape(b * c, -1), sp).reshape(b, c)
        match = (u[:, :c - 1] == proposals).astype(jnp.int32)
        lead = jnp.cumprod(match, axis=1)
        a = jnp.min(jnp.sum(lead, axis=1))  # min-sync across batch
        u_a = jnp.take_along_axis(
            u, jnp.full((b, 1), a, jnp.int32), axis=1)
        emit = jnp.concatenate([proposals, u[:, -1:]], axis=1)
        emit = jnp.where(jnp.arange(c)[None, :] == a, u_a, emit)
        ctx = jax.lax.dynamic_update_slice(ctx, emit, (0, n_tot))
        return (cache, d_cache, ctx, n + a + 1, t + a + 1, iters + 1)

    carry = (cache, d_cache, ctx, jnp.int32(1), jnp.int32(p),
             jnp.int32(0))
    cache, d_cache, ctx, n, t, iters = jax.lax.while_loop(
        cond, body, carry)
    tokens = jax.lax.dynamic_slice(ctx, (0, p), (b, steps))
    return tokens, n, iters


def generate_speculative(
    model,
    params,
    prompt: jnp.ndarray,
    rng: jax.Array,
    decode_params: DecodeParams,
    *,
    draft_model=None,
    draft_params=None,
    spec: SpecParams = SpecParams(),
    with_stats: bool = False,
):
    """Speculative counterpart of decode.engine.generate.

    prompt: [B, P] int32 -> [B, steps] int32 (greedy: token-identical
    to the plain engine). draft_model=None selects prompt-lookup
    drafting. with_stats=True additionally returns
    {"emitted", "iterations", "mean_accepted"} — mean_accepted is the
    average number of ACCEPTED proposals per verify forward (0 =
    nothing sped up, chunk-1 = every proposal landed)."""
    b, p = prompt.shape
    dp = decode_params
    if not (hasattr(model, "decode_chunk")
            and hasattr(model, "max_seq")):
        raise ValueError(
            "speculative decoding needs a chunk-verify target with a "
            "position-indexed cache (decode_chunk/prefill — the "
            f"transformer families); {type(model).__name__} has "
            "neither (RNN families decode through generate())")
    if spec.chunk < 2:
        raise ValueError("spec.chunk must be >= 2 (1 proposal minimum)")
    need = p + dp.steps + spec.chunk
    if need > model.max_seq:
        raise ValueError(
            f"prompt ({p}) + steps ({dp.steps}) + chunk ({spec.chunk}) "
            f"= {need} exceeds max_seq ({model.max_seq}); speculative "
            "decoding needs `chunk` positions of headroom")
    if (draft_model is None) != (draft_params is None):
        raise ValueError("draft_model and draft_params go together")
    if draft_model is not None and not hasattr(draft_model, "prefill"):
        raise ValueError(
            "draft model needs a position-indexed cache (prefill/"
            "decode_step); recurrent drafts are not supported")
    cache_len = align_cache_len(model, min(need, model.max_seq))
    draft_cache_len = 0
    if draft_model is not None:
        if need > draft_model.max_seq:
            raise ValueError(
                f"draft max_seq ({draft_model.max_seq}) < prompt + "
                f"steps + chunk ({need})")
        draft_cache_len = align_cache_len(
            draft_model, min(need, draft_model.max_seq))
    tokens, n, iters = _generate_spec(
        model, params, draft_params, prompt, rng, dp, spec, draft_model,
        cache_len, draft_cache_len)
    if not with_stats:
        return tokens
    n = int(n)
    iters = int(iters)
    # the first token is sampled before the loop; each iteration emits
    # (accepted proposals) + 1 bonus sample
    return tokens, {
        "emitted": n,
        "iterations": iters,
        "mean_accepted": (n - 1 - iters) / max(iters, 1),
    }
