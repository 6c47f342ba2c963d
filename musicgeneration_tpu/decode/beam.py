"""Beam search + stochastic (Gumbel) beam search, compiled to one lax.scan.

Semantics follow the reference RNN beam searches
(PerformanceRNN/network.py:156-257; Event_MelodyRNN/network.py:166-268):

* scores accumulate RAW logits / temperature — the reference never
  log-softmaxes before adding to the beam score (network.py:205-209). The
  correct log-prob accumulation is available via `normalize=True`,
* the search starts from one live beam and expands to `beam_size` after
  the first step (PerformanceRNN's current_beam_size dance, :161, :255)
  — reproduced here with fixed shapes by -inf-masking beams 1.. at
  step 0. Event_MelodyRNN instead starts with ALL beams live and
  identical (network.py:172 sets current_beam_size = beam_size up
  front): equivalent under deterministic selection (ties break to beam
  0 on both sides), but under Gumbel perturbation the independent noise
  per replicated beam can select the same token through several parent
  beams — `all_beams_live=True` reproduces that,
* stochastic mode perturbs the expanded scores with Gumbel(0,1) noise and
  selects top-k by perturbed score while accumulating the unperturbed
  score (:182-230; the normalization the reference left commented out is
  likewise omitted),
* result = the sequence of the best-scoring final beam per batch (:253).

Unlike the reference (a Python loop gathering hiddens with a hard-coded
`repeat(4,1,1,1024)` that only works for one config —
Event_MelodyRNN/network.py:252), this is shape-generic and runs entirely
on device: state is a pytree with leading dim batch*beam, reindexed with
take_along_axis inside the scan.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

StepFn = Callable[[jnp.ndarray, Any], Tuple[jnp.ndarray, Any]]
NEG_INF = -1e30


def _gather_beams(tree, beam_idx, batch, beam, batch_axis: int = 0):
    """Reindex a pytree whose leaves carry batch*beam at `batch_axis` by
    beam_idx [batch, beam]."""

    def gather(x):
        moved = jnp.moveaxis(x, batch_axis, 0)
        shaped = moved.reshape(batch, beam, *moved.shape[1:])
        idx = beam_idx.reshape(batch, beam, *([1] * (moved.ndim - 1)))
        out = jnp.take_along_axis(shaped, idx, axis=1)
        return jnp.moveaxis(out.reshape(moved.shape), 0, batch_axis)

    return jax.tree.map(gather, tree)


def beam_search(
    step_fn: StepFn,
    init_state: Any,
    first_token: jnp.ndarray,
    steps: int,
    beam_size: int,
    vocab_size: int,
    rng: jax.Array | None = None,
    temperature: float = 1.0,
    stochastic: bool = False,
    normalize: bool = False,
    state_batch_axis: int = 0,
    per_step_inputs: Any = None,
    all_beams_live: bool = False,
    gumbel_noise: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Returns best sequences [batch, steps].

    step_fn(tokens [batch*beam], state) -> (logits [batch*beam, V], state).
    init_state: pytree with leading dim batch*beam (replicate per beam
    before calling — each beam starts from the same state).
    first_token: [batch] int fed to every beam at step 0.
    per_step_inputs: optional pytree with leading dim `steps`, scanned
    alongside and passed to step_fn as a third argument (PerformanceRNN
    beam_search control conditioning, network.py:156-257).
    all_beams_live: start every beam at score 0 instead of -inf-masking
    beams 1.. (Event_MelodyRNN semantics, network.py:172 — only
    observable under stochastic selection; see module docstring).
    gumbel_noise: optional pre-drawn [steps, batch, beam*V] Gumbel(0,1)
    noise for the stochastic path (deterministic replay / parity
    testing); when given, `rng` is unused.
    """
    batch = first_token.shape[0]
    bb = batch * beam_size
    if stochastic and rng is None and gumbel_noise is None:
        raise ValueError("stochastic beam search needs an rng "
                         "(or pre-drawn gumbel_noise)")

    tokens0 = jnp.repeat(first_token, beam_size)  # [batch*beam]
    if all_beams_live:
        score0 = jnp.zeros((batch, beam_size))
    else:
        # beams 1.. start dead so step 0 effectively expands from one beam
        score0 = jnp.where(jnp.arange(beam_size)[None, :] == 0, 0.0,
                           NEG_INF)
        score0 = jnp.broadcast_to(score0, (batch, beam_size))
    seqs0 = jnp.zeros((batch, beam_size, steps), jnp.int32)
    use_noise = stochastic and gumbel_noise is not None
    rngs = (jnp.asarray(gumbel_noise, jnp.float32) if use_noise
            else jax.random.split(rng, steps) if rng is not None
            else jnp.zeros((steps, 2), jnp.uint32))

    def body(carry, inp):
        state, tokens, scores, seqs = carry
        if per_step_inputs is None:
            step_i, rng_i = inp
            logits, state = step_fn(tokens, state)
        else:
            step_i, rng_i, extra = inp
            logits, state = step_fn(tokens, state, extra)
        logits = logits.astype(jnp.float32) / temperature
        if normalize:
            logits = jax.nn.log_softmax(logits, axis=-1)
        logits = logits.reshape(batch, beam_size, vocab_size)
        expanded = scores[:, :, None] + logits  # [batch, beam, V]
        flat = expanded.reshape(batch, beam_size * vocab_size)
        if stochastic:
            noise = (rng_i if use_noise
                     else jax.random.gumbel(rng_i, flat.shape))
            sel = flat + noise
        else:
            sel = flat
        _, top_idx = jax.lax.top_k(sel, beam_size)  # [batch, beam]
        new_scores = jnp.take_along_axis(flat, top_idx, axis=1)
        beam_idx = top_idx // vocab_size  # parent beam per winner
        tok_idx = (top_idx % vocab_size).astype(jnp.int32)
        state = _gather_beams(state, beam_idx, batch, beam_size,
                              state_batch_axis)
        seqs = jnp.take_along_axis(
            seqs, beam_idx[:, :, None], axis=1)
        seqs = jax.lax.dynamic_update_index_in_dim(
            seqs.transpose(2, 0, 1), tok_idx, step_i, axis=0
        ).transpose(1, 2, 0)
        return (state, tok_idx.reshape(bb), new_scores, seqs), None

    init = (init_state, tokens0, score0, seqs0)
    xs = ((jnp.arange(steps), rngs) if per_step_inputs is None
          else (jnp.arange(steps), rngs, per_step_inputs))
    (state, tokens, scores, seqs), _ = jax.lax.scan(body, init, xs)
    best = jnp.argmax(scores, axis=-1)  # [batch]
    return jnp.take_along_axis(
        seqs, best[:, None, None], axis=1)[:, 0]  # [batch, steps]


def replicate_for_beams(tree, beam_size: int, batch_axis: int = 0):
    """Tile a state pytree to batch*beam along its batch axis."""
    return jax.tree.map(
        lambda x: jnp.repeat(x, beam_size, axis=batch_axis), tree)
