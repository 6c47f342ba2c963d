"""Continuous-batching serving for PoPMAG melody->arrangement.

The last generator family without an engine: decode/serving.py serves
the flat transformer, serving_cp.py the CP transformer, serving_rnn.py
the GRU LMs. PoPMAG is a seq2seq over BARS (reference
PoPMAG_RNN/network.py:366-417 generate_arrangement: per target bar,
encode the melody bar into the carried hidden, then a typed decode
loop until the bar token) — so the serving unit here is a BAR, not a
token:

* a slot's state is its carried hidden ``[L, B, H]`` plus its OWN
  melody: compound rows ``[B, bars_max, bar_len, 7]``, per-bar lengths
  ``[B, bars_max]``, and a per-row bar cursor ``k`` — requests at
  different bars share every segment,
* ``submit(melody, n_bars, init=...)`` takes the packed melody
  ``[bars, S, 7]`` (data/mumidi_packing.py layout, same as
  ``generate_arrangement``'s ``src``); ``max_new`` counts target BARS.
  Retirement is always count-based (bars are fixed upfront — no eos),
* a segment decodes ``seg_len`` bars for every slot: gather each row's
  bar ``k``, embed + encode it against the row's hidden
  (``encode_bar``), run the shared typed bar loop
  (decode/popmag_generate.py ``decode_bar_steps`` — per-row bar-position
  embeddings instead of the generator's broadcast scalar), carry
  ``hidden = enc_h + dec_h`` (network.py:414) and ``k += 1``,
* admission is pure state install per bar bucket: scatter the group's
  melodies/lengths, ``init_to_hidden`` the latents, zero the cursors —
  no prefill scan (the encoder runs per bar inside segments, exactly
  the generator's interleaving),
* results are the flat token streams of
  ``popmag_generate.flatten_arrangement``: each bar opens with
  BAR_TOKEN, then the valid (etype[, pitch, duration]) triples.

Greedy serving is token-identical to ``generate_arrangement`` +
``flatten_arrangement`` at the same pool width (same op stream); across
widths the usual f32 reassociation caveat (tests/test_serving.py).
"""

from __future__ import annotations

import functools
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import mumidi_packing as mp
from .popmag_generate import decode_bar_steps
from .sampling import SamplingParams
from .scheduling import SlotScheduler

__all__ = ["PopMAGContinuousBatcher"]


@functools.partial(jax.jit,
                   static_argnames=("model", "seg", "max_steps",
                                    "greedy"),
                   donate_argnames=("hidden", "k", "rng"))
def _run_segment_popmag(model, params, hidden, src, src_len, k, rng,
                        temp, seg: int, max_steps: int, greedy: bool):
    """seg bar decodes over the slot pool. Returns (hidden, k, rng',
    out [seg, B, max_steps, 3, 2] int32 — tokens stacked with their
    valid mask so the scheduler ships ONE array per segment)."""
    bars_max = src.shape[1]
    va = {"params": params}

    def decode_bar(carry, rng_bar):
        hidden, k = carry
        kk = jnp.clip(k, 0, bars_max - 1)
        bar_rows = jnp.take_along_axis(
            src, kk[:, None, None, None], axis=1)[:, 0]     # [B, S, 7]
        blen = jnp.take_along_axis(src_len, kk[:, None], axis=1)[:, 0]
        src_e = model.apply(va, bar_rows, method=model.compression)
        enc_h = model.apply(va, src_e, hidden, blen,
                            method=model.encode_bar)
        bar_embed = jnp.minimum(k, model.bar_dim - 1) + mp.EVENT_DIM
        tokens, valid, dec_h = decode_bar_steps(
            model, params, enc_h, bar_embed, rng_bar,
            max_steps=max_steps, greedy=greedy, temperature=temp)
        out = jnp.stack([tokens, valid.astype(jnp.int32)], axis=-1)
        return (enc_h + dec_h, k + 1), out      # network.py:414

    rng, sub = jax.random.split(rng)
    rngs = jax.random.split(sub, seg)
    (hidden, k), out = jax.lax.scan(decode_bar, (hidden, k), rngs)
    return hidden, k, rng, out


@functools.partial(jax.jit, static_argnames=("model",),
                   donate_argnames=("hidden", "src", "src_len", "k"))
def _admit_popmag(model, params, hidden, src, src_len, k, melodies,
                  lens, slots_idx, inits):
    """Install an admission group: melodies [S, pb, bar_len, 7] +
    per-bar lens [S, pb] scattered into each target slot's buffers
    (bars past pb zeroed — a shorter melody must not leak the evicted
    request's bars), latents through init_to_hidden, cursors to 0.
    Unused group rows duplicate row 0 (idempotent scatter)."""
    pb = melodies.shape[1]
    h0 = model.apply({"params": params}, inits,
                     method=model.init_to_hidden)
    hidden = hidden.at[:, slots_idx].set(h0)
    bars_max = src.shape[1]
    pad_rows = jnp.zeros(
        (melodies.shape[0], bars_max - pb) + melodies.shape[2:],
        jnp.int32)
    src = src.at[slots_idx].set(
        jnp.concatenate([melodies, pad_rows], axis=1))
    pad_lens = jnp.zeros((lens.shape[0], bars_max - pb), jnp.int32)
    src_len = src_len.at[slots_idx].set(
        jnp.concatenate([lens, pad_lens], axis=1))
    k = k.at[slots_idx].set(0)
    return hidden, src, src_len, k


@jax.jit
def _gather_popmag(hidden, src, src_len, k, idx):
    return (hidden[:, idx], src[idx], src_len[idx], k[idx])


class PopMAGContinuousBatcher(SlotScheduler):
    """Continuous-batching bar decode over a PoPMAG slot pool.

    >>> cb = PopMAGContinuousBatcher(model, params, slots=8)
    >>> rid = cb.submit(melody, n_bars)        # melody [bars, S, 7]
    >>> outs = cb.run()    # {rid: flat arrangement token stream}

    ``submit`` extras: ``init`` — the per-request latent ``[init_dim]``
    (defaults to zeros, like ``cli.generate``'s seeded draws do
    explicitly); ``src_len`` — per-bar true lengths ``[bars]`` (default
    = rows with any nonzero id, matching mumidi_packing's padding).
    ``max_new`` counts target bars; ``eos_id`` must stay None.
    """

    def __init__(self, model, params, *, slots: int = 8,
                 sampling: SamplingParams = SamplingParams(),
                 seg_len: int = 2, max_bars: int = 32,
                 max_bar_len: int = 96, max_steps: int = 200,
                 prompt_bucket: int = 8, depth: int = 4,
                 min_slots: int = 8, boost: int = 4,
                 on_finalize: Optional[Callable] = None,
                 rng: Optional[jax.Array] = None):
        if sampling.top_k or sampling.top_p < 1.0:
            raise ValueError(
                "top-k/top-p are not defined for PoPMAG's typed heads "
                "(greedy or temperature only — decode/popmag_generate)")
        if max_bars % prompt_bucket:
            raise ValueError(
                f"max_bars ({max_bars}) must be a multiple of "
                f"prompt_bucket ({prompt_bucket}) so bucketed melodies "
                "fit the per-slot bar buffers")
        super().__init__(
            slots=slots, sampling=sampling, seg_len=seg_len,
            prompt_bucket=prompt_bucket, depth=depth,
            min_slots=min_slots, per_row_sampling=False,
            on_finalize=on_finalize, rng=rng, pad_id=0, boost=boost)
        self.model = model
        self.params = params
        self.max_bars = max_bars
        self.max_bar_len = max_bar_len
        self.max_steps = max_steps
        # boost (scheduling.py _boosted_seg): bars fused into one
        # launch when the queue is empty and every active slot has at
        # least that many bars left — pure dispatch/fetch-RTT
        # amortization (popmag requests are always count-retired). Two
        # programs: seg and boost*seg; warm() precompiles both.
        L, H = model.num_layers, model.hidden_dim
        self.hidden = jnp.zeros((L, slots, H), jnp.float32)
        self.src = jnp.zeros((slots, max_bars, max_bar_len, 7),
                             jnp.int32)
        self.src_len = jnp.zeros((slots, max_bars), jnp.int32)
        self.k = jnp.zeros((slots,), jnp.int32)
        self._temp_dev = jnp.float32(max(sampling.temperature, 1e-6))

    # --------------------------------------------------- scheduler hooks

    def _canon_prompt(self, prompt) -> np.ndarray:
        m = np.asarray(prompt, np.int32)
        if m.ndim != 3 or m.shape[2] != 7:
            raise ValueError(
                f"PoPMAG prompts are [bars, S, 7] compound melodies "
                f"(data/mumidi_packing.py), got {m.shape}")
        if m.shape[0] > self.max_bars:
            raise ValueError(
                f"melody has {m.shape[0]} bars > max_bars="
                f"{self.max_bars}; raise max_bars at construction")
        if m.shape[1] > self.max_bar_len:
            raise ValueError(
                f"melody bar length {m.shape[1]} > max_bar_len="
                f"{self.max_bar_len}; raise max_bar_len at construction")
        if m.shape[1] < self.max_bar_len:    # static kernel width
            m = np.pad(m, ((0, 0), (0, self.max_bar_len - m.shape[1]),
                           (0, 0)))
        return m

    def _warm_prompt(self, n: int) -> np.ndarray:
        return np.zeros((min(n, self.max_bars), self.max_bar_len, 7),
                        np.int32)

    def _empty_result(self) -> np.ndarray:
        return np.zeros((0,), np.int64)

    def _validate_request(self, prompt, max_new, eos_id, kw) -> dict:
        init = kw.pop("init", None)
        src_len = kw.pop("src_len", None)
        if kw:
            raise TypeError(f"unexpected submit() arguments: "
                            f"{sorted(kw)}")
        if eos_id is not None:
            raise ValueError(
                "PoPMAG requests retire by bar count (max_new = target "
                "bars); eos_id is not defined")
        if init is not None:
            init = np.asarray(init, np.float32).reshape(-1)
            if init.shape != (self.model.init_dim,):
                raise ValueError(
                    f"init must be [{self.model.init_dim}], got "
                    f"{init.shape}")
        if src_len is not None:
            src_len = np.asarray(src_len, np.int32).reshape(-1)
            if src_len.shape[0] != prompt.shape[0]:
                raise ValueError(
                    f"src_len has {src_len.shape[0]} entries for "
                    f"{prompt.shape[0]} melody bars")
        else:
            src_len = (np.asarray(prompt) != 0).any(-1).sum(-1).astype(
                np.int32)
        return {"init": init, "src_len": src_len}

    def _assemble_result(self, toks: List, max_new: int,
                         eos_id) -> np.ndarray:
        """Per-bar [max_steps, 3, 2] blocks -> the flat token stream of
        popmag_generate.flatten_arrangement: BAR_TOKEN, then the valid
        (etype[, pitch, duration]) entries in step order."""
        seq: List[int] = []
        for blk in toks[:max_new]:
            blk = np.asarray(blk)
            seq.append(mp.BAR_TOKEN)
            t, v = blk[..., 0], blk[..., 1].astype(bool)
            seq.extend(int(x) for x in t[v])   # row-major = step, field
        return np.asarray(seq, np.int64)

    def _gather_state(self, idx) -> None:
        self.hidden, self.src, self.src_len, self.k = _gather_popmag(
            self.hidden, self.src, self.src_len, self.k,
            jnp.asarray(idx, jnp.int32))

    def _segment(self):
        seg = self._boosted_seg()
        self._last_seg = seg
        self.hidden, self.k, self.rng, out = _run_segment_popmag(
            self.model, self.params, self.hidden, self.src,
            self.src_len, self.k, self.rng, self._temp_dev,
            seg, self.max_steps, self.sp.greedy)
        return out

    def _warm_after_drain(self) -> None:
        if self.boost > 1:
            self.hidden, self.k, self.rng, out = _run_segment_popmag(
                self.model, self.params, self.hidden, self.src,
                self.src_len, self.k, self.rng, self._temp_dev,
                self.boost * self.seg_len, self.max_steps,
                self.sp.greedy)
            np.asarray(out)   # free slots only: garbage, discarded

    def _try_admit(self):
        free = self._free_slots()
        if not free or not self.pending:
            return
        groups = {}
        remaining = []
        for q in self.pending:
            if not free:
                remaining.append(q)
                continue
            groups.setdefault(q.pb, []).append((q, free.pop(0)))
        for pb, grp in groups.items():
            for q, slot in grp:
                self._admit_bookkeeping(q, slot)
            mel = [q.padded for q, _ in grp]
            lens = [np.pad(q.extra["src_len"],
                           (0, pb - q.extra["src_len"].shape[0]))
                    for q, _ in grp]
            slots_idx = [slot for _, slot in grp]
            inits = [q.extra["init"] if q.extra["init"] is not None
                     else np.zeros(self.model.init_dim, np.float32)
                     for q, _ in grp]
            while len(mel) < self.b:          # duplicate-pad: idempotent
                mel.append(mel[0])
                lens.append(lens[0])
                slots_idx.append(slots_idx[0])
                inits.append(inits[0])
            (self.hidden, self.src, self.src_len, self.k
             ) = _admit_popmag(
                self.model, self.params, self.hidden, self.src,
                self.src_len, self.k,
                jnp.asarray(np.stack(mel)), jnp.asarray(np.stack(lens)),
                jnp.asarray(np.asarray(slots_idx, np.int32)),
                jnp.asarray(np.stack(inits)))
            self._n_admit_calls += 1
            self._n_admitted += len(grp)
        self.pending = remaining
