"""EventMelodyRNN: GRU language model over MIDI-like events.

Parity with the reference Event_Melody_RNN
(mg/model/Event_MelodyRNN/network.py:11-116):

* Embedding(event_dim, event_dim) -> num_layers x GRU(hidden) ->
  Linear(hidden, event_dim) from the TOP layer's outputs (the reference's
  `gen_forward`/`SeqForward` path; its legacy one-step `forward` that reads
  all-layer hidden is shape-broken for >1 layer and intentionally not
  reproduced),
* a latent `init` vector maps to the initial hidden state via
  Linear(init_dim, layers*hidden) + tanh (`init_to_hidden`, :98-104).
  NB the reference does `out.view(rnn_layers, B, H)` on a [B, L*H]
  tensor — a flat reinterpret that SCRAMBLES batch elements for B > 1
  (one sequence's latent leaks into another's hidden); we use the
  per-element reshape(B, L, H).transpose instead. Intentional fix,
  machine-pinned by tests/test_reference_executable.py
  (test_init_to_hidden_view_quirk_documented); parity holds at B = 1,
* sequences are primed with a "primary event" = event_dim - 1 (:22, :87),
  and the training forward returns len(events)+1 logits: position 0
  predicts events[0] from the primary event alone (`SeqForward`, :63-88),
* defaults: init_dim 32, hidden 512, 3 layers, dropout 0.5
  (Event_MelodyRNN/config.py:8-14).

TPU-first: the whole sequence is one lax.scan (ops/gru.py), generation
plugs into the decode engine via init_cache/decode_step where the "cache"
is just the [L, B, H] hidden stack — O(1) state, static shapes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.gru import GRUStack
from .registry import register_model


@register_model("event_rnn")
class EventMelodyRNN(nn.Module):
    event_dim: int = 308
    init_dim: int = 32
    hidden_dim: int = 512
    num_layers: int = 3
    dropout_rate: float = 0.5
    dtype: Any = jnp.float32

    @property
    def primary_event(self) -> int:
        return self.event_dim - 1

    def setup(self):
        self.event_embedding = nn.Embed(self.event_dim, self.event_dim,
                                        dtype=self.dtype)
        self.inithid_fc = nn.Dense(self.num_layers * self.hidden_dim,
                                   dtype=self.dtype)
        self.gru = GRUStack(self.hidden_dim, self.num_layers,
                            self.dropout_rate, dtype=self.dtype)
        self.output_fc = nn.Dense(self.event_dim, dtype=self.dtype)

    def init_to_hidden(self, init: jnp.ndarray) -> jnp.ndarray:
        """init: [B, init_dim] -> [L, B, H] (network.py:98-104)."""
        b = init.shape[0]
        out = jnp.tanh(self.inithid_fc(init.astype(self.dtype)))
        return out.reshape(b, self.num_layers, self.hidden_dim).transpose(
            1, 0, 2)

    def __call__(self, init: jnp.ndarray, events: jnp.ndarray,
                 deterministic: bool = True,
                 lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Training forward (reference `Train` -> `SeqForward`).

        init: [B, init_dim]; events: [T, B] int (time-major, like the
        reference). Returns logits [T+1, B, event_dim]: row 0 is the
        prediction from the primary event, row t+1 from events[t].

        lengths: optional [B] int for padded batches (the reference's
        `Train(init, events, lengths)` pack_padded_sequence path,
        network.py:71-77): positions t >= lengths[b]+1 of the primed
        sequence neither advance the hidden state nor produce output
        (the +1 accounts for the primary-event row the model prepends).
        """
        b = events.shape[1]
        hidden = self.init_to_hidden(init)
        primary = jnp.full((1, b), self.primary_event, jnp.int32)
        seq = jnp.concatenate([primary, events.astype(jnp.int32)], axis=0)
        xs = self.event_embedding(seq)  # [T+1, B, event_dim]
        outputs, _ = self.gru(xs, hidden, deterministic=deterministic,
                              lengths=None if lengths is None
                              else lengths + 1)
        return self.output_fc(outputs).astype(jnp.float32)

    def step_train(self, token: jnp.ndarray, hidden: jnp.ndarray,
                   deterministic: bool = True):
        """One step WITH inter-layer dropout — the reference's
        `gen_forward` under model.train() (network.py:51-61), used by
        scheduled-sampling training. token: [B] int, hidden: [L, B, H]
        -> (logits [B, event_dim], hidden')."""
        x = self.event_embedding(token.astype(jnp.int32))
        out, h = self.gru(x[None], hidden, deterministic=deterministic)
        return self.output_fc(out[0]).astype(jnp.float32), h

    # -- incremental decoding (decode engine interface) -----------------------

    def init_cache(self, batch: int, cache_len: int = 0,
                   init: Optional[jnp.ndarray] = None) -> Dict:
        """RNN 'cache' = hidden stack. If `init` is given it seeds the
        hidden state (reference generate(), network.py:119-164)."""
        if init is not None:
            return {"h": self.init_to_hidden(init)}
        return {"h": jnp.zeros(
            (self.num_layers, batch, self.hidden_dim), self.dtype)}

    def decode_step(self, token: jnp.ndarray, cache: Dict,
                    t: jnp.ndarray = None):
        """token: [B] int -> (logits [B, event_dim], cache)."""
        x = self.event_embedding(token.astype(jnp.int32))
        out, h = self.gru.step(x, cache["h"])
        return self.output_fc(out).astype(jnp.float32), {"h": h}


def scheduled_sampling_logits(model, params, init, events, teacher_draws,
                              dropout_rng=None):
    """Scheduled-sampling training forward: the reference window-mode
    train path `model.generate(init, W, events=events[:-1],
    teacher_forcing_ratio=r, output_type='logit')`
    (Event_MelodyRNN/train.py:231-232 -> network.py:119-164).

    One lax.scan over the window. At step t the model predicts
    events[t] from its current input; the NEXT input is events[t] when
    teacher_draws[t] is True (the reference's per-step scalar
    `np.random.random() <= teacher_forcing_ratio` draw shared by the
    whole batch, network.py:160-162) and the model's own greedy argmax
    otherwise (generate()'s greedy=1.0 default — the stochastic
    sampler is generation-only). The final step never teacher-feeds
    (`step < steps - 1`, network.py:160); the input after the last
    prediction is unused either way.

    Works for any model exposing init_to_hidden / step_train /
    primary_event (EventMelodyRNN, PerformanceRNN). events: [T, B]
    int; teacher_draws: [T-1] bool. Returns [T, B, event_dim] logits;
    row t predicts events[t]. With all draws True this equals the
    teacher-forced forward (EventMelodyRNN.__call__ rows [:-1])."""
    t_len, b = events.shape
    h0 = model.apply({"params": params}, init,
                     method=model.init_to_hidden)
    ev0 = jnp.full((b,), model.primary_event, jnp.int32)
    teach = jnp.concatenate(
        [teacher_draws.astype(bool), jnp.zeros((1,), bool)])

    def body(carry, xs):
        ev, h = carry
        t, ev_t, use_teacher = xs
        if dropout_rng is None:
            logits, h = model.apply({"params": params}, ev, h,
                                    method=model.step_train)
        else:
            # fresh inter-layer masks per step (torch nn.GRU parity)
            logits, h = model.apply(
                {"params": params}, ev, h, deterministic=False,
                rngs={"dropout": jax.random.fold_in(dropout_rng, t)},
                method=model.step_train)
        nxt = jnp.where(use_teacher, ev_t,
                        jnp.argmax(logits, axis=-1).astype(jnp.int32))
        return (nxt, h), logits

    (_, _), logits = jax.lax.scan(
        body, (ev0, h0),
        (jnp.arange(t_len), events.astype(jnp.int32), teach))
    return logits
