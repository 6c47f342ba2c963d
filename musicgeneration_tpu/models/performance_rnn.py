"""PerformanceRNN: control-conditioned GRU event LM.

Parity with the reference (mg/model/PerformanceRNN/network.py:15-154):

* input per step = [event embedding (event_dim) | default flag (1) |
  control (control_dim)] -> Linear(concat, hidden) -> LeakyReLU(0.1)
  (:34-36, :61-84). When no control is given the flag is 1 and the control
  block is zeros (:69-75),
* 3x GRU(hidden, dropout 0.3), initial hidden from latent z via
  Linear(init_dim, layers*hidden)+tanh (:30-31, :89-95) — with the
  per-element reshape, not the reference's batch-scrambling
  out.view(L, B, H) flat reinterpret (see models/event_rnn.py; parity
  at B=1, pinned in tests/test_reference_executable.py),
* the output head reads the CONCATENATED HIDDEN STATES OF ALL LAYERS:
  Linear(hidden*layers, event_dim) (:40, :80-84) — unlike EventMelodyRNN's
  top-layer head,
* xavier-normal init on embedding/inithid/concat/output weights, zero
  biases (:44-51),
* primary event = event_dim - 1 (:29, :86-87); control sequences repeat a
  single control or truncate per-step controls (`expand_controls`,
  :97-104),
* defaults: event_dim 308 (MIDI-like), control_dim 24 (ControlSeq),
  init_dim 32, hidden 512 (PerformanceRNN/config.py:6-23).

TPU-first: training forward is one lax.scan; generation goes through the
decode engine with the hidden stack (+ per-step control) as cache.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.gru import GRUStack
from .registry import register_model

_xavier = nn.initializers.xavier_normal()


@register_model("performance_rnn")
class PerformanceRNN(nn.Module):
    event_dim: int = 308
    control_dim: int = 24
    init_dim: int = 32
    hidden_dim: int = 512
    num_layers: int = 3
    dropout_rate: float = 0.3
    dtype: Any = jnp.float32

    @property
    def primary_event(self) -> int:
        return self.event_dim - 1

    def setup(self):
        self.event_embedding = nn.Embed(self.event_dim, self.event_dim,
                                        dtype=self.dtype,
                                        embedding_init=_xavier)
        self.inithid_fc = nn.Dense(self.num_layers * self.hidden_dim,
                                   dtype=self.dtype, kernel_init=_xavier,
                                   bias_init=nn.initializers.zeros)
        self.concat_input_fc = nn.Dense(self.hidden_dim, dtype=self.dtype,
                                        kernel_init=_xavier)
        self.gru = GRUStack(self.hidden_dim, self.num_layers,
                            self.dropout_rate, dtype=self.dtype)
        self.output_fc = nn.Dense(self.event_dim, dtype=self.dtype,
                                  kernel_init=_xavier,
                                  bias_init=nn.initializers.zeros)

    def init_to_hidden(self, init: jnp.ndarray) -> jnp.ndarray:
        b = init.shape[0]
        out = jnp.tanh(self.inithid_fc(init.astype(self.dtype)))
        return out.reshape(b, self.num_layers, self.hidden_dim).transpose(
            1, 0, 2)

    def _step_input(self, tokens: jnp.ndarray,
                    control: Optional[jnp.ndarray],
                    default_mask: Optional[jnp.ndarray] = None
                    ) -> jnp.ndarray:
        """tokens: [..., B]; control: [..., B, control_dim] or None.

        default_mask: optional per-ROW bool [..., B] — True rows behave
        exactly like the control=None path (default flag 1, zero
        control) while False rows consume their `control` row. Lets a
        serving pool mix conditioned and unconditioned requests in one
        program; with the mask all-False this is identical to the plain
        control path (reference semantics: network.py:46-56 builds the
        default flag from control presence per call)."""
        emb = self.event_embedding(tokens.astype(jnp.int32))
        b_shape = emb.shape[:-1]
        if control is None:
            default = jnp.ones(b_shape + (1,), self.dtype)
            control = jnp.zeros(b_shape + (self.control_dim,), self.dtype)
        elif default_mask is not None:
            default = default_mask[..., None].astype(self.dtype)
            control = control.astype(self.dtype) * (1 - default)
        else:
            default = jnp.zeros(b_shape + (1,), self.dtype)
            control = control.astype(self.dtype)
        concat = jnp.concatenate([emb, default, control], axis=-1)
        return nn.leaky_relu(self.concat_input_fc(concat),
                             negative_slope=0.1)

    def _head(self, h_all: jnp.ndarray) -> jnp.ndarray:
        """h_all: [L, B, H] -> logits [B, event_dim] from concat of all
        layers (network.py:80-84)."""
        b = h_all.shape[1]
        flat = h_all.transpose(1, 0, 2).reshape(b, -1)
        return self.output_fc(flat).astype(jnp.float32)

    def __call__(self, init: jnp.ndarray, events: jnp.ndarray,
                 controls: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        """Teacher-forced training forward.

        init: [B, init_dim]; events: [T, B]; controls: [T, B, control_dim]
        or None. Returns logits [T, B, event_dim]; row t predicts
        events[t] from the primary event + events[:t] (generate() with
        teacher_forcing_ratio=1, network.py:106-154).
        """
        t_len, b = events.shape
        hidden = self.init_to_hidden(init)
        primary = jnp.full((1, b), self.primary_event, jnp.int32)
        inputs = jnp.concatenate(
            [primary, events[:-1].astype(jnp.int32)], axis=0)
        xs = self._step_input(inputs, controls)

        # the head reads all-layer hiddens per step (network.py:80-84)
        _, _, h_seq = self.gru(xs, hidden, deterministic=deterministic,
                               return_all_hiddens=True)
        # h_seq: [T, L, B, H]
        flat = h_seq.transpose(0, 2, 1, 3).reshape(t_len, b, -1)
        return self.output_fc(flat).astype(jnp.float32)

    def step_train(self, token: jnp.ndarray, hidden: jnp.ndarray,
                   deterministic: bool = True):
        """One unconditioned step WITH inter-layer dropout (the
        reference's generate() step under model.train(),
        network.py:106-154) for scheduled-sampling training. token:
        [B] int, hidden: [L, B, H] -> (logits [B, event_dim],
        hidden')."""
        x = self._step_input(token, None)
        _, h, _ = self.gru(x[None], hidden, deterministic=deterministic,
                           return_all_hiddens=True)
        return self._head(h), h

    # -- incremental decoding --------------------------------------------------

    def init_cache(self, batch: int, cache_len: int = 0,
                   init: Optional[jnp.ndarray] = None) -> Dict:
        if init is not None:
            return {"h": self.init_to_hidden(init)}
        return {"h": jnp.zeros(
            (self.num_layers, batch, self.hidden_dim), self.dtype)}

    def decode_step(self, token: jnp.ndarray, cache: Dict,
                    t: jnp.ndarray = None,
                    control: Optional[jnp.ndarray] = None,
                    control_default: Optional[jnp.ndarray] = None):
        x = self._step_input(token, control, control_default)
        _, h = self.gru.step(x, cache["h"])
        return self._head(h), {"h": h}
