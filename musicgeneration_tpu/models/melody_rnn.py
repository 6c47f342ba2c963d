"""MelodyRNN: LSTM language model over monophonic note arrays.

Parity with the reference Melody_RNN
(mg/model/MelodyRNN/train_basic_rnn.py:184-230):

* Embedding(130, 64) -> 2x LSTM(64, dropout 0.5) -> Linear(64, 130)
  over the Magenta note-array vocabulary (0-127 pitch / 128 off /
  129 no-event — train_basic_rnn.py:30),
* defaults embed 64, hidden 64, 2 layers, dropout 0.5
  (train_basic_rnn.py:31-35).

Attention variant: the reference carries a non-functional attention-RNN
scratchpad (mg/model/MelodyRNN/trian_attention_rnn.py; Magenta
`attention_rnn` HParams quoted at train.py:154-168 — rnn [128,128],
attn_length=40).  `attn_length > 0` enables a TPU-shaped version of the
Magenta/tf.contrib AttentionCellWrapper: a rolling [W, B, H] buffer of
the last W top-layer outputs is carried through a lax.scan; each step
attends over the window (additive/Bahdanau scoring) and mixes the
context into the output projection.  Static shapes, no ragged windows.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.lstm import LSTMStack
from .registry import register_model

MELODY_VOCAB = 130


@register_model("melody_rnn")
class MelodyRNN(nn.Module):
    vocab_size: int = MELODY_VOCAB
    embed_size: int = 64
    hidden_dim: int = 64
    num_layers: int = 2
    dropout_rate: float = 0.5
    attn_length: int = 0  # 0 = basic_rnn; 40 = Magenta attention_rnn
    dtype: Any = jnp.float32

    def setup(self):
        self.embedding = nn.Embed(self.vocab_size, self.embed_size,
                                  dtype=self.dtype)
        self.lstm = LSTMStack(self.hidden_dim, self.num_layers,
                              self.dropout_rate, dtype=self.dtype)
        if self.attn_length > 0:
            self.attn_query = nn.Dense(self.hidden_dim, use_bias=False,
                                       dtype=self.dtype)
            self.attn_key = nn.Dense(self.hidden_dim, use_bias=False,
                                     dtype=self.dtype)
            self.attn_v = nn.Dense(1, use_bias=False, dtype=self.dtype)
            self.attn_mix = nn.Dense(self.hidden_dim, dtype=self.dtype)
        self.decoder = nn.Dense(self.vocab_size, dtype=self.dtype)

    def _attend(self, h: jnp.ndarray, window: jnp.ndarray,
                valid: jnp.ndarray) -> jnp.ndarray:
        """Additive attention of h [B, H] over window [W, B, H]."""
        scores = self.attn_v(jnp.tanh(
            self.attn_key(window) + self.attn_query(h)[None]))  # [W, B, 1]
        scores = jnp.where(valid[:, :, None], scores, -1e9)
        weights = jax.nn.softmax(scores, axis=0)
        context = jnp.sum(weights * window, axis=0)  # [B, H]
        return jnp.tanh(self.attn_mix(jnp.concatenate([h, context], -1)))

    def __call__(self, tokens: jnp.ndarray, lengths: Optional[jnp.ndarray]
                 = None, deterministic: bool = True) -> jnp.ndarray:
        """tokens: [T, B] int time-major -> logits [T, B, vocab].

        With `lengths`, padded positions neither advance state nor emit
        output (torch pack_padded_sequence parity,
        train_basic_rnn.py:223-226).
        """
        t, b = tokens.shape
        xs = self.embedding(tokens.astype(jnp.int32))
        state = (jnp.zeros((self.num_layers, b, self.hidden_dim), self.dtype),
                 jnp.zeros((self.num_layers, b, self.hidden_dim), self.dtype))
        outputs, _ = self.lstm(xs, state, deterministic=deterministic,
                               lengths=lengths)
        if self.attn_length > 0:
            outputs = self._windowed_attention(outputs)
        return self.decoder(outputs).astype(jnp.float32)

    def _windowed_attention(self, outputs: jnp.ndarray) -> jnp.ndarray:
        """Attend each step over the previous `attn_length` outputs.

        TPU shaping: instead of a sequential scan with a rolling buffer,
        build the band in parallel — stack the outputs shifted by
        d = 1..W so position t sees exactly outputs[t-W:t].  One
        [W, T, B, H] tensor, fully parallel over T (the decode path's
        rolling buffer in decode_step computes the same window).
        """
        w = self.attn_length
        t, b, h = outputs.shape
        # shifted[d-1, t] = outputs[t - d] (zeros where t - d < 0)
        shifted = jnp.stack([
            jnp.pad(outputs, ((d, 0), (0, 0), (0, 0)))[:t]
            for d in range(1, w + 1)
        ])  # [W, T, B, H]; index 0 = most recent previous step
        q = self.attn_query(outputs)              # [T, B, H]
        scores = self.attn_v(jnp.tanh(
            self.attn_key(shifted) + q[None]))    # [W, T, B, 1]
        dist = jnp.arange(1, w + 1)[:, None]      # [W, 1]
        valid = dist <= jnp.arange(t)[None, :]    # [W, T]
        scores = jnp.where(valid[:, :, None, None], scores, -1e9)
        weights = jax.nn.softmax(scores, axis=0)
        context = jnp.sum(weights * shifted, axis=0)  # [T, B, H]
        return jnp.tanh(self.attn_mix(
            jnp.concatenate([outputs, context], -1)))

    # -- incremental decoding (decode engine interface) -----------------------

    def init_cache(self, batch: int, cache_len: int = 0) -> Dict:
        state = (jnp.zeros((self.num_layers, batch, self.hidden_dim),
                           self.dtype),
                 jnp.zeros((self.num_layers, batch, self.hidden_dim),
                           self.dtype))
        cache: Dict[str, Any] = {"h": state[0], "c": state[1]}
        if self.attn_length > 0:
            cache["attn_buf"] = jnp.zeros(
                (self.attn_length, batch, self.hidden_dim), self.dtype)
            # per-ROW step count: rows admitted at different times (the
            # continuous-batching serving pool) each mask their own
            # unfilled window; a dedicated decode just carries B equal
            # counters
            cache["attn_n"] = jnp.zeros((batch,), jnp.int32)
        return cache

    def decode_step(self, token: jnp.ndarray, cache: Dict,
                    t: jnp.ndarray = None) -> Tuple[jnp.ndarray, Dict]:
        x = self.embedding(token.astype(jnp.int32))
        out, (h, c) = self.lstm.step(x, (cache["h"], cache["c"]))
        new_cache: Dict[str, Any] = {"h": h, "c": c}
        if self.attn_length > 0:
            w, b = self.attn_length, out.shape[0]
            n = cache["attn_n"]                       # [B]
            # buf is oldest->newest: the last min(n_b, w) slots are real
            valid = (jnp.arange(w)[:, None]
                     >= (w - jnp.minimum(n, w))[None, :])
            out = self._attend(out, cache["attn_buf"], valid)
            new_cache["attn_buf"] = jnp.concatenate(
                [cache["attn_buf"][1:],
                 (h[-1])[None]], axis=0)
            new_cache["attn_n"] = n + 1
        return self.decoder(out).astype(jnp.float32), new_cache
